"""Python line parsers for the TSV formats — the SQL-UDTF mirror of the
native csv scans in tsv.py.

The DataFrame API keeps the JVM-side csv scans (codegen, pushdown); these
exist so the reference's SQL names (``SELECT * FROM read_gff('x')``) run
verbatim through Python UDTFs (functions/register.py). Normalizations
mirror tsv.py exactly: '.' → NULL, BED 0→1-based shifts, SAM '*'
placeholders and the CIGAR-derived ``end``.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from exon_duckdb_spark.sources.reader_core import read_split_lines
from exon_duckdb_spark.sources.splits import FileSplit

__all__ = [
    "parse_gff_split",
    "parse_gtf_split",
    "parse_bed_split",
    "parse_sam_split",
    "parse_hmm_split",
]


def _dot(v: str) -> str | None:
    return None if v == "." else v


def _gff_attrs(raw: str) -> dict[str, list[str]] | None:
    if raw == "." or not raw:
        return None
    out: dict[str, list[str]] = {}
    for part in raw.rstrip(";").split(";"):
        part = part.strip()
        if not part:
            continue
        k, _, v = part.partition("=")
        out[k] = v.split(",")
    return out


_GTF_ATTR_RE = re.compile(r'([A-Za-z0-9_]+)\s+"([^"]*)"')


def _gtf_attrs(raw: str) -> dict[str, list[str]] | None:
    if raw == "." or not raw:
        return None
    return {k: [v] for k, v in _GTF_ATTR_RE.findall(raw)}


def _gff_like(split: FileSplit, last_col: str, attr_fn) -> Iterator[dict]:
    for line in read_split_lines(split):
        line = line.rstrip(b"\r\n")
        if not line or line.startswith(b"#"):
            continue
        f = line.decode("utf-8", "replace").split("\t")
        # GFF3 '##FASTA' trailer: sequence lines have no tab-separated
        # coordinates — requiring both mandatory coordinates drops exactly
        # them, mirroring tsv.py's start/end IS NOT NULL filter.
        if len(f) < 5 or f[3] in (".", "") or f[4] in (".", ""):
            continue
        f += [""] * (9 - len(f))
        yield {
            "seqname": _dot(f[0]),
            "source": _dot(f[1]),
            "type": _dot(f[2]),
            "start": int(f[3]) if f[3] not in (".", "") else None,
            "end": int(f[4]) if f[4] not in (".", "") else None,
            "score": float(f[5]) if f[5] not in (".", "") else None,
            "strand": _dot(f[6]),
            last_col: _dot(f[7]),
            "attributes": attr_fn(f[8]),
        }


def parse_gff_split(split: FileSplit) -> Iterator[dict]:
    yield from _gff_like(split, "phase", _gff_attrs)


def parse_gtf_split(split: FileSplit) -> Iterator[dict]:
    yield from _gff_like(split, "frame", _gtf_attrs)


def parse_gff_raw_split(split: FileSplit) -> Iterator[dict]:
    """Raw GFF: every column verbatim (no '.'→NULL, no attr parsing) except
    start/end as ints — the reference's read_gff_raw shape
    (test_gff_scan.test:100-113, disabled there)."""
    for line in read_split_lines(split):
        line = line.rstrip(b"\r\n")
        if not line or line.startswith(b"#"):
            continue
        f = line.decode("utf-8", "replace").split("\t")
        # drop '##FASTA' trailer sequence lines (see _gff_like)
        if len(f) < 5 or f[3] in (".", "") or f[4] in (".", ""):
            continue
        f += [""] * (9 - len(f))
        yield {
            "seqid": f[0],
            "source": f[1],
            "type": f[2],
            "start": int(f[3]) if f[3] not in (".", "") else None,
            "end": int(f[4]) if f[4] not in (".", "") else None,
            "score": f[5],
            "strand": f[6],
            "phase": f[7],
            "attributes": f[8],
        }


def parse_bed_split(split: FileSplit) -> Iterator[dict]:
    zero_null = lambda v: None if v in (".", "0", "") else v  # noqa: E731
    for line in read_split_lines(split):
        line = line.rstrip(b"\r\n")
        if not line or line.startswith(b"#"):
            continue
        f = line.decode("utf-8", "replace").split("\t")
        f += [""] * (12 - len(f))
        as_int = lambda v: int(v) if v not in (".", "") else None  # noqa: E731
        start0 = as_int(f[1])
        thick0 = as_int(f[6])
        yield {
            "reference_sequence_name": f[0],
            "start": start0 + 1 if start0 is not None else None,
            "end": as_int(f[2]),
            "name": _dot(f[3]) or None,
            "score": zero_null(f[4]),
            "strand": _dot(f[5]) or None,
            "thick_start": thick0 + 1 if thick0 is not None else None,
            "thick_end": as_int(f[7]),
            "color": zero_null(f[8]),
            "block_count": as_int(f[9]),
            "block_sizes": f[10] or None,
            "block_starts": f[11] or None,
        }


_CIGAR_RE = re.compile(r"(\d+)([MIDNSHP=X])")
_REF_OPS = set("MDN=X")


def _cigar_ref_len(cigar: str) -> int:
    return sum(int(n) for n, op in _CIGAR_RE.findall(cigar) if op in _REF_OPS)


def parse_sam_split(split: FileSplit) -> Iterator[dict]:
    star = lambda v: None if v == "*" else v  # noqa: E731
    for line in read_split_lines(split):
        line = line.rstrip(b"\r\n")
        if not line or line.startswith(b"@"):
            continue
        f = line.decode("utf-8", "replace").split("\t")
        pos = int(f[3])
        cigar = star(f[5])
        rname = star(f[2])
        yield {
            "name": f[0],
            "flag": int(f[1]),
            "reference": rname,
            "start": pos if pos != 0 else None,
            "end": (
                pos + _cigar_ref_len(cigar) - 1 if cigar is not None and pos != 0 else None
            ),
            "mapping_quality": f[4],
            "cigar": cigar,
            "mate_reference": rname if f[6] == "=" else star(f[6]),
            "sequence": star(f[9]),
            "quality_score": star(f[10]),
        }


def parse_vcf_record_fields(f: list[str], info_fields) -> dict:
    """One VCF data line (already tab-split) → record dict mirroring
    read_vcf's column semantics (vcf.py _info_col)."""
    info_raw = f[7] if len(f) > 7 else ""
    entries: dict[str, str | None] = {}
    if info_raw not in (".", ""):
        for part in info_raw.split(";"):
            k, eq, v = part.partition("=")
            entries[k] = v if eq else None

    def _cast(v: str, t: str):
        # '.' is the VCF missing-value marker (scalar or per list element);
        # malformed values null out instead of killing the task — mirrors
        # _info_col's try_cast semantics in the DataFrame path.
        if v == ".":
            return None
        try:
            if t == "Integer":
                return int(v)
            if t == "Float":
                return float(v)
        except ValueError:
            return None
        return v

    info = {}
    for fld in info_fields:
        if fld.type == "Flag" or fld.number == "0":
            info[fld.id] = fld.id in entries
        else:
            raw = entries.get(fld.id)
            # a bare '.' value is whole-field-missing → NULL (not [NULL]),
            # matching _info_col's pre-split '.' check
            if raw in (None, "", "."):
                info[fld.id] = None
            elif fld.number == "1":
                info[fld.id] = _cast(raw, fld.type)
            else:
                info[fld.id] = [_cast(v, fld.type) for v in raw.split(",")]
    def _try(v: str, conv):
        try:
            return conv(v)
        except ValueError:
            return None

    qual = f[5] if len(f) > 5 else "."
    return {
        "chrom": f[0],
        "pos": _try(f[1], int) if len(f) > 1 else None,
        "id": _dot(f[2]) if len(f) > 2 else None,
        "ref": f[3] if len(f) > 3 else None,
        "alt": None if len(f) < 5 or f[4] == "." else f[4].split(","),
        "qual": _try(qual, float) if qual != "." else None,
        "filter": _dot(f[6]) if len(f) > 6 else None,
        "info": info,
        "formats": f[8] if len(f) > 8 else None,
        "genotypes": f[9:] if len(f) > 9 else None,
    }


def parse_hmm_split(split: FileSplit) -> Iterator[dict]:
    from exon_duckdb_spark.sources.schemas import HMM_DOMTAB_SCHEMA

    from pyspark.sql import types as T

    fields = HMM_DOMTAB_SCHEMA.fields
    for line in read_split_lines(split):
        line = line.rstrip(b"\r\n")
        if not line or line.startswith(b"#"):
            continue
        parts = line.decode("utf-8", "replace").strip().split(None, 22)
        rec = {}
        for i, fld in enumerate(fields):
            v = parts[i] if i < len(parts) else None
            if v is not None and not isinstance(fld.dataType, T.StringType):
                v = int(v) if isinstance(fld.dataType, T.IntegerType) else float(v)
            rec[fld.name] = v
        yield rec
