"""GenBank flat-file source.

Parity: reference ``read_genbank`` (exon crate gb parser; golden:
sequence[:5]='gttaa', accession='NC_021938', topology='circular',
test_genbank_scan.test:5-10; the features list exists but its UNNEST test is
disabled in the reference).

Records are LOCUS..// blocks; a file may hold several. Files are one split
each (records are multi-line with no cheap boundary probe); directory scans
fan out per file.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from exon_duckdb_spark.sources.reader_core import make_reader, read_split_lines
from exon_duckdb_spark.sources.schemas import GENBANK_SCHEMA
from exon_duckdb_spark.sources.splits import FileSplit

__all__ = ["read_genbank"]

_LOCUS_RE = re.compile(
    rb"^LOCUS\s+(\S+)\s+\d+\s+bp\s+(\S+)\s+(circular|linear)?\s*(\S+)?\s*(\S+)?"
)


def _parse_genbank_split(split: FileSplit) -> Iterator[dict]:
    rec: dict | None = None
    section = None
    feature: dict | None = None
    qual_key = None
    for raw in read_split_lines(split):
        line = raw.rstrip(b"\r\n")
        if line.startswith(b"LOCUS"):
            rec = {k.name: None for k in GENBANK_SCHEMA.fields}
            rec["features"] = []
            seq_parts: list[bytes] = []
            rec["_seq_parts"] = seq_parts
            m = _LOCUS_RE.match(line)
            if m:
                rec["name"] = m.group(1).decode("utf-8", "replace")
                rec["molecule_type"] = m.group(2).decode("utf-8", "replace")
                rec["topology"] = m.group(3).decode("utf-8", "replace") if m.group(3) else "linear"
                rec["division"] = m.group(4).decode("utf-8", "replace") if m.group(4) else None
                rec["date"] = m.group(5).decode("utf-8", "replace") if m.group(5) else None
            section = None
            continue
        if rec is None:
            continue
        if line.startswith(b"//"):
            rec["sequence"] = b"".join(rec.pop("_seq_parts")).decode("utf-8", "replace") or None
            yield {k: v for k, v in rec.items() if not k.startswith("_")}
            rec = None
            section = None
            continue

        if line[:1] not in (b" ", b"") and not line.startswith(b"ORIGIN"):
            key, _, val = line.partition(b" ")
            section = key.decode("utf-8", "replace")
            val = val.strip().decode("utf-8", "replace")
            mapping = {
                "DEFINITION": "definition",
                "ACCESSION": "accession",
                "VERSION": "version",
                "DBLINK": "dblink",
                "KEYWORDS": "keywords",
                "SOURCE": "source",
                "COMMENT": "comments",
                "CONTIG": "contig",
            }
            if section in mapping:
                col = mapping[section]
                rec[col] = val if rec[col] is None else rec[col] + " " + val
            continue
        if line.startswith(b"ORIGIN"):
            section = "ORIGIN"
            continue
        if line.startswith(b"FEATURES"):
            section = "FEATURES"
            continue

        if section == "ORIGIN":
            # '        1 gttaatgtag cttataatat caaagcaagg' → strip offsets/spaces
            rec["_seq_parts"].append(re.sub(rb"[\d\s/]", b"", line))
        elif section == "FEATURES":
            stripped = line.strip()
            if line[:6].strip() and len(line) > 5 and line[5:6] != b" ":
                # new feature: 5-space indent, kind at col 5
                kind, _, loc = stripped.partition(b" ")
                feature = {
                    "kind": kind.decode("utf-8", "replace"),
                    "location": loc.strip().decode("utf-8", "replace"),
                    "qualifiers": {},
                }
                rec["features"].append(feature)
                qual_key = None
            elif stripped.startswith(b"/") and feature is not None:
                k, eq, v = stripped[1:].partition(b"=")
                qual_key = k.decode("utf-8", "replace")
                feature["qualifiers"][qual_key] = v.strip(b'"').decode("utf-8", "replace") if eq else ""
            elif feature is not None:
                cont = stripped.decode("utf-8", "replace")
                if qual_key:
                    feature["qualifiers"][qual_key] += " " + cont.strip('"')
                else:
                    feature["location"] += cont
        elif section == "REFERENCE":
            # TITLE is an indented sub-key of each REFERENCE block
            # ("  TITLE     Complete mitochondrial genome ..."); multiple
            # references' titles join with '; ', continuations (indented
            # ~12 cols, vs sub-keys at 2-3) append with a space
            indent = len(line) - len(line.lstrip(b" "))
            stripped = line.strip()
            skey, _, sval = stripped.partition(b" ")
            if indent <= 4 and skey in (
                b"AUTHORS", b"TITLE", b"JOURNAL", b"PUBMED", b"MEDLINE",
                b"REMARK", b"CONSRTM",
            ):
                rec["_ref_sub"] = skey
                if skey == b"TITLE":
                    t = sval.strip().decode("utf-8", "replace")
                    rec["titles"] = (
                        t if rec["titles"] is None else rec["titles"] + "; " + t
                    )
            elif rec.get("_ref_sub") == b"TITLE" and rec["titles"] is not None:
                rec["titles"] += " " + stripped.decode("utf-8", "replace")
        elif section in ("DEFINITION", "COMMENT", "SOURCE", "KEYWORDS", "CONTIG", "DBLINK"):
            col = {
                "DEFINITION": "definition",
                "COMMENT": "comments",
                "SOURCE": "source",
                "KEYWORDS": "keywords",
                "CONTIG": "contig",
                "DBLINK": "dblink",
            }[section]
            cont = line.strip().decode("utf-8", "replace")
            rec[col] = cont if rec[col] is None else rec[col] + " " + cont
    if rec is not None:
        # truncated file whose last record lacks the '//' terminator:
        # yield what was parsed instead of silently dropping the record
        # (splits are whole files here, so end-of-lines IS end-of-file)
        rec["sequence"] = (
            b"".join(rec.pop("_seq_parts")).decode("utf-8", "replace") or None
        )
        yield {k: v for k, v in rec.items() if not k.startswith("_")}


def read_genbank(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """GenBank records (name, accession, topology, sequence, features, …)."""
    return make_reader(
        spark,
        path,
        GENBANK_SCHEMA,
        _parse_genbank_split,
        compression="auto_detect",
        splittable=False,
    )
