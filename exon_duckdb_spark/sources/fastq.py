"""FASTQ source.

Parity: reference ``read_fastq`` (4-line records; schema
(name, description, sequence, quality_scores) per test_fastq_scan.test:36-42).

FASTQ is not byte-splittable without heuristics ('@' legally begins quality
lines), so each file is one split — exactly the reference's per-file stream
model; parallelism comes from many files, the normal shape of a sequencing
corpus. A 4-line-frame heuristic splitter is a possible upgrade if single
giant uncompressed FASTQ files become the bottleneck.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from exon_duckdb_spark.sources.reader_core import make_reader, read_split_lines
from exon_duckdb_spark.sources.schemas import FASTQ_SCHEMA
from exon_duckdb_spark.sources.splits import FileSplit


def _parse_fastq_split(split: FileSplit) -> Iterator[dict]:
    it = read_split_lines(split)
    while True:
        head = next(it, None)
        if head is None:
            return
        head = head.rstrip(b"\r\n")
        if not head:
            continue
        if not head.startswith(b"@"):
            raise ValueError(f"malformed FASTQ record header: {head[:50]!r}")
        seq = next(it, b"").rstrip(b"\r\n")
        plus = next(it, b"").rstrip(b"\r\n")
        qual = next(it, b"").rstrip(b"\r\n")
        if not plus.startswith(b"+"):
            raise ValueError(f"malformed FASTQ separator: {plus[:50]!r}")
        name_desc = head[1:].decode("utf-8", "replace")
        name, _, desc = name_desc.partition(" ")
        yield {
            "name": name,
            "description": desc if desc else None,
            "sequence": seq.decode("utf-8", "replace"),
            "quality_scores": qual.decode("utf-8", "replace"),
        }


def read_fastq(
    spark: SparkSession,
    path: str | list[str],
    compression: str | None = "auto_detect",
) -> DataFrame:
    """FASTQ records as DataFrame[name, description, sequence, quality_scores]."""
    return make_reader(
        spark,
        path,
        FASTQ_SCHEMA,
        _parse_fastq_split,
        compression=compression,
        splittable=False,
    )
