"""FASTA source — the template split-parallel record reader.

Parity: reference ``read_fasta`` (exon/src/exon_extension.cpp:50;
schema (id, description, sequence) per test_fasta_scan.test).

Record framing across splits: a record begins at a line starting with '>'.
A split parses records whose '>' byte offset is in [start, end); the last
record continues past end until the next '>' or EOF. Gzip/zstd files are
unsplittable → one task per file (identical to the reference's per-file
stream, but files still fan out across the cluster).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from exon_duckdb_spark.sources.reader_core import make_reader
from exon_duckdb_spark.sources.schemas import FASTA_SCHEMA
from exon_duckdb_spark.sources.splits import FileSplit, open_maybe_compressed


def _parse_fasta_split(split: FileSplit) -> Iterator[dict]:
    end = split.start + split.length
    with open_maybe_compressed(split.path, split.compression) as f:
        if split.compression is None and split.start > 0:
            # scan forward to the first record head at-or-after start:
            # align to a line boundary with one seek + readline (the same
            # shape fastq.py uses — a per-byte read(1) loop costs one
            # filesystem call per byte on pyarrow URI streams)
            f.seek(split.start - 1)
            offset = split.start - 1 + len(f.readline())
        else:
            offset = 0

        header: bytes | None = None
        header_off = -1
        seq_parts: list[bytes] = []
        for line in f:
            line_off = offset
            offset += len(line)
            if line.startswith(b">"):
                if header is not None:
                    yield _record(header, seq_parts)
                if split.compression is None and line_off >= end:
                    header = None
                    break
                header = line
                header_off = line_off
                seq_parts = []
            elif header is not None:
                seq_parts.append(line.strip())
        if header is not None and (split.compression is not None or header_off < end):
            yield _record(header, seq_parts)


def _record(header: bytes, seq_parts: list[bytes]) -> dict:
    head = header[1:].decode("utf-8", "replace").rstrip("\r\n")
    ident, _, desc = head.partition(" ")
    return {
        "id": ident,
        "description": desc if desc else None,
        "sequence": b"".join(seq_parts).decode("utf-8", "replace"),
    }


def read_fasta(
    spark: SparkSession,
    path: str | list[str],
    compression: str | None = "auto_detect",
    split_bytes: int | None = None,
) -> DataFrame:
    """FASTA records as DataFrame[id, description, sequence]."""
    return make_reader(
        spark,
        path,
        FASTA_SCHEMA,
        _parse_fasta_split,
        compression=compression,
        splittable=True,
        split_bytes=split_bytes,
    )
