"""FASTQ source.

Parity: reference ``read_fastq`` (4-line records; schema
(name, description, sequence, quality_scores) per test_fastq_scan.test:36-42).

Byte-splittable: '@' legally begins quality lines, so a split anchors itself
with the standard 4-line-frame heuristic — a record head is a line starting
with '@' whose +2 line starts with '+' and whose +1/+3 lines (sequence,
quality) have equal length. A split owns records whose header byte offset
falls in [start, end); the last record reads past end until it closes. At
100 TB this keeps one giant uncompressed FASTQ from serializing onto a
single task. Compressed files stay one-split-per-file (gzip is a stream).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from exon_duckdb_spark.sources.reader_core import make_reader
from exon_duckdb_spark.sources.schemas import FASTQ_SCHEMA
from exon_duckdb_spark.sources.splits import FileSplit, open_maybe_compressed


def _is_record_head(window: list[bytes], j: int) -> bool:
    """4-line-frame heuristic at line j of the lookahead window."""
    if j + 3 >= len(window):
        return False
    head, seq, plus, qual = (w.rstrip(b"\r\n") for w in window[j : j + 4])
    return (
        head.startswith(b"@")
        and plus.startswith(b"+")
        and len(seq) == len(qual)
    )


def _parse_fastq_split(split: FileSplit) -> Iterator[dict]:
    end = math.inf if split.compression is not None else split.start + split.length
    with open_maybe_compressed(split.path, split.compression) as f:
        offset = 0
        if split.compression is None and split.start > 0:
            # align to the next line boundary at-or-after start-1
            f.seek(split.start - 1)
            offset = split.start - 1 + len(f.readline())

        # Lookahead buffer of (offset, line); anchor on the first record
        # head. A line-aligned offset lands at most 3 lines into a record
        # (blank separator lines can push the head a little further), so
        # this scans only a handful of lines per split.
        window: list[tuple[int, bytes]] = []

        def extend_window(upto: int) -> None:
            nonlocal offset
            while len(window) < upto:
                line = f.readline()
                if not line:
                    return
                window.append((offset, line))
                offset += len(line)

        anchor = None
        j = 0
        while True:
            extend_window(j + 4)
            if j >= len(window):
                break  # EOF without a record head
            if not window[j][1].rstrip(b"\r\n"):
                j += 1  # blank line between records
                continue
            if _is_record_head([w[1] for w in window], j):
                anchor = j
                break
            if window[j][0] >= end:
                break  # heads from here on belong to the next split anyway
            j += 1
        if anchor is None:
            if split.start == 0 and any(x[1].rstrip(b"\r\n") for x in window):
                first = window[0][1].rstrip(b"\r\n")[:50]
                raise ValueError(f"malformed FASTQ record header: {first!r}")
            return  # tail split with no record head

        window = window[anchor:]

        def next_line() -> tuple[int, bytes] | None:
            nonlocal offset
            if window:
                return window.pop(0)
            line = f.readline()
            if not line:
                return None
            out = (offset, line)
            offset += len(line)
            return out

        while True:
            item = next_line()
            if item is None:
                return
            head_off, head = item
            head = head.rstrip(b"\r\n")
            if not head:
                continue
            if head_off >= end:
                return  # next split owns this record
            if not head.startswith(b"@"):
                raise ValueError(f"malformed FASTQ record header: {head[:50]!r}")
            seq = (next_line() or (0, b""))[1].rstrip(b"\r\n")
            plus = (next_line() or (0, b""))[1].rstrip(b"\r\n")
            qual = (next_line() or (0, b""))[1].rstrip(b"\r\n")
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
    split_bytes: int | None = None,
) -> DataFrame:
    """FASTQ records as DataFrame[name, description, sequence, quality_scores]."""
    return make_reader(
        spark,
        path,
        FASTQ_SCHEMA,
        _parse_fastq_split,
        compression=compression,
        splittable=True,
        split_bytes=split_bytes,
    )
