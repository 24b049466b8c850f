"""Sinks: FASTA / FASTQ / GFF writers.

The reference's COPY TO writers exist only as fully commented-out tests
(SURVEY §2.2) — here they are live: each serializes records to their text
format with native expressions and writes through Spark's distributed text
sink (one file per partition, codec-compressible via the standard
``compression`` option).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["to_fasta", "to_fastq", "to_gff"]


def _write_lines(df: DataFrame, line: F.Column, path: str, compression: str | None):
    writer = df.select(line.alias("value")).write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.text(path)


def to_fasta(df: DataFrame, path: str, compression: str | None = None) -> None:
    """(id, description, sequence) → FASTA. NULL description omits the
    space-separated suffix."""
    header = F.concat(
        F.lit(">"),
        F.col("id"),
        F.when(
            F.col("description").isNotNull(), F.concat(F.lit(" "), F.col("description"))
        ).otherwise(F.lit("")),
    )
    _write_lines(df, F.concat_ws("\n", header, F.col("sequence")), path, compression)


def to_fastq(df: DataFrame, path: str, compression: str | None = None) -> None:
    """(name, description, sequence, quality_scores) → 4-line FASTQ."""
    header = F.concat(
        F.lit("@"),
        F.col("name"),
        F.when(
            F.col("description").isNotNull(), F.concat(F.lit(" "), F.col("description"))
        ).otherwise(F.lit("")),
    )
    _write_lines(
        df,
        F.concat_ws("\n", header, F.col("sequence"), F.lit("+"), F.col("quality_scores")),
        path,
        compression,
    )


def to_gff(df: DataFrame, path: str, compression: str | None = None) -> None:
    """GFF scan schema → 9-column GFF3 text; NULLs render as '.'; the
    attributes map re-serializes as k=v1,v2;… ."""
    dot = lambda c: F.coalesce(c.cast("string"), F.lit("."))  # noqa: E731
    attrs = F.when(F.col("attributes").isNull(), F.lit(".")).otherwise(
        F.array_join(
            F.transform(
                F.map_entries(F.col("attributes")),
                lambda e: F.concat(e["key"], F.lit("="), F.array_join(e["value"], ",")),
            ),
            ";",
        )
    )
    line = F.concat_ws(
        "\t",
        dot(F.col("seqname")),
        dot(F.col("source")),
        dot(F.col("type")),
        dot(F.col("start")),
        dot(F.col("end")),
        dot(F.col("score")),
        dot(F.col("strand")),
        dot(F.col("phase")),
        attrs,
    )
    _write_lines(df, line, path, compression)
