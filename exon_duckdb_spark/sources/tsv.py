"""Line-oriented TSV formats via native ``spark.read.csv`` — GFF, GTF, BED,
SAM (text), HMMER domtblout.

These stay entirely JVM-side: the scan is a FileSourceScan (column pruning +
predicate pushdown from Catalyst for free), '.'-placeholder normalization
and nested-attribute parsing are codegen expressions. Hadoop codecs handle
.gz transparently; directories and globs are native.

Parity: reference scans read_gff / read_gtf / read_bed_file /
read_sam_file_records / read_hmm_dom_tbl_out
(exon/src/exon_extension.cpp:47-58; schemas per SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from exon_duckdb_spark.functions.gff import gff_attributes_to_map, gtf_attributes_to_map
from exon_duckdb_spark.functions.sam import cigar_reference_length
from exon_duckdb_spark.sources.schemas import (
    BED_SCHEMA,
    GFF_SCHEMA,
    GTF_SCHEMA,
    HMM_DOMTAB_SCHEMA,
    SAM_SCHEMA,
)

__all__ = [
    "read_gff",
    "read_gff_raw",
    "read_gtf",
    "read_bed",
    "read_sam",
    "read_hmm_dom_tbl",
]


def _dot_null(c: Column) -> Column:
    return F.when(c == ".", F.lit(None)).otherwise(c)


_GFF_RAW = "seqname string, source string, type string, start long, end long, score_raw string, strand string, phase_raw string, attrs_raw string"


def _read_gff_like(spark: SparkSession, path: str, last_col: str, attr_parse) -> DataFrame:
    raw = (
        spark.read.option("sep", "\t")
        .option("quote", "")
        .option("comment", "#")
        .schema(_GFF_RAW.replace("phase_raw", f"{last_col}_raw"))
        .csv(path)
    )
    # GFF3 files may end with a '##FASTA' section; the directive line is
    # comment-skipped but the sequence lines after it are not — they parse
    # as 1-field rows (no tabs), so requiring the mandatory numeric
    # coordinates drops exactly them (every real feature row carries both)
    raw = raw.where(F.col("start").isNotNull() & F.col("end").isNotNull())
    return raw.select(
        "seqname",
        "source",
        "type",
        "start",
        "end",
        _dot_null(F.col("score_raw")).cast("float").alias("score"),
        _dot_null(F.col("strand")).alias("strand"),
        _dot_null(F.col(f"{last_col}_raw")).alias(last_col),
        attr_parse(F.col("attrs_raw")).alias("attributes"),
    )


def read_gff(spark: SparkSession, path: str) -> DataFrame:
    """GFF3 → (seqname, source, type, start, end, score, strand, phase,
    attributes MAP<STRING, ARRAY<STRING>>); '.' → NULL."""
    df = _read_gff_like(spark, path, "phase", gff_attributes_to_map)
    assert [f.name for f in df.schema.fields] == [f.name for f in GFF_SCHEMA.fields]
    return df


def read_gff_raw(spark: SparkSession, path: str) -> DataFrame:
    """Raw GFF3 scan: the nine columns with NO normalization — score,
    strand and phase stay verbatim strings ('.' included) and ``attributes``
    is the unparsed attribute text. Mirrors the reference's read_gff_raw
    (commented-out test_gff_scan.test:100-113, column head ``seqid``; the
    raw-test golden keeps '.' score and prints phase '0' literally)."""
    return (
        spark.read.option("sep", "\t")
        .option("quote", "")
        .option("comment", "#")
        .schema(
            "seqid string, source string, type string, start long, end long, "
            "score string, strand string, phase string, attributes string"
        )
        .csv(path)
        # drop '##FASTA' trailer sequence lines (see _read_gff_like)
        .where(F.col("start").isNotNull() & F.col("end").isNotNull())
    )


def read_gtf(spark: SparkSession, path: str) -> DataFrame:
    """GTF (GFF2 ``key "value";`` attributes) → same shape as GFF with
    ``frame`` in place of ``phase``."""
    df = _read_gff_like(spark, path, "frame", gtf_attributes_to_map)
    assert [f.name for f in df.schema.fields] == [f.name for f in GTF_SCHEMA.fields]
    return df


_BED_RAW = T.StructType(
    [
        T.StructField("c0", T.StringType()),
        T.StructField("c1", T.LongType()),
        T.StructField("c2", T.LongType()),
        T.StructField("c3", T.StringType()),
        T.StructField("c4", T.StringType()),
        T.StructField("c5", T.StringType()),
        T.StructField("c6", T.LongType()),
        T.StructField("c7", T.LongType()),
        T.StructField("c8", T.StringType()),
        T.StructField("c9", T.IntegerType()),
        T.StructField("c10", T.StringType()),
        T.StructField("c11", T.StringType()),
    ]
)


def read_bed(spark: SparkSession, path: str) -> DataFrame:
    """BED (≤12 col) with the reference's normalizations: 0-based start /
    thick_start shifted to 1-based; '.', score 0 and color 0 → NULL
    (test_bed_io.test:5-17)."""
    raw = (
        spark.read.option("sep", "\t")
        .option("quote", "")
        .option("comment", "#")
        .schema(_BED_RAW)
        .csv(path)
    )
    zero_null = lambda c: F.when((c == ".") | (c == "0"), F.lit(None)).otherwise(c)  # noqa: E731
    df = raw.select(
        F.col("c0").alias("reference_sequence_name"),
        (F.col("c1") + 1).alias("start"),
        F.col("c2").alias("end"),
        _dot_null(F.col("c3")).alias("name"),
        zero_null(F.col("c4")).alias("score"),
        _dot_null(F.col("c5")).alias("strand"),
        (F.col("c6") + 1).alias("thick_start"),
        F.col("c7").alias("thick_end"),
        zero_null(F.col("c8")).alias("color"),
        F.col("c9").alias("block_count"),
        F.col("c10").alias("block_sizes"),
        F.col("c11").alias("block_starts"),
    )
    assert [f.name for f in df.schema.fields] == [f.name for f in BED_SCHEMA.fields]
    return df


_SAM_RAW = (
    "qname string, flag int, rname string, pos long, mapq string, cigar_raw string, "
    "rnext string, pnext long, tlen long, seq string, qual string"
)


def read_sam(spark: SparkSession, path: str) -> DataFrame:
    """SAM text alignments → the reference's 10 columns; ``end`` is computed
    from the CIGAR's reference-consumed length (end = start + reflen - 1),
    '*' placeholders → NULL, mate '=' resolves to the read's reference.

    Header lines start with '@' → native comment skipping.
    """
    raw = (
        spark.read.option("sep", "\t")
        .option("quote", "").option("comment", "@").schema(_SAM_RAW).csv(path)
    )
    star_null = lambda c: F.when(c == "*", F.lit(None)).otherwise(c)  # noqa: E731
    cigar = star_null(F.col("cigar_raw"))
    df = raw.select(
        F.col("qname").alias("name"),
        F.col("flag"),
        star_null(F.col("rname")).alias("reference"),
        F.when(F.col("pos") == 0, F.lit(None)).otherwise(F.col("pos")).alias("start"),
        F.when(
            cigar.isNull() | (F.col("pos") == 0), F.lit(None)
        )
        .otherwise(F.col("pos") + cigar_reference_length(F.col("cigar_raw")) - 1)
        .alias("end"),
        F.col("mapq").alias("mapping_quality"),
        cigar.alias("cigar"),
        F.when(F.col("rnext") == "=", star_null(F.col("rname")))
        .otherwise(star_null(F.col("rnext")))
        .alias("mate_reference"),
        star_null(F.col("seq")).alias("sequence"),
        star_null(F.col("qual")).alias("quality_score"),
    )
    assert [f.name for f in df.schema.fields] == [f.name for f in SAM_SCHEMA.fields]
    return df


def read_hmm_dom_tbl(spark: SparkSession, path: str) -> DataFrame:
    """HMMER3 --domtblout: 22 whitespace-delimited columns + free-text
    description. Native text scan + split with a limit so the description
    keeps its spaces."""
    lines = spark.read.text(path).where(~F.col("value").startswith("#"))
    parts = F.split(F.trim(F.col("value")), r"\s+", 23)
    cols = []
    for i, field in enumerate(HMM_DOMTAB_SCHEMA.fields):
        c = parts.getItem(i)
        if not isinstance(field.dataType, T.StringType):
            c = c.cast(field.dataType)
        cols.append(c.alias(field.name))
    return lines.select(*cols)
