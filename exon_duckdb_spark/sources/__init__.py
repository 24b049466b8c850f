"""File-format sources (SURVEY §2.1 parity surface).

``read_bio`` is the replacement-scan analog: extension sniffing → the right
reader (reference: SELECT * FROM 'x.fasta',
exon/src/exon/arrow_table_function/module.cpp:320-382).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from exon_duckdb_spark.sources.bam import bam_query, read_bam  # noqa: F401
from exon_duckdb_spark.sources.bcf import bcf_query, read_bcf  # noqa: F401
from exon_duckdb_spark.sources.fasta import read_fasta  # noqa: F401
from exon_duckdb_spark.sources.fastq import read_fastq  # noqa: F401
from exon_duckdb_spark.sources.genbank import read_genbank  # noqa: F401
from exon_duckdb_spark.sources.mzml import read_mzml  # noqa: F401
from exon_duckdb_spark.sources.tsv import (  # noqa: F401
    read_bed,
    read_gff,
    read_gff_raw,
    read_gtf,
    read_hmm_dom_tbl,
    read_sam,
)
from exon_duckdb_spark.sources.vcf import read_vcf, vcf_query  # noqa: F401

_EXT_READERS = {
    "fasta": read_fasta,
    "fa": read_fasta,
    "fna": read_fasta,
    "fastq": read_fastq,
    "fq": read_fastq,
    "gff": read_gff,
    "gff3": read_gff,
    "gtf": read_gtf,
    "bed": read_bed,
    "sam": read_sam,
    "bam": read_bam,
    "vcf": read_vcf,
    "bcf": read_bcf,
    "gb": read_genbank,
    "gbk": read_genbank,
    "genbank": read_genbank,
    "mzml": read_mzml,
    "hmmout": read_hmm_dom_tbl,
    "domtblout": read_hmm_dom_tbl,
}

_COMPRESSION_SUFFIXES = (".gz", ".gzip", ".zst", ".zstd")


def read_bio(spark: SparkSession, path: str) -> DataFrame:
    """Dispatch on file extension, ignoring a trailing compression suffix —
    the Spark analog of the reference's replacement scan (``FROM 'x.fasta'``
    and ``FROM 'x.fasta.gz'`` both resolve, rust/src/arrow_reader.rs:174-197).
    """
    name = os.path.basename(path.rstrip("/"))
    lower = name.lower()
    for suf in _COMPRESSION_SUFFIXES:
        if lower.endswith(suf):
            lower = lower[: -len(suf)]
            break
    ext = lower.rsplit(".", 1)[-1] if "." in lower else ""
    reader = _EXT_READERS.get(ext)
    if reader is None:
        raise ValueError(
            f"read_bio: unrecognized extension {ext!r} for {path!r}; "
            f"known: {sorted(set(_EXT_READERS))}"
        )
    return reader(spark, path)
