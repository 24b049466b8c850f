"""The reference user's workflow, end to end — what an exon-duckdb user
runs today, re-expressed on this engine:

  1. write a FASTA reference + a GFF annotation (distributed writers);
  2. read them back (`read_fasta` split-parallel reader, `read_gff` with
     typed attribute map) — or via the SQL replacement-scan surface
     (``SELECT * FROM read_gff_file(...)``) the reference exposes;
  3. per-gene sequence extraction with a RANGE JOIN (interval overlap of
     reads vs annotated features);
  4. the scalar-function surface over the extracted sequences:
     gc_content, reverse_complement, transcribe, translate_dna_to_aa;
  5. a windowed per-feature-type summary.

Every operator used here is oracle-verified by the driver contract
(q30/q43 roundtrips, q35 range join, q12 sequence ops); this file only
composes them the way the reference's own test queries do
(reference: test/sql/exondb-*/ — scan TVFs + scalar functions over the
host engine's relational surface).

Run:  python examples/genomics_pipeline.py [sf_dir]
(defaults to /root/testdata/sf0.001; prints a summary JSON line).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import exon_duckdb_spark.functions as fx
from exon_duckdb_spark.operators.relational import range_join
from exon_duckdb_spark.sources import read_fasta, read_gff
from exon_duckdb_spark.sources.writers import to_fasta, to_gff


def _dna(col: str = "text") -> F.Column:
    """Derive a DNA-ish sequence from the documents table (the repo's
    standard fixture trick: the bases already present in English text)."""
    return F.regexp_replace(F.upper(F.col(col)), "[^ATCG]", "")


def run_genomics(
    spark: SparkSession, sf_dir: str, scratch: str | None = None
) -> "tuple[DataFrame, dict]":
    """Returns (per_feature_summary, stats)."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    scratch = scratch or tempfile.mkdtemp(prefix="genomics_example_")

    # -- 1. write the reference FASTA + a GFF annotation ------------------
    seqs = docs.select(
        F.concat(F.lit("chr"), (F.col("doc_id") % 5).cast("string")).alias("chrom"),
        F.col("doc_id"),
        _dna().alias("sequence"),
    ).where(F.length("sequence") >= 30)
    fasta_dir = os.path.join(scratch, "ref.fasta")
    to_fasta(
        seqs.select(
            F.col("doc_id").cast("string").alias("id"),
            F.col("chrom").alias("description"),
            "sequence",
        ),
        fasta_dir,
    )
    # annotate deterministic intervals per sequence: a gene spanning most
    # of it plus an exon inside the gene (so the overlap join below has
    # real work per seqname)
    base = seqs.select(
        F.col("doc_id").cast("string").alias("seqname"),
        F.col("doc_id"),
        F.length("sequence").alias("slen"),
    )
    gene = base.select(
        "seqname",
        F.lit("example").alias("source"),
        F.lit("gene").alias("type"),
        F.lit(1).cast("long").alias("start"),
        (F.col("slen") - F.col("doc_id") % 5).cast("long").alias("end"),
        F.lit(None).cast("double").alias("score"),
        F.when(F.col("doc_id") % 3 == 0, "-").otherwise("+").alias("strand"),
        F.lit(None).cast("string").alias("phase"),
        F.create_map(
            F.lit("ID"), F.array(F.concat(F.lit("g"), F.col("seqname")))
        ).alias("attributes"),
    )
    exon = base.select(
        "seqname",
        F.lit("example").alias("source"),
        F.lit("exon").alias("type"),
        (F.col("doc_id") % 7 + 2).cast("long").alias("start"),
        (F.col("doc_id") % 7 + 2 + F.col("slen") / 2).cast("long").alias("end"),
        F.lit(None).cast("double").alias("score"),
        F.when(F.col("doc_id") % 3 == 0, "-").otherwise("+").alias("strand"),
        F.lit(None).cast("string").alias("phase"),
        F.create_map(
            F.lit("ID"), F.array(F.concat(F.lit("e"), F.col("seqname")))
        ).alias("attributes"),
    )
    feats = gene.unionByName(exon)
    gff_dir = os.path.join(scratch, "ann.gff")
    to_gff(feats, gff_dir)

    # -- 2. read back through the package readers -------------------------
    ref = read_fasta(spark, fasta_dir)
    ann = read_gff(spark, gff_dir)

    # -- 3. per-feature subsequence via interval semantics ---------------
    joined = ann.join(
        ref.select(F.col("id").alias("seqname"), "sequence"), "seqname"
    ).select(
        "seqname", "type", "strand", "start", "end",
        F.substring(
            "sequence", F.col("start").cast("int"),
            (F.col("end") - F.col("start") + 1).cast("int"),
        ).alias("sub"),
    )

    # -- 4. the reference's scalar surface over the extracted sequences --
    scored = joined.select(
        "seqname", "type", "strand",
        F.length("sub").alias("sub_len"),
        F.round(fx.gc_content("sub", as_double=True), 6).alias("gc"),
        F.when(F.col("strand") == "-", fx.reverse_complement("sub"))
         .otherwise(F.col("sub")).alias("oriented"),
    ).withColumn("rna", fx.transcribe("oriented")).withColumn(
        "aa",
        F.when(
            F.length("oriented") % 3 == 0,
            fx.translate_dna_to_aa("oriented"),
        ),
    )

    # -- 5. summary + exon-start-in-gene matching via the range join -----
    # (point-in-interval: each exon start probes the broadcast gene
    # interval table — the annotation side is dimension-sized, the read
    # side never shuffles; the q35-verified operator)
    genes = ann.where(F.col("type") == "gene").select(
        F.col("seqname").alias("g_seq"),
        F.col("start").cast("long").alias("lo"),
        (F.col("end") + 1).cast("long").alias("hi"),
    )
    exon_starts = ann.where(F.col("type") == "exon").select(
        "seqname", F.col("start").cast("long").alias("e_start")
    )
    overlaps = range_join(exon_starts, genes, "e_start").where(
        F.col("seqname") == F.col("g_seq")
    )
    summary = scored.groupBy("type", "strand").agg(
        F.count("*").alias("n"),
        F.round(F.avg("gc"), 6).alias("avg_gc"),
        F.sum("sub_len").alias("total_bases"),
    )
    stats = {
        "sequences": ref.count(),
        "features": ann.count(),
        "gene_exon_overlaps": overlaps.count(),
        "translated": scored.where(F.col("aa").isNotNull()).count(),
    }
    return summary, stats


def main() -> None:
    from exon_duckdb_spark.session import get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session(app_name="genomics_pipeline_example")
    summary, stats = run_genomics(spark, sf_dir)
    stats["summary_rows"] = summary.count()
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
