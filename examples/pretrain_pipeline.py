"""End-to-end pretraining-corpus pipeline, composed from the package's
operators — the "switch your pipeline to this repo" demonstration.

Stages (each one an operator documented and oracle-verified on its own;
this file only composes them, adding no new semantics):

  1. normalize      normalize_text       NFC + lower + whitespace collapse
  2. quality gate   quality_filter       Gopher-style heuristics + keep flag
  3. exact dedup    exact_dedup          one representative per distinct text
  4. boilerplate    paragraph_dedup      cross-document repeated-line removal
  5. near dedup     minhash_lsh_pairs    MinHash bands → verified pairs
                    + near_dedup_keep_list (connected components, min-id rep)
  6. decontaminate  decontaminate        8-gram overlap vs an eval benchmark
  7. PII            pii_scrub            emails / IPv4 / phones → tags
  8. mix            temperature_mix      p^tau source flattening
  9. pack           pack_sequences       per-stream token offsets + pack ids

Scale shape (the reason the composition is safe at 100 TB): stages 1-2 and
7 are map-only; 3 shuffles (hash, id) pairs only; 4 shuffles (line-hash,
id); 5 shuffles band keys and verifies on shingle sets, never all-pairs;
6 broadcasts the benchmark's distinct gram hashes; 8 is a map-only
md5-bucket filter after one tiny group-count collect; 9 windows per
stream. Text crosses the wire exactly twice (4's surviving lines, 9's
token counts are computed before the window) — every other stage moves
hashes and ids.

Run:  python examples/pretrain_pipeline.py [sf_dir]
(defaults to /root/testdata/sf0.001; prints the stage funnel as JSON).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from exon_duckdb_spark import operators as ops


def build_pretrain_corpus(
    spark: SparkSession,
    sf_dir: str,
    benchmark: DataFrame | None = None,
    seq_len: int = 512,
    tau: float = 0.7,
    budget_frac: float = 0.8,
) -> "tuple[DataFrame, DataFrame, dict[str, int]]":
    """Returns (clean_docs, packed, funnel): the surviving documents with
    scrubbed text, their packed-sequence layout, and per-stage keep counts.

    ``benchmark`` is the eval-suite frame to decontaminate against (any
    (doc_id, text) frame); defaults to a held-out slice of the corpus so
    the example is self-contained.
    """
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    funnel: dict[str, int] = {"raw": docs.count()}

    # 1. normalize, keeping identity columns for the mix stage
    norm = ops.normalize_text(docs).join(
        docs.select("doc_id", "source", "lang"), "doc_id"
    ).withColumnRenamed("norm_text", "text")

    # 2. quality gate (metrics + keep flag; filter on the flag)
    gated = (
        ops.quality_filter(norm, extra_cols=["source", "lang"])
        .where(F.col("keep"))
        .select("doc_id", "source", "lang")
        .join(norm.select("doc_id", "text"), "doc_id")
    )
    funnel["quality"] = gated.count()

    # 3. exact dedup (keep the min-id representative per distinct text)
    kept_ids = ops.exact_dedup(gated).select(
        F.col("kept_doc_id").alias("doc_id")
    )
    exact = gated.join(kept_ids, "doc_id")
    funnel["exact_dedup"] = exact.count()

    # 4. cross-document boilerplate removal (docs whose every line is
    # boilerplate drop out; survivors carry dedup_text)
    para = ops.paragraph_dedup(exact).withColumnRenamed("dedup_text", "text")
    para = para.join(exact.select("doc_id", "source", "lang"), "doc_id")
    funnel["boilerplate"] = para.count()

    # 5. near-dup dedup: banded MinHash pairs → cluster keep-list
    pairs = ops.minhash_lsh_pairs(
        para, num_hashes=16, bands=4, threshold=0.8, shingle=3
    )
    near = ops.near_dedup_keep_list(para, pairs)
    funnel["near_dedup"] = near.count()

    # 6. benchmark decontamination (8-gram overlap, benchmark broadcast)
    if benchmark is None:
        benchmark = docs.where(F.col("doc_id") % 97 == 0).select(
            "doc_id", "text"
        )
    clean = ops.decontaminate(near, benchmark, n=8)
    funnel["decontaminated"] = clean.count()

    # 7. PII scrub (redacted text + per-type counts for monitoring)
    scrubbed = ops.pii_scrub(clean).join(
        clean.select("doc_id", "source", "lang"), "doc_id"
    ).withColumnRenamed("redacted_text", "text")

    # 8. temperature-flattened source mix (deterministic md5 buckets)
    mixed = ops.temperature_mix(
        scrubbed, group_col="source", tau=tau, budget_frac=budget_frac
    )
    funnel["mixed"] = mixed.count()

    # 9. training-sequence packing (per-source streams)
    packed = ops.pack_sequences(mixed, seq_len=seq_len)
    return mixed, packed, funnel


def main() -> None:
    from exon_duckdb_spark.session import get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session(app_name="pretrain_pipeline_example")
    clean, packed, funnel = build_pretrain_corpus(spark, sf_dir)
    funnel["packs"] = packed.agg(
        F.countDistinct("source", "pack_id")
    ).collect()[0][0]
    print(json.dumps(funnel))
    spark.stop()


if __name__ == "__main__":
    main()
