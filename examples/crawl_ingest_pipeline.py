"""Incremental daily-crawl ingest pipeline — the "100 GB of arrivals
against 100 TB of corpus" composition, built from the package's
incremental-dedup operators. The batch pipelines (see
examples/pretrain_pipeline.py) re-scan the whole corpus per run; a crawl
ingests a small batch every day, so every stage here touches the BATCH
plus constant-size or index-shaped corpus artifacts — never the corpus
itself.

Stages (each operator documented and verified on its own; this file only
composes them):

  1. exact dedup (intra-batch)  exact_dedup          one row per distinct text
  2. boilerplate vs corpus      bloom_paragraph_filter
                                 constant-size Bloom filter of every
                                 paragraph the corpus has ever emitted;
                                 intra_batch=True also collapses repeats
                                 WITHIN today's batch
  3. near-dup vs corpus         minhash_keyed → lsh_index_probe
                                 the batch's signatures probe the
                                 band-partitioned parquet index built
                                 from the accumulated corpus; the index
                                 never shuffles (broadcast probe join)
  4. ingest                     lsh_index_build(mode="append") + bloom_merge
                                 survivors' signatures append to the
                                 index — sliced from the SAME
                                 minhash_keyed frame stage 3 computed,
                                 so the signature UDF ran ONCE for the
                                 whole day — and their paragraphs fold
                                 into the filter

Scale shape: stage 1 shuffles (hash, id) pairs of the BATCH only; stage
2 broadcasts an m/64-row bit-word table (128 KB at m=2^16, 16 MB at a
production 2^30) and never shuffles the batch; stage 3 ships the batch's
band keys into the index's partition-pruned parquet scan; stage 4
appends batch-sized parquet and OR-merges two constant-size tables. The
corpus is read zero times after its index+filter exist — that is the
entire point of the incremental shape.

Idempotency invariant (pinned in tests/test_example_crawl.py): probing a
batch that was already ingested emits no self-pairs (the probe excludes
equal ids), and re-running the whole day is bit-deterministic — every
decision is a pure function of (text, ids).

Run:  python examples/crawl_ingest_pipeline.py [sf_dir]
(defaults to /root/testdata/sf0.001; prints the day's funnel as JSON).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from exon_duckdb_spark import operators as ops
from exon_duckdb_spark.operators import sketches as sk

NUM_HASHES = 16
BANDS = 4
SHINGLE = 3


def bootstrap_corpus_artifacts(
    corpus: DataFrame, index_path: str, seen_boilerplate: "list[str]" = ()
) -> DataFrame:
    """One-time (or nightly-rebuild) artifacts from the accumulated
    corpus: the persisted LSH band index on disk and the Bloom paragraph
    filter returned as a DataFrame. After this, daily ingest never reads
    the corpus again.

    The two artifacts deliberately cover DIFFERENT text: the index holds
    signatures of the KEPT, boilerplate-stripped documents (the corpus
    is itself the product of prior ingests, so its text is already
    clean — and the probe compares cleaned batch text against it); the
    filter holds every paragraph EVER SEEN, including boilerplate that
    was stripped before keeping (``seen_boilerplate`` seeds those from
    prior days — in steady state ``bloom_paragraph_filter`` folds them
    forward automatically)."""
    ops.lsh_index_build(
        corpus, index_path,
        num_hashes=NUM_HASHES, bands=BANDS, shingle=SHINGLE,
    )
    paras = corpus.select(F.explode(F.split("text", "\n")).alias("para"))
    words = sk.bloom_words(paras, "para")
    if seen_boilerplate:
        seen = corpus.sparkSession.createDataFrame(
            [(p,) for p in seen_boilerplate], "para string"
        )
        words = sk.bloom_merge(words, sk.bloom_words(seen, "para"))
    return words


def ingest_day(
    spark: SparkSession,
    batch: DataFrame,
    index_path: str,
    bloom: DataFrame,
    jaccard_threshold: float = 0.5,
) -> "tuple[DataFrame, DataFrame, dict[str, int]]":
    """Run one day's batch through the incremental pipeline.

    Returns (clean_batch, updated_bloom, funnel): the surviving documents
    (with boilerplate-stripped ``text``), the folded-forward Bloom filter,
    and per-stage keep counts. The surviving signatures are APPENDED to
    the on-disk index as a side effect, so tomorrow's probe sees today's
    survivors.

    Lifecycle: the cleaned batch and its signature frame stay persisted
    (the funnel counts, the probe, the index append and the RETURNED
    lazy survivors all read them — without the persists stages 1-2
    re-execute per action); call ``spark.catalog.clearCache()`` between
    days, the same convention as minhash_lsh_pairs.
    """
    funnel: dict[str, int] = {"raw": batch.count()}

    # 1. intra-batch exact dedup (min-id representative)
    kept_ids = ops.exact_dedup(batch).select(
        F.col("kept_doc_id").alias("doc_id")
    )
    exact = batch.join(kept_ids, "doc_id")
    funnel["exact"] = exact.count()

    # 2. corpus-boilerplate removal: Bloom-positive paragraphs drop;
    # intra_batch also collapses paragraphs repeated within today
    filtered, bloom_next = sk.bloom_paragraph_filter(
        exact, bloom, intra_batch=True
    )
    funnel["paras_removed"] = int(
        filtered.agg(F.sum("n_removed")).collect()[0][0] or 0
    )
    cleaned = filtered.where(F.col("clean_text") != "").select(
        "doc_id", F.col("clean_text").alias("text")
    ).persist()
    funnel["boilerplate"] = cleaned.count()

    # 3. near-dup vs the accumulated corpus: ONE signature pass for the
    # day (minhash_keyed), sliced for the probe now and the append later
    keyed = ops.minhash_keyed(
        cleaned, num_hashes=NUM_HASHES, shingle=SHINGLE, with_ws=False
    ).persist()
    hits = ops.lsh_index_probe(
        cleaned, index_path,
        num_hashes=NUM_HASHES, bands=BANDS, shingle=SHINGLE,
        threshold=jaccard_threshold, keyed=keyed,
    )
    dup_ids = hits.select(F.col("id_new").alias("doc_id")).distinct()
    survivors = cleaned.join(dup_ids, "doc_id", "left_anti")
    funnel["near_dup"] = survivors.count()

    # 4. ingest survivors: append their signatures (sliced from the SAME
    # keyed frame — the UDF does not run again) and fold their
    # paragraphs into the filter for tomorrow
    surv_ids = survivors.select("doc_id")
    ops.lsh_index_build(
        survivors, index_path,
        num_hashes=NUM_HASHES, bands=BANDS, shingle=SHINGLE,
        mode="append", keyed=keyed.join(surv_ids, "doc_id"),
    )
    return survivors, bloom_next, funnel


BANNER = "Subscribe to our newsletter | Cookie notice"
REPLAY_ID_BASE = 1_000_000


def demo_split(docs: DataFrame) -> "tuple[DataFrame, DataFrame]":
    """Deterministic (corpus, batch) planting over a (doc_id, text)
    frame: corpus = even ids with CLEAN text (the accumulated corpus is
    the product of prior ingests, so its boilerplate is long stripped);
    batch = odd non-%3 ids carrying the site BANNER paragraph
    (boilerplate work for stage 2 — the filter knows the banner from
    prior days) plus the %6==0 corpus slice replayed under shifted ids
    with one extra token and the banner (near-dup work for stage 3:
    after the banner strips, the probe sees orig+' replay' vs the
    indexed orig)."""
    banner = "\n" + BANNER
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    fresh = docs.where(
        (F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 3 != 0)
    ).select("doc_id", F.concat("text", F.lit(banner)).alias("text"))
    replayed = (
        docs.where((F.col("doc_id") % 2 == 0) & (F.col("doc_id") % 3 == 0))
        .select(
            (F.col("doc_id") + REPLAY_ID_BASE).alias("doc_id"),
            F.concat("text", F.lit(" replay"), F.lit(banner)).alias("text"),
        )
    )
    return corpus, fresh.unionByName(replayed)


def main() -> None:
    import shutil
    import tempfile

    from exon_duckdb_spark.session import get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session(app_name="crawl_ingest_example")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    corpus, batch = demo_split(docs)
    tmp = tempfile.mkdtemp(prefix="crawl_idx_")
    try:
        bloom = bootstrap_corpus_artifacts(
            corpus, f"{tmp}/idx", seen_boilerplate=[BANNER]
        )
        survivors, bloom2, funnel = ingest_day(
            spark, batch, f"{tmp}/idx", bloom
        )
        print(json.dumps(funnel))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
