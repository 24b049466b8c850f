"""The examples/crawl_ingest_pipeline.py composition must deliver the
incremental-crawl guarantees its stages promise individually: the corpus
banner is stripped from every survivor, every planted replay is caught
by the index probe, tomorrow's replay of a survivor is caught by the
APPENDED index (the incremental property), and re-running the day is
bit-deterministic."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
)

from pyspark.sql import functions as F

from crawl_ingest_pipeline import (
    BANDS,
    BANNER,
    NUM_HASHES,
    REPLAY_ID_BASE,
    SHINGLE,
    bootstrap_corpus_artifacts,
    demo_split,
    ingest_day,
)
from exon_duckdb_spark import operators as ops

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def run(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    corpus, batch = demo_split(docs)
    tmp = tempfile.mkdtemp(prefix="crawl_test_")
    idx = f"{tmp}/idx"
    bloom = bootstrap_corpus_artifacts(corpus, idx, seen_boilerplate=[BANNER])
    survivors, bloom2, funnel = ingest_day(spark, batch, idx, bloom)
    survivors = survivors.persist()
    survivors.count()
    yield {
        "docs": docs, "corpus": corpus, "batch": batch, "idx": idx,
        "bloom": bloom, "survivors": survivors, "funnel": funnel,
        "spark": spark,
    }
    survivors.unpersist()
    shutil.rmtree(tmp, ignore_errors=True)


def test_funnel_shape(run):
    f = run["funnel"]
    assert f["raw"] == run["batch"].count()
    # every batch page carries exactly one banner paragraph -> at least
    # one removal per page survives the intra-batch collapse accounting
    assert f["paras_removed"] >= f["exact"]
    assert f["raw"] >= f["exact"] >= f["boilerplate"] >= f["near_dup"] > 0


def test_banner_stripped_from_every_survivor(run):
    assert (
        run["survivors"].where(F.col("text").contains(BANNER)).count() == 0
    )


def test_every_planted_replay_is_caught(run):
    assert (
        run["survivors"].where(F.col("doc_id") >= REPLAY_ID_BASE).count() == 0
    )


def test_next_day_replay_of_survivor_hits_appended_index(run):
    """The incremental property: survivors' signatures were APPENDED to
    the index, so a next-day exact replay of any survivor (under a new
    id) must probe positive at est_jaccard 1.0."""
    tomorrow = run["survivors"].select(
        (F.col("doc_id") + 2 * REPLAY_ID_BASE).alias("doc_id"), "text"
    )
    hits = ops.lsh_index_probe(
        tomorrow, run["idx"],
        num_hashes=NUM_HASHES, bands=BANDS, shingle=SHINGLE, threshold=1.0,
    )
    caught = hits.select("id_new").distinct().count()
    assert caught == run["survivors"].count()


def test_rerun_is_deterministic(run):
    """Same batch, fresh artifacts -> identical survivor id set and
    identical funnel (every decision is a pure function of text+ids)."""
    tmp = tempfile.mkdtemp(prefix="crawl_rerun_")
    try:
        idx = f"{tmp}/idx"
        bloom = bootstrap_corpus_artifacts(
            run["corpus"], idx, seen_boilerplate=[BANNER]
        )
        surv2, _, funnel2 = ingest_day(run["spark"], run["batch"], idx, bloom)
        ids1 = {r["doc_id"] for r in run["survivors"].select("doc_id").collect()}
        ids2 = {r["doc_id"] for r in surv2.select("doc_id").collect()}
        assert ids1 == ids2
        assert funnel2 == run["funnel"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
