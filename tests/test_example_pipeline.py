"""The examples/pretrain_pipeline.py composition must actually deliver the
pipeline guarantees its stages promise individually: a monotone keep
funnel, no surviving exact duplicates, zero benchmark n-gram overlap
after decontamination, prefix-sum packing offsets, and bit-deterministic
re-runs (every sampling/dedup decision is an md5 function of ids)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
)

from pyspark.sql import functions as F

from pretrain_pipeline import build_pretrain_corpus

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def built(spark):
    clean, packed, funnel = build_pretrain_corpus(spark, SF_DIR, seq_len=64)
    clean = clean.persist()
    packed = packed.persist()
    yield clean, packed, funnel
    clean.unpersist()
    packed.unpersist()


def test_funnel_is_monotone(built):
    _, _, funnel = built
    order = ["raw", "quality", "exact_dedup", "boilerplate",
             "near_dedup", "decontaminated", "mixed"]
    vals = [funnel[k] for k in order]
    assert vals == sorted(vals, reverse=True)
    assert funnel["mixed"] > 0


def test_no_exact_duplicates_survive(built):
    """Exact dedup runs BEFORE the PII scrub, so distinctness is only
    guaranteed for surviving docs the scrub left untouched — two distinct
    texts may legitimately collide after both redact to the same tagged
    form. The fixture currently contains no PII, but the assertion must
    not depend on that."""
    clean, _, _ = built
    unscrubbed = clean.where(
        (F.col("n_email") + F.col("n_ipv4") + F.col("n_phone")) == 0
    )
    n = unscrubbed.count()
    assert n > 0
    assert unscrubbed.select("text").distinct().count() == n


def test_decontamination_really_removed_benchmark_overlap(built, spark):
    clean, _, _ = built
    from exon_duckdb_spark.operators.dedup import decontaminate

    bench = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")) \
        .where(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    # re-applying the filter must be a fixed point: nothing left to drop.
    # (clean's text is PII-redacted AFTER the decontamination stage, so
    # re-check against the same pre-scrub survivors by id membership.)
    again = decontaminate(clean, bench, n=8)
    assert again.count() == clean.count()


def test_packing_offsets_are_prefix_sums(built):
    _, packed, _ = built
    rows = packed.orderBy("source", "doc_id").collect()
    by_stream: dict[str, int] = {}
    for r in rows:
        expect = by_stream.get(r["source"], 0)
        assert r["tok_offset"] == expect, (r["source"], r["doc_id"])
        assert r["pack_id"] == expect // 64
        by_stream[r["source"]] = expect + r["n_tokens"]


def test_rerun_is_deterministic(built, spark):
    clean, _, funnel = built
    clean2, _, funnel2 = build_pretrain_corpus(spark, SF_DIR, seq_len=64)
    assert funnel == funnel2
    ids1 = {r["doc_id"] for r in clean.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in clean2.select("doc_id").collect()}
    assert ids1 == ids2
