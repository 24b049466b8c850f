"""Plan-hygiene regression tests: the scale guarantees (pushdown, pruning,
join strategy) asserted on the optimized plans so they can't silently rot."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_reaches_scan(spark):
    p = _plan(spark, entry.q01_pricing_summary(spark, SF))
    assert "LessThanOrEqual(l_shipdate" in p  # PushedFilters
    # column pruning: unused lineitem columns don't reach the scan
    assert "l_partkey" not in p.split("ReadSchema")[1][:400]


def test_star_join_broadcasts_dims(spark):
    p = _plan(spark, entry.q03_revenue_by_nation(spark, SF))
    assert p.count("BroadcastHashJoin") >= 3  # customer, nation, region
    assert "SortMergeJoin" not in p or p.count("SortMergeJoin") <= 1


def test_selective_filter_pushdown(spark):
    p = _plan(spark, entry.q06_revenue_filter_agg(spark, SF))
    assert "GreaterThanOrEqual(l_discount,0.03)" in p
    assert "LessThan(l_quantity,20.0)" in p


def test_embedding_scan_prunes_columns(spark):
    p = _plan(spark, entry.q27_cosine_topk(spark, SF))
    assert "label" not in p  # embeddings.label is never read


def test_lsh_candidates_are_equi_join(spark):
    """The LSH pair generation must be an equi join (hashable shuffle key),
    never a nested-loop cross product."""
    p = _plan(spark, entry.q22_minhash_lsh_pairs(spark, SF))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_asof_join_is_single_window_pass(spark):
    """asof_join must not expand into a range join: no join operator at all,
    one window over the union."""
    p = _plan(spark, entry.q18_asof_join(spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert p.count("Window") >= 1
