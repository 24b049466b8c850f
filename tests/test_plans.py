"""Plan-hygiene regression tests: the scale guarantees (pushdown, pruning,
join strategy) asserted on the optimized plans so they can't silently rot.
Uses the exon_duckdb_spark.plans inspection helpers."""

from __future__ import annotations

import __spark_entry__ as entry
from exon_duckdb_spark.plans import (
    assert_no_cartesian,
    explain_formatted,
    join_strategies,
    pushed_filters,
    read_schemas,
)

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_scan(spark):
    df = entry.q01_pricing_summary(spark, SF)
    assert any("LessThanOrEqual(l_shipdate" in f for f in pushed_filters(df))
    # column pruning: unused lineitem columns don't reach the scan
    assert all("l_partkey" not in s for s in read_schemas(df))


def test_star_join_broadcasts_dims(spark):
    s = join_strategies(entry.q03_revenue_by_nation(spark, SF))
    assert s["BroadcastHashJoin"] >= 3  # customer, nation, region
    assert s["CartesianProduct"] == 0


def test_selective_filter_pushdown(spark):
    fs = pushed_filters(entry.q06_revenue_filter_agg(spark, SF))
    assert "GreaterThanOrEqual(l_discount,0.03)" in fs
    assert "LessThan(l_quantity,20.0)" in fs


def test_embedding_scan_prunes_columns(spark):
    p = explain_formatted(entry.q27_cosine_topk(spark, SF))
    assert "label" not in p  # embeddings.label is never read


def test_lsh_candidates_are_equi_join(spark):
    """The LSH pair generation must be an equi join (hashable shuffle key),
    never a nested-loop cross product."""
    df = entry.q22_minhash_lsh_pairs(spark, SF)
    assert_no_cartesian(df)
    assert join_strategies(df)["BroadcastNestedLoopJoin"] == 0


def test_asof_join_is_single_window_pass(spark):
    """asof_join must not expand into a range join: no join operator at all,
    one window over the union."""
    df = entry.q18_asof_join(spark, SF)
    assert_no_cartesian(df)
    s = join_strategies(df)
    assert s["BroadcastNestedLoopJoin"] == 0
    assert explain_formatted(df).count("Window") >= 1
