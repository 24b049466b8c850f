"""Cross-engine determinism tests for operators/numeric.py.

stable_avg / stable_round exist because two mechanisms produced real
1e-6 oracle divergences on q29's bitext branch at sf0.1 (round 6):
float AVG is partition-order sensitive at ~1 ULP (flips a 6-dp round on
boundary averages), and Spark's BigDecimal HALF_UP vs DuckDB's
FP-multiply round() disagree on tie-adjacent doubles. These tests pin
the regression values and the order/NULL/negative contracts.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from exon_duckdb_spark.operators.numeric import (
    stable_avg,
    stable_avg_sql,
    stable_round,
    stable_round_sql,
)


def _duck(sql: str):
    return duckdb.connect().execute(sql).fetchone()[0]


def test_stable_round_regression_boundary(spark):
    """The measured q29 divergence: 0.2538195 rounded to 0.253820 in
    Spark's round() and 0.253819 in DuckDB's. stable_round gives ONE
    answer in both engines."""
    v = 1015278 / 4000000.0  # == 0.2538195, the sf0.1 neighborhood avg
    got_spark = (
        spark.range(1)
        .select(stable_round(F.lit(v)).alias("r"))
        .collect()[0]["r"]
    )
    # cast: a bare DuckDB literal parses as DECIMAL, whose exact
    # arithmetic hides the double-precision behavior under test
    got_duck = _duck(f"SELECT {stable_round_sql(f'CAST({v!r} AS DOUBLE)')}")
    assert got_spark == got_duck
    # and the engines' native round() DO disagree on this double —
    # the reason stable_round exists; guard that the premise still holds
    native_spark = (
        spark.range(1).select(F.round(F.lit(v), 6).alias("r")).collect()[0]["r"]
    )
    native_duck = _duck(f"SELECT round(CAST({v!r} AS DOUBLE), 6)")
    assert native_spark != native_duck


@pytest.mark.parametrize(
    "v", [0.1234565, -0.2538195, 1.0000005, -1.9999995, 0.0, 42.0]
)
def test_stable_round_cross_engine(spark, v):
    got_spark = (
        spark.range(1).select(stable_round(F.lit(v)).alias("r")).collect()[0]["r"]
    )
    got_duck = _duck(f"SELECT {stable_round_sql(f'CAST({v!r} AS DOUBLE)')}")
    assert got_spark == got_duck


def test_stable_avg_order_independent(spark):
    """The integer-space mean is a pure function of the multiset: any
    row order / partitioning gives the identical double, where a float
    AVG may differ at 1 ULP."""
    vals = [0.299827, 0.193456, 0.253819, 0.268174]
    a = (
        spark.createDataFrame([(v,) for v in vals], ["x"])
        .repartition(4)
        .agg(stable_avg(F.col("x")).alias("m"))
        .collect()[0]["m"]
    )
    b = (
        spark.createDataFrame([(v,) for v in reversed(vals)], ["x"])
        .coalesce(1)
        .agg(stable_avg(F.col("x")).alias("m"))
        .collect()[0]["m"]
    )
    assert a == b
    lst = ", ".join(f"({v!r})" for v in vals)
    d = _duck(
        f"SELECT {stable_avg_sql('x')} FROM (VALUES {lst}) t(x)"
    )
    assert a == d


def test_stable_avg_large_magnitude_no_wrap(spark):
    """The ADVICE-r8 seam: the round-8 two-long form wrapped sum(hi) at
    ~67M max-magnitude rows per group. The three-lane form must match
    DuckDB's exact HUGEINT twin at the quantization contract's magnitude
    ceiling (|x| ~ 9e9 at 6 digits, q near 2^53 — all three lanes
    active, a-lane signed), over enough rows that a lane-width mistake
    would show."""
    import random

    rng = random.Random(17)
    vals = [rng.uniform(-9e9, 9e9) for _ in range(5000)]
    got = (
        spark.createDataFrame([(v,) for v in vals], ["x"])
        .repartition(8)
        .agg(stable_avg(F.col("x")).alias("m"))
        .collect()[0]["m"]
    )
    # literals MUST round-trip through a VARCHAR cast (strtod — correctly
    # rounded): DuckDB types a bare 17-digit literal DECIMAL(17,7), and
    # both decimal-space quantization AND the DECIMAL→DOUBLE conversion
    # land 1 ulp off the written value on ~6% of inputs (found by this
    # very test — 298/5000 literals round-tripped differently). Real
    # oracle inputs come from parquet doubles, so only literal-built
    # fixtures need this
    lst = ", ".join(f"(CAST('{v!r}' AS DOUBLE))" for v in vals)
    d = _duck(f"SELECT {stable_avg_sql('x')} FROM (VALUES {lst}) t(x)")
    assert got == d


def test_stable_avg_skips_nulls_and_handles_negatives(spark):
    df = spark.createDataFrame(
        [(0.5,), (None,), (-0.25,)], ["x"]
    )
    got = df.agg(stable_avg(F.col("x")).alias("m")).collect()[0]["m"]
    assert got == pytest.approx((0.5 - 0.25) / 2, abs=1e-9)
    d = _duck(
        f"SELECT {stable_avg_sql('x')} FROM "
        "(VALUES (0.5::DOUBLE), (NULL::DOUBLE), (-0.25::DOUBLE)) t(x)"
    )
    assert got == d
