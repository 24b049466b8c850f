"""Parity + correctness tests for the KMV / HLL sketch operators.

Covers the ADVICE r5 findings: merged-sketch Jaccard denominator
(under-filled sketches), NULL inputs crashing the DuckDB oracle
builders, and the p-dependent harmonic term shift (overflow at p >= 7
with the old fixed 2^57 scale). Every estimate is compared Spark vs
DuckDB bit-for-bit after the shared 4 dp rounding.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from exon_duckdb_spark.operators.sketches import (
    hll_estimate,
    hll_estimate_sql,
    hll_grouped,
    hll_grouped_sql,
    hll_registers,
    kmv_estimate,
    kmv_estimate_sql,
    kmv_merge_estimate,
    kmv_merge_estimate_sql,
    kmv_sketch,
    kmv_sketch_sql,
)


def _ids_df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x string")


def _duck_one(sql):
    return duckdb.sql(sql).fetchall()


@pytest.fixture(scope="module")
def duck_vals(tmp_path_factory):
    """DuckDB source builder: writes the given values to a parquet file and
    returns its FROM-able path, so oracle SQL runs over the same rows."""
    base = tmp_path_factory.mktemp("sketch_src")
    import pyarrow as pa
    import pyarrow.parquet as pq

    counter = [0]

    def make(vals, col="x"):
        counter[0] += 1
        path = base / f"src_{counter[0]}.parquet"
        pq.write_table(pa.table({col: vals}), path)
        return f"'{path}'"

    return make


# ---------------------------------------------------------------- KMV


def test_kmv_small_set_is_exact(spark):
    df = _ids_df(spark, [f"v{i}" for i in range(10)])
    est = kmv_estimate(kmv_sketch(df, "x", k=64), k=64).collect()[0]["est"]
    assert est == 10.0


def test_kmv_large_set_estimates(spark):
    n = 5000
    df = _ids_df(spark, [f"v{i}" for i in range(n)])
    est = kmv_estimate(kmv_sketch(df, "x", k=64), k=64).collect()[0]["est"]
    # KMV with k=64: relative std err ~ 1/sqrt(k-2) ≈ 13%; allow 4 sigma
    assert abs(est - n) / n < 0.5


def test_kmv_nulls_dropped(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("b",), (None,)], "x string"
    )
    est = kmv_estimate(kmv_sketch(df, "x", k=64), k=64).collect()[0]["est"]
    assert est == 2.0


def test_kmv_merge_identical_sets_jaccard_one(spark):
    # ADVICE r5: two identical 5-element sets must give jaccard_est 1.0,
    # not 5/k — the denominator is the MERGED sketch size.
    df = _ids_df(spark, ["a", "b", "c", "d", "e"])
    sk = kmv_sketch(df, "x", k=64)
    row = kmv_merge_estimate(sk, sk, k=64).collect()[0]
    assert row["jaccard_est"] == 1.0
    assert row["union_est"] == 5.0
    assert row["intersection_est"] == 5.0


def test_kmv_merge_disjoint_sets(spark):
    a = kmv_sketch(_ids_df(spark, [f"a{i}" for i in range(8)]), "x", k=64)
    b = kmv_sketch(_ids_df(spark, [f"b{i}" for i in range(8)]), "x", k=64)
    row = kmv_merge_estimate(a, b, k=64).collect()[0]
    assert row["jaccard_est"] == 0.0
    assert row["union_est"] == 16.0
    assert row["intersection_est"] == 0.0


def test_kmv_merge_overlapping_large(spark):
    # 3000 shared + 1000 each side → true jaccard 3000/5000 = 0.6
    a = _ids_df(spark, [f"s{i}" for i in range(3000)] + [f"a{i}" for i in range(1000)])
    b = _ids_df(spark, [f"s{i}" for i in range(3000)] + [f"b{i}" for i in range(1000)])
    row = kmv_merge_estimate(
        kmv_sketch(a, "x", k=64), kmv_sketch(b, "x", k=64), k=64
    ).collect()[0]
    assert 0.3 < row["jaccard_est"] < 0.9
    assert 2500 < row["union_est"] < 10000


# ---------------------------------------------------------------- HLL


def test_hll_small_range_linear_counting(spark):
    df = _ids_df(spark, [f"v{i}" for i in range(20)])
    est = hll_estimate(hll_registers(df, "x", p=6), p=6).collect()[0]["est"]
    assert abs(est - 20) <= 6


def test_hll_large_set(spark):
    n = 20000
    df = _ids_df(spark, [f"v{i}" for i in range(n)])
    est = hll_estimate(hll_registers(df, "x", p=6), p=6).collect()[0]["est"]
    # HLL std err ≈ 1.04/sqrt(64) ≈ 13%; allow 4 sigma
    assert abs(est - n) / n < 0.52


def test_hll_p_out_of_range_raises(spark):
    df = _ids_df(spark, ["a"])
    with pytest.raises(ValueError, match="out of range"):
        hll_registers(df, "x", p=3)
    with pytest.raises(ValueError, match="out of range"):
        hll_estimate(hll_registers(df, "x", p=6), p=17)


def test_hll_high_p_no_overflow(spark):
    # p=12 overflowed the old fixed 2^57 term scale (ADVICE r5): Spark's
    # non-ANSI sum wrapped while DuckDB promoted to HUGEINT. The
    # p-dependent shift keeps the sum ≤ 2^61 — estimate must be sane and
    # POSITIVE.
    n = 1000
    df = _ids_df(spark, [f"v{i}" for i in range(n)])
    est = hll_estimate(hll_registers(df, "x", p=12), p=12).collect()[0]["est"]
    assert est > 0
    assert abs(est - n) / n < 0.1  # p=12 → ~1.6% std err


# ------------------------------------------------------- oracle parity


@pytest.mark.parametrize("n", [5, 300])
def test_kmv_estimate_oracle_parity(spark, duck_vals, n):
    vals = [f"v{i}" for i in range(n)]
    src = duck_vals(vals)
    sdf = _ids_df(spark, vals)
    s_est = kmv_estimate(kmv_sketch(sdf, "x", k=64), k=64).collect()[0]["est"]
    o_est = _duck_one(kmv_estimate_sql(kmv_sketch_sql(src, "x", k=64), k=64))[0][0]
    assert s_est == o_est


def test_kmv_estimate_oracle_parity_with_nulls(spark, duck_vals):
    # ADVICE r5: a NULL in the hashed column crashed the oracle SQL
    # (CAST('0x' AS BIGINT)) while Spark silently filtered — the replay
    # contract must hold on ordinary nullable data.
    vals = ["a", None, "b", None, "c"]
    src = duck_vals(vals)
    sdf = spark.createDataFrame([(v,) for v in vals], "x string")
    s_est = kmv_estimate(kmv_sketch(sdf, "x", k=64), k=64).collect()[0]["est"]
    o_est = _duck_one(kmv_estimate_sql(kmv_sketch_sql(src, "x", k=64), k=64))[0][0]
    assert s_est == o_est == 3.0


def test_kmv_merge_oracle_parity(spark, duck_vals):
    a_vals = [f"s{i}" for i in range(200)] + [f"a{i}" for i in range(100)]
    b_vals = [f"s{i}" for i in range(200)] + [f"b{i}" for i in range(100)]
    sa, sb = duck_vals(a_vals), duck_vals(b_vals)
    srow = kmv_merge_estimate(
        kmv_sketch(_ids_df(spark, a_vals), "x", k=64),
        kmv_sketch(_ids_df(spark, b_vals), "x", k=64),
        k=64,
    ).collect()[0]
    orow = _duck_one(
        kmv_merge_estimate_sql(
            kmv_sketch_sql(sa, "x", k=64), kmv_sketch_sql(sb, "x", k=64), k=64
        )
    )[0]
    assert (srow["union_est"], srow["jaccard_est"], srow["intersection_est"]) == orow


@pytest.mark.parametrize("p,n", [(6, 40), (6, 5000), (12, 2000)])
def test_hll_estimate_oracle_parity(spark, duck_vals, p, n):
    vals = [f"v{i}" for i in range(n)]
    src = duck_vals(vals)
    s_est = hll_estimate(
        hll_registers(_ids_df(spark, vals), "x", p=p), p=p
    ).collect()[0]["est"]
    o_est = _duck_one(hll_estimate_sql(src, "x", p=p))[0][0]
    assert s_est == o_est


def test_hll_estimate_oracle_parity_with_nulls(spark, duck_vals):
    vals = [f"v{i}" for i in range(50)] + [None] * 7
    src = duck_vals(vals)
    sdf = spark.createDataFrame([(v,) for v in vals], "x string")
    s_est = hll_estimate(hll_registers(sdf, "x", p=6), p=6).collect()[0]["est"]
    o_est = _duck_one(hll_estimate_sql(src, "x", p=6))[0][0]
    assert s_est == o_est


def test_hll_grouped_oracle_parity(spark, duck_vals):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [(f"g{i % 3}", f"v{i % 500}") for i in range(2000)] + [("g0", None)]
    sdf = spark.createDataFrame(rows, "g string, x string")
    # grouped source needs two columns — write directly
    src = duck_vals([r[1] for r in rows])  # path allocation only
    path = src.strip("'").replace(
        path_tail := src.strip("'").split("/")[-1], "grouped_" + path_tail
    )
    pq.write_table(
        pa.table(
            {"g": [r[0] for r in rows], "x": [r[1] for r in rows]}
        ),
        path,
    )
    s_rows = sorted(
        (r["g"], r["est"])
        for r in hll_grouped(sdf, "g", "x", p=6).collect()
    )
    o_rows = sorted(_duck_one(hll_grouped_sql(f"'{path}'", "g", "x", p=6)))
    assert s_rows == o_rows


# --------------------------------------------------------------------------
# Count-Min sketch
# --------------------------------------------------------------------------

from exon_duckdb_spark.operators.sketches import (  # noqa: E402
    cms_query,
    cms_query_sql,
    cms_table,
    cms_table_sql,
)


def test_cms_exact_when_sparse(spark):
    """With few distinct keys and w=64, collisions are unlikely per row
    and min-over-d makes the estimate exact here; always >= true count."""
    vals = ["a"] * 100 + ["b"] * 10 + ["c"] * 1
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    cms = cms_table(df, "x")
    keys = spark.createDataFrame([("a",), ("b",), ("c",)], ["x"])
    got = {r["x"]: r["est"] for r in cms_query(cms, keys, "x").collect()}
    assert got == {"a": 100, "b": 10, "c": 1}


def test_cms_overestimates_only_and_skips_nulls(spark):
    vals = [f"k{i % 200}" for i in range(2000)]  # forced collisions (w=64)
    true = {}
    for v in vals:
        true[v] = true.get(v, 0) + 1
    df = spark.createDataFrame([(v,) for v in vals] + [(None,)], ["x"])
    cms = cms_table(df, "x")
    keys = spark.createDataFrame([(k,) for k in true] + [(None,)], ["x"])
    got = {r["x"]: r["est"] for r in cms_query(cms, keys, "x").collect()}
    assert None not in got
    assert all(got[k] >= c for k, c in true.items())
    # total counter mass per row r equals the non-null input size
    per_r = {
        r["r"]: r["s"]
        for r in cms.groupBy("r").agg(F.sum("cnt").alias("s")).collect()
    }
    assert all(v == 2000 for v in per_r.values())


def test_cms_oracle_parity(spark, duck_vals):
    vals = [f"k{i % 37}" for i in range(500)] + [None, None]
    df = spark.createDataFrame([(v,) for v in vals], "x string")
    src = duck_vals(vals)
    s_rows = sorted(
        (r["x"], r["est"])
        for r in cms_query(
            cms_table(df, "x"), df.select("x").distinct(), "x"
        ).collect()
    )
    o_sql = cms_query_sql(
        cms_table_sql(src, "x"), f"(SELECT DISTINCT x FROM {src})", "x"
    )
    o_rows = sorted(_duck_one(o_sql))
    assert s_rows == o_rows


class TestBloom:
    """Bloom filter (round 8 — the Dolma-style membership pre-screen):
    no false negatives ever, false positives bounded and verified away
    by the exact re-check in bloom_decontaminate."""

    def test_no_false_negatives_bounded_fp(self, spark):
        from exon_duckdb_spark.operators import sketches as sk

        keys = spark.createDataFrame([(f"key{i}",) for i in range(500)], ["g"])
        words = sk.bloom_words(keys, "g")
        probe = spark.createDataFrame(
            [(f"key{i}",) for i in range(400, 700)], ["g"]
        )
        got = {
            r["g"]: r["might"]
            for r in sk.bloom_might_contain(probe, words, "g").collect()
        }
        assert all(got[f"key{i}"] for i in range(400, 500))  # never miss
        fp = sum(1 for i in range(500, 700) if got[f"key{i}"])
        # m=2^16, k=4, n=500 → theoretical fp ~ (1-e^{-kn/m})^4 ≈ 8e-7;
        # allow generous slack for the small sample
        assert fp <= 2, f"{fp} false positives in 200 absent probes"
        # the filter table stays broadcast-sized
        assert words.count() <= sk.BLOOM_M // 64

    def test_decontaminate_equals_exact(self, spark):
        from exon_duckdb_spark.operators import sketches as sk
        from exon_duckdb_spark.operators.dedup import decontaminate

        corpus = spark.createDataFrame(
            [(i, " ".join(f"w{(i * 7 + j) % 50}" for j in range(12)))
             for i in range(40)],
            ["doc_id", "text"],
        )
        bench = spark.createDataFrame(
            [(100 + i, " ".join(f"w{(i * 7 + j) % 50}" for j in range(12)))
             for i in (3, 9)],
            ["doc_id", "text"],
        )
        exact = sorted(r["doc_id"] for r in decontaminate(corpus, bench).collect())
        bloom = sorted(
            r["doc_id"] for r in sk.bloom_decontaminate(corpus, bench).collect()
        )
        assert exact == bloom and 0 < len(exact) < 40

    def test_sql_twin_matches_spark(self, spark):
        import duckdb

        from exon_duckdb_spark.operators import sketches as sk

        rows = [(i,) for i in range(60)]
        bench = spark.createDataFrame(rows[:40], ["g"])
        probe = spark.createDataFrame(rows[20:], ["g"])
        words = sk.bloom_words(bench, "g")
        got = {
            int(r["g"]): int(r["might"])
            for r in sk.bloom_might_contain(probe, words, "g").collect()
        }
        fill = words.selectExpr("sum(bit_count(word)) AS s").collect()[0]["s"]
        con = duckdb.connect()
        con.execute("CREATE TABLE bench AS SELECT UNNEST(range(40)) AS g")
        con.execute("CREATE TABLE probe AS SELECT UNNEST(range(20, 60)) AS g")
        sql = sk.bloom_membership_sql("bench", "g", "probe", "g")
        want = {int(k): int(m) for k, m in con.execute(sql).fetchall()}
        assert got == want
        want_fill = con.execute(sk.bloom_fill_sql("bench", "g")).fetchone()[0]
        assert int(fill) == int(want_fill)


def test_bloom_paragraph_filter_incremental(spark):
    """Daily-crawl shape: day-1 paragraphs fold into the filter; day-2
    re-deliveries of them are deleted while fresh paragraphs survive; the
    returned filter then catches day-2's own paragraphs on day 3."""
    from exon_duckdb_spark.operators import sketches as sk

    empty = spark.createDataFrame([], "word_idx long, word long")
    day1 = spark.createDataFrame(
        [(1, "alpha one\ncommon banner"), (2, "beta two\ncommon banner")],
        ["doc_id", "text"],
    )
    out1, f1 = sk.bloom_paragraph_filter(day1, empty)
    got1 = {r["doc_id"]: (r["clean_text"], r["n_removed"]) for r in out1.collect()}
    # empty prior filter → nothing removed on day 1 (intra-batch dups
    # are NOT collapsed — documented)
    assert got1 == {
        1: ("alpha one\ncommon banner", 0),
        2: ("beta two\ncommon banner", 0),
    }
    day2 = spark.createDataFrame(
        [(3, "gamma three\ncommon banner\nalpha one"), (4, "delta four")],
        ["doc_id", "text"],
    )
    out2, f2 = sk.bloom_paragraph_filter(day2, f1)
    got2 = {r["doc_id"]: (r["clean_text"], r["n_removed"]) for r in out2.collect()}
    assert got2[3] == ("gamma three", 2)  # banner + replayed line die
    assert got2[4] == ("delta four", 0)
    day3 = spark.createDataFrame([(5, "gamma three\nepsilon five")], ["doc_id", "text"])
    out3, _ = sk.bloom_paragraph_filter(day3, f2)
    got3 = out3.collect()[0]
    assert (got3["clean_text"], got3["n_removed"]) == ("epsilon five", 1)
    # the merged filter is still one word table (no growth in rows)
    assert f2.count() <= sk.BLOOM_M // 64


def test_bloom_paragraph_filter_intra_batch(spark):
    """intra_batch=True additionally collapses SAME-DAY duplicates to
    their first (doc id, position) occurrence — the one-line composition
    VERDICT r8 #6 asked for; default mode defers them to tomorrow."""
    from exon_duckdb_spark.operators import sketches as sk

    empty = spark.createDataFrame([], "word_idx long, word long")
    day = spark.createDataFrame(
        [(1, "alpha one\ncommon banner"), (2, "common banner\nbeta two")],
        ["doc_id", "text"],
    )
    out, f = sk.bloom_paragraph_filter(day, empty, intra_batch=True)
    got = {r["doc_id"]: (r["clean_text"], r["n_removed"]) for r in out.collect()}
    # doc 1 holds the first occurrence (doc_id order); doc 2 loses its copy
    assert got == {
        1: ("alpha one\ncommon banner", 0),
        2: ("beta two", 1),
    }
    # the returned filter still catches BOTH days' content tomorrow
    day2 = spark.createDataFrame([(9, "common banner\nfresh")], ["doc_id", "text"])
    out2, _ = sk.bloom_paragraph_filter(day2, f)
    assert out2.collect()[0]["clean_text"] == "fresh"
