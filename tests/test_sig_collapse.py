"""Pins the round-10 representation-free sig collapse (VERDICT r9 #1).

q20/q22/q106 emit one VARCHAR column `sig = kind ':' md5(rowstr)` built
with what must be the byte-identical formula on Spark and DuckDB —
`__spark_entry__._sig_collapse` / `_sig_collapse_sql`. The full oracle
compares exercise it on real data; this test drives the formula pair over
an ADVERSARIAL hand-built frame covering every edge the real branches can
produce — NULL keys, NULL measures, empty strings, unicode, negative and
large quantized doubles, values adjacent to the floor(x*scale+0.5)
boundary — so a future edit that breaks byte equality on a case the
corpus doesn't currently hit fails here first.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

ROWS = [
    # (kind, k1, k2, val)
    ("a", "k", "v", 0.0),
    ("a", "k", "v", None),
    ("a", None, "v", 1.0),
    ("a", "k", None, 1.0),
    ("a", None, None, None),
    ("b", "", "", 0.0625),            # 1/16 — exact micro multiple
    ("b", "café", "éclair", 1.0 / 3.0),
    ("b", "x|y", "z:w", 0.9999995),   # separator chars inside values
    ("c", "neg", "w", -3.2),          # negative weight (q106 shape)
    ("c", "big", "w", 60000.0),       # doc-id-as-double (q22 split shape)
    ("c", "half", "w", 0.0000005),    # x*1e6 == 0.5 exactly -> floor(1.0)=1
    ("c", "tiny", "w", 0.0000004999), # just below the boundary -> 0
]


@pytest.mark.parametrize("scale", [None, 1_000_000, 1_000_000_000])
def test_sig_collapse_spark_matches_duckdb(spark, scale):
    from pyspark.sql import types as T

    if scale is None:
        # integer-measure form (q20): reuse val as a BIGINT column
        rows = [
            (k, a, b, None if v is None else int(v))
            for (k, a, b, v) in ROWS
        ]
        schema = T.StructType(
            [
                T.StructField("kind", T.StringType()),
                T.StructField("k1", T.StringType()),
                T.StructField("k2", T.StringType()),
                T.StructField("n", T.LongType()),
            ]
        )
        num = "n"
        ddl = "kind VARCHAR, k1 VARCHAR, k2 VARCHAR, n BIGINT"
    else:
        rows = ROWS
        schema = T.StructType(
            [
                T.StructField("kind", T.StringType()),
                T.StructField("k1", T.StringType()),
                T.StructField("k2", T.StringType()),
                T.StructField("val", T.DoubleType()),
            ]
        )
        num = "val"
        ddl = "kind VARCHAR, k1 VARCHAR, k2 VARCHAR, val DOUBLE"

    sdf = spark.createDataFrame(rows, schema)
    got = sorted(
        r["sig"] for r in entrymod._sig_collapse(sdf, num, scale).collect()
    )

    con = duckdb.connect()
    placeholders = ", ".join(["(?, ?, ?, ?)"] * len(rows))
    flat = [x for r in rows for x in r]
    con.execute(f"CREATE TABLE t ({ddl})")
    con.execute(f"INSERT INTO t VALUES {placeholders}", flat)
    want = sorted(
        r[0]
        for r in con.sql(
            entrymod._sig_collapse_sql("SELECT * FROM t", num, scale)
        ).fetchall()
    )
    assert got == want


def test_sig_collapse_distinguishes_null_from_sentinel_text():
    """The chr(1) sentinel cannot collide with any REAL branch value:
    every kind/k1/k2 the gated queries emit is printable (ids, md5 hex,
    langs, split names), so NULL→sentinel folding stays injective on the
    actual domains. Pin the assumption on the current sf0.001 gate rows:
    no 4-column branch value contains a control character."""
    import re

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'/root/testdata/sf0.001/{t}.parquet'"
        )
    raw = entrymod.oracle_sql(_gate=False, _collapse=False)
    ctrl = re.compile(r"[\x00-\x08\x0b-\x1f]")
    for name in ("q20_dedup_suite", "q22_minhash_pipeline",
                 "q106_quality_classifier"):
        for kind, k1, k2 in con.sql(
            f"SELECT DISTINCT kind, k1, k2 FROM ({raw[name]})"
        ).fetchall():
            for v in (kind, k1, k2):
                assert v is None or not ctrl.search(v), (name, kind, k1, k2)
