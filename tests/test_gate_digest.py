"""Pins the q20/q22 digest-gated oracles (VERDICT r8, next-round #1).

The gate must be invisible when the evaluating engine agrees with the
builder's digests (rows emitted unchanged), must raise a diagnostic
``error()`` naming the engine version and the actual per-branch digests
on any value divergence, and must pass through ungated at an unknown
scale factor. The error() laziness contract (no constant-folding of the
ELSE arm) is exactly what the corruption test exercises: the same SQL
shape returns rows when digests match and raises only when they don't.
"""

from __future__ import annotations

import copy

import duckdb
import pytest

import __spark_entry__ as entrymod
from exon_duckdb_spark.operators import gate_digests

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
# round 10 extends the gate to the four queries rotated into the driver
# window (q103–q106) — their oracles had never been evaluated by the
# driver's DuckDB, so a first-round divergence needs the same named
# diagnostics q20/q22 earned in round 9
GATED = [
    "q20_dedup_suite",
    "q22_minhash_pipeline",
    "q103_bloom_crawl",
    "q104_media_dedup",
    "q105_bpe_pipeline",
    "q106_quality_classifier",
]


def _connect(sf_dir: str = SF_DIR) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_every_sig_collapsed_query_is_digest_gated():
    """ADVICE r10: collapsing a query's output to one md5 ``sig`` column
    makes a value regression opaque to the driver's comparator (just a
    hash mismatch) — the named per-branch diagnostics live entirely in
    the digest gate. So a collapsed query may never ship ungated: every
    _SIG_COLLAPSE entry must have GATE_EXPECTED constants (and be in the
    GATED list this suite exercises)."""
    collapsed = set(entrymod._SIG_COLLAPSE)
    assert collapsed <= set(gate_digests.GATE_EXPECTED), (
        "sig-collapsed query without digest-gate constants: "
        f"{sorted(collapsed - set(gate_digests.GATE_EXPECTED))}"
    )
    assert collapsed <= set(GATED)


def test_gate_expected_covers_all_sfs():
    # every gated query carries constants for all three driver SFs,
    # keyed by the events-table cardinality
    for name in GATED:
        assert set(gate_digests.GATE_EXPECTED[name]) == {1000, 10000, 100000}
        for branches in gate_digests.GATE_EXPECTED[name].values():
            assert branches, "empty branch list would disable the gate"


def test_gate_happy_path_emits_rows_unchanged():
    con = _connect()
    gated = entrymod.oracle_sql()
    raw = entrymod.oracle_sql(_gate=False)
    for name in GATED:
        assert "__ok" in gated[name] and "__ok" not in raw[name]
        g = con.sql(gated[name]).fetchall()
        r = con.sql(raw[name]).fetchall()
        assert sorted(map(str, g)) == sorted(map(str, r)), name


def test_gate_corruption_raises_versioned_diagnostic(monkeypatch):
    bad = copy.deepcopy(gate_digests.GATE_EXPECTED)
    # corrupt ONE branch digest at the sf0.001 key only
    kind, _h, c = bad["q20_dedup_suite"][1000][0]
    bad["q20_dedup_suite"][1000][0] = (kind, 1, c)
    monkeypatch.setattr(gate_digests, "GATE_EXPECTED", bad)
    con = _connect()
    with pytest.raises(Exception) as ei:
        con.sql(entrymod.oracle_sql()["q20_dedup_suite"]).fetchall()
    msg = str(ei.value)
    # the err payload the driver would surface: label, engine version,
    # SF discriminator, and every actual per-branch digest
    assert "DIAG-q20" in msg
    assert "v1." in msg or "v0." in msg
    assert "nd=1000" in msg
    for k, _h, _c in gate_digests.GATE_EXPECTED["q20_dedup_suite"][1000]:
        assert f"{k}:" in msg


def test_gate_unknown_sf_passes_through():
    con = _connect()
    con.execute("DROP VIEW events")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet' "
        "LIMIT 7"
    )
    # nd=7 matches no embedded constant set -> gate inactive, no error
    rows = con.sql(entrymod.oracle_sql()["q20_dedup_suite"]).fetchall()
    assert rows


@pytest.mark.parametrize(
    "sf_dir, nd",
    [
        ("/root/testdata/sf0.001", 1000),
        ("/root/testdata/sf0.01", 10000),
        pytest.param("/root/testdata/sf0.1", 100000, marks=pytest.mark.slow),
    ],
)
def test_gate_constants_fresh_at_every_sf(sf_dir, nd):
    """Recompute the per-branch digests from the UNGATED oracle texts on
    the local DuckDB and compare against the embedded constants — the
    guard against editing a q20/q22 oracle body and forgetting
    ``python tools/gen_gate_digests.py`` (a stale constant would make
    the gate error() on the DRIVER's next run even though both engines
    agree). The sf0.001 happy-path test alone can't catch constants that
    go stale only at larger SFs."""
    from exon_duckdb_spark.operators.hashing import md5_int_sql

    raw = entrymod.oracle_sql(_gate=False, _collapse=False)
    con = _connect(sf_dir)
    for name, rowstr in entrymod._GATE_ROWSTR.items():
        got = con.sql(
            f"WITH __b AS ({raw[name]}) "
            f"SELECT kind, CAST(SUM({md5_int_sql(rowstr)}) % 1000000007 "
            f"AS BIGINT), COUNT(*) FROM __b GROUP BY kind ORDER BY kind"
        ).fetchall()
        want = sorted(gate_digests.GATE_EXPECTED[name][nd])
        assert [(k, int(h), int(c)) for k, h, c in got] == want, (
            f"{name} digests stale at {sf_dir} — rerun "
            "tools/gen_gate_digests.py"
        )


def test_gate_vocabulary_subset_insurance():
    # the one construct r8's token diff left unique to the failing pair
    # (list indexing l[pos]) must stay gone from the gated texts
    for name in GATED:
        assert "l[pos]" not in entrymod.oracle_sql()[name]
