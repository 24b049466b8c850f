"""Determinism harness (judge r5 ask #1).

The round-5 driver gate flagged q20/q22 with hash_match=false while four
same-environment re-runs were green — an environment-sensitive divergence
no single run can catch. These tests pin the two failure classes the
verdict named:

1. repeat-run stability: the composed gate queries must produce
   IDENTICAL normalized rows when evaluated twice in one session (fresh
   function call each time — streaming drains, checkpoints, caches and
   all). Cross-session and cross-config stability is covered by
   tools/determinism_probe.py (subprocess per Spark-config variant; run
   manually or from CI).

2. drain-split robustness: the streaming operators' batch-oracle
   contracts must hold when the finite input arrives as N interleaved
   part-files forcing multi-micro-batch drains (maxFilesPerTrigger=1) —
   the exact scenario the single-batch determinism contracts in
   streaming/events.py assume away on single-file inputs.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _norm_rows(df):
    from tools.check_oracle import norm_rows

    return norm_rows(df.columns, [tuple(r) for r in df.collect()])


@pytest.mark.parametrize(
    "qname",
    [
        "q20_dedup_suite",
        "q22_minhash_pipeline",
        "q09_distinct_union",
        "q106_quality_classifier",
    ],
)
def test_gate_queries_repeat_run_stable(spark, qname):
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[qname]
    first = _norm_rows(fn(spark, SF_DIR))
    second = _norm_rows(fn(spark, SF_DIR))
    assert first == second


def _write_interleaved(src_rows, schema, out_dir, prefix, n_files):
    """Round-robin rows across n_files part files — ids/timestamps
    interleave across files, so a maxFilesPerTrigger=1 drain sees
    out-of-order arrivals spanning every micro-batch."""
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n_files):
        part = src_rows[i::n_files]
        pq.write_table(
            pa.Table.from_pylist(part, schema=schema),
            os.path.join(out_dir, f"{prefix}_{i}.parquet"),
        )


def test_stream_dedup_multibatch_drain_matches_batch_distinct(spark, tmp_path):
    """events split into 4 interleaved part-files, drained one file per
    micro-batch: the projected DISTINCT key set must equal the batch
    DISTINCT — the q59/q20 oracle contract under a split drain."""
    from exon_duckdb_spark.streaming.events import (
        read_events_stream,
        run_to_memory_sink,
        stream_dedup,
    )

    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    rows = [r.asDict() for r in batch.collect()]
    tbl = pa.Table.from_pylist(rows)
    out_dir = str(tmp_path / "events_split")
    _write_interleaved(rows, tbl.schema, out_dir, "events", 4)

    stream = read_events_stream(spark, out_dir, max_files=1)
    name = f"det_dedup_{uuid.uuid4().hex[:8]}"
    out = run_to_memory_sink(
        stream_dedup(stream, ["user_id", "event_type"], watermark="240 hours"),
        name,
    )
    streamed = {
        (r["user_id"], r["event_type"])
        for r in out.select("user_id", "event_type").collect()
    }
    expected = {
        (r["user_id"], r["event_type"])
        for r in batch.select("user_id", "event_type").distinct().collect()
    }
    assert streamed == expected


def test_stream_minhash_pairs_multibatch_drain_matches_single_batch(
    spark, tmp_path
):
    """documents split into 3 interleaved part-files, drained one file per
    micro-batch: the emitted pair SET (and every est_jaccard value) must
    equal the single-batch drain's — the events.py determinism contract
    ('across many micro-batches the pair SET is the same'), now actually
    exercised instead of assumed."""
    from exon_duckdb_spark.streaming.events import (
        read_documents_stream,
        run_to_memory_sink,
        stream_minhash_pairs,
    )

    batch = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = [r.asDict() for r in batch.collect()]
    tbl = pa.Table.from_pylist(rows)
    out_dir = str(tmp_path / "docs_split")
    _write_interleaved(rows, tbl.schema, out_dir, "documents", 3)

    def drain(docs_dir, max_files):
        stream = read_documents_stream(spark, docs_dir, max_files=max_files)
        name = f"det_smp_{uuid.uuid4().hex[:8]}"
        out = run_to_memory_sink(
            stream_minhash_pairs(
                stream, num_hashes=16, bands=4, shingle=3, threshold=0.5
            ),
            name,
        )
        return {
            (r["band"], r["bh"], r["id_a"], r["id_b"], r["est_jaccard"])
            for r in out.collect()
        }

    multi = drain(out_dir, max_files=1)
    single = drain(out_dir, max_files=10)
    assert multi == single

    # ... and both equal the BATCH operator (q22's 'bandest' gate branch):
    # the stream≡batch equivalence that moved out of the driver gate into
    # pytest (verdict r6 #1 isolation) is asserted here, operator to
    # operator, under the forced multi-batch drain.
    from exon_duckdb_spark.operators.dedup import minhash_band_est_pairs

    batch_pairs = {
        (r["band"], r["bh"], r["id_a"], r["id_b"], r["est_jaccard"])
        for r in minhash_band_est_pairs(
            batch, num_hashes=16, bands=4, shingle=3, threshold=0.5
        ).collect()
    }
    assert multi == batch_pairs


def _docs_in_arrival_order(tmp_path, texts_by_id, order, subdir):
    """One part-file per doc with strictly increasing mtimes in ``order`` —
    FileStreamSource processes oldest-first, so with maxFilesPerTrigger=1
    each doc is its own micro-batch in exactly the given arrival order."""
    out_dir = str(tmp_path / subdir)
    os.makedirs(out_dir, exist_ok=True)
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    t0 = 1_600_000_000
    for i, did in enumerate(order):
        p = os.path.join(out_dir, f"documents_{i}.parquet")
        pq.write_table(
            pa.Table.from_pylist(
                [{"doc_id": did, "text": texts_by_id[did]}], schema=schema
            ),
            p,
        )
        os.utime(p, (t0 + i, t0 + i))
    return out_dir


def test_stream_minhash_cap_keeps_lowest_ids_across_drain_orders(
    spark, tmp_path
):
    """Cap-bound membership contract (verdict r6 #3): with max_bucket=2
    and five identical docs arriving one per micro-batch, bucket
    membership must converge to the LOWEST-id members regardless of
    arrival order (insert-then-evict-max), so every pair among the
    retained members is emitted under ANY drain order. First-arrival
    membership — the old behavior — fails the descending case: the
    bucket would retain {5,4} and never emit (1,2)."""
    from exon_duckdb_spark.streaming.events import (
        read_documents_stream,
        run_to_memory_sink,
        stream_minhash_pairs,
    )

    texts = {i: "alpha beta gamma delta epsilon zeta" for i in range(1, 6)}

    def drain(order, subdir):
        d = _docs_in_arrival_order(tmp_path, texts, order, subdir)
        stream = read_documents_stream(spark, d, max_files=1)
        out = run_to_memory_sink(
            stream_minhash_pairs(
                stream,
                num_hashes=16,
                bands=4,
                shingle=3,
                threshold=0.5,
                max_bucket=2,
            ),
            f"cap_{uuid.uuid4().hex[:8]}",
        )
        rows = out.collect()
        assert all(r["est_jaccard"] == 1.0 for r in rows)  # identical docs
        by_band = {}
        for r in rows:
            by_band.setdefault(r["band"], set()).add((r["id_a"], r["id_b"]))
        # identical docs collide in every band identically
        assert set(by_band) == {0, 1, 2, 3}
        assert len({frozenset(s) for s in by_band.values()}) == 1
        return by_band[0]

    asc = drain([1, 2, 3, 4, 5], "asc")
    desc = drain([5, 4, 3, 2, 1], "desc")
    # ascending replay: {1,2} admitted, 3/4/5 each probe {1,2} and bounce
    assert asc == {(1, 2), (1, 3), (2, 3), (1, 4), (2, 4), (1, 5), (2, 5)}
    # descending replay: each arrival probes, inserts, evicts current max
    assert desc == {(4, 5), (3, 4), (3, 5), (2, 3), (2, 4), (1, 2), (1, 3)}
    # the order-invariant guarantee: all pairs among the retained
    # (lowest-id) members appear under BOTH orders
    assert {(1, 2)} <= asc and {(1, 2)} <= desc


def test_stream_hamming_pairs_drain_matches_batch(spark, tmp_path):
    """stream_hamming_pairs' finite drain ≡ the batch per-block self-join:
    fingerprint part-files drained one per micro-batch emit the same
    (block, bval, id_a, id_b, hamming) SET as a single-batch drain AND
    as a brute-force per-block reference (blocking is pigeonhole-lossless
    for d ≤ max_hamming, so no qualifying pair may be missing)."""
    from exon_duckdb_spark.streaming.events import (
        run_to_memory_sink,
        stream_hamming_pairs,
    )

    bits, max_h = 49, 3
    hashes = {}
    for i in range(50):
        h = 0
        for b in range(bits):
            if (i * 2654435761 + b * 40503) % 89 < 30:
                h |= 1 << b
        hashes[i] = h
    for i in range(0, 50, 10):
        hashes[i + 100] = hashes[i] ^ (1 << (i % bits))

    rows = [{"id": k, "dhash": v} for k, v in sorted(hashes.items())]
    schema = pa.schema([("id", pa.int64()), ("dhash", pa.int64())])
    out_dir = str(tmp_path / "fp_split")
    _write_interleaved(rows, schema, out_dir, "fps", 3)

    def drain(max_files):
        stream = (
            spark.readStream.schema("id long, dhash long")
            .option("maxFilesPerTrigger", max_files)
            .parquet(out_dir)
        )
        name = f"det_shp_{uuid.uuid4().hex[:8]}"
        out = run_to_memory_sink(
            stream_hamming_pairs(stream, bits=bits, max_hamming=max_h), name
        )
        return {
            (r["block"], r["bval"], r["id_a"], r["id_b"], r["hamming"])
            for r in out.collect()
        }

    multi = drain(1)
    single = drain(10)
    assert multi == single

    # brute-force per-block reference (the same decomposition the
    # operator family shares)
    widths = [13, 12, 12, 12]
    offs = [0, 13, 25, 37]
    want = set()
    ids = sorted(hashes)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            d = bin(hashes[a] ^ hashes[b]).count("1")
            if d > max_h:
                continue
            for j in range(4):
                va = (hashes[a] >> offs[j]) & ((1 << widths[j]) - 1)
                vb = (hashes[b] >> offs[j]) & ((1 << widths[j]) - 1)
                if va == vb:
                    want.add((j, va, a, b, d))
    assert multi == want and len(want) >= 5
