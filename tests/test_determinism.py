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
    "qname", ["q20_dedup_suite", "q22_minhash_pipeline", "q09_distinct_union"]
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
