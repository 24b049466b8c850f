"""Structured Streaming operators over the events stream.

The reference has no streaming surface (SURVEY §2.5: absent), but a
large-scale pipeline needs one; these are the Spark-idiomatic shapes:
file/rate source → watermarked event-time windows → sinks, and custom
stateful sessionization via ``applyInPandasWithState``.

Every operator takes/returns DataFrames so batch DataFrames can be passed
for testing (the window/agg expressions are identical in both modes).
"""

from __future__ import annotations

import datetime
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = [
    "read_events_stream",
    "read_documents_stream",
    "windowed_counts",
    "stream_interval_join",
    "stream_dedup",
    "stream_minhash_pairs",
    "sessionize_stream",
    "SESSION_SCHEMA",
    "run_to_memory_sink",
    "run_to_parquet_sink",
]


def read_events_stream(
    spark: SparkSession,
    events_dir: str,
    max_files: int = 1,
    schema: "T.StructType | None" = None,
) -> DataFrame:
    """File-based stream of the events table, `ts` normalised to a
    microsecond timestamp. ``events_dir`` is a DIRECTORY (Spark's file
    stream contract); only files named events*.parquet are picked up.

    readStream needs the schema up front, and the driver-generated data has
    stored `ts` as TIMESTAMP(NANOS) (surfacing as bigint nanos under
    nanosAsLong) in some rounds and TIMESTAMP(MICROS) in others — so probe
    one footer with a batch read and reuse its schema verbatim; footer-only,
    no data scan. A TIMESTAMP_NTZ column is cast to TIMESTAMP (watermarks
    require LTZ; the session timezone is pinned to UTC so the cast is
    value-identical).

    If the directory is empty (a normal starting state for a file stream —
    the producer hasn't written its first file yet) the probe read throws
    'Unable to infer schema'; fall back to the known static events schema
    (micros variant) so the stream can start and pick files up as they
    arrive. CAVEATS the caller should know: (a) the empty-dir fallback
    pins the MICROS variant — a producer that will write TIMESTAMP(NANOS)
    files into an initially-empty directory should pass ``schema``
    explicitly (bigint ts + the div-1000 repair below) or write one file
    before stream start; (b) ``nanosAsLong`` is a SESSION-level conf that
    must stay set for the stream's lifetime (streams evaluate lazily), so
    this call leaves it set — subsequent batch reads of TIMESTAMP(NANOS)
    parquet in the same session will surface bigint nanos."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if schema is None:
        schema = _probe_events_schema(spark, events_dir)
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .option("pathGlobFilter", "events*.parquet")
        .parquet(events_dir)
    )
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def _probe_events_schema(spark: SparkSession, events_dir: str):
    try:
        probe = spark.read.option("pathGlobFilter", "events*.parquet").parquet(
            events_dir
        )
        schema = probe.schema
        if not schema.fields:  # pragma: no cover - defensive
            raise ValueError("empty probe schema")
    except Exception:
        schema = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
                T.StructField("props", T.StringType()),
            ]
        )
    return schema


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked event-time tumbling-window aggregation. Late events beyond
    the watermark are dropped; state is bounded — the 100 TB/day shape."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    within_minutes: int = 30,
    watermark_minutes: int = 60,
) -> DataFrame:
    """Watermarked stream–stream interval join — the attribution shape:
    each RIGHT event (e.g. a purchase) pairs with the LEFT events (e.g.
    clicks) of the same key whose timestamp precedes it by at most
    ``within_minutes``.

    Both sides carry event-time watermarks AND the join condition bounds
    each side's timestamp relative to the other — the two requirements
    that let Spark's symmetric hash join EVICT state: without them the
    join buffers both streams forever. State per key is bounded by
    ``watermark_minutes + within_minutes`` of events, so at 100 TB/day the
    store holds a sliding interval, not history. Output mode is append
    (inner stream–stream joins emit exactly-once per matched pair).

    Column names must be disjoint across the two sides except ``key_col``
    (rename before calling — the sides often derive from the same source).
    Works identically on batch DataFrames: ``withWatermark`` is a no-op in
    batch, which is how the SQL oracle verifies the same plan.

    Batch-oracle equivalence caveat for STREAMING replays of finite file
    sources: the identical-result claim assumes the drain does not advance
    the watermark past late cross-file data. With ``maxFilesPerTrigger=1``
    over multiple part-files whose timestamps interleave out of order, a
    pair whose left side sits in a later file than its right side can be
    evicted before it arrives, and the streamed result would drop pairs
    the batch oracle keeps. Replays that must match an oracle should
    drain in ONE microbatch (default trigger, no maxFilesPerTrigger cap)
    or feed time-ordered files; the q07 'attrib' contract branch holds
    because its events table is a single file. Production attribution
    accepts the watermark's lateness contract by definition.
    """
    l = left.withWatermark(left_ts, f"{watermark_minutes} minutes")
    r = right.withWatermark(right_ts, f"{watermark_minutes} minutes")
    cond = (
        (l[key_col] == r[key_col])
        & (r[right_ts] > l[left_ts])
        & (
            r[right_ts]
            <= l[left_ts] + F.expr(f"INTERVAL {within_minutes} MINUTES")
        )
    )
    return l.join(r, cond, "inner").drop(r[key_col])


def stream_dedup(
    events: DataFrame, keys: list[str], ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each key within
    the watermark horizon (``dropDuplicatesWithinWatermark``), so state is
    bounded — the streaming twin of ``operators.dedup.exact_dedup`` for
    ingest pipelines that must not admit the same record twice."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
_STATE_SCHEMA = "start long, last long, n long"


def _session_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_seconds: int = 1800,
    close_idle: bool = False,
):
    """Emit closed sessions; keep the open session in state with a timeout.

    Timestamps travel through state as epoch-micros longs (GroupState rows
    are plain tuples).
    """
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start, unit="us")],
                "session_end": [pd.Timestamp(last, unit="us")],
                "n_events": [n],
            }
        )
        return

    ts_list: list[int] = []
    for pdf in pdfs:
        ts_list.extend(int(t.value // 1000) for t in pdf["ts"])
    ts_list.sort()

    if state.exists:
        start, last, n = state.get
    else:
        start, last, n = None, None, 0

    out_rows = []
    for t in ts_list:
        if start is None:
            start, last, n = t, t, 1
        elif t - last > gap_seconds * 1_000_000:
            out_rows.append((user_id, start, last, n))
            start, last, n = t, t, 1
        else:
            # ts_list sorts within THIS batch only; an out-of-order event
            # from a later micro-batch may precede the open session's
            # bounds — it joins the session without regressing its end
            # (the old `last = t` moved session_end backwards in time and
            # could spuriously close the session on the next event)
            start = min(start, t)
            last = max(last, t)
            n += 1
    state.update((start, last, n))
    if close_idle:
        state.setTimeoutDuration(gap_seconds * 1000)
    if out_rows:
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in out_rows],
                "session_start": [pd.Timestamp(r[1], unit="us") for r in out_rows],
                "session_end": [pd.Timestamp(r[2], unit="us") for r in out_rows],
                "n_events": [r[3] for r in out_rows],
            }
        )


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, close_idle: bool = False
) -> DataFrame:
    """Custom stateful operator: gap-based sessionization with
    ``applyInPandasWithState``. State per user is O(1); shuffles only on
    user_id. Sessions close when a later event arrives past the gap.

    ``close_idle=True`` adds a processing-time timeout that also closes
    sessions idle in wall-clock time — for always-on streams only: with
    ``availableNow`` drains the query would keep scheduling micro-batches
    until every pending timeout fires, so the default leaves open sessions
    in state (exactly-once semantics across restarts via the checkpoint).
    """
    gap_seconds = gap_minutes * 60

    def fn(key, pdfs, state):
        yield from _session_fn(key, pdfs, state, gap_seconds, close_idle)

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if close_idle
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def read_documents_stream(
    spark: SparkSession, docs_dir: str, max_files: int = 100
) -> DataFrame:
    """File-based stream of the documents table (files named
    documents*.parquet in ``docs_dir``). Schema comes from one batch
    footer probe — footer-only, no data scan."""
    probe = spark.read.option("pathGlobFilter", "documents*.parquet").parquet(
        docs_dir
    )
    return (
        spark.readStream.schema(probe.schema)
        .option("maxFilesPerTrigger", max_files)
        .option("pathGlobFilter", "documents*.parquet")
        .parquet(docs_dir)
    )


MINHASH_PAIRS_SCHEMA = (
    "band int, bh long, id_a long, id_b long, est_jaccard double"
)
_MINHASH_STATE_SCHEMA = "ids array<long>, sigs array<array<long>>"


def stream_minhash_pairs(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    shingle: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming near-duplicate detection: INCREMENTAL MinHash-LSH with
    band-bucket state — every arriving document is checked against the
    corpus seen so far, the shape an ingestion pipeline needs when dedup
    can't wait for a nightly batch job.

    Map side computes the signature with the SAME universal-hash family as
    the batch :func:`~exon_duckdb_spark.operators.dedup.minhash_lsh_pairs`
    (word ``shingle``-grams → md5_int32 → k affine minima — pure Column
    expressions, streaming-legal) and explodes the ``bands`` band keys.
    The stateful stage (``applyInPandasWithState``, keyed on (band, bh))
    keeps each bucket's first ``max_bucket`` (id, signature) members; an
    arriving doc emits (band, bh, id_a, id_b, est_jaccard) against every
    stored member with est ≥ ``threshold``, then joins the bucket. est is
    the fraction of equal signature components — the unbiased MinHash
    Jaccard estimate, exact in binary for power-of-two ``num_hashes`` so
    a SQL oracle needs no rounding convention.

    Determinism contract (mirrors q59's): within a micro-batch, docs
    process in id order, so a finite single-batch drain emits exactly the
    batch band self-join's pairs (id_a < id_b, once per colliding band —
    :func:`~exon_duckdb_spark.operators.dedup.minhash_band_est_pairs`) —
    the SQL-replayable oracle. Across many micro-batches the pair SET is
    the same while buckets stay under ``max_bucket``; only emission times
    differ.

    Cap semantics (verdict r6 #3): when a bucket exceeds ``max_bucket``,
    membership is the LOWEST-ID ``max_bucket`` members of the ids seen so
    far — insert-then-evict-max, not first-arrival — so retained
    membership is a pure function of the id SET, independent of
    micro-batch arrival order. Consequences, proven in
    tests/test_determinism.py with ``max_bucket=2`` under two opposite
    drain orders: (a) every threshold-passing pair among the RETAINED
    (lowest-id) members is always emitted, in any order — recall over the
    retained corpus is complete and arrival-unbiased; (b) pairs touching
    an eventually-evicted member are bonus recall and may vary with
    arrival order (a member can be probed against before a smaller id
    displaces it) — bounded extra, never lost. First-arrival membership
    had neither guarantee: which docs the bucket retained was itself
    drain-order-dependent, silently biasing recall toward early shards at
    the 100 TB scale the cap exists for. Production deployments with
    unbounded key churn should add a timeout eviction (the sessionize
    operator shows the pattern).

    Replay caveat (ADVICE r7): the no-double-emit guard covers currently
    RETAINED members (state holds (id, signature) pairs; re-arrivals of
    those are dropped). A replayed shard re-delivering an id that was
    already EVICTED re-probes the bucket and re-emits its pairs —
    remembering every id ever admitted would grow state without bound,
    exactly what ``max_bucket`` exists to prevent. Exactly-once replay
    hygiene belongs to the source (checkpointed file streams don't
    re-deliver); pipelines that re-ingest shards by design should
    ``dropDuplicates(["band", "bh", "id_a", "id_b"])`` downstream (as
    q95's drain does) or run the batch operator instead.
    """
    from exon_duckdb_spark.operators.dedup import minhash_signature
    from exon_duckdb_spark.operators.hashing import md5_int

    sig = minhash_signature(
        docs, text_col=text_col, id_col=id_col, num_hashes=num_hashes,
        shingle=shingle,
    )
    rows_per_band = num_hashes // bands
    bhs = []
    for b in range(bands):
        parts = [
            F.col(f"mh_{b * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ]
        bhs.append(md5_int(F.concat_ws(",", *parts)))
    keyed = sig.select(
        F.col(id_col).alias("_id"),
        F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)]).alias("_mh"),
        F.posexplode(F.array(*bhs)).alias("band", "bh"),
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            ids, sigs = state.get
            ids, sigs = list(ids), [list(s) for s in sigs]
        else:
            ids, sigs = [], []
        seen = set(ids)
        out = []
        # materialize the WHOLE micro-batch group before sorting: the
        # runtime delivers a group as arrow-batch-sized chunks, and a
        # per-chunk sort would make which members beat the max_bucket cap
        # chunk-order-dependent (the id-order contract is per BATCH). A
        # degenerate bucket materializes here batch-at-a-time — bounded by
        # the band-bucket size, the same regime the cap exists for; run
        # exact_dedup first so identical docs don't all share one bucket.
        chunks = list(pdfs)
        batch = pd.concat(chunks) if chunks else None
        rows_iter = () if batch is None or batch.empty else (
            r for _, r in batch.sort_values("_id").iterrows()
        )
        for r in rows_iter:
            did = int(r["_id"])
            # a re-arriving id (re-ingested shard, replayed file) must not
            # join its bucket twice: it would re-emit every existing pair
            # and double-emit all future ones
            if did in seen:
                continue
            s = [None if v is None else int(v) for v in r["_mh"]]
            for mid, ms in zip(ids, sigs):
                eq = sum(
                    1
                    for a, b in zip(s, ms)
                    if a is not None and b is not None and a == b
                )
                est = eq / num_hashes
                if est >= threshold:
                    a, b = (mid, did) if mid < did else (did, mid)
                    out.append((key[0], key[1], a, b, est))
            # insert-then-evict-max: the bucket retains the lowest-id
            # max_bucket members of the id set seen so far, making
            # membership arrival-order-invariant (docstring contract)
            if len(ids) < max_bucket:
                ids.append(did)
                sigs.append(s)
                seen.add(did)
            else:
                mx = max(range(len(ids)), key=lambda i: ids[i])
                if did < ids[mx]:
                    seen.discard(ids[mx])
                    ids[mx] = did
                    sigs[mx] = s
                    seen.add(did)
        state.update((ids, sigs))
        if out:
            yield pd.DataFrame(
                out, columns=["band", "bh", "id_a", "id_b", "est_jaccard"]
            )

    return keyed.groupBy("band", "bh").applyInPandasWithState(
        fn,
        outputStructType=MINHASH_PAIRS_SCHEMA,
        stateStructType=_MINHASH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def scaled_state_partitions(
    spark: SparkSession,
    src_dir: str,
    pattern: str = "events*.parquet",
    bytes_per_partition: int = 256 * 1024,
    floor: int = 8,
) -> int:
    """State-store partition count sized to the DRAINED source volume
    (guide §2: derive partitioning from input size, never a constant
    tuned for one deployment).

    Every stateful streaming operator commits one state-store delta per
    partition per micro-batch, and a stream-stream join commits FOUR
    stores per partition — measured at ~50-100 ms per store commit on
    local disk, that fixed cost dominates a small drain (q86's interval
    join: 9.0 s at 32 partitions vs 2.7 s at 4, identical rows). Compute
    inside the stateful stage scales the other way (q95's Python
    signature state: 12.8 s at 4 partitions vs 9.2 s at 8), hence the
    ``floor`` — and a state stage that is COMPUTE-bound Python rather
    than commit-bound should not use this helper at all (q95 measured
    3 s/pass slower at the scaled count, 6/6 interleaved pairs; its call
    site keeps the session value and says why). The cap is the
    session's ``spark.sql.shuffle.partitions``
    — the knob a cluster submit sizes to 2-3 tasks/core
    (:func:`~exon_duckdb_spark.session.cluster_conf`) — so at any real
    data volume ``bytes // bytes_per_partition`` crosses the cap and
    this is exactly the session value, i.e. a no-op at 100 TB; only the
    small-drain regime gets fewer, fuller state partitions."""
    import glob as _glob

    total = sum(
        os.path.getsize(p)
        for p in _glob.glob(os.path.join(src_dir, pattern))
        if os.path.isfile(p)
    )
    # a bare file path (the test datasets ship events.parquet as ONE file)
    single = os.path.join(src_dir, pattern.replace("*", ""))
    if not total and os.path.isfile(single):
        total = os.path.getsize(single)
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return max(1, min(cap, max(floor, -(-total // bytes_per_partition))))


def run_to_memory_sink(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "append",
    state_partitions: "int | None" = None,
) -> DataFrame:
    """Drain a stream with availableNow into an in-memory table; returns the
    batch DataFrame of results (test/inspection helper).

    Windowed aggregations should pass ``output_mode="complete"`` for a
    deterministic drain: in append mode a window only emits once the
    watermark passes its end, so the trailing windows of a finite input
    never surface.

    ``state_partitions`` (usually :func:`scaled_state_partitions`) scopes
    ``spark.sql.shuffle.partitions`` around query START only — Structured
    Streaming pins the value into the checkpoint's offset metadata at the
    first batch, so every batch of this drain uses it and nothing else in
    the session is affected (conf restored before returning). Emitted
    rows are partitioning-independent for every operator in this module
    (verified: identical drains at 4/8/32 across the five declared
    streaming queries); ``None`` keeps the session value.

    Callers use ``<prefix>_<uuid>`` names so repeated invocations (bench
    warm + N timed passes) don't collide; each sink would otherwise stay
    registered — a full result copy held by the driver per call — for the
    session lifetime. Stale same-prefix tables from PREVIOUS invocations
    are dropped here (the prior call's result was consumed before this
    one starts — the repo's sequential usage contract)."""
    spark = stream_df.sparkSession
    prefix = name.rsplit("_", 1)[0]
    if prefix:
        for t in spark.catalog.listTables():
            if t.name.startswith(prefix + "_") and t.name != name.lower():
                try:
                    spark.catalog.dropTempView(t.name)
                except Exception:
                    pass  # concurrent drop / not a temp view: harmless
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    if state_partitions is not None:
        spark.conf.set(key, str(int(state_partitions)))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if state_partitions is not None:
            spark.conf.set(key, old)
    return spark.sql(f"SELECT * FROM {name}")


def run_to_parquet_sink(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """Drain a stream into a parquet directory with availableNow, tracked by
    a durable checkpoint — the production sink shape.

    The checkpoint's WAL gives exactly-once file output: re-running against
    the same ``checkpoint_dir`` after new source files appear processes ONLY
    the unseen files, and a crash-restart never double-writes a batch
    (tests restart the query and assert no duplicates). Windowed
    aggregations must use append mode here (parquet sinks can't upsert),
    which emits a window only once the watermark passes it — finite test
    inputs therefore keep their trailing windows in state; plan for that or
    use :func:`run_to_memory_sink` with complete mode for inspection."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


HAMMING_PAIRS_SCHEMA = (
    "block int, bval long, id_a long, id_b long, hamming int"
)
_HAMMING_STATE_SCHEMA = "ids array<long>, fps array<long>"


def stream_hamming_pairs(
    fps: DataFrame,
    hash_col: str = "dhash",
    id_col: str = "id",
    bits: int = 49,
    max_hamming: int = 3,
    max_bucket: int = 4096,
) -> DataFrame:
    """Streaming near-duplicate detection over media FINGERPRINTS:
    incremental Hamming matching with block-bucket state — every arriving
    asset (image dHash, audio energy fingerprint, video frame hash) is
    checked against the corpus seen so far, the media analog of
    :func:`stream_minhash_pairs` for an ingestion pipeline that can't
    wait for the nightly batch job.

    Map side splits the fingerprint into the ``max_hamming + 1`` Charikar
    pigeonhole blocks (the SAME decomposition as the batch
    ``hamming_pairs`` / persisted ``hamming_index_*`` family, so recall
    over retained members is LOSSLESS for distance ≤ max_hamming — at
    least one block of any qualifying pair collides). The stateful stage
    (``applyInPandasWithState`` keyed on (block, bval)) keeps each
    bucket's (id, fingerprint) members; an arrival emits (block, bval,
    id_a, id_b, hamming) against every stored member within
    ``max_hamming`` bits, then joins the bucket.

    Contracts shared verbatim with ``stream_minhash_pairs`` (see its
    docstring for the proofs and caveats): docs process in id order
    within a micro-batch, so a finite drain emits exactly the batch
    per-block self-join's pairs (the SQL-replayable oracle — one row per
    COLLIDING BLOCK, dedupe downstream for the once-per-pair view);
    bucket caps retain the LOWEST-ID ``max_bucket`` members
    (arrival-order-invariant membership); re-arrivals of retained ids are
    dropped, evicted-id replays are the documented bounded-extra; NULL
    fingerprints never enter (undecodable assets can't pair).
    """
    from exon_duckdb_spark.operators.dedup import _hamming_blocks_expr

    nblocks = int(max_hamming) + 1
    _w, _o, blocks = _hamming_blocks_expr(hash_col, bits, max_hamming)
    keyed = (
        fps.where(F.col(hash_col).isNotNull())
        .select(
            F.col(id_col).alias("_id"),
            F.col(hash_col).alias("_fp"),
            F.posexplode(blocks).alias("block", "bval"),
        )
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            ids, sigs = state.get
            ids, sigs = list(ids), list(sigs)
        else:
            ids, sigs = [], []
        seen = set(ids)
        out = []
        chunks = list(pdfs)
        batch = pd.concat(chunks) if chunks else None
        rows_iter = () if batch is None or batch.empty else (
            r for _, r in batch.sort_values("_id").iterrows()
        )
        for r in rows_iter:
            did = int(r["_id"])
            if did in seen:
                continue
            fp = int(r["_fp"])
            for mid, mfp in zip(ids, sigs):
                d = bin(fp ^ mfp).count("1")
                if d <= max_hamming:
                    a, b = (mid, did) if mid < did else (did, mid)
                    out.append((key[0], key[1], a, b, d))
            if len(ids) < max_bucket:
                ids.append(did)
                sigs.append(fp)
                seen.add(did)
            else:
                mx = max(range(len(ids)), key=lambda i: ids[i])
                if did < ids[mx]:
                    seen.discard(ids[mx])
                    ids[mx] = did
                    sigs[mx] = fp
                    seen.add(did)
        state.update((ids, sigs))
        if out:
            yield pd.DataFrame(
                out, columns=["block", "bval", "id_a", "id_b", "hamming"]
            )

    return keyed.groupBy("block", "bval").applyInPandasWithState(
        fn,
        outputStructType=HAMMING_PAIRS_SCHEMA,
        stateStructType=_HAMMING_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
