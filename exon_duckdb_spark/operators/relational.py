"""Relational / event-stream batch operators.

The reference inherits all relational processing from host DuckDB
(SURVEY.md §2.5); these helpers cover the shapes its parity surface needs
plus event-pipeline staples (sessionization) expressed with window functions
so they scale: one shuffle keyed by the session partition key, no
driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "sessionize",
    "top_k_per_group",
    "asof_join",
    "range_join",
    "salted_join",
    "bucketed_write",
    "merge_intervals",
    "ensure_parallelism",
]


def _conf_bytes(spark, key: str, default: int) -> int:
    """Parse a Spark byte-size conf value ('128MB', '4194304b', '4m') —
    the full Spark suffix set through petabytes, so a site's '1t'
    maxPartitionBytes doesn't silently fall back to the default."""
    try:
        raw = str(spark.conf.get(key)).strip().lower()
    except Exception:
        return default
    mult = 1
    for suffix, m in (("pb", 1 << 50), ("tb", 1 << 40), ("gb", 1 << 30),
                      ("mb", 1 << 20), ("kb", 1 << 10),
                      ("p", 1 << 50), ("t", 1 << 40), ("g", 1 << 30),
                      ("m", 1 << 20), ("k", 1 << 10), ("b", 1)):
        if raw.endswith(suffix):
            raw, mult = raw[: -len(suffix)], m
            break
    try:
        return int(float(raw) * mult)
    except ValueError:
        return default


# extensions Spark treats as non-splittable whole-file reads: one task per
# file regardless of size (Hadoop codec splittability; bgzf-based formats
# go through this package's own split planner, not Spark scans)
_UNSPLITTABLE_EXTS = (".gz", ".gzip", ".zst", ".zstd", ".bz2", ".lz4",
                      ".snappy", ".deflate", ".xz")


def _estimated_scan_splits(df: DataFrame) -> int | None:
    """Estimate the file-scan partition count from the plan's input files,
    replicating ``FilePartition.maxSplitBytes`` + greedy bin-packing, with
    NO RDD materialization (``df.rdd.getNumPartitions()`` costs a py4j
    round trip plus a full physical-planning pass per call; ``inputFiles``
    is analysis-only).

    Returns ``None`` when the plan has no file inputs and can't run
    locally — an upstream exchange already fanned the data out to
    ``shuffle.partitions``, and ``createDataFrame`` corpora parallelize to
    ``defaultParallelism`` slices (LogicalRDD), so "already parallel"
    matches what the RDD probe saw — or when a file can't be stat'ed
    (unregistered remote scheme). A no-file plan that IS a driver-local
    relation (``df.isLocal()``, analysis-only) reports 1 split: it
    executes as a single local scan. Non-splittable compressed files
    (.gz, .zst, …) enter the bin-packing as one whole-file chunk
    regardless of size, matching Spark's scan behavior — chunking them by
    maxSplitBytes would overestimate parallelism in exactly the
    single-gz-member case the guard targets, while tiny ones still pack
    together.
    """
    import os
    from urllib.parse import unquote, urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        try:
            return 1 if df.isLocal() else None
        except Exception:
            return None
    spark = df.sparkSession
    from exon_duckdb_spark.sources import splits as _splits

    sizes: list[tuple[int, bool]] = []  # (bytes, splittable)
    for f in files:
        splittable = not f.lower().endswith(_UNSPLITTABLE_EXTS)
        try:
            if f.startswith("file:"):
                sz = os.path.getsize(unquote(urlparse(f).path))
            elif _splits.is_uri(f):
                sz = _splits.file_size(f)
            else:
                sz = os.path.getsize(f)
        except Exception:
            return None
        sizes.append((sz, splittable))
    open_cost = _conf_bytes(spark, "spark.sql.files.openCostInBytes", 4 << 20)
    max_pb = _conf_bytes(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
    try:
        min_pn = int(spark.conf.get("spark.sql.files.minPartitionNum"))
    except Exception:
        min_pn = spark.sparkContext.defaultParallelism
    total = sum(s for s, _ in sizes) + open_cost * len(sizes)
    max_split = max(1, min(max_pb, max(open_cost, total // max(min_pn, 1))))
    chunks: list[int] = []
    for s, splittable in sizes:
        if not splittable:
            # one whole-file chunk: Spark can't split it, but small ones
            # still greedy-pack together with their neighbors
            chunks.append(s)
            continue
        off = 0
        while off < s:
            chunks.append(min(max_split, s - off))
            off += max_split
        if s == 0:
            chunks.append(0)
    chunks.sort(reverse=True)
    parts, cur = 0, 0
    for c in chunks:
        if cur + c > max_split and cur > 0:
            parts += 1
            cur = 0
        cur += c + open_cost
    return parts + (1 if cur > 0 else 0)


def ensure_parallelism(df: DataFrame, *key_cols: str, n_splits: int | None = None) -> DataFrame:
    """Fan a narrow-input DataFrame out to the session's configured
    parallelism IFF its scan produces fewer splits than half of it.

    Single-file/single-row-group inputs (small extracts; the driver's test
    tables) hand the ENTIRE map stage to one task — an Arrow UDF then runs
    on one core while the rest idle, and no optimizer setting can split an
    unsplittable source. The guard makes this scale-honest: on any real
    multi-split layout (every 100 TB table) the split count already meets
    the target and this is a NO-OP with no added exchange; when it does
    fire, the shuffle moves only the raw input bytes, which are tiny *by
    definition* in the under-split regime. Hash-partitioned on ``key_cols``
    (deterministic, no round-robin sort pass).

    The split count comes from ``n_splits`` when the caller already knows
    it, else from a stat-based estimate of the plan's input files — never
    from ``df.rdd`` (see ``_estimated_scan_splits``).
    """
    spark = df.sparkSession
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    splits = n_splits if n_splits is not None else _estimated_scan_splits(df)
    if splits is None or splits >= max(target // 2, 2):
        return df
    return df.repartition(target, *[F.col(c) for c in key_cols])


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign session ids by gap: a new session starts when the time since
    the user's previous event exceeds ``gap_minutes``.

    Single shuffle keyed by ``user_col`` (the window partition). Returns the
    input plus ``session_id`` (1-based per user).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col).over(w))
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return events.withColumn("session_id", F.sum(is_new).over(w))


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_col: str, k: int, ascending: bool = False
) -> DataFrame:
    """row_number-based top-k per group (one shuffle on the group key)."""
    oc = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    w = Window.partitionBy(*group_cols).orderBy(oc)
    return df.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
) -> DataFrame:
    """Backward-inclusive as-of join: for each left row, attach ``right_cols``
    from the latest right row with ``right_time <= left_time`` and the same
    ``on`` key (DuckDB ``ASOF JOIN`` semantics).

    Implemented as the classic union-sort trick — ONE shuffle keyed by
    (``on``), no range-join explosion: tag both sides, sort each key's rows
    by time (right rows before left rows on ties), and carry the last
    non-null right values forward with an unbounded-preceding window. At
    100 TB this is a single repartition+sort of left+right; contrast with a
    naive ``left.join(right, on).where(rt <= lt)`` + argmax, which multiplies
    rows by the per-key right cardinality before reducing.

    Left rows with no earlier right row keep NULLs.
    """
    lcols = left.columns
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*lcols).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema) + ">"
        ).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "__is_left",
        "__l",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c) for c in right_cols],
    )
    return filled.where(F.col("__is_left") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols], *right_cols
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi join: salt the big side's key space ``salts``
    ways and replicate the small side once per salt, so one hot key spreads
    over ``salts`` shuffle partitions instead of hot-spotting a single task.

    AQE's skew-join split (on in `session.py`) handles most skew
    adaptively; use this when the skew is known up front, the small side is
    too big to broadcast, or AQE is unavailable (e.g., streaming joins).
    The salt is derived from a hash of the full row on the big side —
    deterministic, no rand() so retries/speculative tasks agree.
    """
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salts))
    big2 = big.withColumn("__salt", salt.cast("int"))
    small2 = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    return big2.join(small2, keys + ["__salt"], how).drop("__salt")


def merge_intervals(
    df: DataFrame,
    chrom_col: str = "chrom",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Merge overlapping/touching intervals per chromosome (bedtools
    ``merge``): the island detection every interval algebra builds on —
    coverage regions from reads, exon unions, repeat masking.

    Gaps-and-islands in two windows over (chrom, start, end) order: an
    interval starts a new island iff its start exceeds the running max
    end of everything before it (touching intervals — ``start == prev
    end`` — merge, half-open convention); the island id is a running sum
    of starts. Returns (chrom, start, end, n_merged).

    Scale: both windows partition on ``chrom_col``, so parallelism is
    bounded by the chromosome count and one contig's intervals sort in
    one task — fine for real genomes (~10⁷ intervals/contig sorts in
    seconds) but a single hot contig at extreme scale wants a composite
    key: pre-bucket on (chrom, floor(start/B)) and stitch islands that
    touch bucket boundaries in a second tiny pass.
    """
    w = Window.partitionBy(chrom_col).orderBy(
        F.col(start_col).asc(), F.col(end_col).asc()
    )
    prev_max = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    is_new = (prev_max.isNull() | (F.col(start_col) > prev_max)).cast("int")
    isl = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.withColumn("_isl", isl)
        .groupBy(chrom_col, "_isl")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            F.count("*").alias("n_merged"),
        )
        .drop("_isl")
    )


def bucketed_write(
    df: DataFrame,
    table: str,
    bucket_cols: str | list[str],
    n_buckets: int = 32,
    sort_cols: str | list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a BUCKETED catalog table: rows are hash-routed
    into ``n_buckets`` files per partition by ``bucket_cols`` (optionally
    sorted within buckets), and the catalog records that layout.

    Why it matters at 100 TB: every join/aggregation on the bucket keys
    between co-bucketed tables reads the partitioning FROM DISK instead of
    re-shuffling — the exchange disappears from the plan (asserted in
    tests/test_plans.py::test_bucketed_join_skips_exchange). A corpus that
    is joined on doc_id by every pipeline stage (dedup keep-lists, quality
    joins, split assignment) pays the doc_id shuffle ONCE at ingest, not
    once per stage. ``sort_cols`` additionally enables sort-merge joins
    without a per-task sort.

    Spark requires bucketed data to live in the session catalog
    (``saveAsTable``), not a bare path — read it back with
    ``spark.table(name)``; a plain ``spark.read.parquet(path)`` sees the
    files but not the bucket metadata and would shuffle again.
    """
    bc = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.format(fmt).mode(mode).bucketBy(int(n_buckets), *bc)
    if sort_cols:
        sc = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sc)
    w.saveAsTable(table)


def range_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval range join: match each fact row to the band(s) whose
    ``[lo, hi)`` interval contains ``value_col``.

    The band table is dimension-sized, so broadcast it — the fact side never
    shuffles and the non-equi predicate evaluates inside whole-stage codegen
    (a BroadcastNestedLoopJoin over a tiny build side). For a big-big range
    join, pre-bucket both sides on floor(value / bucket_width) to turn it
    into an equi join instead.
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(bands), cond, how)
