"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.
The stdout line is deliberately kept under ~1.9 KB (per-query rows keyed
by qNN tag, branches omitted) because the driver records only a ~2 KB
stdout tail; the COMPLETE record — full query names, branch timings,
q99 stages — is written to ./BENCH.json every run (VERDICT r11 #3).

Each query is forced end-to-end with the noop sink (full computation, no
driver collect). Every headline query first runs once UNTIMED (plan
compile, Janino/JIT, parquet footers, Arrow worker startup), then through
N timed passes (default 3) taking the per-query MINIMUM: single-JVM cold
costs and host-level interference (CPU steal, background flushes — the
round-5 host showed idle load ≈ 4 and run-to-run swings of 1.5-6x on
UNTOUCHED sub-second queries) swing single measurements far more than any
plan change; the min across passes is the standard timeit estimator of
the code's actual cost. The JSON line reports "passes" so rounds with
different settings are comparable. Set SPARK_GRAFT_COLD=1 to skip the
warmup pass and measure cold (first-plan) latencies instead;
SPARK_GRAFT_PASSES overrides the pass count.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from exon_duckdb_spark.session import get_session

HEADLINE = [
    "q01_pricing_summary",
    "q02_top_orders_per_customer",
    "q03_revenue_by_nation",
    "q06_revenue_filter_agg",
    "q07_events_hourly",
    "q10_sessionize",
    "q12_sequence_ops",
    "q16_translate_aa",
    "q17_running_totals",
    "q18_asof_join",
    "q19_cube_events",
    "q20_exact_dedup",
    "q21_minhash_signature",
    "q22_minhash_lsh_pairs",
    "q23_simhash",
    "q24_text_stats",
    "q26_doc_fingerprint",
    "q27_cosine_topk",
    "q28_ngram_jaccard_pairs",
    "q89_edit_distance_pairs",
    "q29_embedding_dedup",
    "q83_semantic_dedup",
    "q32_ann_topk",
    "q33_bpe_tokens",
    "q35_range_band_join",
    "q36_revenue_by_brand",
    "q37_supplier_nation_volume",
    # quality / decontamination (map-only passes + hash-only joins)
    "q60_repetition_stats",
    "q61_quality_filter",
    "q62_pii_scrub",
    "q63_decontaminate",
    "q80_duplicated_spans",
    "q64_bm25_topk",
    "q84_hybrid_retrieval",
    "q65_paragraph_dedup",
    "q66_top_ngrams",
    "q71_chunk_documents",
    "q107_cdc_chunks",
    "q72_tfidf_top_terms",
    "q73_pq_codes",
    "q74_pq_search",
    "q92_pq_rerank",
    "q85_ivfpq_search",
    # alignment (batched DP) + real media decode + LM quality score
    "q40_alignment",
    "q75_image_decode",
    "q76_image_resize",
    "q82_jpeg_decode",
    "q77_audio_decode",
    "q78_perplexity_score",
    "q88_bigram_perplexity",
    "q98_kneser_ney",
    # quantization ladder + projected-space ANN (round-5 additions)
    "q79_sq8_search",
    "q97_bq_search",
    "q96_rp_topk",
    # round-6 additions: incremental index dedup, sketches, order
    # statistics, interval algebra
    "q99_lsh_index_probe",
    "q100_cms_heavy_hitters",
    "q101_quantiles_and_sample",
    "q102_merge_intervals",
    # round-9 additions: incremental crawl dedup end-to-end, cross-modal
    # fingerprint dedup
    "q103_bloom_crawl",
    "q104_media_dedup",
    "q105_bpe_pipeline",
    "q106_quality_classifier",
    # format sources (writer→reader roundtrips + indexed region queries)
    "q47_sam_roundtrip",
    "q49_vcf_roundtrip",
    "q53_bam_roundtrip",
    "q54_bcf_roundtrip",
    "q55_vcf_region_query",
    "q56_bam_region_query",
]


def parse_sf(sf_dir: str) -> float:
    """Scale factor from a dir name: the last 'sf<number>' token
    (handles 'sf0.1', 'spark_graft_sf1', ...); 0.0 when the name carries
    no sf tag (custom data dirs must not crash the bench)."""
    m = re.findall(r"sf(\d+(?:\.\d+)?)", os.path.basename(sf_dir.rstrip("/")))
    return float(m[-1]) if m else 0.0


# The five Structured Streaming pipelines (file stream → stateful operator
# → availableNow drain to a memory sink), timed END-TO-END including the
# drain (r14, VERDICT r13 #2: the streaming surface previously had zero
# timed coverage). Reported under the separate "streaming" key of the
# BENCH.json artifact — like "branches", NOT part of the headline
# total/queries, so round-over-round headline comparisons stay intact.
STREAMING = [
    "q31_stream_sessionize",
    "q38_stream_windowed_counts",
    "q86_stream_attribution",
    "q59_stream_dedup",
    "q95_stream_minhash_pairs",
]


def make_lookup():
    """Query resolver shared with tools/bench_scale.py: fine-grained q*
    module attributes first (keeps timings comparable round-over-round),
    falling back to the consolidated queries() registry."""
    registry = entrymod.queries()

    def lookup(name):
        return getattr(entrymod, name, None) or registry[name]

    return lookup


def run_queries(
    spark, sf_dir: str, names, warm: bool = True, lookup=None, passes: int = 3
) -> dict[str, float]:
    """Warm (untimed) + ``passes`` timed noop-sink passes over ``names``
    taking the per-query minimum — the one measurement harness, imported
    by tools/bench_scale.py so both benches measure the same way.
    ``lookup`` overrides the resolver (bench_scale injects its
    embedding-scale variants)."""
    lookup = lookup or make_lookup()
    if warm:
        for name in names:
            lookup(name)(spark, sf_dir).write.mode("overwrite").format("noop").save()
    times: dict[str, float] = {}
    for _ in range(max(passes, 1)):
        for name in names:
            fn = lookup(name)
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = round(time.time() - t0, 3)
            if name not in times or dt < times[name]:
                times[name] = dt
    return times


def run_branches(spark, sf_dir: str, passes: int = 2) -> dict[str, dict[str, float]]:
    """Branch-level timings for the composite gate queries (VERDICT r7
    #3): each composite's branches time individually through the same
    noop sink (1 warm + ``passes`` timed, per-branch minimum). Shared
    state is released per composite (clearCache — the signature frames
    minhash operators persist would otherwise accumulate across
    composites; ADVICE r7)."""
    out: dict[str, dict[str, float]] = {}
    for name, factory in entrymod.branch_frames().items():
        frames, cleanup = factory(spark, sf_dir)
        try:
            times: dict[str, float] = {}
            for tag, df in frames.items():
                df.write.mode("overwrite").format("noop").save()  # warm
                for _ in range(max(passes, 1)):
                    t0 = time.time()
                    df.write.mode("overwrite").format("noop").save()
                    dt = round(time.time() - t0, 3)
                    if tag not in times or dt < times[tag]:
                        times[tag] = dt
            out[name] = times
        finally:
            cleanup()
        spark.catalog.clearCache()
    return out


def calibrate(spark, passes: int = 3) -> dict[str, float]:
    """Data-independent host-speed probes, run warm, min over ``passes``:
    'calib_cpu' is a generated-range codegen aggregation (pure JVM compute),
    'calib_shuffle' a generated-range exchange + hash aggregate. Neither
    touches the repo's operators or any input data, so round-over-round
    drift in these numbers measures the HOST (CPU steal, scheduler, disk),
    not the code — divide headline totals by the calib ratio before
    reading a cross-round delta as a plan change. Motivated by a round-5
    host that ran every untouched query ~20-25% slower than round 4's.
    """
    cpu_df = spark.range(50_000_000).selectExpr(
        "sum(id * 2654435761 % 1000000007) AS s"
    )
    shuf_df = (
        spark.range(2_000_000)
        .selectExpr("id % 100000 AS k")
        .groupBy("k")
        .count()
        .selectExpr("sum(count) AS s")
    )
    out: dict[str, float] = {}
    for name, df in [("calib_cpu", cpu_df), ("calib_shuffle", shuf_df)]:
        df.write.mode("overwrite").format("noop").save()  # warm
        best = None
        for _ in range(passes):
            t0 = time.time()
            df.write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[name] = round(best, 3)
    return out


def main() -> None:
    # the gate-forensics trace (a driver-side collect + JSON write inside
    # q20m/q22m) must never skew bench timings — force the opt-out here
    # rather than relying on the invoker to remember it (ADVICE r7)
    os.environ.setdefault("SPARK_GRAFT_NO_TRACE", "1")
    # memoize composite-query input fixtures across the warm+timed passes
    # (q104's media synth loops, q106's feature frame): each timed pass
    # re-built the full plan, so fixture generation — a parquet scan in
    # any real deployment — dominated those composites' walls (VERDICT
    # r10 #4). Operator work (fingerprint branches, the whole GD training
    # chain) still runs inside every timed pass.
    os.environ.setdefault("SPARK_GRAFT_BENCH_CACHE", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = parse_sf(sf_dir)
    passes = int(os.environ.get("SPARK_GRAFT_PASSES", "3"))
    spark = get_session(app_name="bench")
    # calibrate at START and END, min-merged: the probe itself was measured
    # 5x apart (0.23 s vs 1.13 s) in back-to-back runs on the round-5 host,
    # so one sample can land entirely inside an interference burst
    calib = calibrate(spark)
    times = run_queries(
        spark,
        sf_dir,
        HEADLINE,
        warm=not os.environ.get("SPARK_GRAFT_COLD"),
        passes=passes,
    )
    branches = run_branches(spark, sf_dir)
    # stage-separated q99 walls (VERDICT r9 #3): sig compute / parquet
    # write / probe join / file count, to localize the builder-vs-driver
    # bench discrepancy on this query
    branches["q99_lsh_index_probe"] = entrymod.q99_stage_times(
        spark, sf_dir, passes=2
    )
    streaming = run_queries(spark, sf_dir, STREAMING, passes=2)
    calib_end = calibrate(spark)
    calib = {k: min(calib[k], calib_end[k]) for k in calib}
    total = round(sum(times.values()), 3)
    doc = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "branches": branches,
        "streaming": streaming,
        "sf": sf,
        "passes": passes,
        # methodology disclosure (ADVICE r11): which composite rows used a
        # memoized input fixture under SPARK_GRAFT_BENCH_CACHE — without
        # this, cross-round comparisons can't see the r11 change that
        # stopped timing q104's fixture synthesis
        "bench_cache": int(bool(os.environ.get("SPARK_GRAFT_BENCH_CACHE"))),
        "cached_fixtures": entrymod.bench_cached_queries(),
        **calib,
    }
    # full record to a fixed-path artifact (VERDICT r11 #3): BENCH_r10 and
    # r11 both recorded `parsed: null` because the driver keeps only a
    # ~2 KB stdout tail and the single JSON line had outgrown it — totals
    # and the first ~35 query rows fell off the front. The complete doc
    # lives here (committed per round) ...
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH.json"), "w") as f:
        json.dump(doc, f, separators=(",", ":"))
        f.write("\n")
    # ... and stdout carries a line SIZED TO SURVIVE the tail cap: same
    # totals/calibration, per-query rows keyed by their unique qNN tag
    # (branch timings only in the artifact). Falls back to full names if
    # the tags ever collide.
    short = {name.split("_", 1)[0]: t for name, t in times.items()}
    compact = dict(doc, queries=short if len(short) == len(times) else times)
    compact.pop("branches")
    compact.pop("streaming")
    compact["artifact"] = "BENCH.json"
    line = json.dumps(compact, separators=(",", ":"))
    # never let the stdout record outgrow the ~2 KB tail cap again: shrink
    # the per-query row count until the line fits (ADVICE r12: a single
    # truncation to 40 rows could still exceed the cap in the full-name
    # fallback branch), dropping to totals-only as the last resort
    n_rows = 40
    while len(line) > 1900 and n_rows > 0:
        compact["queries"] = {k: v for k, v in sorted(
            (short if len(short) == len(times) else times).items(),
            key=lambda kv: -kv[1])[:n_rows]}
        compact["queries_truncated_to_slowest"] = n_rows
        line = json.dumps(compact, separators=(",", ":"))
        n_rows -= 5
    if len(line) > 1900:
        compact["queries"] = {}
        compact["queries_truncated_to_slowest"] = 0
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
