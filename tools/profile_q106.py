"""Listener-level attribution of q106's per-job wall (VERDICT r13 #1).

Runs the q106 training chain once in a session with the Spark event log
enabled, then parses the event log to split wall-clock into:

  - per-job in-flight time (submit -> job end: scheduling + task exec),
  - inter-job driver gaps (job end -> next submit: Python + Py4J +
    Catalyst analysis/optimization + AQE re-planning between stages),
  - pre-first-job lead-in per action.

Stdout: one attribution table per timed action plus a summary. This is a
measurement tool — it never touches declared-query code paths.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from exon_duckdb_spark.session import get_session  # noqa: E402


def parse_eventlog(log_dir: str) -> "list[dict]":
    """Job rows {job_id, submitted_ms, completed_ms, desc} from the single
    application event log under ``log_dir``."""
    files = [
        os.path.join(log_dir, f)
        for f in os.listdir(log_dir)
        if not f.startswith(".")
    ]
    assert len(files) == 1, files
    jobs: dict[int, dict] = {}
    with open(files[0]) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            k = ev.get("Event")
            if k == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                jobs[ev["Job ID"]] = {
                    "job_id": ev["Job ID"],
                    "submitted_ms": ev["Submission Time"],
                    "desc": props.get("spark.job.description", ""),
                    "n_stages": len(ev.get("Stage Infos", [])),
                }
            elif k == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["completed_ms"] = ev["Completion Time"]
    return [jobs[j] for j in sorted(jobs)]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_NO_TRACE", "1")
    os.environ.setdefault("SPARK_GRAFT_BENCH_CACHE", "1")
    log_dir = tempfile.mkdtemp(prefix="q106_eventlog_")
    spark = get_session(
        app_name="profile_q106",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
        },
    )
    sc = spark.sparkContext

    # warm: plan compile, Janino, Arrow workers, fixture build
    fn = getattr(entrymod, "q106_quality_classifier", None) or entrymod.queries()[
        "q106_quality_classifier"
    ]
    sc.setJobDescription("q106 warm")
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

    # timed, labeled
    marks = []
    for i in range(3):
        sc.setJobDescription(f"q106 timed pass {i}")
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        t1 = time.time()
        marks.append((f"pass {i}", t0, t1))
        print(f"q106 pass {i}: {t1 - t0:.3f}s", flush=True)
    sc.setJobDescription(None)
    spark.stop()

    jobs = parse_eventlog(log_dir)
    for label, t0, t1 in marks:
        sel = [
            j
            for j in jobs
            if "completed_ms" in j
            and j["submitted_ms"] >= t0 * 1000 - 50
            and j["completed_ms"] <= t1 * 1000 + 50
        ]
        if not sel:
            continue
        wall = t1 - t0
        inflight = sum(j["completed_ms"] - j["submitted_ms"] for j in sel) / 1000
        gaps = []
        for a, b in zip(sel, sel[1:]):
            gaps.append((b["submitted_ms"] - a["completed_ms"]) / 1000)
        lead = sel[0]["submitted_ms"] / 1000 - t0
        tail = t1 - sel[-1]["completed_ms"] / 1000
        print(f"\n== {label}: wall {wall:.3f}s, {len(sel)} jobs ==")
        print(
            f"  in-flight {inflight:.3f}s | inter-job gaps {sum(gaps):.3f}s "
            f"| lead-in {lead:.3f}s | tail {tail:.3f}s"
        )
        for j, g in zip(sel, gaps + [None]):
            dt = (j["completed_ms"] - j["submitted_ms"]) / 1000
            gtxt = f" gap-after {g:.3f}s" if g is not None else ""
            print(
                f"  job {j['job_id']:4d} {dt:7.3f}s stages={j['n_stages']}"
                f"{gtxt}  {j['desc'][:60]}"
            )
    print(f"\nevent log kept at {log_dir}")


if __name__ == "__main__":
    main()
