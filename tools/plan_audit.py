"""Physical-plan audit over every headline bench query → PLAN_AUDIT.json.

Institutionalizes the ".explain and iterate" loop as a per-round artifact:
for each query in bench.py's HEADLINE list, record the plan facts that
decide 100 TB behavior —

  - join strategies Catalyst picked (broadcast vs sort-merge vs the two
    failure modes, nested-loop and cartesian),
  - exchange (shuffle) count,
  - whole-stage-codegen span count (how much stays JVM-compiled),
  - Python/Arrow eval operators (the deliberate UDF stages),
  - pushed filters and scan schemas (pushdown + pruning reached parquet),

plus an ``attention`` list naming any query whose plan contains a
cartesian product — the shape that does not survive a 100× scale-up.
BroadcastNestedLoopJoin sites are reported separately (``bnlj_sites``)
rather than failing the audit: in this repo every BNLJ is a DELIBERATE
bounded-broadcast pattern (a 1-row stats frame or a k-row query set
cross-joined into the corpus — the no-shuffle alternative to a
driver-side collect), which is scale-correct because the broadcast side
is bounded by construction; the list exists so a reviewer can eyeball
that each new site still is. Run:

    python tools/plan_audit.py [sf_dir] [out.json]

Plan SHAPE is scale-independent for these queries (no AQE re-plan is
captured — this inspects the compile-time physical plan), so the audit
runs at sf0.001 in seconds. Queries that eagerly materialize (index
builds, checkpoint-backed operators) execute at that SF as part of
building their frame; that is the cost of auditing their REAL plan.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, make_lookup
from exon_duckdb_spark.plans import explain_formatted
from exon_duckdb_spark.session import get_session


def audit_one(df) -> dict:
    import re

    full = explain_formatted(df)
    # An EXECUTED adaptive plan prints two subtrees (Final then Initial)
    # followed by one detail block per unique node id. Operator counts
    # (joins / exchanges / python stages) must come from the FINAL tree
    # only — the initial tree repeats every operator and can carry the
    # pre-AQE join strategy; per-node facts (codegen ids, PushedFilters,
    # ReadSchema) come from the detail blocks, which are node-unique
    # (shared nodes print once) so they never double-count.
    m_final = full.find("+- == Final Plan ==")
    m_init = full.find("+- == Initial Plan ==")
    if 0 <= m_final < m_init:
        tree = full[m_final:m_init]
        dm = re.search(r"\n\n\(\d+\) ", full[m_init:])
        details = full[m_init + dm.start():] if dm else ""
    else:
        tree = details = full
    joins = {
        k: len(re.findall(k, tree))
        for k in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                  "BroadcastNestedLoopJoin", "CartesianProduct")
    }
    # depth-aware comma split (filter strings contain commas), same rule
    # as exon_duckdb_spark.plans.pushed_filters
    n_pushed = 0
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", details):
        depth, cur = 0, ""
        for ch in m.group(1):
            if ch == "," and depth == 0:
                n_pushed += bool(cur.strip())
                cur = ""
                continue
            depth += ch == "("
            depth -= ch == ")"
            cur += ch
        n_pushed += bool(cur.strip())
    return {
        "joins": {k: v for k, v in joins.items() if v},
        "exchanges": len(re.findall(r"Exchange \(", tree)),
        "codegen_spans": len(set(re.findall(r"codegen id : (\d+)", details))),
        "python_eval_ops": sum(
            tree.count(op)
            for op in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                       "FlatMapGroupsInPandas", "PythonMapInArrow",
                       "MapInArrow")
        ),
        "pushed_filters": n_pushed,
        "scans": len(re.findall(r"ReadSchema: ", details)),
        "cartesian": joins.get("CartesianProduct", 0) > 0,
        "bnlj": joins.get("BroadcastNestedLoopJoin", 0) > 0,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLAN_AUDIT.json",
    )
    spark = get_session(app_name="plan_audit")
    lookup = make_lookup()
    report: dict = {
        "sf_dir": sf_dir, "queries": {}, "attention": [], "bnlj_sites": [],
    }
    for name in HEADLINE:
        try:
            df = lookup(name)(spark, sf_dir)
            # execute THE FRAME'S OWN queryExecution first (collect, not
            # a noop write — a write wraps the plan in a fresh execution
            # and leaves df's untouched): with AQE on, the pre-execution
            # plan is the INITIAL adaptive plan — codegen ids and the
            # actually-chosen join strategies only appear on the final
            # plan. Row volume is audit-SF-sized.
            df.collect()
            row = audit_one(df)
        except Exception as e:  # a broken query must be visible, not skipped
            row = {"error": str(e).splitlines()[0][:200]}
        report["queries"][name] = row
        if row.get("cartesian"):
            report["attention"].append(name)
        if row.get("bnlj"):
            report["bnlj_sites"].append(name)
        spark.catalog.clearCache()
        print(f"{name}: {json.dumps(row)}")
    n_bad = len(report["attention"])
    report["summary"] = {
        "n_queries": len(HEADLINE),
        "n_attention": n_bad,
        "n_bnlj_sites": len(report["bnlj_sites"]),
        "total_exchanges": sum(
            q.get("exchanges", 0) for q in report["queries"].values()
        ),
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nwrote {out_path}: {len(HEADLINE)} queries, {n_bad} attention")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
