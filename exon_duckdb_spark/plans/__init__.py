"""Plan inspection helpers — the ".explain and iterate" loop as functions.

These make the scale guarantees checkable in code and CI (used by
tests/test_plans.py): pushed filters, pruned read schemas, and the join
strategies Catalyst actually picked.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "explain_formatted",
    "pushed_filters",
    "read_schemas",
    "join_strategies",
    "assert_no_cartesian",
]


def explain_formatted(df: DataFrame) -> str:
    """The formatted plan as a string (what ``df.explain('formatted')``
    prints)."""
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters entry across the plan's scans. Splits on commas
    at paren depth 0 only — filter strings contain commas themselves."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", explain_formatted(df)):
        depth, cur = 0, ""
        for ch in m.group(1):
            if ch == "," and depth == 0:
                if cur.strip():
                    out.append(cur.strip())
                cur = ""
                continue
            depth += ch == "("
            depth -= ch == ")"
            cur += ch
        if cur.strip():
            out.append(cur.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — verify column pruning reached the source."""
    return re.findall(r"ReadSchema: (.*)", explain_formatted(df))


def join_strategies(df: DataFrame) -> dict[str, int]:
    """Counts of join operators by physical strategy."""
    p = explain_formatted(df)
    return {
        k: len(re.findall(k, p))
        for k in (
            "BroadcastHashJoin",
            "SortMergeJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
            "CartesianProduct",
        )
    }


def assert_no_cartesian(df: DataFrame) -> None:
    """Raise if the plan contains an unbounded cross product — the failure
    mode that turns a 100 TB join into heat death."""
    s = join_strategies(df)
    if s["CartesianProduct"]:
        raise AssertionError(f"plan contains CartesianProduct:\n{explain_formatted(df)}")
