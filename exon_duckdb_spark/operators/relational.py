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

__all__ = ["sessionize", "top_k_per_group"]


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
