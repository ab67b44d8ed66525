"""Window-function operators (extensions; the reference has no window
surface at all — SURVEY.md §2.5).

These wrap the canonical Spark window patterns with deterministic
tie-breaking so results are oracle-checkable.  Scale shape: a window
partitioned by the group key is one shuffle; within-partition sort is
spillable.  None of them collect to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    n: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-``n`` rows per group under ``order_cols`` (pass explicit
    ``F.desc``/``F.asc`` columns, including a unique tie-breaker for
    determinism).  Adds ``rank_col`` (1-based)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
    )


def running_total(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    value_col: str,
    out_col: str = "running_total",
) -> DataFrame:
    """Cumulative sum of ``value_col`` per group in ``order_cols`` order."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col, F.sum(value_col).over(w))


def event_deltas(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    out_col: str = "delta_seconds",
) -> DataFrame:
    """Seconds since the previous row per group in ``ts_col`` order
    (null for each group's first row) — the inter-arrival feature used
    for churn/engagement analysis and session-gap tuning.  One shuffle
    on the group key."""
    w = Window.partitionBy(*group_cols).orderBy(F.col(ts_col))
    prev = F.lag(F.col(ts_col)).over(w)
    return df.withColumn(
        out_col,
        F.col(ts_col).cast("double") - prev.cast("double"),
    )
