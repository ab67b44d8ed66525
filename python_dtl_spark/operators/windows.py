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

from python_dtl_spark.operators.timeutil import as_number, epoch_micros


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


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Batch sessionization (gaps-and-islands): group each key's events
    into sessions separated by more than ``gap_minutes`` of inactivity,
    and aggregate one row per session.

    The batch complement of the streaming session windows in
    ``python_dtl_spark.streaming.session_windows`` (which uses
    ``F.session_window`` + watermark): a lag-gap flag followed by a
    cumulative sum numbers the islands.  Session boundaries depend only
    on each key's sorted multiset of timestamps — equal timestamps have
    gap 0 and can never open a session — so the output is deterministic
    and oracle-checkable even when timestamp ties make the underlying
    row order ambiguous.

    Scale shape: one shuffle on ``key_col``; both windows share that
    partitioning (a single Exchange in the plan) and the within-key
    sort is spillable.  Output: key, session_seq (1-based per key),
    session_start, session_end, n_events.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col))
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev.isNull()
        | (epoch_micros(F.col(ts_col)) - epoch_micros(prev) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    wc = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("__new", new_session)
        .withColumn("session_seq", F.sum("__new").over(wc))
        .groupBy(key_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def event_deltas(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    out_col: str = "delta_seconds",
) -> DataFrame:
    """Seconds since the previous row per group in ``ts_col`` order
    (null for each group's first row) — the inter-arrival feature used
    for churn/engagement analysis and session-gap tuning.  ``ts_col``
    may be a timestamp/date (delta in fractional seconds) or a numeric
    axis (delta in its own units), dispatched via ``timeutil.as_number``
    like the as-of/range joins.  One shuffle on the group key."""
    w = Window.partitionBy(*group_cols).orderBy(F.col(ts_col))
    staged = df.withColumn("__ts_num", as_number(df, ts_col))
    prev = F.lag(F.col("__ts_num")).over(w)
    return staged.withColumn(
        out_col, F.col("__ts_num") - prev
    ).drop("__ts_num")
