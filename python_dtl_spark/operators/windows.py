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


def resample_ffill(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    step_seconds: int,
    max_buckets: int = 1_000_000,
) -> DataFrame:
    """Resample each group's series onto a regular ``step_seconds``
    grid and forward-fill gaps — the hypertable `time_bucket_gapfill +
    locf` operation.

    Per (group, bucket) the LAST observation wins, chosen
    deterministically by (event time, ``tiebreak_col``) so engines
    agree on ties; missing buckets between a group's first and last
    observation are generated and filled with the most recent earlier
    value.  Output: group cols, ``bucket_start`` (timestamp), ``value``
    (forward-filled), ``observed`` (false for gap-filled rows).

    Values are moved, never recomputed — no float arithmetic — so the
    output is hash-exact across engines.

    Groups whose bucket span reaches ``max_buckets`` (a stray 1970
    timestamp would otherwise explode the gapfill grid to billions of
    rows) are NOT gap-filled but still emit every OBSERVED bucket —
    the guard degrades the grid, never the data.  Dropping the whole
    group (the pre-round-7 behavior) silently vanished real
    observations exactly when the input was dirty; any SQL oracle must
    mirror this clamp (the catalog one does).

    Scale shape: one hash aggregation to (group, bucket), a row-local
    ``sequence`` explode for the grid, and one window for the fill:
    the same single-shuffle pattern as sessionize, partitioned by
    group.
    """
    # exact bucket index: (us - us mod step) / step — the subtraction
    # is exact long arithmetic and the quotient (= whole seconds /
    # step) stays far below 2^53, so the double division is exact;
    # floor(long/long) directly would mis-bucket beyond 2^53 us (same
    # fix as ohlc_resample / cohort_retention)
    step_us = step_seconds * 1_000_000
    us = epoch_micros(F.col(ts_col))
    b = ((us - F.pmod(us, F.lit(step_us))) / F.lit(step_us)).cast("long")
    picked = F.max(
        F.struct(
            epoch_micros(F.col(ts_col)).alias("__t"),
            F.col(tiebreak_col).alias("__tb"),
            F.col(value_col).alias("__v"),
        )
    )
    buckets = (
        df.select(*group_cols, b.alias("__bucket"), F.col(ts_col), F.col(tiebreak_col), F.col(value_col))
        .groupBy(*group_cols, "__bucket")
        .agg(picked.alias("__pick"))
        .select(*group_cols, "__bucket", F.col("__pick.__v").alias("__obs"))
    )
    spans = buckets.groupBy(*group_cols).agg(
        F.min("__bucket").alias("__lo"), F.max("__bucket").alias("__hi")
    )
    guarded = spans.filter((F.col("__hi") - F.col("__lo")) < max_buckets)
    grid_filled = guarded.select(
        *group_cols,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("__bucket"),
    )
    # over-span groups: observed buckets only, no generated grid —
    # a left_semi against the (tiny) over-limit group list
    over = spans.filter((F.col("__hi") - F.col("__lo")) >= max_buckets).select(
        *group_cols
    )
    over_r = over.select(
        *[F.col(c).alias(f"__ov_{c}") for c in group_cols]
    )
    over_cond = None
    for c in group_cols:
        oc = F.col(c).eqNullSafe(F.col(f"__ov_{c}"))
        over_cond = oc if over_cond is None else over_cond & oc
    grid_observed = buckets.join(over_r, over_cond, how="left_semi").select(
        *group_cols, "__bucket"
    )
    grid = grid_filled.unionByName(grid_observed)
    # null-SAFE join back: groupBy keeps a NULL group key as a real
    # group (spans and grid are generated for it), but a plain
    # name-based equi-join can never match it — the NULL group's every
    # observation would silently emit as value=NULL/observed=false.
    # The buckets side renames first (same-lineage self-join).
    bk = buckets.select(
        *[F.col(c).alias(f"__bk_{c}") for c in group_cols],
        F.col("__bucket").alias("__bk_bucket"),
        "__obs",
    )
    cond = F.col("__bucket").eqNullSafe(F.col("__bk_bucket"))
    for c in group_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__bk_{c}"))
    joined = grid.join(bk, cond, how="left")
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        *group_cols,
        F.timestamp_micros(
            F.col("__bucket") * F.lit(step_seconds * 1_000_000)
        ).alias("bucket_start"),
        F.last("__obs", ignorenulls=True).over(w).alias("value"),
        F.col("__obs").isNotNull().alias("observed"),
    )


def ohlc_resample(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    step_seconds: int,
) -> DataFrame:
    """Open/high/low/close resampling — the classic financial bucket
    rollup, equally the "first/last reading per sensor per interval"
    verb for any time series: per (group, bucket) the first value,
    last value, min, max and count.

    First/last are chosen by (event time, ``tiebreak_col``) struct
    min/max — ``min_by``/``max_by`` leave ties engine-arbitrary, the
    silent nondeterminism that breaks replays; the struct ordering
    makes both engines pick the same row, so the output carries a full
    value oracle (replayed with row_number windows in SQL).

    Scale shape: ONE hash aggregation keyed (group, bucket), map-side
    partials for every field — the same single-shuffle shape as
    ``resample_ffill``'s bucket stage.
    """
    # bucket start in exact LONG microseconds (us - pmod(us, step) —
    # FLOOR semantics): floor(long/long) goes through double and
    # mis-buckets sentinel timestamps beyond 2^53 us.  Same form as
    # cohort_retention; the DuckDB oracle mirrors it with the explicit
    # positive-mod expression (DuckDB's // truncates toward zero, which
    # would diverge on pre-1970 timestamps)
    us = epoch_micros(F.col(ts_col))
    step_us = step_seconds * 1_000_000
    b = us - F.pmod(us, F.lit(step_us))
    tagged = F.struct(
        epoch_micros(F.col(ts_col)).alias("__t"),
        F.col(tiebreak_col).alias("__tb"),
        F.col(value_col).alias("__v"),
    )
    return (
        df.select(*group_cols, b.alias("__bucket"), tagged.alias("__s"),
                  F.col(value_col).alias("__v"))
        .groupBy(*group_cols, "__bucket")
        .agg(
            F.min("__s").getField("__v").alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.max("__s").getField("__v").alias("close"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            *group_cols,
            F.timestamp_micros(F.col("__bucket")).alias("bucket_start"),
            "open",
            "high",
            "low",
            "close",
            "n",
        )
    )
