"""Event-analytics operators: ordered funnels and cohort retention.

Both are built from aggregations and joins keyed on the user column, so
every shuffle in a chain shares one partitioning (Catalyst reuses the
exchange) — and both are exactly replayable in ANSI SQL, so they carry
full value oracles like the rest of the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_dtl_spark.operators.timeutil import epoch_micros


def funnel_conversion(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered funnel: per user, the earliest time each step was
    reached IN ORDER — step i counts only strictly after the user's
    step i-1 time (and within ``within_seconds`` of it, if given).
    The product-analytics conversion query (view → click → purchase).

    Earliest-qualifying-event times make the result deterministic under
    event-time ties (min is order-free), so the SQL oracle replays it
    exactly.

    Output: user col, ``t_<step>`` epoch-microsecond columns (NULL once
    a step is missed — later steps of a broken chain stay NULL), and
    ``steps_completed``.

    Scale shape: one aggregation per step plus a join back, every one
    keyed on the user column — Catalyst reuses the single hash
    partitioning across the whole chain, so a k-step funnel is one
    logical shuffle of the events, k times filtered.  No window over
    the full event stream, no per-user event collection.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        # each step names a t_<step> output column; a repeated step
        # (re-engagement funnels) would alias the same column twice and
        # crash with AMBIGUOUS_REFERENCE deep in the join chain
        raise ValueError(
            f"funnel steps must be unique, got {steps}; model repeated "
            "steps with distinct labels and a derived type column"
        )
    us = F.col(user_col)
    ev = df.select(
        us, F.col(type_col).alias("__t"), epoch_micros(F.col(ts_col)).alias("__us")
    )
    cur = ev.filter(F.col("__t") == steps[0]).groupBy(user_col).agg(
        F.min("__us").alias(f"t_{steps[0]}")
    )
    for i, step in enumerate(steps[1:], start=1):
        prev = f"t_{steps[i - 1]}"
        cand = ev.filter(F.col("__t") == step).join(
            cur.select(user_col, prev), on=user_col, how="inner"
        )
        cond = F.col("__us") > F.col(prev)
        if within_seconds is not None:
            cond = cond & (
                F.col("__us") - F.col(prev) <= within_seconds * 1_000_000
            )
        reached = (
            cand.filter(cond)
            .groupBy(user_col)
            .agg(F.min("__us").alias(f"t_{step}"))
        )
        cur = cur.join(reached, on=user_col, how="left")
    step_cols = [F.col(f"t_{s}") for s in steps]
    completed = sum(
        (s.isNotNull().cast("long") for s in step_cols), F.lit(0).cast("long")
    )
    return cur.select(
        user_col, *[f"t_{s}" for s in steps], completed.alias("steps_completed")
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """Cohort retention: users grouped by first-seen period, counted in
    each later period they were active — the "of the users who arrived
    in week 0, how many came back in week k" table behind every
    retention curve.

    Output: cohort_start (timestamp of the cohort's period), offset
    (periods since the cohort period), n_users (distinct active users
    of that cohort in that period), cohort_size, retention
    (n_users / cohort_size — exact long division, hash-stable).

    Scale shape: a distinct over (user, period) with map-side partials,
    a min-aggregate for the cohort, one join on the user column, and a
    final count keyed (cohort, offset) — a plain count, not a
    count-distinct: the input is already distinct (user, period) pairs
    and the cohort is functionally determined by the user, so every
    row in a (cohort, offset) group carries a unique user.  Cohort
    sizes ride a broadcast (#cohorts rows).
    """
    step_us = period_seconds * 1_000_000
    us = epoch_micros(F.col(ts_col))
    # period start in exact LONG microseconds (us - us mod step) —
    # float division (floor(long/long) goes through double) would
    # mis-bucket sentinel timestamps beyond 2^53 us; long subtraction
    # cannot.  Offsets divide an exact step-multiple difference, which
    # stays under 2^53 for any sane retention horizon.
    p = us - F.pmod(us, F.lit(step_us))
    active = df.select(F.col(user_col), p.alias("__p")).distinct()
    first = active.groupBy(user_col).agg(F.min("__p").alias("__cohort"))
    sizes = first.groupBy("__cohort").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    joined = active.join(first, on=user_col)
    counts = joined.groupBy(
        "__cohort",
        ((F.col("__p") - F.col("__cohort")) / F.lit(step_us))
        .cast("long")
        .alias("offset"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    return (
        counts.join(F.broadcast(sizes), on="__cohort")
        .select(
            F.timestamp_micros(F.col("__cohort")).alias("cohort_start"),
            "offset",
            "n_users",
            "cohort_size",
            (F.col("n_users") / F.col("cohort_size")).alias("retention"),
        )
    )
