"""Skew-aware join utilities.

First line of defense is AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on by default in
``session.get_spark``), which splits oversized partitions at runtime.
Manual salting remains necessary when a single *key* (not partition) is
hot enough that one task would still receive it whole — e.g. a null-ish
default key holding 10% of 100 TB.  The reference engine has no join
strategy at all (always a full cross product, eval.py:163-184).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_dtl_spark.operators.timeutil import numeric_axis

SALT_COL = "__dtl_salt"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
    allow_global: bool = False,
) -> DataFrame:
    """As-of join: each left row picks the nearest right row at or
    before (``backward``) / at or after (``forward``) its ``on`` value,
    within the same ``by`` group.

    Spark-first shape — union + running window, NOT a range join: tag
    both sides, union them, sort within each ``by`` partition by
    (``on``, side) and carry the latest right payload forward with
    ``last(ignorenulls)`` (resp. ``first`` over the following frame).
    One shuffle on the ``by`` key, linear work per partition, no
    candidate-pair explosion — the range-join formulation Spark would
    otherwise pick degenerates to a per-key cross product at scale.

    Rows of ``right`` sharing an (``by``, ``on``) value are not ordered
    relative to each other; pre-deduplicate the right side if that
    matters.  Output: all left columns, plus each of ``value_cols`` and
    the matched right ``on`` value (both suffixed on collision); rows
    with no match keep nulls.  ``tolerance_seconds`` nulls out matches
    further than that many seconds (timestamp ``on``) or units (numeric
    ``on``) away.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, not {direction!r}")
    by_cols = [by] if isinstance(by, str) else list(by or [])
    if not by_cols and not allow_global:
        # An empty `by` makes the running window a single global
        # partition — every row through one task.  Fine for small
        # inputs, a silent serialization at scale, so it must be
        # explicitly requested.
        raise ValueError(
            "asof_join with by=None sorts everything in ONE partition; "
            "pass by=<key column(s)> or allow_global=True for small inputs"
        )
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in by_cols and c != on
        ]
    l_tagged = left.select(
        *[F.col(c).alias(f"__by_{c}") for c in by_cols],
        F.col(on).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    # NULL `on` on the right is a row with no position on the axis: the
    # window orders ASC NULLS FIRST, so such a row would sort before
    # every real row and last(ignorenulls) would hand its payload to
    # any left row with no genuine earlier match — a spurious match
    # from a dirty timestamp.  (A NULL left `on` sorts first too, sees
    # no prior right row, and correctly emits no match.)
    r_tagged = right.filter(F.col(on).isNotNull()).select(
        *[F.col(c).alias(f"__by_{c}") for c in by_cols],
        F.col(on).alias("__ts"),
        F.lit(0 if direction == "backward" else 2).alias("__side"),
        F.struct(
            F.col(on).alias("__on"), *[F.col(c) for c in value_cols]
        ).alias("__r"),
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    base = Window.partitionBy(*[f"__by_{c}" for c in by_cols]).orderBy(
        "__ts", "__side"
    )
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, 0)
        matched = F.last("__r", ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(0, Window.unboundedFollowing)
        matched = F.first("__r", ignorenulls=True).over(w)
    out = u.withColumn("__m", matched).filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        # __ts / __m.__on are staged copies of `on`, so they dispatch on
        # the left schema's dtype (timeutil.numeric_axis).
        on_type = left.schema[on].dataType
        ts_l = numeric_axis(on_type, F.col("__ts"))
        ts_r = numeric_axis(on_type, F.col("__m.__on"))
        dist = (ts_l - ts_r) if direction == "backward" else (ts_r - ts_l)
        out = out.withColumn(
            "__m", F.when(dist <= tolerance_seconds, F.col("__m"))
        )
    taken = set(left.columns)

    def _out_name(c: str) -> str:
        return c + suffix if c in taken else c

    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        F.col("__m.__on").alias(_out_name(on)),
        *[F.col(f"__m.{c}").alias(_out_name(c)) for c in value_cols],
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the left (skewed/large) side salted ``salt`` ways.

    The left side gets a deterministic per-row salt — xxhash64 of the
    whole row, the seed, AND ``monotonically_increasing_id()``, mod
    ``salt``.  The row hash alone would send full-duplicate rows of a
    hot key (common in logs) to one reducer, recreating the straggler;
    the monotonic id spreads duplicates while staying reproducible on
    task retry whenever the upstream partitioning is deterministic (a
    scan, a shuffle with fixed keys) — the case where F.rand would
    still re-roll.  For a nondeterministically-ordered upstream no
    per-row salt can be retry-stable; persist/checkpoint the input
    first.  The right side is replicated once per salt value (array +
    explode — no driver loop, no crossJoin).  Output columns match
    ``left.join(right, on, how)``.

    Cost model: right side is duplicated ``salt``× through the shuffle —
    use for large-left × modest-right joins where one left key
    dominates; for genuinely small right sides just broadcast instead.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, not {how!r} "
            "(right/full-outer would need the salt on the other side)"
        )
    left_s = left.withColumn(
        SALT_COL,
        F.pmod(
            F.xxhash64(
                F.lit(seed),
                F.monotonically_increasing_id(),
                *[F.col(c) for c in left.columns],
            ),
            F.lit(salt),
        ).cast("int"),
    )
    right_s = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = left_s.join(right_s, on=on + [SALT_COL], how=how)
    return out.drop(SALT_COL)


def range_join_point_in_interval(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: str | list[str] | None = None,
    bucket_seconds: int = 3600,
    max_buckets_per_interval: int = 100_000,
) -> DataFrame:
    """Join each point row to every interval row containing it
    (``start <= point <= end``), optionally within ``by`` groups.

    Spark-first shape: Catalyst turns a bare range predicate into a
    (per-key) BroadcastNestedLoopJoin — quadratic at scale.  Instead,
    bucketize time: each interval explodes to the ``bucket_seconds``-wide
    buckets it overlaps, each point maps to exactly one bucket, and the
    join becomes an equi-join on (by, bucket) followed by the exact
    containment filter.  Shuffle cost scales with interval length /
    bucket width, so pick a bucket near the typical interval length.
    Each (point, interval) pair meets in exactly one bucket (the
    point's), so no dedup pass is needed.

    Point/start/end may be timestamps or numerics (epoch-seconds are
    used for timestamps).  Output: all point columns + all interval
    columns (collisions suffixed ``_ivl``).

    ``max_buckets_per_interval`` fails the job LOUDLY (execution-time
    ``raise_error``) when one interval would explode into more than
    that many buckets — a single dirty row (stray 1970 start, year-9999
    end) would otherwise generate millions-to-billions of bucket rows
    and OOM an executor.  Unlike ``resample_ffill``'s degrade-the-grid
    guard, silently skipping an interval here would silently DROP
    matches, so the correct response is an error naming the fix
    (clean the row, or widen ``bucket_seconds``).
    """
    by_cols = [by] if isinstance(by, str) else list(by or [])

    def _epoch(df, c):
        return numeric_axis(df.schema[c].dataType, F.col(c))

    p = points.select(
        *[F.col(c).alias(f"__by_{c}") for c in by_cols],
        F.floor(_epoch(points, point_col) / bucket_seconds).alias("__bucket"),
        F.struct(*[F.col(c) for c in points.columns]).alias("__p"),
    )
    lo_b = F.floor(_epoch(intervals, start_col) / bucket_seconds)
    hi_b = F.floor(_epoch(intervals, end_col) / bucket_seconds)
    n_b = hi_b - lo_b + 1
    guarded_hi = F.when(n_b <= max_buckets_per_interval, hi_b).otherwise(
        F.raise_error(
            F.concat(
                F.lit("range_join_point_in_interval: one interval spans "),
                n_b.cast("string"),
                F.lit(
                    f" buckets (> max_buckets_per_interval="
                    f"{max_buckets_per_interval}) at bucket_seconds="
                    f"{bucket_seconds}; clean the interval or widen "
                    "bucket_seconds"
                ),
            )
        )
    )
    i = intervals.select(
        *[F.col(c).alias(f"__by_{c}") for c in by_cols],
        F.explode(F.sequence(lo_b, guarded_hi)).alias("__bucket"),
        F.struct(*[F.col(c) for c in intervals.columns]).alias("__i"),
    )
    joined = p.join(i, on=[f"__by_{c}" for c in by_cols] + ["__bucket"]).filter(
        (F.col(f"__p.{point_col}") >= F.col(f"__i.{start_col}"))
        & (F.col(f"__p.{point_col}") <= F.col(f"__i.{end_col}"))
    )
    taken = set(points.columns)

    def _out(c: str) -> str:
        return c + "_ivl" if c in taken else c

    return joined.select(
        *[F.col(f"__p.{c}").alias(c) for c in points.columns],
        *[F.col(f"__i.{c}").alias(_out(c)) for c in intervals.columns],
    )
