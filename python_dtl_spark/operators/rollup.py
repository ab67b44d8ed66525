"""Hypertable-style time rollups: one fact stream aggregated at several
time granularities (the reference is strictly batch-relational and has
nothing comparable; this is an M6 pipeline extension).

Scale design: the raw input is scanned and shuffled ONCE, at the finest
grain; every coarser grain re-aggregates the (much smaller) next-finer
result.  Counts and sums compose exactly; averages are derived at the
end as sum/count, so they stay exact at every grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# strict containment chain — every grain's buckets nest inside the next
_GRAIN_CHAIN = ["minute", "hour", "day", "month", "year"]


def time_rollup(
    df: DataFrame,
    ts_col: str,
    dims: list[str],
    value_cols: list[str],
    grains: list[str],
) -> DataFrame:
    """Aggregate ``value_cols`` (count + sum + derived avg) per
    ``dims`` at each time grain in ``grains``.

    Output: (grain, bucket_start, *dims, n_rows, sum_<v>..., avg_<v>...)
    with one row-group per grain level, stacked.

    ``grains`` must come from minute/hour/day/month/year (a strict
    nesting chain — weeks don't nest in months and are deliberately
    excluded).  Order given doesn't matter; aggregation always runs
    finest → coarsest.
    """
    bad = [g for g in grains if g not in _GRAIN_CHAIN]
    if bad:
        raise ValueError(f"unsupported grains {bad}; pick from {_GRAIN_CHAIN}")
    ordered = sorted(set(grains), key=_GRAIN_CHAIN.index)

    finest = ordered[0]
    fine = (
        df.groupBy(
            F.date_trunc(finest, F.col(ts_col)).alias("bucket_start"),
            *[F.col(d) for d in dims],
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[F.sum(v).alias(f"sum_{v}") for v in value_cols],
        )
    )
    levels = {finest: fine}
    prev = fine
    for grain in ordered[1:]:
        prev = (
            prev.groupBy(
                F.date_trunc(grain, F.col("bucket_start")).alias("bucket_start"),
                *[F.col(d) for d in dims],
            )
            .agg(
                F.sum("n_rows").alias("n_rows"),
                *[F.sum(f"sum_{v}").alias(f"sum_{v}") for v in value_cols],
            )
        )
        levels[grain] = prev

    out = None
    for grain in ordered:
        level = levels[grain].select(
            F.lit(grain).alias("grain"),
            "bucket_start",
            *dims,
            "n_rows",
            *[F.col(f"sum_{v}") for v in value_cols],
            *[
                (F.col(f"sum_{v}") / F.col("n_rows")).alias(f"avg_{v}")
                for v in value_cols
            ],
        )
        out = level if out is None else out.unionByName(level)
    return out
