"""Hypertable-style time rollups: one fact stream aggregated at several
time granularities (the reference is strictly batch-relational and has
nothing comparable; this is an M6 pipeline extension).

Scale design: the raw input is scanned and shuffled ONCE, at the finest
grain; every coarser grain re-aggregates the (much smaller) next-finer
result.  Counts, sums and per-column non-null counts compose exactly;
averages are derived at the end as sum / non-null count, so they equal
SQL ``AVG`` at every grain (NULL values stay out of the denominator —
dividing by ``n_rows`` would silently deflate the average of any column
with NULLs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# strict containment chain — every grain's buckets nest inside the next
_GRAIN_CHAIN = ["minute", "hour", "day", "month", "year"]


def _qcol(name: str):
    """Column reference with dots/backticks in the NAME treated
    literally (F.col and df[...] both parse dots as struct access)."""
    return F.col("`" + name.replace("`", "``") + "`")


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
    with one row-group per grain level, stacked.  ``avg_<v>`` is SQL
    AVG: sum over the count of NON-NULL values (NULL when a group has
    none).

    ``grains`` must come from minute/hour/day/month/year (a strict
    nesting chain — weeks don't nest in months and are deliberately
    excluded).  Order given doesn't matter; aggregation always runs
    finest → coarsest.

    Internal aggregate columns are index-named (``__s0`` …), so value
    columns whose names contain dots or backticks work unchanged; only
    the OUTPUT aliases carry the user's names.
    """
    bad = [g for g in grains if g not in _GRAIN_CHAIN]
    if bad:
        raise ValueError(f"unsupported grains {bad}; pick from {_GRAIN_CHAIN}")
    if not grains:
        raise ValueError(f"grains must not be empty; pick from {_GRAIN_CHAIN}")
    ordered = sorted(set(grains), key=_GRAIN_CHAIN.index)

    idx = list(range(len(value_cols)))
    finest = ordered[0]
    fine = (
        df.groupBy(
            F.date_trunc(finest, F.col(ts_col)).alias("bucket_start"),
            *[F.col(d) for d in dims],
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[F.sum(_qcol(v)).alias(f"__s{i}") for i, v in zip(idx, value_cols)],
            # per-column non-null counts: the exact-composability carrier
            # for SQL-AVG semantics at every grain
            *[F.count(_qcol(v)).alias(f"__c{i}") for i, v in zip(idx, value_cols)],
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
                *[F.sum(f"__s{i}").alias(f"__s{i}") for i in idx],
                *[F.sum(f"__c{i}").alias(f"__c{i}") for i in idx],
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
            *[F.col(f"__s{i}").alias(f"sum_{v}") for i, v in zip(idx, value_cols)],
            *[
                (F.col(f"__s{i}") / F.col(f"__c{i}")).alias(f"avg_{v}")
                for i, v in zip(idx, value_cols)
            ],
        )
        out = level if out is None else out.unionByName(level)
    return out


def dimensional_cube(
    df: DataFrame,
    dims: list[str],
    value_cols: list[str],
) -> DataFrame:
    """All-subtotals aggregation over categorical dimensions: one pass
    producing every 2^len(dims) grouping combination (GROUP BY CUBE) —
    the dimensional sibling of :func:`time_rollup`'s time-grain chain.

    Output: (*dims, gid, n_rows, sum_<v>..., avg_<v>...) where ``gid``
    is the SQL-standard GROUPING_ID bitmask (first dim = most
    significant bit; a set bit means that dim is rolled up in the row)
    — it disambiguates a rolled-up dim from a genuine NULL dimension
    value, which both print as NULL.  ``avg_<v>`` is SQL AVG (sum over
    non-null count) at every grouping level, same as time_rollup.

    Plan shape: Spark expands the cube with an Expand node feeding ONE
    partial+final hash aggregate — every subtotal level shares a single
    shuffle, against 2^d separate scans for the hand-written union.
    Row multiplication is 2^len(dims) at the MAP side (pre-combine);
    keep dims few (the usual 2-4) at 100 TB.
    """
    if not dims:
        raise ValueError("dims must name at least one dimension")
    idx = list(range(len(value_cols)))
    agged = df.cube(*[F.col(d) for d in dims]).agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(_qcol(v)).alias(f"__s{i}") for i, v in zip(idx, value_cols)],
        *[F.count(_qcol(v)).alias(f"__c{i}") for i, v in zip(idx, value_cols)],
    )
    return agged.select(
        *dims,
        "gid",
        "n_rows",
        *[F.col(f"__s{i}").alias(f"sum_{v}") for i, v in zip(idx, value_cols)],
        *[
            (F.col(f"__s{i}") / F.col(f"__c{i}")).alias(f"avg_{v}")
            for i, v in zip(idx, value_cols)
        ],
    )
