"""Deterministic sampling / dataset-split operators for training-data
pipelines (M6 extensions; the reference has no sampling surface).

Everything here is *hash-deterministic*, not RNG-based: membership
depends only on the key value and the seed string, never on partition
layout, task retries, or row order.  That property is what makes a
100 TB pipeline reproducible — re-running a failed stage or adding
executors cannot change which rows land in the training set.  It also
makes every operator exactly reproducible in ANSI SQL (md5 is shared
with DuckDB), so the driver can hash-check them.

Keys should be stable identifiers (ints / strings).  Floats are
rejected: their string rendering differs across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 10_000


def hash_bucket(key: Column, seed: str = "") -> Column:
    """Uniform bucket in [0, 10000) from md5(seed || key).

    First 8 hex chars → 32-bit int → mod 10000; the 2^32/10000 bias is
    ~1e-5 relative, irrelevant for sampling."""
    h = F.md5(F.concat(F.lit(seed), key.cast("string")).cast("binary"))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _BUCKETS).alias(
        "bucket"
    )


def hash_bucket_sql(key_expr: str, seed: str = "") -> str:
    """The DuckDB-equivalent expression for :func:`hash_bucket`."""
    return (
        f"(('0x' || substr(md5('{seed}' || CAST({key_expr} AS VARCHAR)), 1, 8))"
        f"::BIGINT % {_BUCKETS})"
    )


def _check_key_type(df: DataFrame, key_col: str) -> None:
    kind = dict(df.dtypes)[key_col]
    if kind in ("float", "double"):
        raise ValueError(
            f"hash-deterministic sampling needs a stable key; {key_col!r} "
            f"is {kind} (float rendering is engine-dependent)"
        )


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    seed: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split (train/val/test/...) by hashed
    key.  ``splits`` maps name → weight; weights are normalized.  Order
    of dict insertion defines the bucket ranges, so the same dict always
    produces the same assignment."""
    _check_key_type(df, key_col)
    total = sum(splits.values())
    expr = None
    acc = 0.0
    b = hash_bucket(F.col(key_col), seed)
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name] / total
        cond = b < int(acc * _BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn(split_col, expr)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, seed: str = ""
) -> DataFrame:
    """Keep a hash-deterministic ``fraction`` of rows by key."""
    _check_key_type(df, key_col)
    return df.filter(
        hash_bucket(F.col(key_col), seed) < int(fraction * _BUCKETS)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep ``fractions[stratum]``
    of each stratum's rows (``default_fraction`` for unlisted strata).
    Unlike ``df.sampleBy`` this is exact-by-key and reproducible across
    engines and retries."""
    _check_key_type(df, key_col)
    b = hash_bucket(F.col(key_col), seed)
    thresh = None
    for value, frac in fractions.items():
        cond = F.col(strata_col) == value
        lim = F.lit(int(frac * _BUCKETS))
        thresh = F.when(cond, lim) if thresh is None else thresh.when(cond, lim)
    thresh = (
        F.lit(int(default_fraction * _BUCKETS))
        if thresh is None
        else thresh.otherwise(int(default_fraction * _BUCKETS))
    )
    return df.filter(b < thresh)
