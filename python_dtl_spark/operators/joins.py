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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__dtl_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the left (skewed/large) side salted ``salt`` ways.

    The left side gets a uniform random salt per row; the right side is
    replicated once per salt value (array + explode — no driver loop,
    no crossJoin).  The hot key's rows then land on ``salt`` different
    reducers instead of one.  Output columns match ``left.join(right,
    on, how)``.

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
        SALT_COL, F.floor(F.rand(seed) * salt).cast("int")
    )
    right_s = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = left_s.join(right_s, on=on + [SALT_COL], how=how)
    return out.drop(SALT_COL)
