"""Embedding-column utilities: L2 normalization and int8 quantization.

Both are row-local array transforms built purely from
``pyspark.sql.functions`` higher-order functions — no shuffle, no
Python, embarrassingly parallel at any scale.  Quantization is the
standard ANN memory-footprint move: 64 float32 components become 64
bytes plus one float scale (4x smaller, dot products stay monotone
enough for re-ranked retrieval).

Float determinism note (measured, not assumed): Spark's sequential
``aggregate`` fold over a cast-to-double array produces bit-identical
sums to DuckDB's ``list_sum``, so norms and normalized components are
exactly comparable across engines without rounding tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_normalize(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "embedding_unit",
    norm_col: str = "l2_norm",
) -> DataFrame:
    """Unit-normalize each embedding; keeps the norm alongside.

    Zero vectors stay zero (norm 0 emits a zero vector, not NULL/NaN),
    so downstream cosine code can treat the output uniformly.
    """
    norm = F.sqrt(_dot(F.col(vec_col), F.col(vec_col)))
    unit = F.when(norm == 0.0, F.transform(F.col(vec_col), lambda x: F.lit(0.0))).otherwise(
        F.transform(F.col(vec_col), lambda x: x.cast("double") / norm)
    )
    return df.withColumn(norm_col, norm).withColumn(out_col, unit)


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "embedding_q8",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: q = round(x * 127 /
    max|x|), stored with the dequantization scale (max|x| / 127).

    Per-vector scaling needs no global statistics pass — the operator
    stays a pure row-local map at 100 TB.  A zero vector quantizes to
    zeros with scale 0.
    """
    max_abs = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))
    q = F.when(
        max_abs == 0.0,
        F.transform(F.col(vec_col), lambda x: F.lit(0).cast("int")),
    ).otherwise(
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * F.lit(127.0) / max_abs, 0).cast("int"),
        )
    )
    scale = F.when(max_abs == 0.0, F.lit(0.0)).otherwise(max_abs / F.lit(127.0))
    return df.withColumn(out_col, q).withColumn(scale_col, scale)


def random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "embedding_rp",
    dim: int = 64,
    out_dim: int = 16,
    seed: int = 7,
) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction with a seeded
    Rademacher (±1/√out_dim) matrix (Achlioptas 2003, "Database-friendly
    random projections") — the standard cheap projection before ANN
    when the embedding dimension is larger than the search needs.

    The matrix is generated driver-side from ``seed`` and compiled into
    the plan as literals (out_dim × dim doubles — a few KB), so the
    operator is a pure row-local map: no shuffle, no Python, no model
    state.  ±1-scaled entries keep every product exact in double, and
    the sequential ``aggregate`` fold is bit-identical to DuckDB's
    ``list_dot_product``, so projections are hash-exact cross-engine.

    A vector whose size disagrees with ``dim`` raises at execution
    time (same guard as the LSH/IVF paths): ``zip_with`` would
    otherwise NULL-pad and every projected component would silently
    come out NULL, degrading any downstream ranking with no error.
    """
    from python_dtl_spark.operators.similarity import _checked_dim

    rows = projection_matrix(dim, out_dim, seed)
    # pick a staging name absent from the input: withColumn would
    # silently OVERWRITE (and the trailing drop delete) a caller
    # column that happens to be named the same
    stage = "__rp_in"
    while stage in df.columns:
        stage += "_"
    df = df.withColumn(stage, _checked_dim(F.col(vec_col), dim))
    # The whole projection is ONE F.expr SQL string rather than
    # out_dim × dim Column-API literal calls: building the expression
    # tree through the Python↔JVM bridge dominated the operator's wall
    # time (~3.5 s of driver-side construction per call at out_dim 32;
    # the JVM parses the equivalent ~50 KB SQL text in ~0.1 s).  The
    # math is term-for-term identical — same zip_with/aggregate fold,
    # same literal values via repr round-trip — so projections remain
    # bit-exact against the SQL oracle (asserted by the
    # embed_random_projection value hash and the operator unit tests).
    def arr(row: list[float]) -> str:
        return "array(" + ",".join(f"{x!r}D" for x in row) + ")"

    comps = ",".join(
        f"aggregate(zip_with({stage}, {arr(row)}, "
        "(a, b) -> CAST(a AS DOUBLE) * b), 0.0D, (acc, x) -> acc + x)"
        for row in rows
    )
    return df.withColumn(out_col, F.expr(f"array({comps})")).drop(stage)


def projection_matrix(
    dim: int, out_dim: int, seed: int
) -> list[list[float]]:
    """The seeded Rademacher projection matrix (shared with the SQL
    oracle, which inlines the same literals)."""
    import random

    rng = random.Random(seed)
    scale = 1.0 / (out_dim ** 0.5)
    return [
        [scale if rng.random() < 0.5 else -scale for _ in range(dim)]
        for _ in range(out_dim)
    ]
