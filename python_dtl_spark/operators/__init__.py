"""Extension operators for large-scale training-data pipelines.

These go beyond the reference's relational core (SURVEY.md §2.5 lists
them as absent there): deduplication, similarity search, text analysis,
and multimodal column handling.  All are pure DataFrame transformations
— JVM-side built-ins wherever possible, Arrow-batched Pandas UDFs only
where unavoidable — so they scale with partitioning, never collect to
the driver, and compose with the DTL engine's outputs.
"""

from python_dtl_spark.operators import (
    analytics,
    cdc,
    classify,
    dedup,
    embeddings,
    joins,
    multimodal,
    rollup,
    sampling,
    semistructured,
    similarity,
    stats,
    text,
    urls,
    windows,
)

__all__ = [
    "analytics",
    "cdc",
    "classify",
    "dedup",
    "embeddings",
    "joins",
    "multimodal",
    "rollup",
    "sampling",
    "semistructured",
    "similarity",
    "stats",
    "text",
    "urls",
    "windows",
]
