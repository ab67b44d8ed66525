"""Partition-shape utilities shared by the pipeline operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Repartition narrow inputs up to the cluster's parallelism.

    Shingling / hashing / dot products are the CPU-heavy first step of
    every near-dup and similarity pipeline; a small parquet file arrives
    as 1-2 splits and would serialize that work on one core.  At real
    scale (thousands of input splits) the file count exceeds the
    parallelism and this is a no-op, so the extra shuffle only ever
    moves small data.

    Plan-construction is action-free AND physical-planning-free: the
    input width is estimated from the scan's file listing
    (``df.inputFiles()`` — metadata already resolved at analysis time)
    rather than ``df.rdd.getNumPartitions()``, which would force RDD
    conversion per call and defeat lazy-plan reuse.  A derived (non-scan)
    input reports no files and is left unchanged — downstream of a
    shuffle its width is already ``spark.sql.shuffle.partitions``.
    Pass ``num_partitions`` to override the heuristic entirely.
    """
    if num_partitions is not None:
        return df.repartition(num_partitions)
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return df
    if 0 < n_files < target:
        return df.repartition(target)
    return df
