"""Partition-shape utilities shared by the pipeline operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition narrow inputs up to the cluster's parallelism.

    Shingling / hashing / dot products are the CPU-heavy first step of
    every near-dup and similarity pipeline; a small parquet file arrives
    as 1-2 splits and would serialize that work on one core.  At real
    scale (thousands of input splits) the condition is false and this is
    a no-op, so the extra shuffle only ever moves small data.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
