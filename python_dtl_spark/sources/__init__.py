"""Importers and exporters — named-table sources and sinks.

Mirrors the reference I/O layer (/root/reference/src/dtl/io.py):
``FileSystemImporter``/``FileSystemExporter`` bind table names to
``{root}/{name}.parquet`` (io.py:41,72); ``InMemoryImporter``/
``InMemoryExporter`` bind by dict key (io.py:20-28,55-64).

Extensions beyond the reference's parquet-only support: ORC, CSV and
JSON-lines formats, partitioned writes, and directory-of-files reads —
at 100 TB a "table" is a directory of parquet parts, not one file, so
the importer accepts both layouts.
"""

from __future__ import annotations

import os
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession


#: Callables run by :meth:`FileSystemImporter.invalidate` — modules
#: holding caches DERIVED from imported data (e.g. the fitted-KMeans
#: model memo in ``operators.similarity``) append their clear function
#: here at import time, so the one invalidation call sites already
#: make after rewriting a table also drops every derived cache.
INVALIDATION_HOOKS: list = []


class Importer(Protocol):
    def import_table(self, name: str) -> DataFrame: ...


class Exporter(Protocol):
    def export_table(self, name: str, df: DataFrame) -> None: ...


class FileSystemImporter:
    """Reads ``{root}/{name}.parquet`` (file or part-directory).

    Unlike the reference's whole-file eager read + cache (io.py:31-42),
    this returns a *lazy* DataFrame: Catalyst prunes columns and pushes
    filters into the scan, so importing a 100-column table and selecting
    two reads two.

    The DataFrame handle is memoized per table name: ``spark.read``
    performs file listing and parquet footer schema inference on every
    call, which repeats for each IMPORT of the same table across a
    script (or a catalog run).  Local parquet makes that a few tens of
    ms; against object storage the listing round-trips are the cost.
    The memo holds lazy plans only — no data is cached.

    Staleness contract: the memoized plan pins the file listing and
    schema observed at first import.  If a table is rewritten during
    the importer's lifetime (``input_dir == output_dir`` round-trips,
    regenerated fixtures, interactive reuse), call
    :meth:`invalidate` — otherwise later actions can fail on missing
    files or silently read the pre-rewrite data.  (The reference
    re-reads eagerly per IMPORT, io.py:31-42, so it cannot go stale —
    and also cannot prune; this importer trades that for lazy scans.)
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        fmt: str = "parquet",
        merge_schema: bool = False,
    ):
        """``merge_schema=True`` unions parquet/ORC footer schemas
        across a table's part files instead of trusting the first one —
        the schema-evolution read mode: a long-lived 100 TB table whose
        later partitions gained columns still imports as one table
        (missing columns read as NULL).  Off by default because the
        footer sweep touches every file at import time."""
        self._spark = spark
        self._root = root
        self._fmt = fmt
        self._merge_schema = merge_schema
        self._memo: dict[str, DataFrame] = {}

    def import_table(self, name: str) -> DataFrame:
        if name not in self._memo:
            self._memo[name] = self._read(name)
        return self._memo[name]

    def invalidate(self, name: str | None = None) -> None:
        """Drop the memoized handle for ``name`` (all tables when None)
        so the next import re-lists files and re-reads the schema.
        Also runs every registered ``INVALIDATION_HOOKS`` entry, so
        caches derived from the (now stale) data — fitted quantizer
        models, etc. — are dropped in the same call."""
        if name is None:
            self._memo.clear()
        else:
            self._memo.pop(name, None)
        for hook in INVALIDATION_HOOKS:
            try:
                hook()
            except Exception:
                pass

    def _read(self, name: str) -> DataFrame:
        path = os.path.join(self._root, f"{name}.{self._fmt}")
        # local roots: cheap driver-side existence probe (including the
        # directory-of-parts layout {root}/{name}/part-*).  Schemed
        # roots (s3a://, hdfs://, ...) cannot be probed with
        # os.path.exists — it is always False there — so they go
        # straight to the Spark reader, whose PATH_NOT_FOUND is
        # translated to the same DtlNameError below.
        remote = "://" in self._root or self._root.startswith("file:")
        if not remote and not os.path.exists(path):
            # directory-of-parts layout: {root}/{name}/part-*.parquet
            alt = os.path.join(self._root, name)
            if os.path.exists(alt):
                path = alt
            else:
                from python_dtl_spark.errors import DtlNameError

                raise DtlNameError(
                    f"compilation error: no input table {name!r} under "
                    f"{self._root!r} (looked for {path!r})"
                )
        def _load(fn):
            try:
                return fn()
            except Exception as e:  # AnalysisException PATH_NOT_FOUND etc.
                if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                    from python_dtl_spark.errors import DtlNameError

                    raise DtlNameError(
                        f"compilation error: no input table {name!r} under "
                        f"{self._root!r} (looked for {path!r})"
                    ) from e
                raise

        if self._fmt == "parquet":
            reader = self._spark.read
            if self._merge_schema:
                reader = reader.option("mergeSchema", True)
            return _load(lambda: reader.parquet(path))
        if self._fmt == "orc":
            reader = self._spark.read
            if self._merge_schema:
                reader = reader.option("mergeSchema", True)
            return _load(lambda: reader.orc(path))
        if self._fmt == "csv":
            return _load(
                lambda: self._spark.read.csv(path, header=True, inferSchema=True)
            )
        if self._fmt == "json":
            return _load(lambda: self._spark.read.json(path))
        raise ValueError(f"unsupported format {self._fmt!r}")


class InMemoryImporter:
    def __init__(self, tables: dict[str, DataFrame]):
        self._tables = dict(tables)

    def import_table(self, name: str) -> DataFrame:
        if name not in self._tables:
            raise KeyError(f"no such input table {name!r}")
        return self._tables[name]


class FileSystemExporter:
    """Writes ``{root}/{name}.parquet`` as a parquet part-directory
    (the scalable layout; the reference writes a single file, io.py:67-72).

    ``num_output_files`` controls output compaction: a job whose final
    stage has thousands of tasks otherwise writes thousands of small
    parquet parts, and small files are the classic downstream-scan
    killer at warehouse scale.  Compaction uses ``coalesce`` (narrow —
    merges partitions without a shuffle); pass a larger number rather
    than 1 unless the result is known-small, since coalesce(1)
    serializes the write through one task.
    """

    def __init__(
        self,
        root: str,
        fmt: str = "parquet",
        partition_by: list[str] | None = None,
        num_output_files: int | None = None,
        sort_within_partitions: list[str] | None = None,
    ):
        """``sort_within_partitions`` orders rows inside each output
        task before writing (a narrow, spill-safe per-partition sort —
        NOT a global orderBy).  Parquet then records tight min/max
        row-group statistics on those columns, so later scans with
        pushed-down predicates on them skip whole row groups — the
        poor man's Z-order, and at 100 TB the difference between
        reading a slice and reading the table.  Compose with
        ``partition_by`` for the classic layout: directory pruning on
        the partition column, row-group skipping within it."""
        self._root = root
        self._fmt = fmt
        self._partition_by = partition_by or []
        self._num_output_files = num_output_files
        self._sort_within = sort_within_partitions or []

    def export_table(self, name: str, df: DataFrame) -> None:
        path = os.path.join(self._root, f"{name}.{self._fmt}")
        if self._num_output_files is not None:
            df = df.coalesce(self._num_output_files)
        if self._sort_within:
            df = df.sortWithinPartitions(*self._sort_within)
        writer = df.write.mode("overwrite")
        if self._partition_by:
            writer = writer.partitionBy(*self._partition_by)
        if self._fmt == "parquet":
            writer.parquet(path)
        elif self._fmt == "orc":
            writer.orc(path)
        elif self._fmt == "csv":
            writer.option("header", True).csv(path)
        elif self._fmt == "json":
            writer.json(path)
        else:
            raise ValueError(f"unsupported format {self._fmt!r}")


class InMemoryExporter:
    def __init__(self) -> None:
        self.tables: dict[str, DataFrame] = {}

    def export_table(self, name: str, df: DataFrame) -> None:
        self.tables[name] = df


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a DataFrame as a bucketed (and optionally sorted) table.

    Bucketing is the 100 TB co-location tool Spark offers for repeated
    equi-joins/aggregations on the same key: both sides pre-hashed into
    ``num_buckets`` files per partition means Catalyst can plan the join
    with NO Exchange at all (asserted in tests/test_plans.py).  Pick
    num_buckets so one bucket of the big table fits an executor task
    (e.g. 100 TB / 2048 buckets ≈ 50 GB before column pruning).

    Uses ``saveAsTable`` (bucketing metadata lives in the session
    catalog; plain ``.parquet(path)`` cannot record it).
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
