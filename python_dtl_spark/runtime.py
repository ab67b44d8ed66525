"""Public entry points, mirroring the reference API surface.

Reference: ``dtl.run(source, *, importer, exporter, tracer)``
(/root/reference/src/dtl/eval.py:447-543) and
``dtl.run_simple(source, *, inputs)`` (eval.py:546-554), exported via
``__init__.py:1-3``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

import os

from python_dtl_spark.compiler import Engine
from python_dtl_spark.lang import nodes as n
from python_dtl_spark.sources import (
    Exporter,
    FileSystemExporter,
    FileSystemImporter,
    Importer,
    InMemoryExporter,
    InMemoryImporter,
)




def _check_self_overwrite(source: str, importer, exporter) -> None:
    """Reject a script that IMPORTs a table it also EXPORTs when the
    importer and exporter share a filesystem root.

    Exports run AFTER the whole script compiles, so every import plan
    pins the pre-script file listing; an overwrite of an imported
    location then deletes part files a compiled plan references — the
    read either fails with FileNotFoundException mid-action or silently
    returns pre-export data.  Neither is acceptable; write to a
    different location (or directory) and rotate afterwards.
    """
    in_root = getattr(importer, "_root", None)
    out_root = getattr(exporter, "_root", None)
    if in_root is None or out_root is None:
        return
    if os.path.abspath(in_root) != os.path.abspath(out_root):
        return
    from python_dtl_spark.lang.parser import parse

    script = parse(source)
    imports = {
        st.expression.location
        for st in script.statements
        if isinstance(st, n.WithStatement)
        and isinstance(st.expression, n.ImportExpression)
    }
    exports = {
        st.location
        for st in script.statements
        if isinstance(st, n.ExportStatement)
    }
    clash = sorted(imports & exports)
    if clash:
        raise ValueError(
            f"script imports AND exports {clash} under the same root "
            f"{in_root!r}: exports overwrite files the compiled import "
            "plans still reference (runs after full compilation). "
            "Export to a different location and rotate afterwards."
        )


def run(
    source: str,
    *,
    spark: SparkSession,
    importer: Importer,
    exporter: Exporter,
    tracer=None,
    ordered: bool = False,
) -> None:
    """Compile and execute a DTL script.

    Each EXPORT statement triggers one Spark action (the write); all
    transformations stay lazy so Catalyst optimizes each export's full
    plan end-to-end.  With ``tracer`` set, row-level provenance is
    recorded (see python_dtl_spark.lineage).
    """
    if tracer is not None:
        from python_dtl_spark.lineage import run_traced

        run_traced(
            source,
            spark=spark,
            importer=importer,
            exporter=exporter,
            tracer=tracer,
            ordered=ordered,
        )
        return
    engine = Engine(spark, importer, ordered=ordered)
    # invalidate the importer's memoized handle for each exported name.
    # Scope: this protects the NEXT run() against a reused importer
    # (input_dir == output_dir round-trips across calls).  It cannot
    # protect a WITHIN-script IMPORT of a location the same script
    # exports — run_script compiles every statement (pinning file
    # listings) before the first write happens — so that conflict is
    # rejected up front instead of failing later mid-write.
    _check_self_overwrite(source, importer, exporter)
    invalidate = getattr(importer, "invalidate", None)
    for location, table in engine.run_script(source):
        exporter.export_table(location, table.public_df())
        if invalidate is not None:
            invalidate(location)


def run_files(
    source: str,
    *,
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    trace_dir: str | None = None,
    ordered: bool = False,
    input_format: str = "parquet",
    output_format: str = "parquet",
    num_output_files: int | None = None,
    merge_schema: bool = False,
    sort_within_partitions: list[str] | None = None,
) -> None:
    """File-to-file execution, mirroring the reference CLI
    (/root/reference/src/dtl/main.py:9-46).  Format, compaction,
    schema-evolution reads and sorted data-skipping writes pass
    straight through to the importer/exporter."""
    importer = FileSystemImporter(
        spark, input_dir, fmt=input_format, merge_schema=merge_schema
    )
    exporter = FileSystemExporter(
        output_dir,
        fmt=output_format,
        num_output_files=num_output_files,
        sort_within_partitions=sort_within_partitions,
    )
    tracer = None
    if trace_dir is not None:
        from python_dtl_spark.lineage import FileSystemTracer

        tracer = FileSystemTracer(trace_dir)
    run(
        source,
        spark=spark,
        importer=importer,
        exporter=exporter,
        tracer=tracer,
        ordered=ordered,
    )


def run_simple(
    source: str,
    *,
    spark: SparkSession,
    inputs: dict[str, DataFrame],
    ordered: bool = True,
) -> dict[str, DataFrame]:
    """In-memory execution: DataFrames in, DataFrames out.

    This is the API the reference's whole test suite drives
    (eval.py:546-554, tests/conftest.py:11-36).  Defaults to ordered
    mode because reference outputs are positional.
    """
    engine = Engine(spark, InMemoryImporter(inputs), ordered=ordered)
    exporter = InMemoryExporter()
    for location, table in engine.run_script(source):
        exporter.export_table(location, table.public_df())
    return exporter.tables
