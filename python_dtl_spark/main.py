"""CLI entry point, mirroring the reference command
``dtl script.dtl --input-dir D --output-dir D [--trace-dir D]``
(/root/reference/src/dtl/main.py:9-46)."""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        prog="python-dtl-spark",
        description="Run a DTL script on Spark: parquet tables in, "
        "parquet tables out, optional row-level provenance trace.",
    )
    parser.add_argument("script", help="path to the .dtl script")
    parser.add_argument("--input-dir", required=True)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument(
        "--trace-dir",
        help="record row-level provenance (snapshots + mappings + trace.json)",
    )
    parser.add_argument(
        "--ordered",
        action="store_true",
        help="reproduce the reference's positional row order (test scale only)",
    )
    parser.add_argument("--master", default=None, help="Spark master override")
    parser.add_argument(
        "--input-format",
        default="parquet",
        choices=["parquet", "orc", "csv", "json"],
        help="table format under --input-dir (default parquet)",
    )
    parser.add_argument(
        "--output-format",
        default="parquet",
        choices=["parquet", "orc", "csv", "json"],
        help="table format written under --output-dir (default parquet)",
    )
    parser.add_argument(
        "--num-output-files",
        type=int,
        default=None,
        help="coalesce each exported table to this many files "
        "(small-files compaction; avoid 1 for large outputs)",
    )
    parser.add_argument(
        "--merge-schema",
        action="store_true",
        help="union parquet/ORC schemas across each input table's part "
        "files (schema-evolution reads; missing columns become NULL)",
    )
    parser.add_argument(
        "--sort-output-by",
        default=None,
        help="comma-separated columns: sort rows within each output "
        "task before writing, so parquet row-group min/max stats allow "
        "data skipping on later scans",
    )
    args = parser.parse_args(argv)

    from python_dtl_spark.runtime import run_files
    from python_dtl_spark.session import get_spark

    spark = get_spark("python-dtl-spark-cli", master=args.master)
    with open(args.script) as f:
        source = f.read()
    run_files(
        source,
        spark=spark,
        input_dir=args.input_dir,
        output_dir=args.output_dir,
        trace_dir=args.trace_dir,
        ordered=args.ordered,
        input_format=args.input_format,
        output_format=args.output_format,
        num_output_files=args.num_output_files,
        merge_schema=args.merge_schema,
        sort_within_partitions=(
            [c.strip() for c in args.sort_output_by.split(",") if c.strip()]
            if args.sort_output_by
            else None
        ),
    )


if __name__ == "__main__":
    main()
