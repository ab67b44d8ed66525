"""Physical-plan assertions: the scale properties the engine promises.

These lock in what `.explain()` showed during development — predicate
pushdown into the parquet scan, column pruning, broadcast-hash join
selection for small dimensions, and no Python row-at-a-time evaluation
in the DTL hot path.  A regression that silently turns a broadcast join
into a nested-loop join, or stops pushing filters into the scan, fails
here long before it fails at 100 TB.
"""

from __future__ import annotations

import pytest

from python_dtl_spark.compiler import Engine
from python_dtl_spark.sources import FileSystemImporter

SF = "/root/testdata/sf0.001"


def _plan(spark, script: str) -> str:
    engine = Engine(spark, FileSystemImporter(spark, SF), ordered=False)
    exports = dict(engine.run_script(script))
    df = next(iter(exports.values())).public_df()
    return df._jdf.queryExecution().executedPlan().toString()


def test_where_pushes_filter_into_scan(spark):
    plan = _plan(
        spark,
        """
        WITH orders AS IMPORT 'orders';
        WITH o AS SELECT o_orderkey FROM orders WHERE o_totalprice > 100000.0;
        EXPORT o TO 'o';
        """,
    )
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in plan


def test_projection_prunes_scan_columns(spark):
    plan = _plan(
        spark,
        """
        WITH lineitem AS IMPORT 'lineitem';
        WITH o AS SELECT l_orderkey, l_quantity FROM lineitem;
        EXPORT o TO 'o';
        """,
    )
    # the scan must read exactly the two referenced columns (the
    # reference reads whole files, io.py:39-42 — we must not)
    scan_lines = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scan_lines and "l_orderkey" in scan_lines[0]
    assert "l_extendedprice" not in scan_lines[0]
    assert "l_comment" not in scan_lines[0]


def test_equi_join_becomes_broadcast_hash(spark):
    plan = _plan(
        spark,
        """
        WITH customer AS IMPORT 'customer';
        WITH nation AS IMPORT 'nation';
        WITH o AS SELECT c_custkey, n_name
                  FROM customer
                  JOIN nation ON c_nationkey = n_nationkey;
        EXPORT o TO 'o';
        """,
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_theta_join_extracts_equi_conjunct(spark):
    # a.key + 1 = b.key is a pure arithmetic theta predicate; Catalyst
    # must still run it as a hash join on the derived expression, not a
    # nested loop (the reference always materializes the full cross
    # product, eval.py:163-184)
    plan = _plan(
        spark,
        """
        WITH customer AS IMPORT 'customer';
        WITH orders AS IMPORT 'orders';
        WITH o AS SELECT c_custkey, o_orderkey
                  FROM customer
                  JOIN orders ON c_custkey + 1 = o_custkey;
        EXPORT o TO 'o';
        """,
    )
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_aggregation_is_partial_then_final(spark):
    plan = _plan(
        spark,
        """
        WITH lineitem AS IMPORT 'lineitem';
        WITH o AS SELECT l_returnflag, sum(l_quantity) AS q
                  FROM lineitem GROUP BY l_returnflag;
        EXPORT o TO 'o';
        """,
    )
    # map-side combine: partial_sum before the exchange, final after
    assert "partial_sum" in plan
    assert plan.count("HashAggregate") >= 2


def test_no_python_udfs_in_dtl_path(spark):
    plan = _plan(
        spark,
        """
        WITH lineitem AS IMPORT 'lineitem';
        WITH o AS SELECT upper(l_returnflag) AS rf, l_quantity * 2.0 AS q2
                  FROM lineitem WHERE l_discount < 0.05;
        EXPORT o TO 'o';
        """,
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
