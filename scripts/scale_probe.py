"""Scaling probe: run representative queries against the sf0.1 tables
and against an N×-replicated copy (distinct keys per replica), and
report the runtime ratio.  Near-N× input with a sub-N× or ~N× runtime
ratio on a fixed 32-core box is the local evidence that the plan shapes
(broadcast joins, map-side combines, bucketed candidate joins) scale
with data instead of exploding.

    python scripts/scale_probe.py [factor ...]

Writes SCALING.md (one table per factor).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from python_dtl_spark.operators import dedup  # noqa: E402
from python_dtl_spark.operators import text as text_ops  # noqa: E402
from python_dtl_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def replicate(df, factor: int, key_cols: list[str], shift: int = 10_000_000):
    """Union ``factor`` copies with key columns shifted per replica so
    join/group cardinalities scale with the data (a plain union would
    multiply duplicate keys instead)."""
    parts = []
    for i in range(factor):
        part = df
        for k in key_cols:
            part = part.withColumn(k, F.col(k) + F.lit(i * shift))
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(label, df):
    start = time.perf_counter()
    n = df.count()
    dt = time.perf_counter() - start
    print(f"# {label}: {dt:.2f}s ({n} rows)", file=sys.stderr)
    return dt, n


def stream_interval_probe(spark, events, factor: int, workdir: str):
    """Watermarked stream-stream interval join at 1× and ``factor``×.

    Replicas shift user_id/event_id (more keys, same time range), so
    buffered join state should scale ~linearly with the data while the
    watermark keeps evicting rows older than the join bound — the two
    numbers that decide whether the operator survives a 100× stream.
    Reports wall time plus the state store's numRowsTotal /
    memoryUsedBytes from the final StreamingQueryProgress.
    """
    import shutil

    from python_dtl_spark.streaming import (
        interval_join,
        run_stream_to_memory,
        stream_events,
    )

    side_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )

    def run_once(ev, tag: str):
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        clicks = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        p_src = os.path.join(workdir, f"purchases_{tag}")
        c_src = os.path.join(workdir, f"clicks_{tag}")
        purchases.write.mode("overwrite").parquet(p_src)
        clicks.write.mode("overwrite").parquet(c_src)
        joined = interval_join(
            stream_events(spark, p_src, side_schema, watermark="2 hours"),
            stream_events(spark, c_src, side_schema, watermark="2 hours"),
            by="user_id",
            ts_col="ts",
            max_delay="2 hours",
            right_cols=["event_id"],
        )
        start = time.perf_counter()
        q = run_stream_to_memory(joined, f"scale_interval_{tag}", mode="append")
        try:
            q.processAllAvailable()
            dt = time.perf_counter() - start
            n = spark.table(f"scale_interval_{tag}").count()
            prog = q.lastProgress or {}
            state = (prog.get("stateOperators") or [{}])[0]
        finally:
            q.stop()
        shutil.rmtree(p_src, ignore_errors=True)
        shutil.rmtree(c_src, ignore_errors=True)
        print(
            f"# interval_join_stream {tag}: {dt:.2f}s ({n} rows, "
            f"state {state.get('numRowsTotal')} rows / "
            f"{state.get('memoryUsedBytes')} B)",
            file=sys.stderr,
        )
        return dt, n, state

    events_n = replicate(events, factor, ["event_id", "user_id"])
    t1, n1, s1 = run_once(events, f"1x_{factor}")
    tn, nn, sn = run_once(events_n, f"{factor}x")
    return (t1, n1, s1, tn, nn, sn)


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [8]
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    from python_dtl_spark.catalog import _read_events

    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    supplier = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    events = _read_events(spark, SF_DIR)
    stream_workdir = tempfile.mkdtemp(prefix="scale_probe_stream_")

    def q1(li):
        return (
            li.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.avg("l_extendedprice").alias("avg_price"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    def q3(cu, od, li):
        return (
            cu.filter(F.col("c_mktsegment") == "BUILDING")
            .join(od, F.col("c_custkey") == F.col("o_custkey"))
            .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("l_orderkey")
            .agg(F.sum(F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).alias("rev"))
        )

    def q21(su, li, od):
        # the TPC-H q21 semi/anti self-join chain (catalog
        # dtl_q21_waiting_suppliers), DataFrame form so the probe can
        # feed replicated inputs.  The hazard probed: the `!=` residual
        # must stay residual on equi-keyed SMJ joins as the lineitem
        # self-joins grow — a flip to nested-loop would blow the ratio
        # far past the data factor.
        late = (
            li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
            .filter(
                (F.col("o_orderstatus") == "F")
                & (F.datediff("l_shipdate", "o_orderdate") > 120)
            )
            .select(F.col("l_orderkey").alias("lo"), F.col("l_suppkey").alias("ls"))
            .distinct()
        )
        members = li.select(
            F.col("l_orderkey").alias("mo"), F.col("l_suppkey").alias("ms")
        )
        waiting = late.join(
            members,
            (F.col("lo") == F.col("mo")) & (F.col("ls") != F.col("ms")),
            "left_semi",
        )
        late_b = late.select(F.col("lo").alias("lo2"), F.col("ls").alias("ls2"))
        sole = waiting.join(
            late_b,
            (F.col("lo") == F.col("lo2")) & (F.col("ls") != F.col("ls2")),
            "left_anti",
        )
        return (
            sole.join(su, F.col("ls") == F.col("s_suppkey"))
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
        )

    # warm up JVM + scans once
    q1(lineitem).count()

    lines = [
        "# SCALING — N× data replication probe (local[32], sf0.1 base)",
        "",
        f"Generated by `scripts/scale_probe.py {' '.join(map(str, factors))}`.",
        "Replicas get shifted keys, so join/group cardinality scales with",
        "the data.  A runtime ratio at or below the data ratio means the",
        "plan's work grows linearly (no quadratic candidate blowups, no",
        "broadcast flips to nested loops).",
    ]
    for factor in factors:
        lineitem_n = replicate(lineitem, factor, ["l_orderkey"])
        orders_n = replicate(orders, factor, ["o_orderkey", "o_custkey"])
        customer_n = replicate(customer, factor, ["c_custkey"])
        documents_n = replicate(
            documents.withColumn(
                "text",
                F.concat_ws(" ", "text", F.col("doc_id").cast("string")),
            ),
            factor,
            ["doc_id"],
        )
        results = []
        for label, one, many in [
            ("q1_agg", q1(lineitem), q1(lineitem_n)),
            ("q3_join_agg", q3(customer, orders, lineitem), q3(customer_n, orders_n, lineitem_n)),
            (
                "minhash_lsh",
                dedup.minhash_lsh_pairs(documents, n=3, num_hashes=32, bands=16, threshold=0.3),
                dedup.minhash_lsh_pairs(documents_n, n=3, num_hashes=32, bands=16, threshold=0.3),
            ),
            (
                "q21_semi_anti",
                q21(supplier, lineitem, orders),
                q21(
                    replicate(supplier, factor, ["s_suppkey"]),
                    replicate(lineitem, factor, ["l_orderkey", "l_suppkey"]),
                    replicate(orders, factor, ["o_orderkey"]),
                ),
            ),
            (
                # replicas keep IDENTICAL text (only doc_id shifts), so
                # every window is duplicated factor-fold — the worst
                # case for the fingerprint aggregation.  Linear ratio
                # here means cross-doc duplication adds no pairwise
                # blowup (n_docs is a count, not a pair list).
                "dup_windows_alldup",
                text_ops.duplicated_token_windows(documents, window_tokens=16),
                text_ops.duplicated_token_windows(
                    replicate(documents, factor, ["doc_id"]), window_tokens=16
                ),
            ),
        ]:
            t1, n1 = timed(f"{label} 1x", one)
            tn, nn = timed(f"{label} {factor}x", many)
            results.append((label, t1, n1, tn, nn, tn / t1 if t1 else float("inf")))

        lines += [
            "",
            f"| query | 1× time | 1× rows | {factor}× time | {factor}× rows | time ratio (data ×{factor}) |",
            "|---|---|---|---|---|---|",
        ]
        for label, t1, n1, tn, nn, ratio in results:
            lines.append(
                f"| {label} | {t1:.2f}s | {n1:,} | {tn:.2f}s | {nn:,} | {ratio:.1f}× |"
            )

        t1, n1, s1, tn, nn, sn = stream_interval_probe(
            spark, events, factor, stream_workdir
        )
        lines += [
            "",
            "Stream-stream interval join (watermarked, append mode; state",
            "metrics from the final StreamingQueryProgress — linear state",
            "rows with bounded per-key memory means the watermark evicts",
            "buffered rows instead of holding both streams forever):",
            "",
            f"| probe | time | output rows | state rows | state memory |",
            "|---|---|---|---|---|",
            f"| interval_join_stream 1× | {t1:.2f}s | {n1:,} | "
            f"{s1.get('numRowsTotal', 0):,} | {s1.get('memoryUsedBytes', 0):,} B |",
            f"| interval_join_stream {factor}× | {tn:.2f}s | {nn:,} | "
            f"{sn.get('numRowsTotal', 0):,} | {sn.get('memoryUsedBytes', 0):,} B |",
        ]
    lines.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"), "w") as f:
        f.write("\n".join(lines))
    print("SCALING.md written")


if __name__ == "__main__":
    main()
