"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from python_dtl_spark.catalog import QUERIES
from python_dtl_spark.operators.dedup import release_all_cached
from python_dtl_spark.session import get_spark


def measure_queries(
    spark,
    headline,
    sf_dir: str,
    warm_passes: int,
) -> tuple[dict[str, float], dict[str, list[float]], dict[str, str]]:
    """One cold pass + ``warm_passes`` warm passes over ``headline``
    (a ``{name: obj_with_fn}`` mapping), returning
    ``(cold_timings, warm_samples, errors)``.

    A raising query — e.g. a DESIGNED guard refusal at an
    out-of-contract scale factor, like the exact-kNN tier's broadcast
    cap — degrades to one ``errors`` row and the run CONTINUES with
    the remaining queries; it never aborts the harness
    (unit-tested in tests/test_bench_harness.py).
    """
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    warm_samples: dict[str, list[float]] = {name: [] for name in headline}
    for name, q in headline.items():
        start = time.perf_counter()
        try:
            df = q.fn(spark, sf_dir)
            n = df.count()  # force full execution
        except Exception as exc:  # noqa: BLE001 — one refused/broken
            # query (e.g. a designed guard raise at an out-of-contract
            # scale factor) degrades to an error row instead of
            # aborting the whole bench run
            errors[name] = repr(exc)[:200]
            release_all_cached(spark)
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(time.perf_counter() - start, 3)
        release_all_cached(spark)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
    for i in range(warm_passes):
        for name, q in headline.items():
            if name in errors:
                continue
            start = time.perf_counter()
            try:
                df = q.fn(spark, sf_dir)
                df.count()
            except Exception as exc:  # noqa: BLE001
                errors[name] = repr(exc)[:200]
                release_all_cached(spark)
                continue
            t = round(time.perf_counter() - start, 3)
            warm_samples[name].append(t)
            release_all_cached(spark)
            print(
                f"# warm[{i + 1}/{warm_passes}] {name}: {t:.3f}s",
                file=sys.stderr,
            )
    return timings, warm_samples, errors


def write_full_results(full: dict, base_dir: str, env=None) -> list[str]:
    """r21 (PERF_r20 item 1): the driver only keeps the LAST 2000 bytes
    of stdout, so with 99 headline queries the compact stdout line must
    elide the cheapest entries (``_elided_cheapest_n``) and the driver's
    per-query round-over-round comparison goes dark (PERF_r20:
    ``per_query`` {}, geomean null, ``bench_ok`` false).  Fix prescribed
    by the r20 verdict: ALSO write the COMPLETE result dict — every
    query, cold + warm median + warm min, no elision, full precision —
    to a stable file artifact next to bench.py (``BENCH_LAST.json``),
    plus an explicit override path via ``$SPARK_GRAFT_BENCH_OUT``.
    Measurement methodology, timed region and the stdout contract are
    unchanged.  Returns the paths actually written."""
    if env is None:
        env = os.environ
    paths = [os.path.join(base_dir, "BENCH_LAST.json")]
    if env.get("SPARK_GRAFT_BENCH_OUT"):
        paths.append(env["SPARK_GRAFT_BENCH_OUT"])
    written = []
    for p in paths:
        try:
            with open(p, "w") as f:
                json.dump(full, f, indent=1, sort_keys=True)
                f.write("\n")
            written.append(p)
        except OSError as exc:  # read-only checkout: the bench result
            # itself must never be lost to a bookkeeping write failure
            print(f"# bench: could not write {p}: {exc!r}", file=sys.stderr)
    return written


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("python-dtl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Name-sorted, NOT catalog order: the catalog dict is re-ordered
    # each round for the driver's correctness window, and whichever
    # query runs first absorbs residual first-run costs the warmup
    # below doesn't cover.  A fixed order keeps cold times comparable
    # round-over-round.
    headline = {
        name: QUERIES[name]
        for name in sorted(QUERIES)
        if QUERIES[name].headline
    }

    # Warm up the JVM before the first measured query: parquet footer
    # caches, whole-stage codegen, exchange/window/explode execution
    # paths.  Uses synthetic data only — no catalog query gets a head
    # start — so per-query cold times measure the query, not whichever
    # query happens to run first after a catalog reordering.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    warmup = (
        spark.range(100_000)
        .select(
            (F.col("id") % 97).alias("k"),
            F.col("id").alias("v"),
            F.split(F.lit("a b c"), " ").alias("arr"),
        )
        .withColumn("tok", F.explode("arr"))
        .groupBy("k", "tok")
        .agg(F.sum("v").alias("s"))
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("tok").orderBy(F.desc("s")))
        )
        .join(spark.range(97).select(F.col("id").alias("k")), on="k")
    )
    warmup.count()
    # Warm the DTL engine path too (lexer → compiler → Catalyst
    # analysis of generated plans) on the 5-row region table.
    from python_dtl_spark.compiler import Engine
    from python_dtl_spark.sources import FileSystemImporter

    engine = Engine(spark, FileSystemImporter(spark, sf_dir), ordered=False)
    exports = dict(
        engine.run_script(
            """
            WITH region AS IMPORT 'region';
            WITH output AS
                SELECT r_name, count() AS n FROM region
                GROUP BY r_name ORDER BY r_name;
            EXPORT output TO 'output';
            """
        )
    )
    exports["output"].public_df().count()

    # cold pass = the headline number (comparable round-over-round);
    # warm pass = same queries re-run in the hot JVM, isolating the
    # data path from Catalyst planning/codegen, which dominates cold
    # times at test scale and can mask data-path regressions
    # release_all_cached(): operators that persist intermediates
    # register them per-session (dedup._release_after) — a loop over
    # all headline queries would otherwise accumulate MEMORY_AND_DISK
    # caches for the whole run and measure later queries under
    # eviction pressure instead of on their own plan.  Round-8 step
    # change: before this, the WARM pass silently reused the cold
    # pass's persisted intermediates (CacheManager matches rebuilt
    # identical plans), flattering cache-heavy queries — r7→r8
    # pipeline_curate/dedup_corpus warm +~1.2s each is that subsidy
    # removed, not a plan regression (cold times unaffected).
    # Round-9 step change: single warm samples on this VM swing up to
    # 2.3× run-to-run (r8 recorded embed_similarity_join warm at 7.0s;
    # a same-code re-run read 3.1s), so one sample cannot distinguish a
    # plan regression from a slow boot.  The warm loop now runs
    # WARM_PASSES times and records the per-query MEDIAN (the verdict
    # number) plus the MIN (best-case data path, for diagnosis).
    # clamped: 0/negative would leave warm_samples empty and crash
    # statistics.median([]) AFTER the full cold pass was already paid
    WARM_PASSES = max(1, int(os.environ.get("SPARK_GRAFT_WARM_PASSES", "3")))
    timings, warm_samples, errors = measure_queries(
        spark, headline, sf_dir, WARM_PASSES
    )

    # Queries in ``errors`` are reported ONLY as error rows: a query
    # that failed partway through the warm passes would otherwise
    # contribute a truncated sample set to the medians, silently
    # mixing complete and incomplete measurements across runs.
    warm_median = {
        name: round(statistics.median(ts), 3)
        for name, ts in warm_samples.items()
        if ts and name not in errors
    }
    warm_min = {
        name: round(min(ts), 3)
        for name, ts in warm_samples.items()
        if ts and name not in errors
    }

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # queries_warm keeps its historical meaning (one number
        # per query) but is now the median of WARM_PASSES runs.
        "queries_warm": warm_median,
        "queries_warm_median": warm_median,
        "queries_warm_min": warm_min,
        "warm_passes": WARM_PASSES,
        "warm_total_sec": round(sum(warm_median.values()), 3),
        "warm_min_total_sec": round(sum(warm_min.values()), 3),
        "errors": errors,
        "sf": sf_val,
        "cpus": cpus,
    }
    print(json.dumps(full))
    write_full_results(full, os.path.dirname(os.path.abspath(__file__)))
    # The driver records only the LAST 2000 bytes of stdout, and the
    # full line above exceeds that (BENCH_r09.json cut off mid-dict,
    # losing the per-query medians the median-of-3 harness exists to
    # record).  Emit a compact final summary — totals + the per-query
    # MEDIANS (the verdict number) — guaranteed to fit the tail window
    # as a complete, parseable JSON line; precision degrades before the
    # line is ever allowed to outgrow the window.
    summary = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "full_results_file": "BENCH_LAST.json",
        "warm_passes": WARM_PASSES,
        "warm_total_sec": round(sum(warm_median.values()), 3),
        "warm_min_total_sec": round(sum(warm_min.values()), 3),
        "error_queries": sorted(errors),
        "queries_warm_median": warm_median,
    }
    line = json.dumps(summary, separators=(",", ":"))
    for ndigits in (2, 1):
        if len(line) <= 1900:
            break
        summary["queries_warm_median"] = {
            n: round(v, ndigits) for n, v in warm_median.items()
        }
        line = json.dumps(summary, separators=(",", ":"))
    if len(line) > 1900:
        # final fallback: totals always survive the tail window even
        # if the per-query dict itself outgrows it (many more headline
        # queries, or 1000s-scale medians)
        # graceful degradation (r14: 74 queries no longer fit even at
        # 1 digit, and the old fallback dropped ALL per-query data —
        # exactly what the round-over-round comparison needs most):
        # keep the MOST EXPENSIVE queries, drop from the cheap end,
        # and record how many were elided so the truncation is
        # visible, never silent.
        by_cost = sorted(warm_median, key=warm_median.get, reverse=True)
        while by_cost:
            trimmed = {
                n: round(warm_median[n], 1) for n in by_cost
            }
            trimmed["_elided_cheapest_n"] = len(warm_median) - len(by_cost)
            summary["queries_warm_median"] = trimmed
            line = json.dumps(summary, separators=(",", ":"))
            if len(line) <= 1900:
                break
            by_cost.pop()  # drop the cheapest remaining
        else:
            summary["queries_warm_median"] = {
                "_dropped_n_queries": len(warm_median)
            }
            line = json.dumps(summary, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
