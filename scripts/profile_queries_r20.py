"""r20 profiling: split each headline query's wall time into
plan-construction time (incl. operator eager jobs: counts, collects,
approxQuantile, persists) vs final-action time, warm (3rd rep).

    python scripts/profile_queries_r20.py [sf_dir] [query ...]

Prints one line per query: name, construct_s, action_s, total_s
(median of 3 warm reps after 1 discarded cold rep).
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from python_dtl_spark.catalog import QUERIES  # noqa: E402
from python_dtl_spark.operators.dedup import release_all_cached  # noqa: E402
from python_dtl_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:] or [n for n, q in QUERIES.items() if q.headline]
    spark = get_spark("profile-r20")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    for name in names:
        q = QUERIES[name]
        cons, act = [], []
        for rep in range(4):
            t0 = time.perf_counter()
            try:
                df = q.fn(spark, sf_dir)
                t1 = time.perf_counter()
                df.count()
                t2 = time.perf_counter()
            except Exception as exc:  # noqa: BLE001
                print(f"{name}: ERROR {exc!r}"[:160])
                break
            finally:
                release_all_cached(spark)
            if rep > 0:  # discard cold rep
                cons.append(t1 - t0)
                act.append(t2 - t1)
        if cons:
            c = statistics.median(cons)
            a = statistics.median(act)
            print(f"{name:40s} construct={c:7.3f}  action={a:7.3f}  total={c + a:7.3f}")


if __name__ == "__main__":
    main()
