"""Time named catalog queries: 1 discarded cold rep + N warm reps,
print per-query warm median and min.

    python scripts/time_queries.py <sf_dir> <reps> <query> [query ...]
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
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2])
    names = sys.argv[3:]
    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    for name in names:
        q = QUERIES[name]
        ts = []
        for rep in range(reps + 1):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).count()
            t = time.perf_counter() - t0
            release_all_cached(spark)
            if rep > 0:
                ts.append(t)
        print(
            f"{name:36s} med={statistics.median(ts):7.3f} "
            f"min={min(ts):7.3f} all={[round(t, 2) for t in ts]}"
        )


if __name__ == "__main__":
    main()
