"""Driver-style self-check of the ``doc_card_scrub`` registration.

    python scripts/staged_r20_card_scrub.py [sf_dir ...]

Until r20 this file HELD the staged registration block (r19 had zero
window headroom, so the pair lived here, pre-verified, waiting for the
r20 slot).  The block is now pasted into ``python_dtl_spark/catalog.py``
— this script imports the REGISTERED pair from there (r19 advisor: the
old copy injected ``_read`` into module globals at runtime, which broke
plain imports) and replays the driver compare, so what it checks is
byte-for-byte what the driver runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    """Driver-style compare of the registered pair at each sf_dir."""
    import duckdb

    from python_dtl_spark.catalog import QUERIES
    from python_dtl_spark.session import get_spark

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001"]
    spark = get_spark("staged-card-scrub")
    spark.sparkContext.setLogLevel("ERROR")
    q = QUERIES["doc_card_scrub"]

    for sf_dir in sf_dirs:
        got = (
            q.fn(spark, sf_dir)
            .toPandas()
            .sort_values("doc_id", ignore_index=True)
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet'"
        )
        want = con.execute(q.oracle).df().sort_values("doc_id", ignore_index=True)
        same = (
            list(got.columns) == list(want.columns)
            and len(got) == len(want)
            and got.equals(want.astype(got.dtypes.to_dict()))
        )
        print(f"{sf_dir}: {'MATCH' if same else 'MISMATCH'} ({len(got)} rows)")
        if not same:
            diff = got.compare(want.astype(got.dtypes.to_dict()))
            print(diff.head(10))
            raise SystemExit(1)


if __name__ == "__main__":
    main()
