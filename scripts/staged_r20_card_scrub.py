"""The r20 registration for ``doc_card_scrub``, ready to paste — and a
self-check that runs the exact registered pair through a driver-style
compare first.

    python scripts/staged_r20_card_scrub.py [sf_dir ...]

r20 is a single-slot round (window = r16's 49 stale rows + exactly one
freshness-0 slot; see COVERAGE.md "r19 plan").  The paste into
``python_dtl_spark/catalog.py`` is the block between the PASTE markers
below, verbatim (it only uses names already imported there: ``F``,
``_read``, ``_register``, ``text``).  The oracle is
``text.card_scrub_replay_sql`` — the same builder the unit tests and
the r19 3-scale ad-hoc validation run, so the registered SQL cannot
drift from the tested SQL.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from python_dtl_spark.operators import text  # noqa: E402

# ---- PASTE INTO catalog.py FROM HERE ------------------------------------


def _q_card_scrub(spark, sf_dir):
    """Luhn-verified payment-card redaction (the PAN leg of the PII
    battery): plant the %7 fixture arms — valid Visa/MC/Amex plain and
    grouped, a bad-check-digit twin, a too-short run, and BOTH
    r18-advisor classes (absorbed PAN `4111111111119 000`; a verified
    value recurring inside a longer invalid run) — row-locally over
    the real documents table, then scrub.  The oracle replays the
    ENTIRE algorithm (candidate regex, split-rebuild, separator-
    bounded sub-run scan, exact-integer Luhn fold) via
    ``text.card_scrub_replay_sql``, so natural corpus digit runs are
    judged identically by construction — algorithm-complete, not a
    planted-truth shortcut."""
    did = F.col("doc_id")
    plant = (
        F.when(did % 7 == 0, F.lit(" pay 4111111111111111."))
        .when(did % 7 == 1, F.lit(" card 5500-0000-0000-0004 x"))
        .when(did % 7 == 2, F.lit(" ref 4111111111111112 (bad)"))
        .when(did % 7 == 3, F.lit(" amex 378282246310005"))
        .when(did % 7 == 4, F.lit(" card 4111111111119 000."))
        .when(
            did % 7 == 5,
            F.lit(" pay 4111111111119 and ref 4111111111119 000"),
        )
        .otherwise(F.lit(" order 123456789012"))
    )
    docs = (
        _read(spark, sf_dir, "documents")  # noqa: F821 (catalog scope)
        .select("doc_id", "text")
        .filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
        .withColumn("text", F.concat(F.col("text"), plant))
    )
    return text.card_scrub(docs)


_CARD_SCRUB_DOCS_SRC = """(
    SELECT doc_id,
           text || CASE doc_id % 7
               WHEN 0 THEN ' pay 4111111111111111.'
               WHEN 1 THEN ' card 5500-0000-0000-0004 x'
               WHEN 2 THEN ' ref 4111111111111112 (bad)'
               WHEN 3 THEN ' amex 378282246310005'
               WHEN 4 THEN ' card 4111111111119 000.'
               WHEN 5 THEN ' pay 4111111111119 and '
                           || 'ref 4111111111119 000'
               ELSE ' order 123456789012' END AS text
    FROM documents
    WHERE doc_id IS NOT NULL AND text IS NOT NULL
)"""

# in catalog.py this line follows the function:
# _register("doc_card_scrub", _q_card_scrub,
#           text.card_scrub_replay_sql(_CARD_SCRUB_DOCS_SRC))

# ---- PASTE INTO catalog.py TO HERE --------------------------------------


def main() -> None:
    """Driver-style compare of the staged pair at each sf_dir."""
    import duckdb
    import pandas as pd

    from python_dtl_spark.session import get_spark

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001"]
    spark = get_spark("staged-card-scrub")
    spark.sparkContext.setLogLevel("ERROR")

    # make _read visible to the pasted block exactly as in catalog.py
    from python_dtl_spark.catalog import _read

    globals()["_read"] = _read

    for sf_dir in sf_dirs:
        got = (
            _q_card_scrub(spark, sf_dir)
            .toPandas()
            .sort_values("doc_id", ignore_index=True)
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet'"
        )
        want = (
            con.execute(
                text.card_scrub_replay_sql(_CARD_SCRUB_DOCS_SRC)
            )
            .df()
            .sort_values("doc_id", ignore_index=True)
        )
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
