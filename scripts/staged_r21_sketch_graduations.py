"""Staged r21/r22 graduations for the three remaining rows-only sketch
twins, using the r19 ``orders_table_profile_sketch`` template: keep the
sketch tier as the operator under test, hash the EXACT twin's legs
directly, and ship each sketch leg as a tolerance flag whose
non-vacuity is pinned by its own unit test.

    python scripts/staged_r21_sketch_graduations.py [sf_dir ...]

Schedule (window discipline — memory: one freshness-0 slot per round
when the backlog rotation is at steady state, and each of these rows
is ALREADY the round's rows-only cadence pick in its due round, so the
graduation costs ZERO extra slots, exactly like r19's profile-sketch
graduation):

- r21: ``dtl_approx_distinct_parts`` (due by cadence — last checked
  r17).  Paste block 1.
- r22: ``events_value_histogram_sketch`` + ``events_winsorized_sketch``
  (both due by cadence — last checked r18; ``_ROWS_ONLY_PER_ROUND`` is
  2, so both rotate in together).  Paste blocks 2 and 3.

Each block REPLACES the existing ``_register(name, fn, None)`` pair in
``python_dtl_spark/catalog.py`` (helpers + function + registration,
verbatim — beyond the block's own helper definitions, every name it
uses is already in catalog scope).  After pasting, add
the graduated name to ``_CHANGED_IN_ROUND`` with the landing round so
the forced-re-verify override is explicit (oracle None→SQL flips
freshness to 0 anyway; the entry documents intent).

The self-check below imports the blocks and runs the exact driver
compare at each sf_dir, like scripts/staged_r20_card_scrub.py did for
the r20 slot (r19 advisor: no runtime globals injection — everything
imports from the catalog at module top).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from python_dtl_spark.catalog import (  # noqa: E402
    _dtl,
    _read_events,
    _sketch_within_tolerance,
)
from python_dtl_spark.operators import stats  # noqa: E402

# ---- PASTE BLOCK 1 (r21): dtl_approx_distinct_parts ----------------------
# Replaces the current `_register("dtl_approx_distinct_parts", _dtl(...),
# None)` registration.  The DTL script is UNCHANGED — the engine still
# parses and executes approx_count_distinct through the §2.4 function
# registry — but the catalog projection now hashes the exact leg
# directly and the HLL++ leg as the r19 tolerance flag, so the row
# graduates from rows-only to a full hash-green driver check.

_APPROX_DISTINCT_DTL = """
    WITH lineitem AS IMPORT 'lineitem';
    WITH output AS
        SELECT l_returnflag,
               approx_count_distinct(l_partkey) AS approx_parts,
               count_distinct(l_partkey) AS exact_parts
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag;
    EXPORT output TO 'output';
"""


def _q_approx_distinct_parts(spark, sf_dir):
    """HLL++ approx distinct per returnflag THROUGH THE DTL ENGINE
    (§2.4 approx_count_distinct in the function registry), graduated
    from rows-only to hash-checked (r21): the exact leg hashes
    directly; the engine-private HLL++ estimate ships as the
    ``_sketch_within_tolerance`` flag (|est−exact| ≤ 15%·exact+2 — 3σ
    of the default rsd=0.05; measured error on these columns ≤ 2.7% at
    all three driver scales, a >5× margin).  A broken sketch flips the flag and
    reddens the row; ``test_approx_distinct_tolerance_flag_is_not_
    vacuous`` pins that the flag actually can flip."""
    out = _dtl(_APPROX_DISTINCT_DTL)(spark, sf_dir)
    return out.select(
        "l_returnflag",
        "exact_parts",
        _sketch_within_tolerance(
            F.col("approx_parts"), F.col("exact_parts")
        ).alias("approx_ok"),
    )


_APPROX_DISTINCT_ORACLE = """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS approx_ok
    FROM lineitem
    GROUP BY l_returnflag
"""

# _register("dtl_approx_distinct_parts", _q_approx_distinct_parts,
#           _APPROX_DISTINCT_ORACLE)

# ---- PASTE BLOCK 2 (r22): events_value_histogram_sketch ------------------
# Replaces `_register("events_value_histogram_sketch",
# _q_value_histogram_sketch, None)`.  The sketch tier under test is
# t-digest approx_percentile edges; the graduated projection joins the
# exact twin on bucket and hashes (bucket, n_exact) directly plus a
# per-bucket count-deviation flag.  The deviation bound is RANK error:
# approx_percentile's default accuracy gives ~1e-4 relative rank per
# edge, but when sketch and exact land on DIFFERENT tie-run values the
# count shifts by the tie mass, so the tolerance is
# max(2, 1% of N/n_buckets) — measured max deviation is 0 / 2 / 13 at
# sf0.001 / 0.01 / 0.1 (0.13% of bucket size at sf0.1, a ~7× margin;
# the heavy value ties of the events table are exactly the tie-mass
# case the bound is sized for).


def _hist_n_within_tolerance(n_sk, n_exact, n_total):
    """|n_sk − n_exact| ≤ max(2, 1%·n_total/10), FALSE when the sketch
    bucket is missing (NULL n_sk) — factored out so
    ``test_histogram_sketch_tolerance_flag_is_not_vacuous`` can pin
    that the flag flips on a drained or vanished bucket."""
    tol = F.greatest(F.lit(2.0), 0.01 * n_total / F.lit(10))
    return F.coalesce(F.abs(n_sk - n_exact) <= tol, F.lit(False))


def _q_value_histogram_sketch(spark, sf_dir):
    """Sketch-tier equi-depth histogram (t-digest approx_percentile
    edges — constant executor memory, sketch merge instead of a
    full-column sort), graduated from rows-only to hash-checked (r22):
    exact-twin join on bucket, (bucket, n_exact) hashed directly,
    sketch leg as a count-deviation flag.  Row set = the exact twin's
    buckets (DuckDB-replayable); a sketch bucket that disappears or
    absorbs rows flips ``n_ok`` on the buckets it drained
    (coalesce(FALSE) covers the vanished-bucket case).
    ``test_histogram_sketch_tolerance_flag_is_not_vacuous`` pins the
    flag's teeth."""
    ev = _read_events(spark, sf_dir).select("value")
    sk = stats.equi_depth_histogram(ev, "value", n_buckets=10, exact=False)
    ex = stats.equi_depth_histogram(ev, "value", n_buckets=10)
    n_total = F.broadcast(
        ev.filter(F.col("value").isNotNull()).agg(
            F.count(F.lit(1)).alias("__n_total")
        )
    )
    return (
        ex.select("bucket", F.col("n").alias("n_exact"))
        .join(sk.select("bucket", F.col("n").alias("__n_sk")), "bucket", "left")
        .join(n_total)
        .select(
            "bucket",
            "n_exact",
            _hist_n_within_tolerance(
                F.col("__n_sk"), F.col("n_exact"), F.col("__n_total")
            ).alias("n_ok"),
        )
    )


_HISTOGRAM_SKETCH_ORACLE = """
    WITH ranked AS (
        SELECT value, cume_dist() OVER (ORDER BY value) AS cd FROM events
        WHERE value IS NOT NULL
    ), b AS (
        SELECT """ + ", ".join(
    f"min(CASE WHEN cd >= {i / 10!r} THEN value END) AS e{i}"
    for i in range(1, 10)
) + """
        FROM ranked
    ), t AS (
        SELECT value, CAST(""" + " + ".join(
    f"(CASE WHEN value > e{i} THEN 1 ELSE 0 END)" for i in range(1, 10)
) + """ AS BIGINT) AS bucket
        FROM events CROSS JOIN b
        WHERE value IS NOT NULL
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_exact, TRUE AS n_ok
    FROM t GROUP BY bucket
"""

# _register("events_value_histogram_sketch", _q_value_histogram_sketch,
#           _HISTOGRAM_SKETCH_ORACLE)

# ---- PASTE BLOCK 3 (r22): events_winsorized_sketch -----------------------
# Replaces `_register("events_winsorized_sketch", _q_winsorize_sketch,
# None)`.  Sketch bounds carry rank error, so which rows clip is
# engine-private — but rows FAR from the percentile boundary must
# behave identically under any in-tolerance sketch.  The graduation
# classifies each row against EXACT percentiles widened by a rank band
# delta = 0.002 (20x approx_percentile's default ~1e-4 rank error):
# below the low band the row MUST clip into [pd(p_lo-d), pd(p_lo+d)],
# inside the certain middle it MUST pass through unchanged, above the
# high band it MUST clip into the high band; rows inside a band are
# unconstrained (either outcome is in-tolerance).  (event_id, value)
# hash directly; the flag is TRUE for every row under a correct
# sketch and flips on out-of-band bounds.


def _winsorize_within_band(v, w, lo_lo, lo_hi, hi_lo, hi_hi):
    """The per-row clip-decision check against exact percentiles
    widened by the rank band: rows below the low band MUST clip into
    it, rows inside the certain middle MUST pass through, rows above
    the high band MUST clip into it, band rows are free, NULL stays
    NULL — factored out so
    ``test_winsorize_sketch_tolerance_flag_is_not_vacuous`` can pin
    that every MUST leg actually flips on a broken sketch."""
    return (
        F.when(v.isNull(), w.isNull())
        .when(v < lo_lo, w.between(lo_lo, lo_hi))
        .when(v > hi_hi, w.between(hi_lo, hi_hi))
        .when(v.between(lo_hi, hi_lo), w == v)
        .otherwise(F.lit(True))
    )


def _q_winsorize_sketch(spark, sf_dir):
    """Sketch-tier winsorization (approx_percentile bounds), graduated
    from rows-only to hash-checked (r22): exact legs (event_id, value)
    hash directly; the sketch leg ships as a rank-band flag — clip
    decisions are checked against exact percentiles widened by
    ±0.002 rank, so every row far from the boundary constrains the
    sketch and band rows stay free.
    ``test_winsorize_sketch_tolerance_flag_is_not_vacuous`` pins the
    flag's teeth."""
    ev = _read_events(spark, sf_dir).select("event_id", "value")
    out = stats.winsorize(ev, "value", lower=0.01, upper=0.99, exact=False)
    delta = 0.002
    band = F.broadcast(
        ev.agg(
            *[
                F.expr(
                    f"percentile_disc({q!r}) WITHIN GROUP (ORDER BY value)"
                ).alias(a)
                for q, a in [
                    (0.01 - delta, "__lo_lo"),
                    (0.01 + delta, "__lo_hi"),
                    (0.99 - delta, "__hi_lo"),
                    (0.99 + delta, "__hi_hi"),
                ]
            ]
        )
    )
    ok = _winsorize_within_band(
        F.col("value"),
        F.col("value_winsorized"),
        F.col("__lo_lo"),
        F.col("__lo_hi"),
        F.col("__hi_lo"),
        F.col("__hi_hi"),
    )
    return out.join(band).select("event_id", "value", ok.alias("w_ok"))


_WINSORIZE_SKETCH_ORACLE = """
    SELECT event_id, value, TRUE AS w_ok FROM events
"""

# _register("events_winsorized_sketch", _q_winsorize_sketch,
#           _WINSORIZE_SKETCH_ORACLE)

# ---- END PASTE BLOCKS ----------------------------------------------------

_STAGED = {
    "dtl_approx_distinct_parts": (
        _q_approx_distinct_parts,
        _APPROX_DISTINCT_ORACLE,
        ["lineitem"],
    ),
    "events_value_histogram_sketch": (
        _q_value_histogram_sketch,
        _HISTOGRAM_SKETCH_ORACLE,
        ["events"],
    ),
    "events_winsorized_sketch": (
        _q_winsorize_sketch,
        _WINSORIZE_SKETCH_ORACLE,
        ["events"],
    ),
}


def main() -> None:
    """Driver-style compare of each staged pair at each sf_dir."""
    import duckdb

    from python_dtl_spark.session import get_spark

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001"]
    spark = get_spark("staged-sketch-graduations")
    spark.sparkContext.setLogLevel("ERROR")

    failed = False
    for sf_dir in sf_dirs:
        con = duckdb.connect()
        for t in ("lineitem", "events"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        for name, (fn, oracle, _tables) in _STAGED.items():
            got = fn(spark, sf_dir).toPandas()
            want = con.execute(oracle).df()
            key = [got.columns[0]] + (
                ["value"] if "value" in got.columns else []
            )
            got = got.sort_values(key, ignore_index=True)
            want = want.sort_values(key, ignore_index=True)
            same = (
                list(got.columns) == list(want.columns)
                and len(got) == len(want)
                and got.equals(want.astype(got.dtypes.to_dict()))
            )
            print(
                f"{sf_dir} {name}: {'MATCH' if same else 'MISMATCH'} "
                f"({len(got)} rows)"
            )
            if not same:
                failed = True
                print(got.compare(want.astype(got.dtypes.to_dict())).head(10))
    if failed:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
