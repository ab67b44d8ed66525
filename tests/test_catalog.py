"""Invariants of the driver-facing catalog contract.

The driver checks exactly the first 50 entries of ``queries()`` — these
tests keep the ordering machinery honest without running any query.
"""

from __future__ import annotations

from python_dtl_spark.catalog import _DRIVER_ORDER, QUERIES


def test_driver_order_has_no_duplicates():
    assert len(_DRIVER_ORDER) == len(set(_DRIVER_ORDER))


def test_driver_order_covers_catalog_exactly():
    # every listed name registered, every registered name listed (new
    # queries may legitimately be unlisted — they auto-slot into the
    # window — but a listed-but-unregistered name would KeyError at
    # import, and drift in the other direction should be deliberate)
    assert set(_DRIVER_ORDER) <= set(QUERIES)


def test_window_holds_never_or_least_verified_queries():
    # The first 50 exported entries are the driver's correctness
    # window.  Twice-green basics (tier 4) must never occupy window
    # slots while any newer query sits outside.
    window = list(QUERIES)[:50]
    tier4_start = _DRIVER_ORDER.index("dtl_q1_pricing_summary")
    tier4 = set(_DRIVER_ORDER[tier4_start:])
    assert not (set(window) & tier4), sorted(set(window) & tier4)


def test_oracle_keys_subset_of_queries():
    for name, q in QUERIES.items():
        assert q.fn is not None, name
        if q.oracle is not None:
            assert isinstance(q.oracle, str) and q.oracle.strip(), name


def test_headline_queries_exist_and_have_oracles_where_expected():
    headline = [n for n, q in QUERIES.items() if q.headline]
    assert len(headline) >= 27  # bench regression baseline set
    # bench iterates sorted(QUERIES) — names must be stable identifiers
    for n in QUERIES:
        assert n == n.strip() and " " not in n
