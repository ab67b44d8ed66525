"""Property-based differential testing: random DTL queries on random
tables, executed by BOTH this engine (ordered mode) and DuckDB; result
multisets must match exactly.

The generator emits a typed expression grammar (strict DTL typing:
int64-only and double-only subtrees, no coercion) that renders to both
DTL and ANSI SQL.  Integer division is excluded — DTL truncates C-style
(reference eval.py:214-224) while SQL engines differ.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from python_dtl_spark import run_simple

# --- typed expression grammar ----------------------------------------------

INT_COLS = ["key", "a"]
DBL_COLS = ["b"]


def int_expr(depth: int = 2):
    leaf = st.one_of(
        st.sampled_from(INT_COLS),
        st.integers(min_value=-5, max_value=9).map(str),
    )
    if depth == 0:
        return leaf
    return st.one_of(
        leaf,
        st.tuples(
            int_expr(depth - 1), st.sampled_from(["+", "-", "*"]), int_expr(depth - 1)
        ).map(lambda t: f"({t[0]} {t[1]} {t[2]})"),
    )


def dbl_expr(depth: int = 1):
    leaf = st.one_of(
        st.sampled_from(DBL_COLS),
        st.floats(min_value=-2.0, max_value=2.0, allow_nan=False).map(
            lambda v: f"{round(v, 2)}"
        ),
    )
    if depth == 0:
        return leaf
    return st.one_of(
        leaf,
        st.tuples(
            dbl_expr(depth - 1), st.sampled_from(["+", "-", "*"]), dbl_expr(depth - 1)
        ).map(lambda t: f"({t[0]} {t[1]} {t[2]})"),
    )


def comparison():
    op = st.sampled_from(["=", "!=", "<", "<=", ">", ">="])
    return st.one_of(
        st.tuples(int_expr(), op, int_expr()).map(lambda t: f"{t[0]} {t[1]} {t[2]}"),
        st.tuples(dbl_expr(), op, dbl_expr()).map(lambda t: f"{t[0]} {t[1]} {t[2]}"),
    )


def predicate(depth: int = 1):
    if depth == 0:
        return comparison()
    return st.one_of(
        comparison(),
        st.tuples(
            predicate(depth - 1), st.sampled_from(["&", "|"]), predicate(depth - 1)
        ).map(lambda t: f"({t[0]} {t[1]} {t[2]})"),
    )


def to_sql(expr: str) -> str:
    return expr.replace("&", "AND").replace("|", "OR").replace("!=", "<>")


rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),  # key
        st.integers(min_value=-10, max_value=10),  # a
        st.floats(min_value=-3.0, max_value=3.0, allow_nan=False).map(
            lambda v: round(v, 3)
        ),  # b
    ),
    min_size=1,
    max_size=20,
)


def _canon(df: pd.DataFrame) -> list[tuple]:
    out = []
    for row in df.itertuples(index=False):
        out.append(
            tuple(
                round(v, 6) if isinstance(v, float) else int(v) for v in row
            )
        )
    return sorted(out)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=rows_strategy, proj_int=int_expr(), proj_dbl=dbl_expr(), pred=predicate())
def test_select_where_matches_duckdb(spark, rows, proj_int, proj_dbl, pred):
    pdf = pd.DataFrame(rows, columns=["key", "a", "b"])
    pdf["key"] = pdf["key"].astype("int64")
    pdf["a"] = pdf["a"].astype("int64")
    pdf["b"] = pdf["b"].astype("float64")

    dtl_src = (
        "WITH t AS IMPORT 't';\n"
        f"WITH o AS SELECT {proj_int} AS x, {proj_dbl} AS y FROM t WHERE {pred};\n"
        "EXPORT o TO 'o';"
    )
    sql = (
        f"SELECT {to_sql(proj_int)} AS x, {to_sql(proj_dbl)} AS y "
        f"FROM t WHERE {to_sql(pred)}"
    )

    out = run_simple(
        dtl_src,
        spark=spark,
        inputs={"t": spark.createDataFrame(pdf)},
        ordered=True,
    )
    got = _canon(out["o"].toPandas())

    con = duckdb.connect()
    con.register("t", pdf)
    want = _canon(con.execute(sql).df())
    con.close()

    assert got == want, f"\nDTL: {dtl_src}\nSQL: {sql}"


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(rows=rows_strategy, pred=predicate())
def test_group_by_matches_duckdb(spark, rows, pred):
    pdf = pd.DataFrame(rows, columns=["key", "a", "b"])
    pdf["key"] = pdf["key"].astype("int64")
    pdf["a"] = pdf["a"].astype("int64")
    pdf["b"] = pdf["b"].astype("float64")

    dtl_src = (
        "WITH t AS IMPORT 't';\n"
        "WITH o AS SELECT key, sum(a) AS s, count() AS n, min(b) AS mb\n"
        f"          FROM t WHERE {pred} GROUP BY key;\n"
        "EXPORT o TO 'o';"
    )
    sql = (
        "SELECT key, sum(a) AS s, count(*) AS n, min(b) AS mb "
        f"FROM t WHERE {to_sql(pred)} GROUP BY key"
    )

    out = run_simple(
        dtl_src,
        spark=spark,
        inputs={"t": spark.createDataFrame(pdf)},
        ordered=False,
    )
    got = _canon(out["o"].toPandas())
    con = duckdb.connect()
    con.register("t", pdf)
    want = _canon(con.execute(sql).df())
    con.close()
    assert got == want, f"\nDTL: {dtl_src}\nSQL: {sql}"


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    rows_l=rows_strategy,
    rows_r=rows_strategy,
    how=st.sampled_from(["JOIN", "LEFT JOIN", "SEMI JOIN", "ANTI JOIN"]),
    shift=st.integers(min_value=0, max_value=2),
)
def test_join_matches_duckdb(spark, rows_l, rows_r, how, shift):
    """Joins (incl. theta via key arithmetic) against DuckDB."""
    pl = pd.DataFrame(rows_l, columns=["key", "a", "b"]).astype(
        {"key": "int64", "a": "int64", "b": "float64"}
    )
    pr = pd.DataFrame(rows_r, columns=["key", "c", "d"]).astype(
        {"key": "int64", "c": "int64", "d": "float64"}
    )

    if how in ("SEMI JOIN", "ANTI JOIN"):
        select = "l.key, l.a"
        sql_select = "l.key, l.a"
    else:
        select = "l.key, l.a, r.c"
        sql_select = "l.key, l.a, r.c"
    cond = f"l.key + {shift} = r.key" if shift else "l.key = r.key"

    dtl_src = (
        "WITH l AS IMPORT 'l';\nWITH r AS IMPORT 'r';\n"
        f"WITH o AS SELECT {select} FROM l {how} r ON {cond};\n"
        "EXPORT o TO 'o';"
    )
    sql_how = {"JOIN": "JOIN", "LEFT JOIN": "LEFT JOIN"}.get(how)
    if sql_how:
        sql = f"SELECT {sql_select} FROM l {sql_how} r ON {cond}"
    elif how == "SEMI JOIN":
        sql = f"SELECT l.key, l.a FROM l WHERE EXISTS (SELECT 1 FROM r WHERE {cond})"
    else:
        sql = f"SELECT l.key, l.a FROM l WHERE NOT EXISTS (SELECT 1 FROM r WHERE {cond})"

    out = run_simple(
        dtl_src,
        spark=spark,
        inputs={"l": spark.createDataFrame(pl), "r": spark.createDataFrame(pr)},
        ordered=False,
    )
    pdf_out = out["o"].toPandas()
    # LEFT JOIN null c: canonicalize None/NaN to sentinel
    got = sorted(
        tuple(-(10**9) if v is None or (isinstance(v, float) and math.isnan(v)) else int(v) if not isinstance(v, float) else round(v, 6) for v in row)
        for row in pdf_out.itertuples(index=False)
    )
    con = duckdb.connect()
    con.register("l", pl)
    con.register("r", pr)
    wdf = con.execute(sql).df()
    con.close()
    want = sorted(
        tuple(-(10**9) if v is None or (isinstance(v, float) and math.isnan(v)) else int(v) if not isinstance(v, float) else round(v, 6) for v in row)
        for row in wdf.itertuples(index=False)
    )
    assert got == want, f"\nDTL: {dtl_src}\nSQL: {sql}"


# --- as-of join vs brute-force reference ------------------------------------

asof_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # uid
        st.integers(min_value=0, max_value=50),  # t
    ),
    min_size=0,
    max_size=25,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=asof_rows, right=asof_rows)
def test_asof_join_matches_bruteforce(spark, left, right):
    from python_dtl_spark.operators.joins import asof_join

    # unique (uid, t) on the right: asof output is undefined under right
    # ties (documented), so the generator dedupes
    right = sorted({(u, t) for u, t in right})
    left = [(i, u, t) for i, (u, t) in enumerate(left)]
    rdf_rows = [(u, t, float(u * 100 + t)) for u, t in right]
    ldf = spark.createDataFrame(left, "lid long, uid long, t long") if left else None
    if ldf is None:
        return
    rdf = spark.createDataFrame(rdf_rows or [(99, 99, 0.0)], "uid long, t long, rv double")
    if not rdf_rows:
        rdf = rdf.filter("uid < 0")  # empty right side, schema kept

    got = {
        r.lid: (r.t_right, r.rv)
        for r in asof_join(ldf, rdf, on="t", by="uid", value_cols=["rv"]).collect()
    }
    for lid, u, t in left:
        cands = [(ru, rt, rv) for (ru, rt, rv) in rdf_rows if ru == u and rt <= t]
        if cands:
            _, bt, bv = max(cands, key=lambda c: c[1])
            assert got[lid] == (bt, bv), (lid, u, t)
        else:
            assert got[lid] == (None, None), (lid, u, t)
    assert len(got) == len(left)  # every left row exactly once


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    points=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 400)), min_size=1, max_size=20
    ),
    intervals=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 400), st.integers(0, 150)),
        min_size=0,
        max_size=10,
    ),
    bucket=st.sampled_from([7, 60, 100, 500]),
)
def test_range_join_matches_bruteforce(spark, points, intervals, bucket):
    """Bucketized range join must equal the brute-force containment
    relation for every bucket width (buckets are an execution detail,
    never a semantics knob)."""
    from python_dtl_spark.operators.joins import range_join_point_in_interval

    pts = [(i, g, t) for i, (g, t) in enumerate(points)]
    ivs = [(j, g, s, s + w) for j, (g, s, w) in enumerate(intervals)]
    pdf = spark.createDataFrame(pts, "pid long, g long, t long")
    idf = spark.createDataFrame(
        ivs or [(0, 99, 0, 0)], "iid long, g long, s long, e long"
    )
    if not ivs:
        idf = idf.filter("g < 0")
    got = {
        (r.pid, r.iid)
        for r in range_join_point_in_interval(
            pdf, idf, point_col="t", start_col="s", end_col="e",
            by="g", bucket_seconds=bucket,
        ).collect()
    }
    want = {
        (pid, iid)
        for pid, pg, t in pts
        for iid, ig, s, e in ivs
        if pg == ig and s <= t <= e
    }
    assert got == want


# --- stream-stream interval join vs brute force -----------------------------


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=asof_rows, right=asof_rows)
def test_interval_join_matches_bruteforce(spark, left, right):
    import datetime as dt

    from python_dtl_spark.streaming import interval_join

    base = dt.datetime(2024, 1, 1)
    L = [(i, u, base + dt.timedelta(minutes=t)) for i, (u, t) in enumerate(left)]
    R = [
        (1000 + j, u, base + dt.timedelta(minutes=t))
        for j, (u, t) in enumerate(right)
    ]
    if not L or not R:
        return
    ldf = spark.createDataFrame(L, "lid long, user_id long, ts timestamp")
    rdf = spark.createDataFrame(R, "rid long, user_id long, ts timestamp")
    got = {
        (r.lid, r.rid)
        for r in interval_join(
            ldf, rdf, by="user_id", ts_col="ts", max_delay="10 minutes",
            right_cols=["rid"],
        ).collect()
    }
    exp = {
        (lid, rid)
        for (lid, lu, lt) in L
        for (rid, ru, rt) in R
        if lu == ru and rt <= lt and (lt - rt) <= dt.timedelta(minutes=10)
    }
    assert got == exp


# --- sequence packing invariants --------------------------------------------


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tokens=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=40))
def test_pack_token_budget_invariants(spark, tokens):
    from python_dtl_spark.operators import text

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tokens)], "doc_id long, n_tokens long"
    )
    out = text.pack_token_budget(docs, budget=256, num_groups=4).collect()
    assert len(out) == len(tokens)  # every doc assigned exactly once
    assert all(0 <= r.seq_offset < 256 for r in out)
    # within each group, id-ordered docs occupy a contiguous token
    # stream: position = exclusive cumsum of the group's token counts
    by_grp = {}
    for r in sorted(out, key=lambda r: r.doc_id):
        by_grp.setdefault(r.pack_group, []).append(r)
    for rows in by_grp.values():
        pos = [r.seq_index * 256 + r.seq_offset for r in rows]
        acc, starts = 0, []
        for r in rows:
            starts.append(acc)
            acc += tokens[r.doc_id]
        assert pos == starts


# --- exact-substring duplication census ------------------------------------

doc_corpus = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12
    ).map(" ".join),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=doc_corpus, k=st.integers(min_value=2, max_value=4))
def test_duplicated_token_windows_matches_bruteforce(spark, texts, k):
    from python_dtl_spark.operators.text import duplicated_token_windows

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_windows, r.n_dup_windows)
        for r in duplicated_token_windows(docs, window_tokens=k).collect()
    }

    # brute-force reference: window -> set of docs containing it
    windows: dict[int, list[tuple[str, ...]]] = {}
    owners: dict[tuple[str, ...], set[int]] = {}
    for i, text in enumerate(texts):
        toks = text.split()
        ws = [tuple(toks[j : j + k]) for j in range(len(toks) - k + 1)]
        windows[i] = ws
        for w in ws:
            owners.setdefault(w, set()).add(i)
    # short docs (no windows) keep an explicit (0, 0) row
    expect = {
        i: (len(ws), sum(1 for w in ws if len(owners[w]) > 1))
        for i, ws in windows.items()
    }
    assert got == expect


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=doc_corpus, n=st.integers(min_value=2, max_value=3))
def test_ngram_dominance_matches_bruteforce(spark, texts, n):
    from collections import Counter

    from python_dtl_spark.operators.text import ngram_dominance

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_grams, r.top_count)
        for r in ngram_dominance(docs, n=n).collect()
    }
    expect = {}
    for i, text in enumerate(texts):
        toks = text.split()
        grams = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
        c = Counter(grams)
        # short docs keep an explicit (0, 0) row
        expect[i] = (len(grams), max(c.values()) if grams else 0)
    assert got == expect


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=200), min_size=1, max_size=120
    ),
    k=st.sampled_from([16, 64]),
)
def test_kmv_distinct_exact_below_k_and_bounded_error(spark, keys, k):
    from python_dtl_spark.operators import stats

    df = spark.createDataFrame([("g", x) for x in keys], "g string, key long")
    n_true = len(set(keys))
    [row] = stats.kmv_distinct(df, "key", ["g"], k=k).collect()
    if n_true < k:
        # sketch saw every distinct hash: exact by construction
        assert row.approx_distinct == n_true
    else:
        # KMV relative error concentrates around 1/sqrt(k); allow a
        # generous 6/sqrt(k) so the test never flakes on the
        # deterministic md5 "draw" for a given key set
        assert abs(row.approx_distinct - n_true) <= max(3, 6 * n_true / (k ** 0.5))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(
        st.sampled_from(["alpha", "beta", "x1", "contact", "now"]),
        min_size=0,
        max_size=6,
    ),
    emails=st.integers(min_value=0, max_value=3),
    phones=st.integers(min_value=0, max_value=3),
    upper=st.booleans(),
)
def test_pii_scrub_counts_match_injections(spark, words, emails, phones, upper):
    from python_dtl_spark.operators.text import pii_scrub

    parts = list(words)
    # mixed-case branch: the patterns are (?i), so 'John.Doe@Example.COM'
    # must count and redact the same as its lowercase form
    parts += [
        f"User{i}@Host{i}.Example.COM" if upper
        else f"user{i}@host{i}.example.com"
        for i in range(emails)
    ]
    parts += [f"555-{1000 + i}" for i in range(phones)]
    text = " ".join(parts)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    [row] = pii_scrub(df).collect()
    assert row.n_emails == emails
    assert row.n_phones == phones
    assert "@" not in row.text or emails == 0
    assert row.text.count("<EMAIL>") == emails
    assert row.text.count("<PHONE>") == phones


# --- deterministic corpus-mix sampling -------------------------------------


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=60), min_size=1, max_size=4),
    quota=st.integers(min_value=1, max_value=30),
)
def test_domain_quota_invariants(spark, sizes, quota):
    from python_dtl_spark.operators.sampling import domain_quota

    rows, k = [], 0
    for d, n in enumerate(sizes):
        for _ in range(n):
            rows.append((k, f"dom{d}"))
            k += 1
    df = spark.createDataFrame(rows, "k long, dom string")
    out = domain_quota(df, "dom", "k", quota=quota).collect()
    got = {}
    for r in out:
        got.setdefault(r.dom, set()).add(r.k)
    # exactly min(quota, n_i) survivors per domain, all from that domain
    for d, n in enumerate(sizes):
        assert len(got.get(f"dom{d}", set())) == min(quota, n)
    all_keys = {r.k for r in out}
    assert len(all_keys) == sum(min(quota, n) for n in sizes)  # no dup rows


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(min_value=5, max_value=400), min_size=2, max_size=4),
    alpha_num=st.sampled_from([(0, 1), (1, 3), (1, 2), (2, 3), (1, 1)]),
)
def test_temperature_resample_invariants(spark, sizes, alpha_num):
    from fractions import Fraction

    from python_dtl_spark.operators.sampling import temperature_resample

    a, b = alpha_num
    alpha = Fraction(a, b)
    rows, k = [], 0
    for d, n in enumerate(sizes):
        for _ in range(n):
            rows.append((k, f"dom{d}"))
            k += 1
    df = spark.createDataFrame(rows, "k long, dom string")
    out = temperature_resample(df, "dom", "k", alpha=alpha).collect()
    kept = {}
    for r in out:
        kept.setdefault(r.dom, 0)
        kept[r.dom] += 1
    n_min = min(sizes)
    smallest = f"dom{sizes.index(n_min)}"
    # the smallest stratum always keeps everything (f = 1 exactly)
    assert kept.get(smallest, 0) == n_min
    if alpha == 1:
        assert len(out) == sum(sizes)  # identity mix
    # survivors never exceed the stratum and keep counts are
    # monotone in the target fraction: bigger domains keep a
    # smaller SHARE of their rows (within hash noise this is only
    # asserted as a hard bound, not distributional)
    for d, n in enumerate(sizes):
        assert kept.get(f"dom{d}", 0) <= n


# --- profiling operators ---------------------------------------------------


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.one_of(
            st.integers(min_value=-50, max_value=50).map(float), st.none()
        ),
        min_size=2,
        max_size=120,
    ),
    k=st.integers(min_value=2, max_value=8),
    exact=st.booleans(),
)
def test_equi_depth_histogram_invariants(spark, vals, k, exact):
    """Both tiers: exact percentile_disc edges AND the t-digest
    approx_percentile 100 TB valve — counts always cover exactly the
    non-null rows, buckets stay ordered/non-overlapping, and lo/hi are
    actual input values (min/max over bucket members, whatever the edge
    method)."""
    from python_dtl_spark.operators.stats import equi_depth_histogram

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    non_null = [v for v in vals if v is not None]
    out = sorted(
        equi_depth_histogram(df, "v", k, exact=exact).collect(),
        key=lambda r: r.bucket,
    )
    if not non_null:
        assert out == []
        return
    # counts cover exactly the non-null rows
    assert sum(r.n for r in out) == len(non_null)
    # buckets are ordered, non-overlapping ranges of actual values
    for a, b in zip(out, out[1:]):
        assert a.bucket < b.bucket
        assert a.hi <= b.lo
    for r in out:
        assert r.lo in non_null and r.hi in non_null and r.lo <= r.hi


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000).map(float),
        min_size=3,
        max_size=100,
    ),
    exact=st.booleans(),
)
def test_winsorize_output_values_are_input_values(spark, vals, exact):
    from python_dtl_spark.operators.stats import winsorize

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k long, value double"
    )
    out = winsorize(df, "value", lower=0.1, upper=0.9, exact=exact).collect()
    assert len(out) == len(vals)
    pool = set(vals)
    for r in out:
        # clipped value is always an actual input value, order kept
        assert r.value_winsorized in pool
        lo = min(x.value_winsorized for x in out)
        hi = max(x.value_winsorized for x in out)
        assert lo <= r.value_winsorized <= hi


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=1, max_value=120),
    n_shards=st.integers(min_value=1, max_value=9),
    parts=st.sampled_from([1, 3, 7]),
)
def test_shuffle_shards_layout_invariant_total_permutation(spark, n, n_shards, parts):
    """shard/shard_pos depend only on (key, seed) — NOT on partition
    layout (the retry-stability contract) — and positions are a dense
    1..len permutation within every shard."""
    from python_dtl_spark.operators.sampling import shuffle_shards

    df = spark.createDataFrame([(i * 7 + 3,) for i in range(n)], "doc_id long")
    a = {
        r.doc_id: (r.shard, r.shard_pos)
        for r in shuffle_shards(df, "doc_id", n_shards, seed="x").collect()
    }
    b = {
        r.doc_id: (r.shard, r.shard_pos)
        for r in shuffle_shards(
            df.repartition(parts), "doc_id", n_shards, seed="x"
        ).collect()
    }
    assert a == b
    by_shard: dict[int, list[int]] = {}
    for s, p in a.values():
        by_shard.setdefault(s, []).append(p)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    assert len(a) == n


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=3,
        max_size=60,
    ),
    z=st.sampled_from([2.0, 3.5]),
)
def test_mad_outliers_matches_bruteforce(spark, vals, z):
    """Engine median/MAD gate vs a literal Python reimplementation:
    same flagged ids, same statistics (percentile_disc = sorted-element
    pick, no interpolation)."""
    from python_dtl_spark.operators.stats import mad_outliers

    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)], "id long, g string, value double"
    )
    out = {r.id: r for r in mad_outliers(df, "value", ["g"], z=z).collect()}

    def disc_median(xs):
        # smallest element whose cume_dist >= 0.5
        s = sorted(xs)
        import math as m

        return s[m.ceil(len(s) * 0.5) - 1]

    med = disc_median(vals)
    mad = disc_median([abs(v - med) for v in vals])
    expected = {}
    if mad > 0.0:
        for i, v in enumerate(vals):
            rz = 0.6745 * (v - med) / mad
            if abs(rz) > z:
                expected[i] = rz
    assert set(out) == set(expected)
    import math as m

    for i, rz in expected.items():
        assert out[i].group_median == med
        assert out[i].group_mad == mad
        if m.isinf(rz):
            # a subnormal MAD can overflow the ratio — both engines
            # overflow identically; inf - inf is nan, so compare exactly
            assert out[i].robust_z == rz
        else:
            assert abs(out[i].robust_z - rz) < 1e-12


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12),
        min_size=1,
        max_size=5,
    ),
    pair=st.tuples(st.sampled_from(["a", "b"]), st.sampled_from(["a", "b"])),
)
def test_apply_merge_matches_greedy_reference(spark, docs, pair):
    """Spark apply_merge vs a literal Python left-to-right greedy BPE
    merge: identical merged token streams and merge counts on random
    corpora — including same-token pairs and runs, where the
    take/consume rule is easiest to get wrong."""
    from python_dtl_spark.operators.text import apply_merge

    left, right = pair
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.tokens_merged, r.n_merges)
        for r in apply_merge(df, left, right).collect()
    }

    def greedy(toks):
        res, merges, i = [], 0, 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
                res.append(left + " " + right)
                merges += 1
                i += 2
            else:
                res.append(toks[i])
                i += 1
        return res, merges

    for i, toks in enumerate(docs):
        assert out[i] == greedy(toks)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=10),
        min_size=1,
        max_size=4,
    ),
    table=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "a b", "b a", "a a"]),
            st.sampled_from(["a", "b", "c", "a b"]),
        ),
        min_size=1,
        max_size=4,
    ),
)
def test_bpe_encode_matches_sequential_greedy_reference(spark, docs, table):
    """The single-fold encoder vs a literal Python reference that
    applies each merge with left-to-right greedy non-overlap, table
    entries in order — including tables whose later entries consume
    earlier entries' merged tokens (the cascade case) and entries
    that never match."""
    from python_dtl_spark.operators.text import bpe_encode

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.tokens_bpe for r in bpe_encode(df, table).collect()
    }

    def greedy_one(toks, left, right):
        res, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
                res.append(left + " " + right)
                i += 2
            else:
                res.append(toks[i])
                i += 1
        return res

    for i, toks in enumerate(docs):
        ref = list(toks)
        for left, right in table:
            ref = greedy_one(ref, left, right)
        assert out[i] == ref


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=8),
        min_size=2,
        max_size=4,
    ),
)
def test_bpe_fit_loop_equals_single_fold_encode(spark, docs):
    """The iterative fit loop's final token arrays must equal ONE
    bpe_encode fold over the merge table it learned — the loop applies
    merges incrementally (n chained projections over caches), the
    encoder in a single expression; any divergence means the fold's
    greedy step disagrees with apply_merge's."""
    from python_dtl_spark.operators.text import bpe_encode, bpe_fit

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    fitted, merges = bpe_fit(df, n_merges=3, min_count=2)
    loop_out = {r.doc_id: r.tokens_merged for r in fitted.collect()}
    fitted.release_cached()
    enc_out = {
        r.doc_id: r.tokens_bpe
        for r in bpe_encode(df, merges, out_col="tokens_bpe").collect()
    }
    assert enc_out == loop_out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    hosts=st.lists(
        st.lists(st.sampled_from(["x", "y", "zz"]), min_size=1, max_size=4).map(
            ".".join
        ),
        min_size=1,
        max_size=6,
    ),
    rules=st.lists(
        st.tuples(
            st.lists(st.sampled_from(["x", "y", "zz"]), min_size=1, max_size=3).map(
                ".".join
            ),
            st.sampled_from(["plain", "wildcard", "exception"]),
        ),
        min_size=1,
        max_size=6,
    ),
)
def test_registrable_domains_psl_matches_reference(spark, hosts, rules):
    """Relational PSL resolution vs a literal Python reimplementation
    of the prevailing-rule algorithm on random hosts × random rule
    sets (plain/wildcard/exception over a tiny label alphabet, so
    collisions and overlapping rules are frequent)."""
    from python_dtl_spark.operators.urls import registrable_domains_psl

    parsed = [(key, kind, key.count(".") + 1) for key, kind in rules]

    def ref(host):
        labels = host.lower().split(".")
        n = len(labels)
        exc = reg = None
        for key, kind, k in parsed:
            if n >= k and labels[n - k:] == key.split("."):
                if kind == "exception":
                    exc = max(exc or 0, k - 1)
                elif kind == "plain":
                    reg = max(reg or 0, k)
                elif kind == "wildcard" and n > k:
                    reg = max(reg or 0, k + 1)
        ps = exc if exc is not None else (reg if reg is not None else 1)
        # registrable domain = public suffix + ONE preceding label
        return ".".join(labels[n - ps - 1:]) if n > ps else None

    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    out = {
        r.host: r.psl_domain
        for r in registrable_domains_psl(df, rules=parsed).collect()
    }
    for h in set(hosts):
        assert out[h] == ref(h), (h, parsed, out[h], ref(h))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=10),
        min_size=2,
        max_size=4,
    ),
)
def test_bpe_encode_broadcast_tier_equals_fold_on_fit_tables(spark, docs):
    """The big-table mapInPandas tier (min-rank-first loop, broadcast
    rank dict) must equal the plan-literal fold on tables a real
    bpe_fit produces — the no-reappearance argument: merge k's output
    concatenates tokens built by merges < k, so applying k can never
    re-create an earlier pair, making rank-order single-pass and
    min-rank-first equivalent.  Forced via max_literal_entries=0."""
    from python_dtl_spark.operators.text import bpe_encode, bpe_fit

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    fitted, merges = bpe_fit(df, n_merges=3, min_count=2)
    fitted.release_cached()
    fold = {
        r.doc_id: r.tokens_bpe for r in bpe_encode(df, merges).collect()
    }
    bcast = {
        r.doc_id: r.tokens_bpe
        for r in bpe_encode(df, merges, max_literal_entries=0).collect()
    }
    assert bcast == fold


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    train=st.lists(
        st.tuples(
            st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=6),
            st.sampled_from(["x", "y"]),
        ),
        min_size=2,
        max_size=6,
    ).filter(lambda t: len({lbl for _, lbl in t}) == 2),
    test=st.lists(
        st.lists(st.sampled_from(["a", "b", "zz"]), min_size=0, max_size=6),
        min_size=1,
        max_size=4,
    ),
)
def test_nb_row_local_equals_join_path_on_random_corpora(spark, train, test):
    """The streaming tier's plan-literal fold must equal the
    broadcast-join path on ARBITRARY corpora, not just the fixed
    fixture: random docs, both classes, OOV tokens, empty docs."""
    from python_dtl_spark.operators import classify

    tr = spark.createDataFrame(
        [(i, " ".join(ws), lbl) for i, (ws, lbl) in enumerate(train)],
        "doc_id long, text string, label string",
    )
    tc, cs = classify.nb_fit(tr, "label")
    te = spark.createDataFrame(
        [(100 + i, " ".join(ws)) for i, ws in enumerate(test)],
        "doc_id long, text string",
    )
    a = {
        r.doc_id: (r.predicted_label, round(r.log_score, 9))
        for r in classify.nb_apply(te, tc, cs).collect()
    }
    b = {
        r.doc_id: (r.predicted_label, round(r.log_score, 9))
        for r in classify.nb_apply(te, tc, cs, row_local=True).collect()
    }
    assert a == b


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=8),
        min_size=2,
        max_size=5,
    ),
)
def test_lm_row_local_equals_join_path_on_random_corpora(spark, docs):
    """lm_perplexity's plan-literal fold must equal the join path on
    arbitrary corpora: identical integer diagnostics, perplexity to
    1e-9, NULL for transition-free docs."""
    from python_dtl_spark.operators import classify

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    bi, uni = classify.lm_fit(df)
    cols = [
        "doc_id", "n_trans", "n_unseen", "n_oov_ctx",
        "sum_bigram_freq", "sum_context_freq", "perplexity",
    ]

    def norm(rows):
        return {
            r.doc_id: tuple(
                round(v, 9) if isinstance(v, float) else v
                for v in (r[c] for c in cols[1:])
            )
            for r in rows
        }

    a = norm(classify.lm_perplexity(df, bi, uni).select(cols).collect())
    b = norm(
        classify.lm_perplexity(df, bi, uni, row_local=True)
        .select(cols)
        .collect()
    )
    assert a == b


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.tuples(
        st.integers(min_value=2, max_value=20),
        st.integers(min_value=2, max_value=20),
        st.integers(min_value=2, max_value=20),
    ),
    weights=st.tuples(
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=1, max_value=3),
    ),
)
def test_target_mix_precap_identity_property(spark, sizes, weights):
    """The prefix-of-same-order identity claim, property-tested: for
    ANY stratum sizes and weights, precap_quota = max_s(w_s x K)
    yields exactly the un-capped mix."""
    from python_dtl_spark.operators import sampling

    strata = ["s1", "s2", "s3"]
    rows = []
    base = 0
    for name, n in zip(strata, sizes):
        rows += [(base + i, name) for i in range(n)]
        base += 1000
    df = spark.createDataFrame(rows, "doc_id long, src string")
    wmap = dict(zip(strata, weights))
    k = min(n // w for n, w in zip(sizes, weights))
    quota = max(w * k for w in weights)
    plain = sampling.target_mix_resample(df, "src", "doc_id", wmap, seed="pp")
    capped = sampling.target_mix_resample(
        df, "src", "doc_id", wmap, seed="pp", precap_quota=max(quota, 1)
    )
    got_p = sorted((r.doc_id, r.src) for r in plain.collect())
    got_c = sorted((r.doc_id, r.src) for r in capped.collect())
    assert got_p == got_c
    assert len(got_p) == k * sum(weights)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    target=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "dd"]), min_size=0, max_size=8),
        min_size=1,
        max_size=4,
    ),
    raw=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd", "zz", "qq"]),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=5,
    ),
)
def test_dsir_weights_match_reference_on_random_corpora(spark, target, raw):
    """DSIR weights on ARBITRARY corpora, not just the fixed fixture:
    bucket counts, all five integer diagnostics, and the float log
    weight to 1e-9 against a literal Python reference — including
    empty docs (0 features → weight 0.0) and hash-collision buckets
    (the reference hashes identically, so collisions cancel)."""
    import hashlib
    import math as m
    from collections import Counter

    from python_dtl_spark.operators import classify

    tgt = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(target)],
        "doc_id long, text string",
    )
    rw = spark.createDataFrame(
        [(100 + i, " ".join(ws)) for i, ws in enumerate(raw)],
        "doc_id long, text string",
    )
    tc = classify.dsir_fit(tgt, seed="pp")
    rc = classify.dsir_fit(rw, seed="pp")
    out = {
        r.doc_id: r
        for r in classify.dsir_weights(rw, tc, rc, seed="pp").collect()
    }

    B = 10_000

    def bucket(feat):
        return int(hashlib.md5(("pp" + feat).encode()).hexdigest()[:8], 16) % B

    def feats(ws):
        return list(ws) + [f"{x} {y}" for x, y in zip(ws, ws[1:])]

    tcnt = Counter(bucket(f) for ws in target for f in feats(ws))
    rcnt = Counter(bucket(f) for ws in raw for f in feats(ws))
    T, R = sum(tcnt.values()), sum(rcnt.values())
    for i, ws in enumerate(raw):
        r = out[100 + i]
        fs = feats(ws)
        assert r.n_feats == len(fs)
        assert r.sum_target_freq == sum(tcnt.get(bucket(f), 0) for f in fs)
        assert r.sum_raw_freq == sum(rcnt.get(bucket(f), 0) for f in fs)
        assert r.n_unseen_target == sum(bucket(f) not in tcnt for f in fs)
        assert r.n_unseen_raw == sum(bucket(f) not in rcnt for f in fs)
        lw = sum(
            m.log((tcnt.get(bucket(f), 0) + 1.0) / (T + B))
            - m.log((rcnt.get(bucket(f), 0) + 1.0) / (R + B))
            for f in fs
        )
        assert abs(r.log_weight - lw) < 1e-9


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    strata=st.lists(
        st.sampled_from(["s1", "s2", "s3", None]), min_size=1, max_size=20
    ),
    emap=st.dictionaries(
        st.sampled_from(["s1", "s2", "s3"]),
        st.integers(min_value=0, max_value=4),
        max_size=3,
    ),
)
def test_epoch_upsample_multiplicity_property(spark, strata, emap):
    """epoch_upsample on arbitrary stratum sequences and epoch maps:
    output multiplicity per row is exactly epochs.get(stratum, 1)
    (NULL strata match only a None map key — none here, so they
    default to 1), epoch indices are exactly 0..e-1, and no other
    column is disturbed."""
    from python_dtl_spark.operators import sampling

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strata)], "doc_id long, src string"
    )
    out = sampling.epoch_upsample(df, "src", emap)
    got = {}
    for r in out.collect():
        got.setdefault((r.doc_id, r.src), []).append(r.epoch)
    for i, s in enumerate(strata):
        e = emap.get(s, 1)
        eps = sorted(got.get((i, s), []))
        assert eps == list(range(e)), (i, s, e, eps)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),      # key basis
            st.sampled_from(["w", "x", "y"]),            # stratum
            st.integers(min_value=0, max_value=40),      # size
        ),
        min_size=1,
        max_size=30,
    ),
    budgets=st.dictionaries(
        st.sampled_from(["w", "x", "y"]),
        st.integers(min_value=0, max_value=120),
        min_size=1,
        max_size=3,
    ),
)
def test_token_budget_mix_matches_reference_on_random_inputs(
    spark, rows, budgets
):
    """token_budget_mix on ARBITRARY inputs vs a literal Python
    reference: per-stratum md5-rank order, greedy prefix while the
    exact running total fits, absent strata dropped — including
    zero-size rows, zero budgets, and duplicate sizes."""
    import hashlib

    from python_dtl_spark.operators import sampling

    uniq = {}
    for i, (kb, s, sz) in enumerate(rows):
        uniq[i] = (i * 100 + kb, s, sz)  # unique keys, arbitrary gaps
    data = [(k, s, sz) for k, s, sz in uniq.values()]
    df = spark.createDataFrame(data, "doc_id long, src string, n long")
    got = sorted(
        r.doc_id
        for r in sampling.token_budget_mix(
            df, "src", "doc_id", "n", budgets, seed="pp"
        ).collect()
    )
    want = []
    for s, b in budgets.items():
        members = sorted(
            (r for r in data if r[1] == s),
            key=lambda r: (
                hashlib.md5(f"pp{r[0]}".encode()).hexdigest(),
                r[0],
            ),
        )
        cum = 0
        for k, _, sz in members:
            cum += sz
            if cum <= b:
                want.append(k)
            else:
                break
    assert got == sorted(want)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["w", "x"]),                  # stratum
            st.integers(min_value=0, max_value=40),       # size
            st.integers(min_value=-5, max_value=5),       # score basis
        ),
        min_size=1,
        max_size=30,
    ),
    budgets=st.dictionaries(
        st.sampled_from(["w", "x"]),
        st.integers(min_value=0, max_value=120),
        min_size=1,
        max_size=2,
    ),
)
def test_token_budget_mix_quality_ordered_matches_reference(
    spark, rows, budgets
):
    """The quality-ordered mode (order_col, registered r15 as
    pipeline_quality_budget) on ARBITRARY inputs vs a literal Python
    reference: per-stratum (score DESC, key ASC) order — DUPLICATE
    scores are deliberately common here so the key tie-break is
    exercised — greedy prefix while the exact running total fits."""
    from python_dtl_spark.operators import sampling

    data = [
        (i, s, sz, float(q) / 2.0) for i, (s, sz, q) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "doc_id long, src string, n long, q double"
    )
    got = sorted(
        r.doc_id
        for r in sampling.token_budget_mix(
            df, "src", "doc_id", "n", budgets, order_col="q"
        ).collect()
    )
    want = []
    for s, b in budgets.items():
        members = sorted(
            (r for r in data if r[1] == s), key=lambda r: (-r[3], r[0])
        )
        cum = 0
        for k, _, sz, _q in members:
            cum += sz
            if cum <= b:
                want.append(k)
            else:
                break
    assert got == sorted(want)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    scores=st.lists(
        st.floats(
            min_value=-100.0, max_value=100.0,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=4,
        max_size=60,
    ),
)
def test_top_fraction_floor_only_invariants(spark, scores):
    """floor_only=True on ARBITRARY scores (duplicates included): the
    kept set is exactly a score-threshold slice (min kept ≥ max
    dropped — downward closed), and it NEVER undershoots the exact
    top-fraction quota: the Greenwald–Khanna rank guarantee puts the
    floor's rank at most (1−fraction−err)·n from the top, so every
    true top-⌈fraction·n⌉ row scores at or above it."""
    from fractions import Fraction

    from python_dtl_spark.operators import sampling

    data = [(i, float(s)) for i, s in enumerate(scores)]
    df = spark.createDataFrame(data, "doc_id long, score double")
    kept = sampling.top_fraction(
        df, "score", Fraction(1, 4), "doc_id", floor_only=True
    ).collect()
    kept_ids = {r.doc_id for r in kept}
    kept_scores = [s for i, s in data if i in kept_ids]
    dropped_scores = [s for i, s in data if i not in kept_ids]
    n = len(data)
    k = (n + 3) // 4
    assert len(kept_ids) >= k, (len(kept_ids), k, n)
    if dropped_scores:
        assert min(kept_scores) >= max(dropped_scores)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    weights=st.lists(
        st.floats(
            min_value=-50.0, max_value=50.0,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=40,
    ),
    num=st.integers(min_value=1, max_value=9),
)
def test_importance_resample_matches_reference_on_random_inputs(
    spark, weights, num
):
    """Gumbel-top-k importance resampling on ARBITRARY log weights vs
    a literal Python reference: exact-u construction, identical kept
    set for any fraction p/10 — including duplicate and extreme
    weights (the md5-derived Gumbel noise breaks all ties
    deterministically)."""
    import hashlib
    import math as m

    from fractions import Fraction

    from python_dtl_spark.operators import sampling

    frac = Fraction(num, 10)
    data = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(data, "doc_id long, w double")
    got = sorted(
        r.doc_id
        for r in sampling.importance_resample(
            df, "w", "doc_id", frac, seed="pp"
        ).collect()
    )

    def prio(k, w):
        v = int(hashlib.md5(f"pp{k}".encode()).hexdigest()[:12], 16)
        u = (v + 0.5) / (1 << 48)
        return w + (-m.log(-m.log(u)))

    n = len(data)
    k = (n * frac.numerator + frac.denominator - 1) // frac.denominator
    ranked = sorted(data, key=lambda r: (-prio(r[0], r[1]), r[0]))
    want = sorted(d for d, _ in ranked[:k])
    assert got == want and len(got) == k


# --- within-doc repetition rules / C4 line cleaning -------------------------

_line_words = st.lists(
    st.sampled_from(["aa", "bb", "cc", "javascript", "lorem", "ipsum"]),
    min_size=0,
    max_size=5,
).map(" ".join)
_line = st.tuples(
    _line_words, st.sampled_from([".", "!", "?", "", " "])
).map(lambda t: t[0] + t[1])
_multiline_doc = st.lists(
    st.tuples(_line, st.sampled_from(["\n", "\n\n"])), min_size=1, max_size=8
).map(lambda segs: "".join(l + sep for l, sep in segs).rstrip("\n"))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_multiline_doc, min_size=1, max_size=6))
def test_repetition_flags_matches_bruteforce(spark, texts):
    import re

    from python_dtl_spark.operators.text import repetition_flags

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (
            r.n_lines, r.dup_line_frac, r.dup_line_char_frac,
            r.n_paras, r.dup_para_frac, r.dup_para_char_frac,
        )
        for r in repetition_flags(docs).collect()
    }

    def metrics(arr):
        n = len(arr)
        dist = list(dict.fromkeys(arr))
        dup_frac = (n - len(dist)) / n if n else 0.0
        total = sum(len(x) for x in arr)
        dup_chars = sum(
            (arr.count(v) - 1) * len(v) for v in dist if arr.count(v) > 1
        )
        dcf = dup_chars / total if total else 0.0
        return n, dup_frac, dcf

    def has_content(s):
        # the operator's explicit whitespace set (space/tab/LF/CR) —
        # NOT str.strip(), which also strips \x0b/\x0c/unicode spaces
        return any(ch not in " \t\n\r" for ch in s)

    for i, text in enumerate(texts):
        lines = [l for l in text.split("\n") if has_content(l)]
        paras = [p for p in re.split(r"\n{2,}", text) if has_content(p)]
        assert got[i] == (*metrics(lines), *metrics(paras)), (i, text)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(_multiline_doc, min_size=1, max_size=6),
    dedup=st.booleans(),
)
def test_c4_clean_lines_matches_bruteforce(spark, texts, dedup):
    import re

    from python_dtl_spark.operators.text import c4_clean_lines

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.text, r.n_lines, r.n_lines_kept, r.keep)
        for r in c4_clean_lines(docs, dedup_lines=dedup).collect()
    }
    for i, text in enumerate(texts):
        lines = [l for l in text.split("\n") if l.strip() != ""]
        kept = []
        for l in lines:
            t = l.strip()
            if not any(t.endswith(p) for p in (".", "!", "?", '"')):
                continue
            if len([w for w in re.split(r"\s+", t) if w]) < 3:
                continue
            if "javascript" in t.lower():
                continue
            kept.append(t)
        if dedup:
            kept = list(dict.fromkeys(kept))
        low = text.lower()
        keep = (
            len(kept) >= 5
            and "lorem ipsum" not in low
            and "{" not in low
        )
        assert got[i] == ("\n".join(kept), len(lines), len(kept), keep), (
            i, text,
        )


# Adversarial whitespace alphabets for the trim-based text filters
# (r16 verdict item 6): the r16 hypothesis find in repetition_flags was
# a space-only-trim vs all-whitespace divergence; the audit declared
# the sibling operators' whitespace edges unreachable at fixture grain
# — these properties turn that audit into an enforced pin.  The brute
# force mirrors the OPERATOR's exact semantics: Spark trim() strips
# U+0020 ONLY (a tab/CR survives trimming, measured), and Java \\s is
# the ASCII class [ \\t\\n\\x0b\\f\\r] (\\x0b IS a word separator,
# unlike RE2 — which is why the catalog oracles keep \\x0b out of
# fixtures while THESE tests drive it on purpose).

_WS_CHUNK = st.sampled_from(
    ["ab", "cd ef", "javascript", "lorem ipsum", ".", "!", "?", '"', "{",
     " ", "\t", "\n", "\n\n", "\x0b", "\f", "\r", ""]
)
_ws_doc = st.lists(_WS_CHUNK, min_size=0, max_size=14).map("".join)

_SP_TRIM = " "  # Spark/DuckDB trim class: the space character, nothing else
_JAVA_WS = "[ \t\n\x0b\f\r]+"  # Java regex \s without UNICODE_CHARACTER_CLASS


def _java_words(s):
    import re

    return [w for w in re.split(_JAVA_WS, s) if w != ""]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_ws_doc, min_size=1, max_size=6), dedup=st.booleans())
def test_c4_clean_lines_adversarial_whitespace(spark, texts, dedup):
    """c4_clean_lines under hostile whitespace: lines split on \\n only;
    a line counts as non-empty when its SPACE-trim is non-empty (so a
    bare tab line IS a line, and is then dropped by the terminal-punct
    rule because trim never removes the tab); kept lines are emitted
    space-trimmed with interior/edge tabs, VTs and CRs intact; word
    counts split on the Java ASCII \\s class."""
    from python_dtl_spark.operators.text import c4_clean_lines

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.text, r.n_lines, r.n_lines_kept, r.keep)
        for r in c4_clean_lines(docs, dedup_lines=dedup).collect()
    }
    for i, text in enumerate(texts):
        lines = [l for l in text.split("\n") if l.strip(_SP_TRIM) != ""]
        kept = []
        for l in lines:
            s = l.strip(_SP_TRIM)
            if not any(s.endswith(p) for p in (".", "!", "?", '"')):
                continue
            if len(_java_words(s)) < 3:
                continue
            if "javascript" in s.lower():
                continue
            kept.append(s)
        if dedup:
            kept = list(dict.fromkeys(kept))
        low = text.lower()
        keep = len(kept) >= 5 and "lorem ipsum" not in low and "{" not in low
        assert got[i] == ("\n".join(kept), len(lines), len(kept), keep), (
            i, repr(text),
        )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_ws_doc, min_size=1, max_size=6))
def test_split_sentences_adversarial_whitespace(spark, texts):
    """split_sentences under hostile whitespace: the delimiter is
    [.!?] followed by one-or-more Java-\\s chars (VT and FF included —
    the boundary eats ALL of that whitespace run); only fragments
    whose SPACE-trim is empty drop, so a bare-tab fragment SURVIVES
    as a sentence — exactly the pin this test enforces, in both array
    and exploded forms (n_words uses the same Java class)."""
    import re

    from python_dtl_spark.operators.text import split_sentences

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (list(r.sentences), r.n_sentences)
        for r in split_sentences(docs).collect()
    }
    got_ex = {}
    ex = split_sentences(docs, explode=True).collect()
    for r in ex:
        got_ex.setdefault(r.doc_id, []).append(
            (r.sent_index, r.sentence, r.n_words)
        )
    for i, text in enumerate(texts):
        marked = re.sub(r"([.!?])" + _JAVA_WS, "\\1\x01", text)
        sents = [
            s.strip(_SP_TRIM)
            for s in marked.split("\x01")
            if s.strip(_SP_TRIM) != ""
        ]
        assert got[i] == (sents, len(sents)), (i, repr(text))
        expected_ex = [
            (j, s, len(_java_words(s))) for j, s in enumerate(sents)
        ]
        assert sorted(got_ex.get(i, [])) == expected_ex, (i, repr(text))



@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab z.\né"), min_size=0, max_size=60
        ),
        min_size=1,
        max_size=6,
    )
)
def test_char_concentration_matches_bruteforce(spark, texts):
    """char_concentration_flags over adversarial small-alphabet text
    (including multibyte é): every exact-integer metric and the
    permille keep rule equal the Counter brute force."""
    from collections import Counter

    from python_dtl_spark.operators.text import char_concentration_flags

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (
            r.n_chars, r.n_distinct_chars, r.simpson_num,
            r.top_char_count, r.keep,
        )
        for r in char_concentration_flags(docs).collect()
    }
    for i, text in enumerate(texts):
        c = Counter(text)
        n = sum(c.values())
        num = sum(v * (v - 1) for v in c.values())
        top = max(c.values(), default=0)
        keep = n < 20 or (
            1000 * num <= 100 * n * (n - 1) and 1000 * top <= 250 * n
        )
        assert got[i] == (n, len(c), num, top, keep), (i, text)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sigs=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=2,
        max_size=10,
        unique=True,
    ),
    radius=st.integers(min_value=1, max_value=8),
)
def test_hamming_near_pairs_matches_bruteforce_property(spark, sigs, radius):
    """hamming_near_pairs over random signed 64-bit signatures: the
    pigeonhole candidates + bit_count verify recover EXACTLY the
    brute-force pair set at every radius (soundness is the pigeonhole
    theorem; this pins completeness and the distance values)."""
    from python_dtl_spark.operators.dedup import hamming_near_pairs

    rows = list(enumerate(sigs))
    df = spark.createDataFrame(rows, "sid long, sig long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_near_pairs(
            df, "sid", "sig", max_hamming=radius
        ).collect()
    }
    expect = {}
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1:]:
            d = bin((sa ^ sb) & 0xFFFFFFFFFFFFFFFF).count("1")
            if d <= radius:
                expect[(ia, ib)] = d
    assert got == expect


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", None]),
            st.sampled_from([True, False, None]),
        ),
        min_size=1,
        max_size=24,
    ),
    num=st.integers(min_value=0, max_value=4),
    den=st.integers(min_value=1, max_value=4),
    min_n=st.integers(min_value=1, max_value=3),
)
def test_keep_rate_filter_matches_bruteforce(spark, rows, num, den, min_n):
    """keep_rate_filter over random groups/flags (NULLs included):
    surviving row set equals the exact-rational brute force — NULL
    flags not-kept, NULL group a group of its own, equality survives."""
    from collections import defaultdict

    from python_dtl_spark.operators.sampling import keep_rate_filter

    data = [(i, g, f) for i, (g, f) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, dom string, keep boolean")
    got = {
        r.doc_id
        for r in keep_rate_filter(
            df, "dom", "keep", min_rate=(num, den), min_group_rows=min_n
        ).collect()
    }
    stats = defaultdict(lambda: [0, 0])
    for _, g, f in data:
        stats[g][0] += 1
        stats[g][1] += 1 if f is True else 0
    expect = {
        i
        for i, g, _ in data
        if stats[g][0] >= min_n and stats[g][1] * den >= num * stats[g][0]
    }
    assert got == expect


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    old=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", None]),
            st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
        ),
        min_size=0,
        max_size=25,
    ),
    new=st.lists(
        st.tuples(
            st.sampled_from(["a", "c", None]),
            st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
        ),
        min_size=0,
        max_size=25,
    ),
    ps=st.lists(
        st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9]),
        min_size=1,
        max_size=3,
        unique=True,
    ),
)
def test_quantile_drift_matches_bruteforce(spark, old, new, ps):
    """quantile_drift vs a literal reference: per group and side,
    percentile_disc(p) must equal the smallest non-NULL value whose
    cumulative share reaches p (ties, duplicates, NULL metrics, NULL
    group keys, one-sided groups all drawn by hypothesis); n counts
    non-NULL metrics only; a side with no rows for the group reports
    NULL everywhere including n."""
    import math as _math

    from python_dtl_spark.operators.stats import quantile_drift

    def ref_card(rows):
        by_grp = {}
        for g, v in rows:
            by_grp.setdefault(g, []).append(v)
        card = {}
        for g, vals in by_grp.items():
            nn = sorted(v for v in vals if v is not None)
            pcts = {}
            for p in ps:
                if not nn:
                    pcts[p] = None
                else:
                    # smallest value whose cume_dist reaches p
                    idx = _math.ceil(p * len(nn)) - 1
                    pcts[p] = nn[max(idx, 0)]
            card[g] = (len(nn), pcts)
        return card

    schema = "g string, v long"
    df_o = spark.createDataFrame(old, schema)
    df_n = spark.createDataFrame(new, schema)
    out = quantile_drift(df_o, df_n, "v", ["g"], ps=tuple(ps)).collect()
    ro, rn = ref_card(old), ref_card(new)
    assert {r.g for r in out} == set(ro) | set(rn)
    names = ["p" + f"{p:.10f}".rstrip("0").split(".")[1] for p in ps]
    for r in out:
        eo = ro.get(r.g)
        en = rn.get(r.g)
        assert r.n_old == (eo[0] if eo else None)
        assert r.n_new == (en[0] if en else None)
        for p, name in zip(ps, names):
            assert r[f"old_{name}"] == (eo[1][p] if eo else None), (r.g, p)
            assert r[f"new_{name}"] == (en[1][p] if en else None), (r.g, p)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    texts=st.lists(
        st.text(alphabet="abc", min_size=0, max_size=6),
        min_size=2,
        max_size=14,
    )
)
def test_edit_distance_pairs_matches_bruteforce(spark, texts):
    """edit_distance_pairs vs the literal DP reference over adversarial
    tiny-alphabet strings (duplicates, empty strings, heavy variant
    collisions): the deletion-neighborhood candidates + levenshtein
    verify must emit EXACTLY the distance-≤1 pairs — FastSS
    completeness and verify soundness in one property."""
    from python_dtl_spark.operators.dedup import edit_distance_pairs

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): r.edit_distance
        for r in edit_distance_pairs(df).collect()
    }
    want = {
        (i, j): _lev(texts[i], texts[j])
        for i in range(len(texts))
        for j in range(i + 1, len(texts))
        if _lev(texts[i], texts[j]) <= 1
    }
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    texts=st.lists(
        st.lists(
            # FRAGMENT alphabet, not characters: a char-level alphabet
            # can never spontaneously spell 'script', so the
            # script/style block rules (incl. their closing-tag
            # whitespace class — the Java-vs-RE2 \x0B divergence) were
            # unreachable by the old fuzz (r18 review find)
            st.sampled_from(
                [
                    "<script>", "</script>", "</script\x0b>", "</script >",
                    "<style>", "</style>", "</style\t>", "<script a=b>",
                    "<!--", "-->", "<", ">", "&", ";", "/", "!", " ",
                    "\t", "\n", "\x0b", "\f", '"', "'", "ab", "ps", "-",
                    "#", "&amp;", "&lt;", "0", "9",
                ]
            ),
            min_size=0,
            max_size=12,
        ).map("".join),
        min_size=1,
        max_size=8,
    )
)
def test_html_to_text_cross_engine_fuzz(spark, texts):
    """Adversarial tag-soup fuzz of the html_to_text regex chain:
    random FRAGMENT compositions dense in real tags (script/style
    openers and whitespace-bearing closers), comments, entities,
    quotes and whitespace must extract IDENTICALLY in Spark (Java
    regex) and DuckDB (RE2) — the registered row's engine-exactness
    claim, enforced on hostile input rather than asserted (malformed
    nesting must degrade to whitespace, never diverge)."""
    import duckdb
    import pyarrow as pa

    from python_dtl_spark.operators.text import (
        HTML_COMMENT_RE,
        HTML_ENTITIES,
        HTML_SCRIPT_RE,
        HTML_STYLE_RE,
        HTML_TAG_RE,
        html_to_text,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r.doc_id: r.text for r in html_to_text(df).collect()}
    con = duckdb.connect()
    con.register(
        "t",
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts),
            }
        ),
    )
    ent_chain = "p"
    for entity, ch in HTML_ENTITIES:
        lit = entity.replace("'", "''")
        chl = ch.replace("'", "''")
        ent_chain = f"replace({ent_chain}, '{lit}', '{chl}')"
    want = dict(
        con.execute(f"""
        WITH stripped AS (
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(text, '{HTML_SCRIPT_RE}', ' ', 'g'),
                         '{HTML_STYLE_RE}', ' ', 'g'),
                       '{HTML_COMMENT_RE}', ' ', 'g'),
                     '{HTML_TAG_RE}', ' ', 'g') AS p
            FROM t
        )
        SELECT doc_id,
               trim(regexp_replace({ent_chain},
                    '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'), ' ')
        FROM stripped
        """).fetchall()
    )
    assert got == want, texts


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    texts=st.lists(
        st.text(
            alphabet="htps:/.co m\"'()<>[]{},;!?&=x123\t\n\x0B\f",
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_extract_urls_cross_engine_fuzz(spark, texts):
    """extract_urls on adversarial URL-soup: the match + trailing-
    punctuation strip must agree byte-for-byte between Spark (Java
    regex) and DuckDB (RE2) including multiplicities per doc."""
    import duckdb
    import pyarrow as pa

    from python_dtl_spark.operators.urls import extract_urls

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = sorted(
        (r.doc_id, r.url) for r in extract_urls(df).collect()
    )
    con = duckdb.connect()
    con.register(
        "t",
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts),
            }
        ),
    )
    want = sorted(
        tuple(r)
        for r in con.execute("""
        SELECT doc_id,
               regexp_replace(
                   unnest(regexp_extract_all(
                       text, 'https?://[^ \\t\\n\\r\\f\\x0B<>"''\\)\\]\\}]+')),
                   '[.,;:!?]+$', '') AS url
        FROM t
        """).fetchall()
    )
    assert got == want, texts


@settings(max_examples=200, deadline=None)
@given(value=st.binary(min_size=0, max_size=64))
def test_bytes_literal_roundtrip(value):
    """Any byte string survives render-as-\\xHH → lex → parse: the
    bytes literal's value path (lexer raw body + unescape_bytes) is a
    bijection on the \\xHH normal form, including quotes, backslashes,
    NULs and high bytes."""
    from python_dtl_spark.lang import nodes as n
    from python_dtl_spark.lang.parser import parse

    rendered = "".join(f"\\x{b:02x}" for b in value)
    script = parse(f"WITH o AS SELECT b'{rendered}' AS c FROM t;")
    lit = script.statements[0].expression.columns[0].expression
    assert lit == n.Literal(value=value, kind="bytes")


@settings(max_examples=200, deadline=None)
@given(
    body=st.text(
        alphabet=st.sampled_from("ab\\'x09AF \t"), min_size=0, max_size=20
    )
)
def test_bytes_literal_never_misencodes(body):
    """Fuzz the raw literal body: every outcome is either a clean parse
    whose value round-trips through the \\xHH normal form, or a
    DtlSyntaxError — never a crash, never a value that re-renders
    differently (no silent mis-encode)."""
    from python_dtl_spark.errors import DtlSyntaxError
    from python_dtl_spark.lang.parser import parse

    # a body containing a quote that ISN'T escaped changes the token
    # boundary — build source and let the parser decide; we only claim
    # no crash + round-trip on success
    src = f"WITH o AS SELECT b'{body}' AS c FROM t;"
    try:
        script = parse(src)
    except DtlSyntaxError:
        return
    exprs = [
        c.expression
        for s in script.statements
        if hasattr(s, "expression") and hasattr(s.expression, "columns")
        for c in s.expression.columns
    ]
    for lit in exprs:
        if getattr(lit, "kind", None) == "bytes":
            rerendered = "".join(f"\\x{b:02x}" for b in lit.value)
            script2 = parse(f"WITH o AS SELECT b'{rerendered}' AS c FROM t;")
            lit2 = script2.statements[0].expression.columns[0].expression
            assert lit2.value == lit.value


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    texts=st.lists(
        st.lists(
            # fragment alphabet (the html-fuzz lesson): real PAN-shaped
            # runs, separators, boundaries and digit noise compose so
            # the candidate regex, the Luhn verify and the replace fold
            # are all reachable — incl. Java-vs-RE2 \b and
            # leftmost/greedy extraction agreement on grouped runs
            st.sampled_from(
                [
                    "4111111111111111", "4111 1111 1111 1111",
                    "5500-0000-0000-0004", "378282246310005",
                    "4111111111111112", "123456789012", "0",
                    "9", "99", " ", "-", "x", ".", "(", ")", "\n",
                    # 13-digit PAN + short digit groups: composes the
                    # two r18-advisor classes (PAN absorbed into a
                    # longer invalid candidate; verified value
                    # recurring inside another site) so the sub-run
                    # scan and split-rebuild are fuzz-reachable
                    "4111111111119", "000", "00",
                ]
            ),
            min_size=0,
            max_size=8,
        ).map("".join),
        min_size=1,
        max_size=8,
    )
)
def test_card_scrub_cross_engine_fuzz(spark, texts):
    """Adversarial PAN-soup fuzz: random compositions of valid/invalid
    card runs, separators and digit noise must scrub IDENTICALLY in
    Spark (Java regex + JVM fold) and DuckDB (RE2 + list fold) — the
    candidate extraction, Luhn arithmetic and replace fold agree
    byte-for-byte or the staged row's oracle claim is void."""
    import duckdb
    import pyarrow as pa

    from tests.test_operators import card_scrub_replay_sql
    from python_dtl_spark.operators.text import card_scrub

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = sorted(
        (r.doc_id, r.n_cards, r.text) for r in card_scrub(df).collect()
    )
    con = duckdb.connect()
    con.register(
        "t",
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts),
            }
        ),
    )
    want = sorted(
        tuple(r) for r in con.execute(card_scrub_replay_sql("t")).fetchall()
    )
    assert got == want, texts
