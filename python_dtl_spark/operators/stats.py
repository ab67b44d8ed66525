"""Grouped statistics operators: exact percentiles, pivot tables, and
multi-dimensional (ROLLUP) aggregation.

Extensions beyond the reference surface (SURVEY.md §2.4 lists grouping
sets/cube/rollup as absent there) — these expose the Spark-native
multi-dim aggregation operators, which Catalyst plans as a single
Expand + hash aggregate (one scan for all grouping sets, partial
aggregation before the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ref(df: DataFrame, name: str):
    """Literal top-level column reference, safe for names that need
    quoting (dots, spaces) — the sampling._ref convention."""
    return df["`{}`".format(name.replace("`", "``"))]


def grouped_percentiles(
    df: DataFrame,
    value_col: str,
    by: list[str],
    ps: list[float] = (0.5, 0.9, 0.99),
    exact: bool = True,
) -> DataFrame:
    """Discrete percentiles of ``value_col`` per group.

    ``exact=True`` uses ``percentile_disc`` — the smallest actual value
    whose cumulative distribution reaches p.  Discrete (no
    interpolation), so every output is an element of the input:
    deterministic and hash-comparable across engines, unlike
    ``percentile``/``quantile_cont`` whose interpolated quotients can
    differ in the last ulp.

    Scale shape: one shuffle on the group keys; the exact percentile
    buffers each group's column inside the aggregate (spillable).  For
    huge groups pass ``exact=False`` for t-digest ``approx_percentile``
    — a mergeable sketch with bounded memory and map-side partials
    (same valve as ``equi_depth_histogram``/``winsorize``; sketch
    results carry no cross-engine value oracle).
    """
    names = []
    for p in ps:
        if not 0.0 < p < 1.0:
            # str-slicing names would label p=1.0 as "p0" (colliding
            # with p=0.0) — endpoints are just min/max, use those
            raise ValueError(
                f"percentiles must be in (0, 1), got {p}; use min/max "
                "aggregates for the endpoints"
            )
        # decimal rendering, never scientific: 0.5 -> p5, 0.99 -> p99,
        # 0.00001 -> p00001
        names.append("p" + f"{p:.10f}".rstrip("0").split(".")[1])
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate percentile labels from ps={list(ps)}")
    if exact:
        aggs = [
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY {value_col})"
            ).alias(name)
            for p, name in zip(ps, names)
        ]
    else:
        aggs = [
            F.expr(f"approx_percentile({value_col}, {p!r})").alias(name)
            for p, name in zip(ps, names)
        ]
    return df.groupBy(*by).agg(*aggs)


def pivot_table(
    df: DataFrame,
    row_col: str,
    pivot_col: str,
    pivot_values: list[str],
    value_expr,
    agg: str = "sum",
) -> DataFrame:
    """Pivot ``pivot_col`` into one output column per value.

    ``pivot_values`` is REQUIRED: with an explicit value list the pivot
    is pure plan construction; omitting it would make Spark run a
    distinct job over ``pivot_col`` before the plan even exists — a
    driver-blocking action at 100 TB (and nondeterministic column order
    besides).  Catalyst rewrites the pivot into a single hash aggregate
    with one conditional aggregate per value — one scan, one shuffle.
    """
    agg_fn = getattr(F, agg)
    return (
        df.groupBy(row_col)
        .pivot(pivot_col, pivot_values)
        .agg(agg_fn(value_expr))
    )


def rollup_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: list,
    grouping_id_col: str = "grouping_id",
) -> DataFrame:
    """ROLLUP aggregation: totals at every prefix level of
    ``group_cols`` plus the grand total, in ONE scan.

    Catalyst plans this as Expand (one row copy per grouping set) into
    a single partial+final hash aggregate — versus N separate
    groupBy/union jobs, it reads the input once and shuffles once.
    ``grouping_id_col`` carries the standard bitmask (0 = most
    detailed; bit set = column rolled up) so consumers can tell a real
    NULL key from a rolled-up one.
    """
    return df.rollup(*group_cols).agg(
        F.grouping_id().alias(grouping_id_col), *aggs
    )


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    by: list[str],
    k: int = 256,
    salt_buckets: int = 64,
) -> DataFrame:
    """Approximate distinct count per group via a deterministic KMV
    (k-minimum-values) sketch (Bar-Yossef et al. 2002): hash every key
    to a uniform 48-bit value, keep the k smallest DISTINCT hashes per
    group, and estimate distinct = (k-1) / normalized k-th minimum.
    Groups with fewer than k distinct hashes report the exact count
    (the sketch saw everything).

    Unlike HLL++ (``approx_count_distinct``), whose register layout is
    engine-private, every step here is elementary — md5, sort, max —
    so DuckDB replays the estimate bit-for-bit and the driver can
    value-hash it: a *verifiable* approximate aggregate.

    Scale shape: the shuffle carries (group, 48-bit hash) pairs —
    narrow rows, map-side-deduplicated — and the k-min selection is
    two-level: per (group, salt) bucket first (parallel across
    ``salt_buckets`` reducers), then a final k-min over the
    ≤ salt_buckets×k survivors, so a low-cardinality ``by`` (the
    common case: 3 return flags over 100 TB of lineitem) never
    funnels every distinct hash through one reducer.
    """
    from pyspark.sql import Window

    two48 = float(1 << 48)
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string").cast("binary")), 1, 12),
        16,
        10,
    ).cast("long")
    # NULL keys are not values: count(DISTINCT x) ignores NULL, and an
    # unfiltered NULL would hash to a NULL __h that Spark's ascending
    # window sorts NULLS FIRST (stealing a k-slot) while DuckDB sorts
    # NULLS LAST — filter before sketching so both engines agree and
    # the estimate matches distinct-count semantics on any input.
    hashes = (
        df.filter(F.col(key_col).isNotNull())
        .select(*by, h.alias("__h"))
        .dropDuplicates([*by, "__h"])
    )
    w1 = Window.partitionBy(*by, F.pmod(F.col("__h"), salt_buckets)).orderBy(
        "__h"
    )
    survivors = (
        hashes.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    w2 = Window.partitionBy(*by).orderBy("__h")
    kmin = survivors.withColumn("__rn", F.row_number().over(w2)).filter(
        F.col("__rn") <= k
    )
    return (
        kmin.groupBy(*by)
        .agg(
            F.count(F.lit(1)).alias("__n_kept"),
            F.max("__h").alias("__kth"),
        )
        .select(
            *by,
            F.when(F.col("__n_kept") < k, F.col("__n_kept").cast("long"))
            .otherwise(
                F.floor(
                    F.lit(float(k - 1))
                    * F.lit(two48)
                    / F.col("__kth").cast("double")
                ).cast("long")
            )
            .alias("approx_distinct"),
        )
    )


def key_profile(
    df: DataFrame,
    keys: list[str],
    top_n: int = 20,
) -> DataFrame:
    """Heavy-hitter / skew profile of a prospective join or groupBy key:
    the ``top_n`` most frequent key values with their absolute count,
    share of all rows, and cumulative share.

    The operational pre-flight for every shuffle in this module — a
    key whose top value holds 30% of 100 TB needs salting
    (``joins.salted_join``) or the AQE skew valve *before* the job
    runs, and this report is how you find out for the cost of one
    count aggregation.  NULL keys are profiled too (they hash-collide
    into one reducer like any other hot value).

    Plan shape: one partial+final count agg on the keys, a global
    ``top_n`` limit (partial TakeOrdered per partition — no single
    reducer sees more than ``top_n`` rows), one single-row total
    broadcast, and a width-``top_n`` window for the cumulative share.
    """
    total = df.groupBy().agg(F.count(F.lit(1)).cast("long").alias("__total"))
    counts = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), *[F.col(k).asc_nulls_last() for k in keys])
        .limit(top_n)
    )
    w = Window.orderBy(F.col("cnt").desc(), *[F.col(k).asc_nulls_last() for k in keys])
    return (
        counts.join(total.hint("broadcast"), how="cross")
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            *keys,
            "cnt",
            (F.col("cnt").cast("double") / F.col("__total")).alias("share"),
            (
                F.sum("cnt").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ).cast("double")
                / F.col("__total")
            ).alias("cum_share"),
        )
    )


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    by: list[str],
    z: float = 3.0,
) -> DataFrame:
    """Rows whose ``value_col`` deviates more than ``z`` population
    standard deviations from their group's mean.

    The cheap distributional anomaly gate for event/metric pipelines.
    Population stddev (not sample) so a one-row group is well-defined
    (stddev 0 → never an outlier rather than NULL-division).  Output:
    the input row plus ``group_mean``, ``group_std``, ``zscore``.

    Plan shape: one partial+final agg on the group keys + one equi-join
    back (broadcast when the group dimension is small); the input is
    scanned twice unless persisted by the caller — at 100 TB prefer a
    window formulation ONLY if the group count is too high to hold the
    aggregate side, since the window variant must sort all rows while
    the join-back streams them.
    """
    # NaN values are masked out of the aggregates: one corrupt reading
    # would make the group's mean/std NaN, and under Spark's
    # NaN-is-largest ordering `NaN > 0.0` is TRUE — every row of the
    # group would then get zscore NaN and `abs(NaN) > z` (also TRUE)
    # would flag the whole group as outliers.  The NaN row itself is
    # excluded from outlier candidacy below for the same reason.
    v = F.col(value_col)
    vtype = dict(df.dtypes).get(value_col)
    is_float = vtype in ("double", "float")
    clean = F.when(~F.isnan(v), v) if is_float else v
    stats = df.groupBy(*by).agg(
        F.avg(clean).alias("group_mean"),
        F.stddev_pop(clean).alias("group_std"),
    )
    # null-SAFE join-back: groupBy collects NULL-keyed rows into their
    # own group, but a plain equi-join can never match them (NULL !=
    # NULL) — their genuine outliers would silently vanish.  NULL is a
    # group like any other here (key_profile in this module already
    # treats it so).  The stats side renames its keys first: it
    # descends from ``df``, so joining on same-named columns trips
    # Spark's ambiguous-self-join detection.
    stats = stats.select(
        *[F.col(k).alias(f"__st_{k}") for k in by], "group_mean", "group_std"
    )
    cond = None
    for k in by:
        c = F.col(k).eqNullSafe(F.col(f"__st_{k}"))
        cond = c if cond is None else cond & c
    joined = df.join(stats, cond, "inner").drop(
        *[f"__st_{k}" for k in by]
    )
    candidate = F.col("group_std") > 0.0
    if is_float:
        candidate = candidate & ~F.isnan(F.col(value_col))
    zexpr = F.when(
        candidate,
        (F.col(value_col) - F.col("group_mean")) / F.col("group_std"),
    ).otherwise(F.lit(0.0))
    return joined.withColumn("zscore", zexpr).filter(
        F.abs(F.col("zscore")) > z
    )


def equi_depth_histogram(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    exact: bool = True,
) -> DataFrame:
    """Equi-depth (equal-frequency) histogram of ``value_col`` — the
    profiling verb behind optimizer statistics and skew reports: bucket
    edges at the i/n_buckets quantiles, so each bucket holds ~1/n of
    the rows and dense regions get narrow buckets.

    Edges use ``percentile_disc`` — actual data values, no
    interpolation — so every engine computes identical edges and the
    output is hash-exact (same recipe as ``grouped_percentiles``).  A
    value equal to an edge belongs to the LOWER bucket; bucket i spans
    (edge_i, edge_{i+1}].

    Output: bucket (0-based), n (rows), lo/hi (actual min/max in the
    bucket).  Buckets emptied by ties simply don't appear.

    Scale shape: the edge aggregate is ONE single-row result broadcast
    back (no driver action); bucket assignment is a row-local filter
    count over the ≤ n_buckets-1 edge array; the final count/min/max
    aggregates map-side-combine.  ``exact=True`` sorts the full column
    inside the percentile aggregate — fine to ~10^8 rows per executor;
    at 100 TB pass ``exact=False`` for t-digest ``approx_percentile``
    edges (same shape, sketch-merged, no value oracle).  Measured
    (SCALING.md, 32× = 3.2M values): exact 3.6 s vs sketch 5.9 s — the
    sketch's per-row digest updates cost MORE cpu while the column
    still fits the reducer, so it is the constant-MEMORY valve for
    when it doesn't, not a local speed win."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    if exact:
        edge_exprs = [
            F.expr(
                f"percentile_disc({f!r}) WITHIN GROUP (ORDER BY {value_col})"
            ).alias(f"__e{i}")
            for i, f in enumerate(fracs)
        ]
    else:
        edge_exprs = [
            F.expr(f"approx_percentile({value_col}, {f!r})").alias(f"__e{i}")
            for i, f in enumerate(fracs)
        ]
    edges = df.agg(*edge_exprs).select(
        F.array(*[F.col(f"__e{i}") for i in range(len(fracs))]).alias("__edges")
    )
    v = F.col(value_col)
    bucket = F.size(F.filter(F.col("__edges"), lambda e: e < v)).cast("long")
    # NULL values are excluded, matching the percentile edges (which
    # ignore them): unfiltered, `e < NULL` is NULL so F.filter drops
    # every edge and every NULL row lands in bucket 0, inflating its
    # count while lo/hi silently exclude them
    return (
        df.filter(v.isNotNull())
        .join(F.broadcast(edges))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min(v).alias("lo"),
            F.max(v).alias("hi"),
        )
    )


def table_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column table profile — the ANALYZE/data-quality sweep run
    before committing a 100 TB ingest: row count, null count and
    distinct cardinality for each requested column, one output row per
    column.

    ``exact_distinct=True`` uses ``count(DISTINCT col)`` (Spark plans
    the multi-distinct aggregate with Expand — one pass over the data,
    partial aggregation per column); for very wide or very hot tables
    pass ``False`` for HLL++ ``approx_count_distinct`` (single pass,
    no Expand blowup, ±2% — and no value oracle, matching the
    engine-private-sketch caveat of ``dtl_approx_distinct_parts``).

    Output: column (name), n_rows, n_nulls, n_distinct (NULL excluded,
    matching SQL COUNT(DISTINCT) semantics).
    """
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("no columns to profile")
    distinct = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"__nn{i}"))
        aggs.append(distinct(c).alias(f"__nd{i}"))
    wide = df.agg(*aggs)
    stack_args = []
    for i, c in enumerate(cols):
        stack_args.append(F.lit(c))
        stack_args.append((F.col("__n") - F.col(f"__nn{i}")).cast("long"))
        stack_args.append(F.col(f"__nd{i}").cast("long"))
    return wide.select(
        F.col("__n").cast("long").alias("n_rows"),
        F.stack(
            F.lit(len(cols)), *stack_args
        ).alias("column", "n_nulls", "n_distinct"),
    ).select("column", "n_rows", "n_nulls", "n_distinct")


def corpus_report(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    flag_cols: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-source corpus data card (staged r16 → r17): the one-table
    accounting a pretraining lab monitors per ingest source — doc
    count, NULL-text count, exact character and whitespace-token sums,
    distinct-content count (whence the exact-dup rate), plus an exact
    true-count for every boolean ``flag_cols`` entry (quality gates,
    language flags, dedup keeps — compose upstream and summarize
    here).  Every emitted metric is an exact integer, so the card is
    fully value-oracle-able; rates are left to the reader
    (``n_docs − n_distinct_texts`` over ``n_docs`` is the dup rate).

    ``exact_distinct=False`` swaps the per-group distinct-content
    count to HLL++ ``approx_count_distinct`` (the
    :func:`table_profile` caveat applies: no value oracle for that
    column).  NULL text counts in ``n_docs``/``n_null_text`` but sums
    zero chars/tokens and is excluded from the distinct count (SQL
    COUNT(DISTINCT) semantics).

    Scale shape: ONE group-keyed aggregation; every measure except the
    exact distinct is partial-aggregable map-side, and the exact
    distinct is Spark's standard two-exchange partial-distinct plan —
    the documented cost of an exact dup-rate; per-source output is one
    row per source (tiny)."""
    flag_cols = flag_cols or []
    missing = [
        c for c in [group_col, text_col, *flag_cols] if c not in df.columns
    ]
    if missing:
        raise ValueError(f"columns {missing} not in {df.columns}")
    # _ref, not F.col: dotted text/group/flag names must resolve as
    # literal top-level columns, not struct paths (the r16
    # keep_newest_canonical advisor lesson, applied proactively)
    txt = _ref(df, text_col)
    toks = F.filter(F.split(F.trim(txt), r"\s+"), lambda t: t != "")
    distinct = (
        F.count_distinct(txt)
        if exact_distinct
        else F.approx_count_distinct(txt)
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.count(F.lit(1)) - F.count(txt))
        .cast("long")
        .alias("n_null_text"),
        F.sum(F.coalesce(F.length(txt), F.lit(0)))
        .cast("long")
        .alias("sum_chars"),
        # explicit NULL branch, not coalesce(size(...), 0): under
        # spark.sql.legacy.sizeOfNull=true size(NULL) is -1, which a
        # coalesce would keep — silently decrementing the card by 1
        # per NULL-text doc on that config.  when/otherwise is exact
        # on every config.
        F.sum(
            F.when(txt.isNull(), F.lit(0)).otherwise(F.size(toks))
        )
        .cast("long")
        .alias("sum_tokens"),
        distinct.cast("long").alias("n_distinct_texts"),
    ]
    for c in flag_cols:
        aggs.append(F.count_if(_ref(df, c)).cast("long").alias(f"n_{c}"))
    return df.groupBy(_ref(df, group_col)).agg(*aggs)


def winsorize(
    df: DataFrame,
    value_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    out_col: str | None = None,
    exact: bool = True,
) -> DataFrame:
    """Percentile winsorization: clip ``value_col`` to its
    [``lower``, ``upper``] quantile bounds — the standard outlier tamer
    before aggregates that a single corrupt reading would wreck.

    Bounds use ``percentile_disc`` (actual data values, no
    interpolation) so both the bounds and the clipped output are
    engine-exact.  Values are MOVED, never computed: every output
    value is an input value.

    Scale shape: one single-row bound aggregate broadcast back, then a
    row-local ``greatest``/``least`` clamp; same caveat as
    ``equi_depth_histogram`` — the exact percentile sorts the column
    inside the aggregate, fine to ~10^8 rows per executor; at 100 TB
    pass ``exact=False`` for t-digest ``approx_percentile`` bounds
    (sketch-merged, constant memory; the output is still values-moved-
    not-computed, but the bounds — hence which rows clip — carry the
    sketch's rank error, so no cross-engine value oracle).
    """
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1, got {lower}, {upper}")
    out = out_col or f"{value_col}_winsorized"
    if exact:
        lo_expr = F.expr(
            f"percentile_disc({lower!r}) WITHIN GROUP (ORDER BY {value_col})"
        )
        hi_expr = F.expr(
            f"percentile_disc({upper!r}) WITHIN GROUP (ORDER BY {value_col})"
        )
    else:
        lo_expr = F.expr(f"approx_percentile({value_col}, {lower!r})")
        hi_expr = F.expr(f"approx_percentile({value_col}, {upper!r})")
    bounds = df.agg(lo_expr.alias("__wlo"), hi_expr.alias("__whi"))
    # greatest/least SKIP nulls, so an unguarded clamp would turn a
    # NULL reading into the lower bound — fabricating a 1st-percentile
    # observation from missing data.  NULL stays NULL.
    clipped = F.when(
        F.col(value_col).isNotNull(),
        F.least(F.greatest(F.col(value_col), F.col("__wlo")), F.col("__whi")),
    )
    return (
        df.join(F.broadcast(bounds))
        .withColumn(out, clipped)
        .drop("__wlo", "__whi")
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    by: list[str],
    z: float = 3.5,
    scale: float = 0.6745,
    persist: bool = False,
) -> DataFrame:
    """Robust (median / MAD) outlier gate — the heavy-tail-safe sibling
    of :func:`zscore_outliers`.

    Mean/stddev are themselves dragged by the outliers they are meant
    to find; the median and the median-absolute-deviation are not
    (50% breakdown point), so this gate stays calibrated on the
    long-tailed value distributions event and metrics pipelines
    actually have.  Flags rows where
    ``|scale * (v - median) / MAD| > z`` — ``scale=0.6745`` rescales
    MAD to estimate sigma under normality, making ``z`` comparable to
    a z-score threshold (3.5 is the classic Iglewicz-Hoaglin cut).

    Both the median and the MAD use ``percentile_disc`` (actual data
    values, no interpolation — same recipe as ``grouped_percentiles``),
    so the statistic is a handful of exact-input-value arithmetic ops
    and a DuckDB oracle matches bit-for-bit.

    NaN values are masked from both aggregates and from candidacy
    (one corrupt reading must not poison the group), NULL group keys
    are a group like any other (null-safe join-back), and a group
    with MAD = 0 (majority at the median) flags nothing rather than
    dividing by zero.

    Plan shape: median agg (one shuffle) → broadcast back for the
    deviation pass → MAD agg (one shuffle) that CARRIES the median
    through as a min (constant per group), so both statistics land in
    one tiny per-group table and the output is a single broadcast
    join against the input.  The naive "join median back, then join
    MAD back" chain re-derives the median subtree inside the second
    join (measured: the median aggregate planned TWICE, 7 exchanges vs
    this shape's 3).  The input is scanned three times (two stat
    passes + the output pass) — pass ``persist=True`` when the
    upstream scan dominates (wide source, filter chain, join): the
    masked input caches once (MEMORY_AND_DISK) and all three passes
    read the cache (``InMemoryTableScan`` ×3, asserted in
    tests/test_plans.py); release via
    :func:`~python_dtl_spark.operators.dedup.release_all_cached` or
    the attached ``release_cached()`` handle, as with the dedup
    operators.  The percentile aggregate buffers each group's column
    in its reducer — the same ~10^8 rows/executor bound (and
    ``approx_percentile`` escape valve) documented on
    :func:`equi_depth_histogram` applies at 100 TB.
    """
    v = F.col(value_col)
    vtype = dict(df.dtypes).get(value_col)
    is_float = vtype in ("double", "float")
    clean = F.when(~F.isnan(v), v) if is_float else v
    base = df.withColumn("__mv", clean)
    if persist:
        base = base.persist()

    def _rename_keys(stats_df: DataFrame) -> DataFrame:
        return stats_df.select(
            *[F.col(k).alias(f"__st_{k}") for k in by],
            *[c for c in stats_df.columns if c not in by],
        )

    def _key_cond(left_names: list[str]):
        cond = None
        for k in left_names:
            c = F.col(k).eqNullSafe(F.col(f"__st_{k}"))
            cond = c if cond is None else cond & c
        return cond

    med = _rename_keys(
        base.groupBy(*by).agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __mv)").alias(
                "group_median"
            )
        )
    )
    # deviation pass: broadcast the per-group medians (tiny), compute
    # |v - median|, and aggregate MAD — the median rides through as a
    # min (it is constant within the group), so no second join-back
    dev = (
        base.join(F.broadcast(med), _key_cond(by), "inner")
        .withColumn("__ad", F.abs(F.col("__mv") - F.col("group_median")))
    )
    stats = _rename_keys(
        dev.groupBy(*[F.col(f"__st_{k}").alias(k) for k in by]).agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __ad)").alias(
                "group_mad"
            ),
            F.min("group_median").alias("group_median"),
        )
    )
    joined = base.join(F.broadcast(stats), _key_cond(by), "inner").drop(
        *[f"__st_{k}" for k in by]
    )
    candidate = F.col("group_mad") > 0.0
    candidate = candidate & F.col("__mv").isNotNull()
    rz = F.when(
        candidate,
        F.lit(scale) * (F.col("__mv") - F.col("group_median")) / F.col("group_mad"),
    ).otherwise(F.lit(0.0))
    out = (
        joined.withColumn("robust_z", rz)
        .filter(F.abs(F.col("robust_z")) > z)
        .drop("__mv")
    )
    if persist:
        from python_dtl_spark.operators.dedup import _release_after

        out = _release_after(out, base)
    return out


def quantile_drift(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    by: list[str],
    ps: list[float] = (0.25, 0.5, 0.75, 0.9),
    exact: bool = True,
) -> DataFrame:
    """Distribution-drift card between two snapshots of one metric —
    the third leg of the monitoring trilogy (``cdc.source_drift_card``
    = row churn, ``similarity.centroid_assignment_stats`` = index
    drift, this = METRIC DISTRIBUTION shift): per group, the exact
    discrete percentiles of ``value_col`` in the old and new crawls
    side by side, with row counts.  "Did the crawler update shift
    source X's token-length distribution" is one row of this table.

    Output: the group keys + ``n_old``/``n_new`` + ``old_p*``/
    ``new_p*`` per requested percentile.  Percentiles are
    ``percentile_disc`` — actual elements of the input, no
    interpolation — so on integer metrics the whole card is exact and
    cross-engine hash-comparable; a group present on one side only
    reports NULLs on the other (a source appearing/disappearing IS
    drift).  NULL group keys are a group like any other (null-safe
    join).  ``exact=False`` switches both sides to t-digest
    ``approx_percentile`` — the mergeable-sketch tier for huge groups
    (no value oracle, the usual sketch caveat).

    Scale shape: ONE group-keyed aggregation per side (the exact
    percentile buffers per group inside the aggregate, spillable;
    the sketch tier is map-side partial) + one |groups|-sized
    equi-join that AQE broadcasts — no window, no data-grain join.
    """
    if not by:
        raise ValueError("by must name at least one group column")
    names = []
    for p in ps:
        if not 0.0 < p < 1.0:
            raise ValueError(
                f"percentiles must be in (0, 1), got {p}; use min/max "
                "aggregates for the endpoints"
            )
        names.append("p" + f"{p:.10f}".rstrip("0").split(".")[1])
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate percentile labels from ps={list(ps)}")

    def side(df: DataFrame, prefix: str) -> DataFrame:
        missing = [c for c in [*by, value_col] if c not in df.columns]
        if missing:
            raise ValueError(
                f"columns {missing} missing from the {prefix.rstrip('_')} "
                "snapshot"
            )
        # index-based internal names: dotted group/value refs resolve
        # as literal columns and never reach a raw expr string
        base = df.select(
            *[_ref(df, c).alias(f"__qd_k_{i}") for i, c in enumerate(by)],
            _ref(df, value_col).alias("__qd_v"),
        )
        if exact:
            # percentile_disc outputs are actual elements of the input,
            # but Spark types the aggregate DOUBLE regardless — cast
            # back to the metric's own dtype so an integer metric yields
            # an integer card.  Exact for integer metrics within
            # double's 2^53 exact range (chars/tokens/counts — the
            # intended domain); a long metric holding values past 2^53
            # (nanosecond epochs, hash-derived ids) already lost
            # precision inside Spark's DOUBLE-typed aggregate and this
            # cast cannot restore it — the caveat is Spark's, inherited,
            # and now stated instead of papered over.  No-op for double
            # metrics.
            vtype = base.schema["__qd_v"].dataType
            aggs = [
                F.expr(
                    f"percentile_disc({p}) WITHIN GROUP (ORDER BY __qd_v)"
                )
                .cast(vtype)
                .alias(f"{prefix}{name}")
                for p, name in zip(ps, names)
            ]
        else:
            aggs = [
                F.expr(f"approx_percentile(__qd_v, {p!r})").alias(
                    f"{prefix}{name}"
                )
                for p, name in zip(ps, names)
            ]
        return base.groupBy(
            *[F.col(f"__qd_k_{i}") for i in range(len(by))]
        ).agg(F.count("__qd_v").alias(f"n_{prefix.rstrip('_')}"), *aggs)

    o = side(old, "old_")
    n = side(new, "new_")
    n = n.select(
        *[F.col(f"__qd_k_{i}").alias(f"__qd_nk_{i}") for i in range(len(by))],
        *[c for c in n.columns if not c.startswith("__qd_k_")],
    )
    cond = None
    for i in range(len(by)):
        clause = F.col(f"__qd_k_{i}").eqNullSafe(F.col(f"__qd_nk_{i}"))
        cond = clause if cond is None else (cond & clause)
    j = o.join(n, on=cond, how="full_outer")
    return j.select(
        *[
            F.coalesce(F.col(f"__qd_k_{i}"), F.col(f"__qd_nk_{i}")).alias(k)
            for i, k in enumerate(by)
        ],
        "n_old",
        "n_new",
        *[f"old_{name}" for name in names],
        *[f"new_{name}" for name in names],
    )
