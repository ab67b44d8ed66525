"""Change-data-capture operators: changeset application (merge/upsert)
and slowly-changing-dimension history construction.

The reference reserves UPDATE/DELETE/INSERT keywords without semantics
(/root/reference/src/dtl/nodes.py:331-344); the language layer gives
them per-statement copy-on-write meaning (compiler.py), and this module
is the *set-at-a-time* counterpart a data pipeline actually runs at
scale: apply a whole changeset (CDC feed, upsert batch) to a snapshot
in one pass, or turn a change log into validity-interval history.

Both operators are single-shuffle shapes: latest-change selection is a
partial+final window (WindowGroupLimit prunes per partition before the
exchange), and the snapshot merge is one equi-join on the key — the
exact plan a MERGE INTO compiles to in lakehouse engines, minus the
table-format commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Changeset operation values understood by :func:`apply_changes`.
OP_UPSERT = "upsert"
OP_DELETE = "delete"


def latest_changes(
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    op_col: str | None = None,
) -> DataFrame:
    """One row per key: the change with the highest ``seq_col``.

    Ties on ``seq_col`` are broken deterministically: deletes beat
    upserts (a delete and an upsert carrying the same sequence number
    is a malformed feed; biasing to delete makes replays idempotent),
    and remaining ties resolve by the change's other columns ascending
    (name order) — an engine that kept "whichever row arrived last"
    would not be reproducible run to run.

    Pass ``op_col`` to name the operation column; without it the
    column ``__op`` is used if present (the :func:`apply_changes`
    internal convention) and otherwise every change counts as an
    upsert.  Callers with a differently-named op column MUST pass it —
    the delete-wins tie-break cannot apply to a column it does not
    know about.

    Plan shape: ``row_number`` over (keys) ordered by seq DESC plans
    as partial WindowGroupLimit before the exchange + final after, so
    a 100 TB change log ships at most one candidate row per key per
    map task.
    """
    if op_col is None and "__op" in changes.columns:
        op_col = "__op"
    op = F.col(op_col) if op_col is not None else F.lit(OP_UPSERT)
    tie_cols = sorted(
        c
        for c in changes.columns
        if c not in keys and c != seq_col and c != op_col
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(),
        # delete-first tie-break (0 sorts before 1 under asc)
        F.when(op == OP_DELETE, 0).otherwise(1).asc(),
        *[F.col(c).asc_nulls_last() for c in tie_cols],
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    op_col: str | None = None,
) -> DataFrame:
    """Apply a CDC changeset to a snapshot — distributed MERGE INTO.

    ``changes`` carries the key columns, a monotone ``seq_col``
    (version / commit timestamp), optionally ``op_col`` with values
    ``'upsert'`` / ``'delete'`` (absent column = all upserts), and the
    same value columns as ``snapshot``.  Semantics per key:

    * no change row            → snapshot row unchanged
    * latest change = upsert   → change's values (insert if the key
      was absent from the snapshot)
    * latest change = delete   → key dropped

    Output schema = snapshot schema.  Deterministic: the latest change
    is selected by (seq DESC, delete-before-upsert) — see
    :func:`latest_changes`.

    Scale shape: one window over the changeset (partial-limit pruned)
    + one full-outer equi-join on the key.  Both sides shuffle on the
    same key so AQE can plan a skew-aware join; nothing is collected,
    no per-row Python.  This is the batch-set counterpart of the DTL
    UPDATE/DELETE/INSERT statements (compiler.py), which rewrite one
    binding per statement.
    """
    value_cols = [c for c in snapshot.columns if c not in keys]
    ch = changes
    if op_col is None and "__op" in ch.columns:
        # the latest_changes docstring blesses a column literally named
        # __op as the implicit op column; overwriting it with 'upsert'
        # here would silently turn deletes into upserts
        op_col = "__op"
    if op_col is None:
        ch = ch.withColumn("__op", F.lit(OP_UPSERT))
    else:
        # validate at execution: an op outside {'upsert','delete'}
        # (incl. NULL — a dirty CDC feed) would otherwise be KEPT as a
        # non-delete whose values are silently discarded, emitting
        # ghost (key, NULL, ...) rows for snapshot-absent keys.  Fail
        # the task with a clear message instead.
        valid = F.when(
            F.col(op_col).isin(OP_UPSERT, OP_DELETE), F.col(op_col)
        ).otherwise(
            F.expr(
                "raise_error(concat("
                f"'apply_changes: op must be {OP_UPSERT} or {OP_DELETE},"
                f" got: ', coalesce(cast(`{op_col}` as string), 'NULL')))"
            )
        )
        ch = ch.withColumn("__op", valid)
        if op_col != "__op":
            ch = ch.drop(op_col)
    latest = latest_changes(ch, keys, seq_col).select(
        *[F.col(k).alias(f"__ch_k_{k}") for k in keys],
        F.col("__op"),
        *[F.col(c).alias(f"__ch_{c}") for c in value_cols],
    )
    # null-SAFE equi-join: a change targeting a NULL key must match the
    # snapshot's NULL-key row (latest_changes already groups NULL keys
    # together) — plain equality would silently no-op the delete and
    # duplicate the upsert.  EqualNullSafe stays hash-joinable.
    cond = None
    for k in keys:
        c = F.col(f"s.{k}").eqNullSafe(F.col(f"__ch_k_{k}"))
        cond = c if cond is None else cond & c
    merged = snapshot.alias("s").join(latest, cond, "full_outer")
    kept = merged.filter(
        F.col("__op").isNull() | (F.col("__op") != OP_DELETE)
    )
    out_cols = [
        # when BOTH sides' key is NULL (null-safe match) the result key
        # is NULL either way; otherwise exactly one side carries it
        F.coalesce(F.col(f"s.{k}"), F.col(f"__ch_k_{k}")).alias(k)
        for k in keys
    ] + [
        F.when(F.col("__op") == OP_UPSERT, F.col(f"__ch_{c}"))
        .otherwise(F.col(f"s.{c}"))
        .alias(c)
        for c in value_cols
    ]
    return kept.select(*out_cols)


def scd2_history(
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    attr_cols: list[str] | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change log: one
    validity interval per change, closed by the next change to the
    same key.

    Output: key columns + attribute columns + ``valid_from`` (the
    change's ``seq_col``), ``valid_to`` (next change's seq, NULL while
    current) and ``is_current``.  Duplicate (key, seq) rows are
    collapsed to one deterministically (max over attributes) first —
    an interval with zero width would make history unreadable.

    One shuffle: everything is a window over (keys) ordered by seq.
    """
    if attr_cols is None:
        attr_cols = [
            c for c in changes.columns if c not in keys and c != seq_col
        ]
    dedup = changes.groupBy(*keys, seq_col).agg(
        *[F.max(c).alias(c) for c in attr_cols]
    )
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).asc())
    return dedup.select(
        *keys,
        *attr_cols,
        F.col(seq_col).alias("valid_from"),
        F.lead(seq_col).over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Version-to-version dataset diff (staged r16 → r17): row-level
    delta between two FULL snapshots of one table — the verb an
    incremental pipeline runs when no changeset exists ("what changed
    between last month's crawl and this one", "which shards must be
    regenerated").  The changeset-driven complement of
    :func:`apply_changes`: that operator APPLIES a known delta; this
    one DERIVES the delta from two materialized versions.

    Output: one row per key present in either snapshot, with the key
    columns and ``diff_status`` ∈ ``'added'`` (key only in ``new``),
    ``'removed'`` (only in ``old``), ``'changed'`` (present in both,
    any ``compare_cols`` value differs null-safely), ``'unchanged'``
    (dropped unless ``include_unchanged``).  ``compare_cols`` defaults
    to every column the snapshots share beyond the keys.  NULL
    participates exactly: NULL keys match each other (null-safe join),
    and NULL vs non-NULL in a compare column IS a change.

    Precondition: ``key_cols`` must be unique within each snapshot
    (compose :func:`~python_dtl_spark.operators.dedup.exact_dedup`
    upstream); duplicated keys would fan the join out and double-count
    statuses.

    Scale shape: ONE null-safe full-outer equi-join on the keys — the
    canonical incremental-diff plan (sort-merge at 100 TB; bucketed or
    pre-partitioned snapshots co-locate it) — with every comparison
    row-local; no window, no second exchange beyond the join's."""
    missing_old = [c for c in key_cols if c not in old.columns]
    missing_new = [c for c in key_cols if c not in new.columns]
    if not key_cols or missing_old or missing_new:
        raise ValueError(
            f"key_cols must name columns present in both snapshots; "
            f"missing {missing_old} from old, {missing_new} from new"
        )
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns if c in old.columns and c not in key_cols
        ]
    bad = [
        c
        for c in compare_cols
        if c not in old.columns or c not in new.columns
    ]
    if bad:
        raise ValueError(f"compare_cols {bad} not present in both snapshots")
    # backtick-quoted refs, not F.col: dotted key/compare names must
    # resolve as literal top-level columns, not struct paths (the r16
    # keep_newest_canonical advisor lesson, applied proactively)
    def _q(frame, name):
        return frame["`{}`".format(name.replace("`", "``"))]

    # internal working names are INDEX-based (__sd_ok_0 …), never the
    # caller's column text — a dotted input name embedded in an alias
    # would just move the struct-path misparse one select downstream
    o = old.select(
        *[_q(old, c).alias(f"__sd_ok_{i}") for i, c in enumerate(key_cols)],
        *[
            _q(old, c).alias(f"__sd_ov_{i}")
            for i, c in enumerate(compare_cols)
        ],
        F.lit(1).alias("__sd_in_old"),
    )
    n = new.select(
        *[_q(new, c).alias(f"__sd_nk_{i}") for i, c in enumerate(key_cols)],
        *[
            _q(new, c).alias(f"__sd_nv_{i}")
            for i, c in enumerate(compare_cols)
        ],
        F.lit(1).alias("__sd_in_new"),
    )
    cond = None
    for i in range(len(key_cols)):
        clause = F.col(f"__sd_ok_{i}").eqNullSafe(F.col(f"__sd_nk_{i}"))
        cond = clause if cond is None else (cond & clause)
    j = o.join(n, on=cond, how="full_outer")
    differs = F.lit(False)
    for i in range(len(compare_cols)):
        differs = differs | ~F.col(f"__sd_ov_{i}").eqNullSafe(
            F.col(f"__sd_nv_{i}")
        )
    status = (
        F.when(F.col("__sd_in_old").isNull(), F.lit("added"))
        .when(F.col("__sd_in_new").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *[
            F.coalesce(F.col(f"__sd_nk_{i}"), F.col(f"__sd_ok_{i}")).alias(k)
            for i, k in enumerate(key_cols)
        ],
        status.alias("diff_status"),
    )
    if include_unchanged:
        return out
    return out.filter(F.col("diff_status") != "unchanged")


def source_drift_card(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    group_col: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group churn card over a snapshot diff (staged r17 → the r18
    slate's trend-card item): "which sources churned between crawls" —
    the monitoring aggregation ABOVE :func:`snapshot_diff`, one row
    per group with exact BIGINT added/removed/changed/unchanged
    counts (whence old/new totals and churn rates: n_old = removed +
    changed + unchanged, n_new = added + changed + unchanged).

    Group semantics: the group column joins WITH the keys, so a row
    that moved between groups counts as ``removed`` from its old group
    and ``added`` to its new one — the churn grain a per-source card
    wants (a source that "lost" a document to re-labeling did lose
    it).  NULL groups are a group like any other (null-safe key join,
    null-preserving aggregation key).

    Scale shape: :func:`snapshot_diff`'s single null-safe full-outer
    equi-join with row-local status comparison, feeding ONE group
    aggregation whose counts are all map-side partial-aggregable — no
    window, no second join; at 100 TB the join sort-merges (bucketed
    snapshots co-locate it) and the card table is |groups| rows.
    """
    if group_col in key_cols:
        raise ValueError(
            f"group_col {group_col!r} duplicates a key column; pass it "
            "only as group_col (it joins with the keys automatically)"
        )
    diff = snapshot_diff(
        old,
        new,
        [*key_cols, group_col],
        compare_cols=compare_cols,
        include_unchanged=True,
    )
    # backtick-quoted literal ref: a dotted group name must resolve as
    # a top-level column, not a struct path (the r16 advisor lesson)
    grp = diff["`{}`".format(group_col.replace("`", "``"))]
    st = F.col("diff_status")
    return diff.groupBy(grp.alias(group_col)).agg(
        F.count_if(st == "added").alias("n_added"),
        F.count_if(st == "removed").alias("n_removed"),
        F.count_if(st == "changed").alias("n_changed"),
        F.count_if(st == "unchanged").alias("n_unchanged"),
    )
