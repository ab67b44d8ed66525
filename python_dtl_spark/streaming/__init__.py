"""Structured Streaming extension (absent from the reference, which is
strictly batch — SURVEY.md §2.5; the ``events`` test table anticipates
this).

Design: every transformation here is written against a plain DataFrame
and works identically on a batch frame (``spark.read``) and a streaming
frame (``spark.readStream``) — the standard Spark pattern for testable
streaming logic.  Batch parity is what the DuckDB oracle checks; the
streaming path adds watermarks for late data and is exercised by the
file-source streaming tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_event_stats(
    df: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per tumbling window × event type: event count and value sum."""
    return (
        df.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(type_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col(value_col)), 2).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col(type_col),
            "n_events",
            "value_sum",
        )
    )


def sliding_event_counts(
    df: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    return (
        df.groupBy(F.window(F.col(ts_col), window, slide).alias("w"), F.col(type_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), F.col(type_col), "n_events")
    )


def session_windows(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Session windows per user: a session ends after ``gap`` of
    inactivity (F.session_window — stateful in streaming mode)."""
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col(user_col),
            "n_events",
        )
    )


def stream_events(
    spark,
    path: str,
    schema,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """File-source streaming read with a watermark for late data."""
    return (
        spark.readStream.schema(schema)
        .parquet(path)
        .withWatermark(ts_col, watermark)
    )


def run_stream_to_memory(stream_df: DataFrame, query_name: str, mode: str = "complete"):
    """Drive a streaming DataFrame into an in-memory sink (tests/demos).

    Returns the StreamingQuery; caller awaits ``processAllAvailable`` and
    reads ``spark.table(query_name)``.
    """
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .start()
    )


def streaming_first_seen(
    stream_df: DataFrame,
    key_col: str = "event_id",
):
    """Stateful streaming exact-dedup: emit only the FIRST event per key.

    Custom stateful operator via ``applyInPandasWithState`` (the Spark
    shape for state the built-in operators can't express — here,
    emit-on-first-arrival semantics rather than windowed aggregation).
    State per key is a single boolean; Arrow-batched, partitioned by
    key, nothing on the driver.  The reference engine has no streaming
    at all (SURVEY.md §2.5) — extension.

    State contract (probed in SCALING.md): O(distinct keys) rows, one
    boolean each — per-key bytes constant as keys grow.  Exact
    forever-dedup over an UNBOUNDED key domain is inherently unbounded
    state in ANY engine; when retention-bounded dedup is acceptable,
    use :func:`streaming_dedup_within_watermark`, whose state the
    watermark evicts.  (A processing-time-timeout TTL variant was
    prototyped and dropped: ``GroupStateTimeout.ProcessingTimeTimeout``
    + ``processAllAvailable`` hangs in this pyspark build, and the
    built-in watermark path is the right tool anyway.)
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = stream_df.schema
    cols = [f.name for f in out_schema.fields]

    def emit_first(key, pdf_iter, state: GroupState):
        if state.exists:
            # key already emitted in an earlier micro-batch
            yield pd.DataFrame(columns=cols)
            return
        state.update((True,))
        # deterministic representative WITHIN the micro-batch: the
        # lexicographic minimum over all columns (stable mergesort) —
        # taking the first row of the first Arrow chunk would make the
        # surviving duplicate depend on partition/batch read order, so
        # a recovery replay could emit a different row than the
        # original run.  (Across batches, first-batch-wins is the
        # operator's contract.)
        best = None
        for pdf in pdf_iter:
            if not len(pdf):
                continue
            cand = pdf.sort_values(by=cols, kind="mergesort").iloc[:1]
            if best is None:
                best = cand
            else:
                best = (
                    pd.concat([best, cand])
                    .sort_values(by=cols, kind="mergesort")
                    .iloc[:1]
                )
        yield best if best is not None else pd.DataFrame(columns=cols)

    return stream_df.groupBy(F.col(key_col)).applyInPandasWithState(
        emit_first,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup_within_watermark(
    stream_df: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    delay: str = "1 hour",
):
    """Retention-bounded streaming dedup: drop duplicate keys arriving
    within the watermark horizon, with state the engine EVICTS as the
    watermark advances (``dropDuplicatesWithinWatermark``).

    The scale tier next to :func:`streaming_first_seen`: first_seen is
    exact forever (state grows with distinct keys); this bounds state
    to ~keys-per-``delay``-window at the cost that a key recurring
    after the horizon is emitted again — the standard trade for
    at-least-once sources, where duplicates arrive close together.
    All built-in (no Python state function): the state store, its
    eviction, and its metrics come from the engine.
    """
    keys = key_cols or ["event_id"]
    return stream_df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        keys
    )


def streaming_time_rollup(
    df: DataFrame,
    grain: str = "1 hour",
    dims: list[str] | None = None,
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """The streaming half of the hypertable pattern: a continuous
    aggregate at the finest grain, keyed on a tumbling event-time
    window so the watermark can evict state (grouping on a bare
    ``date_trunc`` would accumulate state forever).

    Output schema matches ``operators.rollup.time_rollup``'s per-level
    shape (bucket_start, dims, n_rows, sum_/avg_<value>), so coarser
    grains are plain batch re-aggregations of this operator's sink —
    exactly how the batch rollup derives day from hour.  Works
    identically on batch frames, which is what the oracle checks.
    """
    dims = dims or []
    return (
        df.groupBy(F.window(F.col(ts_col), grain).alias("w"), *dims)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("`" + value_col.replace("`", "``") + "`")).alias("__sum"),
            # SQL-AVG denominator: non-null values only, matching the
            # batch rollup (dividing by n_rows deflates NULL-y columns)
            F.count(F.col("`" + value_col.replace("`", "``") + "`")).alias("__cnt"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            *dims,
            "n_rows",
            F.col("__sum").alias(f"sum_{value_col}"),
            (F.col("__sum") / F.col("__cnt")).alias(f"avg_{value_col}"),
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    max_delay: str = "4 hours",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Event-time interval join: each left row matched to the right rows
    of the same key whose timestamp falls in [left.ts - max_delay,
    left.ts] — the click-to-purchase attribution shape.

    This is the canonical Structured Streaming stream-stream join: in
    streaming mode both inputs must carry watermarks (see
    :func:`stream_events`) and the two-sided time bound is exactly what
    lets Spark evict buffered join state instead of holding both
    streams forever.  On batch frames the same expression is an
    ordinary equi-join on the key with a range post-filter, which is
    what the DuckDB oracle checks (batch parity, like every operator in
    this module).

    Output: all left columns, plus the right timestamp and
    ``right_cols`` (suffixed on collision with a left name).
    """
    for side, frame in (("left", left), ("right", right)):
        missing = [c for c in (by, ts_col) if c not in frame.columns]
        if missing:
            # without this check a ts_col absent from the LEFT frame
            # makes both range bounds reference the right-side column
            # (trivially true) — a silent pure key equi-join with
            # unbounded streaming state
            raise ValueError(
                f"interval_join: {side} frame lacks column(s) {missing}; "
                f"have {frame.columns}"
            )
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (by, ts_col)]
    taken = set(left.columns)

    def _name(c: str) -> str:
        return c + suffix if c in taken else c

    r = right.select(
        F.col(by).alias("__by_r"),
        F.col(ts_col).alias(_name(ts_col) if ts_col in taken else ts_col),
        *[F.col(c).alias(_name(c)) for c in right_cols],
    )
    r_ts = _name(ts_col) if ts_col in taken else ts_col
    delay = F.expr(f"INTERVAL {max_delay}")
    cond = (
        (F.col(by) == F.col("__by_r"))
        & (F.col(r_ts) <= F.col(ts_col))
        & (F.col(r_ts) >= F.col(ts_col) - delay)
    )
    return left.join(r, cond, "inner").drop("__by_r")


def stream_to_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    partition_by: list[str] | None = None,
):
    """Exactly-once streaming parquet sink — the production EXPORT path
    for a continuously-ingesting pipeline.

    Spark's file sink is transactional: every committed micro-batch
    records its files in the sink's ``_spark_metadata`` log, and the
    source offsets live in ``checkpoint_dir``.  A crash or restart
    resumes from the last committed batch — already-ingested input is
    never reprocessed, half-written files are never exposed to readers
    (downstream ``spark.read.parquet`` consults the metadata log).
    That end-to-end exactly-once property is what lets a 100 TB
    ingestion run for months and be restarted freely.

    ``available_now=True`` drains everything currently available and
    stops (incremental batch — the "run the pipeline every hour from
    cron, process only new files" mode); ``False`` runs continuously.

    Returns the started ``StreamingQuery``; callers await it.  Works on
    any append-safe streaming frame — including every stateless text
    operator in this package (``blocklist_flags``, ``pii_scrub``,
    quality features): they are pure column expressions, so the same
    call chain runs identically over ``readStream`` and ``read``.
    """
    writer = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if partition_by:
        # Hive-style partitioned sink (e.g. shard= directories from
        # sampling.shard_assign) — the streaming training-shard
        # emission path; still exactly-once via _spark_metadata
        writer = writer.partitionBy(*partition_by)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
