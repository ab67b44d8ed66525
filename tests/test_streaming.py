"""Streaming extension tests: batch/stream parity of the shared
transformations, driven through a real file-source readStream into a
memory sink."""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from python_dtl_spark.streaming import (
    run_stream_to_memory,
    session_windows,
    sliding_event_counts,
    stream_events,
    tumbling_event_stats,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _events(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(200):
        rows.append(
            (
                i,
                base + dt.timedelta(minutes=7 * i),
                i % 5,
                ["view", "click", "purchase"][i % 3],
                float(i % 10),
            )
        )
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture(scope="module")
def events(spark):
    return _events(spark)


def test_tumbling_stats_batch(events):
    out = tumbling_event_stats(events, "1 hour")
    rows = out.collect()
    assert sum(r["n_events"] for r in rows) == 200
    # window starts align to the hour
    assert all(r["window_start"].minute == 0 for r in rows)


def test_sliding_counts_double_count(events):
    out = sliding_event_counts(events, "1 hour", "30 minutes")
    # every event lands in exactly two 1h/30m windows
    assert sum(r["n_events"] for r in out.collect()) == 400


def test_session_windows_gap(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (0, base, 1, "view", 0.0),
        (1, base + dt.timedelta(minutes=10), 1, "view", 0.0),
        (2, base + dt.timedelta(minutes=90), 1, "view", 0.0),  # new session
        (3, base + dt.timedelta(minutes=5), 2, "view", 0.0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = session_windows(df, "30 minutes").collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r)
    assert len(per_user[1]) == 2
    assert len(per_user[2]) == 1
    first = min(per_user[1], key=lambda r: r["session_start"])
    assert first["n_events"] == 2
    assert first["session_end"] == base + dt.timedelta(minutes=40)  # last + gap


def test_streaming_matches_batch(spark, tmp_path):
    """Same transformation over readStream (file source → memory sink)
    must equal the batch result."""
    events = _events(spark)
    src = str(tmp_path / "events_stream")
    events.write.parquet(src)

    stream = stream_events(spark, src, SCHEMA, watermark="2 hours")
    q = run_stream_to_memory(
        tumbling_event_stats(stream, "1 hour"), "tumbling_test", mode="complete"
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["value_sum"])
            for r in spark.table("tumbling_test").collect()
        }
    finally:
        q.stop()

    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_sum"])
        for r in tumbling_event_stats(events, "1 hour").collect()
    }
    assert streamed == batch


def test_streaming_first_seen_stateful_dedup(spark, tmp_path):
    """applyInPandasWithState: only the first event per key is emitted,
    across micro-batches."""
    import pandas as pd

    from python_dtl_spark.streaming import streaming_first_seen

    src = str(tmp_path / "stream_src")
    # two files → at least two micro-batches with maxFilesPerTrigger=1
    base = dt.datetime(2024, 1, 1)
    batch1 = [(i, base, i % 5, "view", 1.0) for i in (1, 2, 3, 1, 2)]
    batch2 = [(i, base, i % 5, "view", 1.0) for i in (2, 3, 4, 5)]
    spark.createDataFrame(batch1, SCHEMA).coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame(batch2, SCHEMA).coalesce(1).write.parquet(src + "/b2")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    deduped = streaming_first_seen(stream, key_col="event_id")
    q = (
        deduped.writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(r.event_id for r in spark.table("first_seen").collect())
    finally:
        q.stop()
    assert got == [1, 2, 3, 4, 5]

    # retention-bounded tier: watermark-evicted dedup over the same
    # source — duplicates inside the horizon drop, state is bounded
    from python_dtl_spark.streaming import streaming_dedup_within_watermark

    deduped_wm = streaming_dedup_within_watermark(
        stream, key_cols=["event_id"], ts_col="ts", delay="1 hour"
    )
    q2 = (
        deduped_wm.writeStream.format("memory")
        .queryName("first_seen_wm")
        .outputMode("append")
        .start()
    )
    try:
        q2.processAllAvailable()
        got2 = sorted(r.event_id for r in spark.table("first_seen_wm").collect())
    finally:
        q2.stop()
    assert got2 == [1, 2, 3, 4, 5]


def test_cli_runs_script(spark, tmp_path):
    from python_dtl_spark.main import main as cli_main

    script = tmp_path / "job.dtl"
    script.write_text(
        "WITH orders AS IMPORT 'orders';\n"
        "WITH big AS SELECT o_orderkey FROM orders WHERE o_totalprice > 100000.0;\n"
        "EXPORT big TO 'big';\n"
    )
    outdir = str(tmp_path / "out")
    cli_main(
        [
            str(script),
            "--input-dir",
            "/root/testdata/sf0.001",
            "--output-dir",
            outdir,
        ]
    )
    got = spark.read.parquet(outdir + "/big.parquet")
    assert got.columns == ["o_orderkey"]
    assert got.count() == 1190


def test_streaming_time_rollup_feeds_batch_rollup(spark, tmp_path):
    """Hypertable pattern end-to-end: the streaming finest-grain
    continuous aggregate equals the batch hour level, and re-aggregating
    its sink with the batch rollup yields the day level exactly."""
    from python_dtl_spark.operators.rollup import time_rollup
    from python_dtl_spark.streaming import streaming_time_rollup

    events = _events(spark)
    src = str(tmp_path / "events_rollup_stream")
    events.write.parquet(src)

    stream = stream_events(spark, src, SCHEMA, watermark="2 hours")
    q = run_stream_to_memory(
        streaming_time_rollup(stream, "1 hour", dims=["event_type"]),
        "rollup_test",
        mode="complete",
    )
    try:
        q.processAllAvailable()
        streamed = spark.table("rollup_test").collect()
    finally:
        q.stop()

    batch = {
        (r["bucket_start"], r["event_type"]): (r["n_rows"], r["sum_value"])
        for r in time_rollup(
            events, "ts", ["event_type"], ["value"], ["hour"]
        ).collect()
    }
    got = {
        (r["bucket_start"], r["event_type"]): (r["n_rows"], r["sum_value"])
        for r in streamed
    }
    assert got == batch

    # coarser grain from the streaming sink: re-aggregate hour -> day
    sink = spark.createDataFrame(streamed)
    daily = (
        sink.groupBy(
            F.date_trunc("day", F.col("bucket_start")).alias("bucket_start"),
            "event_type",
        )
        .agg(F.sum("n_rows").alias("n_rows"), F.sum("sum_value").alias("sum_value"))
        .collect()
    )
    daily_expected = {
        (r["bucket_start"], r["event_type"]): (r["n_rows"], r["sum_value"])
        for r in time_rollup(events, "ts", ["event_type"], ["value"], ["day"]).collect()
    }
    assert {
        (r["bucket_start"], r["event_type"]): (r["n_rows"], r["sum_value"])
        for r in daily
    } == daily_expected


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join (append mode) must equal
    the batch interval join over the same data."""
    from python_dtl_spark.streaming import interval_join

    events = _events(spark)
    purchases_b = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks_b = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    p_src = str(tmp_path / "purchases")
    c_src = str(tmp_path / "clicks")
    purchases_b.write.parquet(p_src)
    clicks_b.write.parquet(c_src)

    side_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    p_stream = stream_events(spark, p_src, side_schema, watermark="2 hours")
    c_stream = stream_events(spark, c_src, side_schema, watermark="2 hours")
    joined = interval_join(
        p_stream, c_stream, by="user_id", ts_col="ts", max_delay="2 hours",
        right_cols=["event_id"],
    )
    q = run_stream_to_memory(joined, "interval_join_test", mode="append")
    try:
        q.processAllAvailable()
        streamed = {
            (r["event_id"], r["event_id_right"])
            for r in spark.table("interval_join_test").collect()
        }
    finally:
        q.stop()

    batch = {
        (r["event_id"], r["event_id_right"])
        for r in interval_join(
            purchases_b, clicks_b, by="user_id", ts_col="ts",
            max_delay="2 hours", right_cols=["event_id"],
        ).collect()
    }
    assert streamed == batch
    assert len(batch) > 0


def test_streaming_chunking_matches_batch(spark, tmp_path):
    """Stateless mapInPandas-free chunking runs identically on a
    stream: readStream docs -> chunk_documents -> append sink equals
    the batch result."""
    from python_dtl_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(i, "word " * (40 + 13 * i)) for i in range(20)],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs_stream")
    docs.write.parquet(src)
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    q = run_stream_to_memory(
        chunk_documents(stream, chunk_size=100, overlap=20), "chunk_stream", mode="append"
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r.doc_id, r.chunk_index, r.chunk_start, r.chunk_text)
            for r in spark.table("chunk_stream").collect()
        }
    finally:
        q.stop()
    batch = {
        (r.doc_id, r.chunk_index, r.chunk_start, r.chunk_text)
        for r in chunk_documents(docs, chunk_size=100, overlap=20).collect()
    }
    assert streamed == batch and len(batch) > 20


def test_streaming_c4_clean_matches_batch(spark, tmp_path):
    """c4_clean_lines (registered r16) is a pure row-local map —
    streaming-legal by construction: readStream docs → the full C4
    recipe (line rules + in-page line dedup + page gates) → append
    sink equals the batch result row-for-row.  The crawl-cleaning
    front door therefore runs on a live crawl feed unchanged."""
    from python_dtl_spark.operators.text import c4_clean_lines

    docs = spark.createDataFrame(
        [
            (i, "\n".join(
                f"line {j} of doc {i} stays here."
                if (i + j) % 3 and i % 4 != 0 else f"bare line {j}"
                for j in range(8)
            ))
            for i in range(16)
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "c4_stream")
    docs.write.parquet(src)
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    q = run_stream_to_memory(
        c4_clean_lines(stream, dedup_lines=True, min_kept_lines=3),
        "c4_stream_out",
        mode="append",
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r.doc_id, r.text, r.n_lines, r.n_lines_kept, r.keep)
            for r in spark.table("c4_stream_out").collect()
        }
    finally:
        q.stop()
    batch = {
        (r.doc_id, r.text, r.n_lines, r.n_lines_kept, r.keep)
        for r in c4_clean_lines(docs, dedup_lines=True, min_kept_lines=3).collect()
    }
    assert streamed == batch and len(batch) == 16
    assert any(r[4] for r in batch) and any(not r[4] for r in batch)


def test_streaming_char_concentration_matches_batch(spark, tmp_path):
    """char_concentration_flags (registered r16) is a pure row-local
    map (array_sort + one struct fold) — streaming-legal by
    construction: readStream docs → Simpson/modal junk-blob flags →
    append sink equals the batch result row-for-row, so the filter
    runs on a live crawl feed unchanged."""
    from python_dtl_spark.operators.text import char_concentration_flags

    docs = spark.createDataFrame(
        [
            (i, "z" * 80 if i % 5 == 0
             else f"document {i} carries ordinary prose with spaces and "
                  f"mixed letters so the simpson index stays low {i}")
            for i in range(15)
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "cc_stream")
    docs.write.parquet(src)
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    q = run_stream_to_memory(
        char_concentration_flags(stream), "cc_stream_out", mode="append"
    )
    try:
        q.processAllAvailable()
        streamed = {tuple(r) for r in spark.table("cc_stream_out").collect()}
    finally:
        q.stop()
    batch = {tuple(r) for r in char_concentration_flags(docs).collect()}
    assert streamed == batch and len(batch) == 15
    assert any(not r[-1] for r in batch) and any(r[-1] for r in batch)


def test_streaming_crawl_delta_matches_batch(spark, tmp_path):
    """crawl_delta_pairs_stream (the streaming tier of the r16
    incremental-dedup verb): a readStream crawl feed probing the
    STORED LSH index through stream-static joins must flag exactly
    the pair set the batch operator verifies — same hash algebra,
    row-local signatures instead of the stateful aggregate.  Pair
    duplicates (one per colliding band) collapse to the identical
    value, so set-compare after the sink."""
    from pyspark.sql import functions as F

    from python_dtl_spark.operators.dedup import (
        crawl_delta_pairs,
        crawl_delta_pairs_stream,
        minhash_band_buckets,
    )

    corpus = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .filter("doc_id < 200")
    )
    crawl = corpus.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"), "text"
    )
    idx_path = str(tmp_path / "idx.parquet")
    minhash_band_buckets(corpus).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)

    batch = {
        (r.crawl_id, r.corpus_id, round(r.jaccard, 12))
        for r in crawl_delta_pairs(
            corpus, crawl, threshold=0.3, corpus_buckets=index
        ).collect()
    }
    assert batch  # self-copies guarantee pairs

    src = str(tmp_path / "crawl_stream")
    crawl.write.parquet(src)
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    q = run_stream_to_memory(
        crawl_delta_pairs_stream(stream, index, corpus, threshold=0.3),
        "crawl_delta_stream",
        mode="append",
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r.crawl_id, r.corpus_id, round(r.jaccard, 12))
            for r in spark.table("crawl_delta_stream").collect()
        }
    finally:
        q.stop()
    assert streamed == batch


def test_streaming_embedding_delta_matches_batch(spark, tmp_path):
    """embedding_delta_pairs_stream: a readStream embedding feed
    probing the STORED hyperplane index through stream-static joins
    must flag exactly the batch operator's pair set — identical
    algebra (the signature is row-local in both tiers), and unlike
    the MinHash tier each pair matches through exactly ONE probe
    bucket, so even the multiplicities agree."""
    from pyspark.sql import functions as F

    from python_dtl_spark.operators.dedup import (
        embedding_delta_pairs,
        embedding_delta_pairs_stream,
        embedding_lsh_buckets,
    )

    corpus = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
        .filter("vec_id < 200")
    )
    delta = corpus.filter(F.col("vec_id") % 3 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    idx_path = str(tmp_path / "eidx.parquet")
    embedding_lsh_buckets(corpus, dim=64).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)

    batch = [
        (r.delta_id, r.corpus_id, round(r.cosine, 12))
        for r in embedding_delta_pairs(
            corpus, delta, threshold=0.9, dim=64, corpus_buckets=index
        ).collect()
    ]
    assert batch  # planted copies guarantee pairs

    src = str(tmp_path / "embed_stream")
    delta.write.parquet(src)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    q = run_stream_to_memory(
        embedding_delta_pairs_stream(
            stream, index, corpus, threshold=0.9, dim=64
        ),
        "embed_delta_stream",
        mode="append",
    )
    try:
        q.processAllAvailable()
        streamed = [
            (r.delta_id, r.corpus_id, round(r.cosine, 12))
            for r in spark.table("embed_delta_stream").collect()
        ]
    finally:
        q.stop()
    assert sorted(streamed) == sorted(batch)  # multiplicities included
    with pytest.raises(ValueError, match="dim is required"):
        embedding_delta_pairs_stream(stream, index, corpus)


def test_streaming_url_canonicalize_matches_batch(spark, tmp_path):
    """URL canonicalization is a stateless map stage, so it streams
    as-is: readStream urls -> canonicalize_urls -> append sink equals
    the batch result — the crawl-frontier shape (canonicalize arriving
    URLs incrementally, cap domains downstream)."""
    from python_dtl_spark.operators.urls import canonicalize_urls

    urls_df = spark.createDataFrame(
        [
            (0, "https://WWW.Example.COM:443/a/"),
            (1, "http://blog.ex.co.uk/p?utm_source=x&q=1#f"),
            (2, "not a url"),
            (3, "https://cdn.ex.com:8080//x/"),
        ],
        "doc_id long, url string",
    )
    src = str(tmp_path / "urls_stream")
    urls_df.write.parquet(src)
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("url", T.StringType())]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    q = run_stream_to_memory(
        canonicalize_urls(stream, "url"), "url_stream", mode="append"
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r.doc_id, r.canonical_url, r.host, r.registrable_domain)
            for r in spark.table("url_stream").collect()
        }
    finally:
        q.stop()
    batch = {
        (r.doc_id, r.canonical_url, r.host, r.registrable_domain)
        for r in canonicalize_urls(urls_df, "url").collect()
    }
    assert streamed == batch
    assert ("https://example.com/a", "example.com") == next(
        (c, h) for d, c, h, _ in batch if d == 0
    )


def test_streaming_bpe_encode_matches_batch(spark, tmp_path):
    """Tokenizer inference is a stateless single-fold map stage, so a
    LEARNED merge table applies to a document stream as-is: readStream
    docs -> bpe_encode -> append sink equals the batch result — the
    online-tokenization shape (encode arriving documents with a frozen
    fit)."""
    from python_dtl_spark.operators.text import bpe_encode

    docs = spark.createDataFrame(
        [(0, "t h e t h e"), (1, "a a a"), (2, ""), (3, "t h x")],
        "doc_id long, text string",
    )
    merges = [("t", "h"), ("t h", "e"), ("a", "a")]
    src = str(tmp_path / "docs_stream")
    docs.write.parquet(src)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    q = run_stream_to_memory(
        bpe_encode(stream, merges), "bpe_stream", mode="append"
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r.doc_id, tuple(r.tokens_bpe))
            for r in spark.table("bpe_stream").collect()
        }
    finally:
        q.stop()
    batch = {
        (r.doc_id, tuple(r.tokens_bpe))
        for r in bpe_encode(docs, merges).collect()
    }
    assert streamed == batch
    assert (0, ("t h e", "t h e")) in batch and (1, ("a a", "a")) in batch


DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_stream_curation_to_parquet_exactly_once(spark, tmp_path):
    """The streaming EXPORT path: a stateless curation transform
    (blocklist screening) over a file-source stream into the
    transactional parquet sink.  Restarting with the same checkpoint
    after new input arrives must process ONLY the new files — no row
    from the first run is ever re-emitted (exactly-once resume), and
    the batch reader sees a consistent table via _spark_metadata."""
    from python_dtl_spark.operators.text import blocklist_flags
    from python_dtl_spark.streaming import stream_to_parquet

    src = tmp_path / "in"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    batch1 = spark.createDataFrame(
        [(0, "clean words only"), (1, "some bad words")], DOC_SCHEMA
    )
    batch1.coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(DOC_SCHEMA).parquet(str(src))
    q = stream_to_parquet(blocklist_flags(stream, ["bad"]), out, ckpt)
    q.awaitTermination(120)

    got1 = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert set(got1) == {0, 1}
    assert not got1[0].blocked and got1[1].blocked

    # second arrival: one new file; same checkpoint resumes past batch 1
    batch2 = spark.createDataFrame([(2, "bad again")], DOC_SCHEMA)
    batch2.coalesce(1).write.mode("append").parquet(str(src))

    q2 = stream_to_parquet(
        blocklist_flags(
            spark.readStream.schema(DOC_SCHEMA).parquet(str(src)), ["bad"]
        ),
        out,
        ckpt,
    )
    q2.awaitTermination(120)

    rows = spark.read.parquet(out).collect()
    assert sorted(r.doc_id for r in rows) == [0, 1, 2]  # no duplicates
    got2 = {r.doc_id: r for r in rows}
    assert got2[2].blocked and got2[2].n_blocked == 1


def test_cli_sorted_export_and_merge_schema_flags(spark, tmp_path):
    """--sort-output-by produces tight per-row-group min/max stats on
    the sort column (the data-skipping contract); --merge-schema reads
    an evolved table whole."""
    import glob

    import pyarrow.parquet as pq

    from python_dtl_spark.main import main as cli_main

    script = tmp_path / "job.dtl"
    script.write_text(
        "WITH orders AS IMPORT 'orders';\n"
        "WITH o AS SELECT o_orderkey, o_custkey FROM orders;\n"
        "EXPORT o TO 'o_sorted';\n"
    )
    outdir = str(tmp_path / "out")
    cli_main(
        [
            str(script),
            "--input-dir",
            "/root/testdata/sf0.001",
            "--output-dir",
            outdir,
            "--num-output-files",
            "2",
            "--sort-output-by",
            "o_custkey",
        ]
    )
    parts = glob.glob(f"{outdir}/o_sorted.parquet/part-*.parquet")
    assert parts
    for p in parts:
        f = pq.ParquetFile(p)
        idx = [c.name for c in f.schema_arrow].index("o_custkey")
        prev = None
        for rg in range(f.metadata.num_row_groups):
            st = f.metadata.row_group(rg).column(idx).statistics
            assert st is not None and st.has_min_max
            if prev is not None:
                assert st.min >= prev
            prev = st.max

    # evolve the exported table, then re-import via --merge-schema
    spark.createDataFrame(
        [(999999, 1, "late")], "o_orderkey long, o_custkey long, note string"
    ).write.mode("append").parquet(f"{outdir}/o_sorted.parquet")
    script2 = tmp_path / "job2.dtl"
    script2.write_text(
        "WITH o_sorted AS IMPORT 'o_sorted';\n"
        "WITH all_cols AS SELECT o_orderkey, note FROM o_sorted;\n"
        "EXPORT all_cols TO 'all_cols';\n"
    )
    cli_main(
        [
            str(script2),
            "--input-dir",
            outdir,
            "--output-dir",
            str(tmp_path / "out2"),
            "--merge-schema",
        ]
    )
    back = spark.read.parquet(str(tmp_path / "out2" / "all_cols.parquet"))
    assert set(back.columns) == {"o_orderkey", "note"}
    notes = [r.note for r in back.collect() if r.note is not None]
    assert notes == ["late"]  # evolved column visible, old rows NULL


def test_streaming_json_extraction_matches_batch(spark, tmp_path):
    """Schema-on-read JSON extraction is a stateless column transform,
    so the same call chain runs identically over readStream: extract a
    typed field from the props sidecar, aggregate per event type via a
    watermarked tumbling window, compare to batch."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from python_dtl_spark.operators.semistructured import json_extract_fields

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("props", T.StringType()),
        ]
    )
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 5 * i), "c" if i % 2 else "v", f'{{"k": {i * 10}}}')
        for i in range(8)
    ] + [(99, dt.datetime(2024, 1, 1, 1, 0), "v", "{broken")]
    batch_df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "json_stream")
    batch_df.write.parquet(src)

    def agg(df):
        ex = json_extract_fields(df, "props", {"k": "bigint"})
        return (
            ex.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("k").alias("sum_k"),
                F.count("k").alias("n_with_k"),
            )
            .select(F.col("w.start").alias("ws"), "event_type", "n", "sum_k", "n_with_k")
        )

    stream = (
        spark.readStream.schema(schema).parquet(src).withWatermark("ts", "2 hours")
    )
    q = run_stream_to_memory(agg(stream), "json_stream_test", mode="complete")
    try:
        q.processAllAvailable()
        streamed = {
            (r.ws, r.event_type): (r.n, r.sum_k, r.n_with_k)
            for r in spark.table("json_stream_test").collect()
        }
    finally:
        q.stop()
    batch = {
        (r.ws, r.event_type): (r.n, r.sum_k, r.n_with_k)
        for r in agg(batch_df).collect()
    }
    assert streamed == batch
    # the malformed-sidecar row is counted (n) but contributes no k
    hour2 = [v for (ws, et), v in batch.items() if ws.hour == 1]
    assert hour2 == [(1, None, 0)]


def test_streaming_nb_classify_matches_batch(spark, tmp_path):
    """Online classifier scoring: a FROZEN fitted NB model applies to
    a document stream via nb_apply(row_local=True) — the plan-literal
    model tier is a pure map stage (no streaming aggregation, no
    stream self-join), so readStream docs -> score -> append sink
    equals the batch result.  The GPT-3-style 'score documents as they
    arrive' shape; the default join path stays the batch/backfill
    tier."""
    from python_dtl_spark.operators import classify

    train = spark.createDataFrame(
        [
            (0, "the quick brown fox", "en"),
            (1, "a lazy brown dog", "en"),
            (2, "le chat noir dort", "fr"),
            (3, "un chien et le chat", "fr"),
        ],
        "doc_id long, text string, label string",
    )
    tc, cs = classify.nb_fit(train, "label")
    docs = spark.createDataFrame(
        [(10, "the brown dog"), (11, "le chien dort"), (12, ""), (13, "zz")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "nb_docs_stream")
    docs.write.parquet(src)
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
    q = run_stream_to_memory(
        classify.nb_apply(stream, tc, cs, row_local=True),
        "nb_stream",
        mode="append",
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r.doc_id, r.predicted_label, round(r.log_score, 9))
            for r in spark.table("nb_stream").collect()
        }
    finally:
        q.stop()
    batch = {
        (r.doc_id, r.predicted_label, round(r.log_score, 9))
        for r in classify.nb_apply(docs, tc, cs, row_local=True).collect()
    }
    assert streamed == batch and len(batch) == 4
    labels = {d: l for d, l, _ in batch}
    assert labels[10] == "en" and labels[11] == "fr"


def test_streaming_lm_perplexity_matches_batch(spark, tmp_path):
    """Online perplexity scoring: a frozen fitted bigram LM applies to
    a document stream via lm_perplexity(row_local=True) — plan-literal
    model maps + one per-row fold, no streaming aggregation, no stream
    self-join — so readStream docs -> score -> append sink equals the
    batch result (the CCNet filter over arriving documents)."""
    from python_dtl_spark.operators import classify

    corpus = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the dog sat on the mat"),
            (2, "a cat ran to the dog"),
        ],
        "doc_id long, text string",
    )
    bi, uni = classify.lm_fit(corpus)
    docs = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zz qq ww"), (12, ""), (13, "single")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "lm_docs_stream")
    docs.write.parquet(src)
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
    q = run_stream_to_memory(
        classify.lm_perplexity(stream, bi, uni, row_local=True),
        "lm_stream",
        mode="append",
    )
    try:
        q.processAllAvailable()
        streamed = {
            (
                r.doc_id, r.n_trans, r.n_unseen, r.n_oov_ctx,
                r.sum_bigram_freq, r.sum_context_freq,
                None if r.perplexity is None else round(r.perplexity, 9),
            )
            for r in spark.table("lm_stream").collect()
        }
    finally:
        q.stop()
    batch = {
        (
            r.doc_id, r.n_trans, r.n_unseen, r.n_oov_ctx,
            r.sum_bigram_freq, r.sum_context_freq,
            None if r.perplexity is None else round(r.perplexity, 9),
        )
        for r in classify.lm_perplexity(docs, bi, uni, row_local=True).collect()
    }
    assert streamed == batch and len(batch) == 4


def test_streaming_tokenize_then_classify_chain(spark, tmp_path):
    """The full streaming curation chain composes: a FROZEN BPE merge
    table encodes arriving documents (single-fold map stage) and a
    FROZEN NB model classifies them over the encoded tokens
    (row_local plan-literal tier, tokens_col handoff) — one stateless
    readStream pipeline, batch-parity-checked.  Merged tokens are the
    classifier's features end to end."""
    from python_dtl_spark.operators import classify
    from python_dtl_spark.operators.text import bpe_encode

    merges = [("t", "h")]
    train = spark.createDataFrame(
        [
            (0, "t h buy cheap", "spam"),
            (1, "t h cheap now", "spam"),
            (2, "t h meeting notes", "ham"),
            (3, "t h notes agenda", "ham"),
        ],
        "doc_id long, text string, label string",
    )
    enc_train = bpe_encode(train, merges, out_col="toks")
    tc, cs = classify.nb_fit(enc_train, "label", tokens_col="toks")

    docs = spark.createDataFrame(
        [(10, "t h cheap"), (11, "t h agenda"), (12, "")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "chain_stream")
    docs.write.parquet(src)
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)

    def chain(frame):
        encoded = bpe_encode(frame, merges, out_col="toks")
        return classify.nb_apply(
            encoded, tc, cs, tokens_col="toks", row_local=True
        ).select("doc_id", "predicted_label")

    q = run_stream_to_memory(chain(stream), "chain_stream_q", mode="append")
    try:
        q.processAllAvailable()
        streamed = {
            (r.doc_id, r.predicted_label)
            for r in spark.table("chain_stream_q").collect()
        }
    finally:
        q.stop()
    batch = {(r.doc_id, r.predicted_label) for r in chain(docs).collect()}
    assert streamed == batch and len(batch) == 3
    labels = dict(batch)
    assert labels[10] == "spam" and labels[11] == "ham"


def test_streaming_shard_emission_matches_batch(spark, tmp_path):
    """The streaming training-shard emission leg: readStream ->
    shard_assign (pure map, streaming-legal) -> exactly-once
    partitioned parquet sink.  The shard coordinate must be
    byte-identical to batch shuffle_shards' shard for the same
    seed/key (same md5 slice by construction), the sink must lay out
    Hive-style shard= directories, and a rerun assigns identically."""
    import os

    from python_dtl_spark.operators import sampling
    from python_dtl_spark.streaming import stream_to_parquet

    in_dir = os.path.join(str(tmp_path), "in")
    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
    )
    docs.write.parquet(in_dir)
    batch = spark.read.parquet(in_dir)

    stream = spark.readStream.schema(batch.schema).parquet(in_dir)
    out_dir = os.path.join(str(tmp_path), "shards")
    q = stream_to_parquet(
        sampling.shard_assign(stream, "doc_id", 8, seed="em"),
        out_dir,
        os.path.join(str(tmp_path), "ckpt"),
        partition_by=["shard"],
    )
    q.awaitTermination()

    # Hive-style shard directories exist
    dirs = {d for d in os.listdir(out_dir) if d.startswith("shard=")}
    assert len(dirs) > 1, dirs
    streamed = {
        (r.doc_id, r.shard)
        for r in spark.read.parquet(out_dir).select("doc_id", "shard").collect()
    }
    # batch parity: shuffle_shards' shard coordinate is the same slice
    full = {
        (r.doc_id, r.shard)
        for r in sampling.shuffle_shards(batch, "doc_id", 8, seed="em")
        .select("doc_id", "shard")
        .collect()
    }
    assert streamed == full
    # the map-only assign itself is deterministic across runs
    again = {
        (r.doc_id, r.shard)
        for r in sampling.shard_assign(batch, "doc_id", 8, seed="em")
        .select("doc_id", "shard")
        .collect()
    }
    assert again == full
    # plan: zero Exchange, zero Python (pure map stage)
    plan = (
        sampling.shard_assign(batch, "doc_id", 8, seed="em")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan
    # guards
    with pytest.raises(ValueError, match="n_shards"):
        sampling.shard_assign(batch, "doc_id", 0)
    with pytest.raises(ValueError, match="already exists"):
        sampling.shard_assign(
            batch.withColumn("shard", F.lit(1)), "doc_id", 4
        )


def test_streaming_epoch_shard_emission_chain(spark, tmp_path):
    """The FULL streaming emission chain: readStream -> epoch_upsample
    (stream-static broadcast join + row-local explode — streaming-legal
    by construction) -> composite doc_id#epoch key -> shard_assign ->
    partitioned exactly-once sink.  Batch parity on the complete
    (doc_id, epoch, shard) multiset."""
    import os

    from python_dtl_spark.operators import sampling
    from python_dtl_spark.streaming import stream_to_parquet

    in_dir = os.path.join(str(tmp_path), "in")
    docs = spark.range(0, 120).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "wiki")
        .when(F.col("id") % 3 == 1, "crawl")
        .otherwise("books")
        .alias("source"),
    )
    docs.write.parquet(in_dir)
    batch = spark.read.parquet(in_dir)

    def chain(df):
        up = sampling.epoch_upsample(
            df, "source", {"wiki": 3, "crawl": 0, "books": 2}
        )
        keyed = up.withColumn(
            "k", F.concat_ws("#", F.col("doc_id"), F.col("epoch"))
        )
        return sampling.shard_assign(keyed, "k", 4, seed="se")

    stream = spark.readStream.schema(batch.schema).parquet(in_dir)
    out_dir = os.path.join(str(tmp_path), "emit")
    q = stream_to_parquet(
        chain(stream),
        out_dir,
        os.path.join(str(tmp_path), "ckpt"),
        partition_by=["shard"],
    )
    q.awaitTermination()

    streamed = {
        (r.doc_id, r.epoch, r.shard)
        for r in spark.read.parquet(out_dir)
        .select("doc_id", "epoch", "shard")
        .collect()
    }
    batched = {
        (r.doc_id, r.epoch, r.shard)
        for r in chain(batch).select("doc_id", "epoch", "shard").collect()
    }
    assert streamed == batched and len(streamed) > 0
    # multiplicity is the epoch recipe: wiki x3, books x2, crawl dropped
    n_wiki = sum(1 for d, e, s in streamed if d % 3 == 0)
    n_crawl = sum(1 for d, e, s in streamed if d % 3 == 1)
    n_books = sum(1 for d, e, s in streamed if d % 3 == 2)
    assert (n_wiki, n_crawl, n_books) == (40 * 3, 0, 40 * 2)


def test_streaming_dsir_weights_matches_batch(spark, tmp_path):
    """Online DSIR importance scoring: frozen fitted bucket models
    apply to a document stream via dsir_weights(row_local=True) —
    plan-literal maps + one per-row fold, no streaming aggregation,
    no stream self-join — so readStream docs -> score -> append sink
    equals the batch result (score arriving crawl documents against a
    fixed target-domain model)."""
    from python_dtl_spark.operators import classify

    corpus = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the dog sat on the mat"),
            (2, "a cat ran to the dog"),
        ],
        "doc_id long, text string",
    )
    tc = classify.dsir_fit(
        corpus.where("doc_id < 2"), text_col="text", seed="s-d"
    )
    rc = classify.dsir_fit(corpus, text_col="text", seed="s-d")
    docs = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zz qq ww"), (12, ""), (13, "single")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "dsir_docs_stream")
    docs.write.parquet(src)
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
    q = run_stream_to_memory(
        classify.dsir_weights(stream, tc, rc, seed="s-d", row_local=True),
        "dsir_stream",
        mode="append",
    )
    try:
        q.processAllAvailable()
        streamed = {
            (
                r.doc_id, r.n_feats, r.sum_target_freq, r.sum_raw_freq,
                r.n_unseen_target, r.n_unseen_raw,
                round(r.log_weight, 9),
            )
            for r in spark.table("dsir_stream").collect()
        }
    finally:
        q.stop()
    batch = {
        (
            r.doc_id, r.n_feats, r.sum_target_freq, r.sum_raw_freq,
            r.n_unseen_target, r.n_unseen_raw,
            round(r.log_weight, 9),
        )
        for r in classify.dsir_weights(
            docs, tc, rc, seed="s-d", row_local=True
        ).collect()
    }
    assert streamed == batch and len(batch) == 4


def test_streaming_keep_newest_matches_batch(spark, tmp_path):
    """keep_newest_canonical (registered r16) on a crawl-event stream:
    the election is one stateful hash aggregation (max-struct / count /
    min / max — all partial-aggregable, so streaming-legal in complete
    mode), and the complete-mode result over a readStream feed equals
    the batch result row-for-row, including the exact-tie -> larger-id
    break.  A live recrawl feed therefore maintains the newest-fetch
    table without a batch rebuild."""
    from python_dtl_spark.operators.dedup import keep_newest_canonical

    crawls = spark.createDataFrame(
        [
            (10, "u", 5), (11, "u", 9),
            (20, "v", 7), (22, "v", 7), (21, "v", 3),
            (30, "w", 0),
        ],
        "doc_id long, canonical_url string, fetch_time long",
    )
    src = str(tmp_path / "recrawl_stream")
    crawls.write.parquet(src)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("canonical_url", T.StringType()),
            T.StructField("fetch_time", T.LongType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    q = run_stream_to_memory(
        keep_newest_canonical(stream, "doc_id", ["canonical_url"], "fetch_time"),
        "recrawl_stream_out",
        mode="complete",
    )
    try:
        q.processAllAvailable()
        streamed = {tuple(r) for r in spark.table("recrawl_stream_out").collect()}
    finally:
        q.stop()
    batch = {
        tuple(r)
        for r in keep_newest_canonical(
            crawls, "doc_id", ["canonical_url"], "fetch_time"
        ).collect()
    }
    assert streamed == batch and len(batch) == 3


def test_streaming_centroid_assignment_matches_batch(spark, tmp_path):
    """assign_to_centroids (staged r17 → r18): the IVF index append is
    a pure row-local map against a frozen literal centroid table —
    streaming-legal by construction, so the daily-arrival tier runs
    on a live embedding feed unchanged: readStream vectors → argmin
    assignment → append sink equals the batch assignment row-for-row
    (the merged index is then the exactly-once sink's partitioned
    append, no new state)."""
    from pyspark.sql import functions as F

    from python_dtl_spark.operators.similarity import assign_to_centroids

    base = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
        .filter(
            F.col("vec_id").isNotNull()
            & F.col("embedding").isNotNull()
            # filter, not limit: limit without an order re-evaluates
            # per action and could hand batch and stream different rows
            & (F.col("vec_id") < 60)
        )
    )
    cents = base.filter(F.col("vec_id") % 13 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("centroid")
    )
    src = str(tmp_path / "vec_stream")
    base.write.parquet(src)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField(
                "embedding", T.ArrayType(T.FloatType())
            ),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    q = run_stream_to_memory(
        assign_to_centroids(stream, cents, dim=64, with_distance=True),
        "centroid_stream_out",
        mode="append",
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r.vec_id, r.centroid_id)
            for r in spark.table("centroid_stream_out").collect()
        }
    finally:
        q.stop()
    batch = {
        (r.vec_id, r.centroid_id)
        for r in assign_to_centroids(base, cents, dim=64).collect()
    }
    assert streamed == batch and len(batch) == 60


def test_streaming_edit_distance_delta_matches_batch(spark, tmp_path):
    """edit_distance_delta_pairs_stream: a readStream title feed
    probing the STORED variant index through two stream-static joins
    must flag exactly the pair set the batch operator verifies — same
    deletion-neighborhood algebra, duplicates (one per shared variant,
    identical values) collapse at set-compare per the
    crawl_delta_pairs_stream convention."""
    from pyspark.sql import functions as F

    from python_dtl_spark.operators import dedup

    corpus = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(
            "doc_id",
            F.lower(F.substring(F.trim("text"), 1, 24)).alias("title"),
        )
        .filter(F.col("doc_id").isNotNull() & F.col("title").isNotNull())
    )
    delta = corpus.filter(
        (F.col("doc_id") % 5 == 2) & (F.length("title") >= 4)
    ).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(
            F.substring("title", 1, 2), F.lit("~"), F.expr("substring(title, 4)")
        ).alias("title"),
    )
    idx_path = str(tmp_path / "variant_index.parquet")
    dedup.title_variant_index(corpus, "doc_id", "title").write.parquet(idx_path)
    index = spark.read.parquet(idx_path)
    src = str(tmp_path / "title_stream")
    delta.write.parquet(src)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("title", T.StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    q = run_stream_to_memory(
        dedup.edit_distance_delta_pairs_stream(
            stream, index, corpus, "doc_id", "title"
        ),
        "ed_delta_stream_out",
        mode="append",
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r.delta_id, r.corpus_id, r.edit_distance)
            for r in spark.table("ed_delta_stream_out").collect()
        }
    finally:
        q.stop()
    batch = {
        (r.delta_id, r.corpus_id, r.edit_distance)
        for r in dedup.edit_distance_delta_pairs(
            corpus, delta, "doc_id", "title", corpus_index=index
        ).collect()
    }
    assert streamed == batch and len(batch) > 100
