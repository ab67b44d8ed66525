"""Scaling probe: run representative queries against the sf0.1 tables
and against an N×-replicated copy (distinct keys per replica), and
report the runtime ratio.  Near-N× input with a sub-N× or ~N× runtime
ratio on a fixed 32-core box is the local evidence that the plan shapes
(broadcast joins, map-side combines, bucketed candidate joins) scale
with data instead of exploding.

    python scripts/scale_probe.py [factor ...]

Writes SCALING.md (one table per factor).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from python_dtl_spark.operators import dedup  # noqa: E402
from python_dtl_spark.operators import rollup as rollup_ops  # noqa: E402
from python_dtl_spark.operators import sampling  # noqa: E402
from python_dtl_spark.operators import similarity  # noqa: E402
from python_dtl_spark.operators import stats as stats_ops  # noqa: E402
from python_dtl_spark.operators import text as text_ops  # noqa: E402
from python_dtl_spark.operators import urls as urls_ops  # noqa: E402
from python_dtl_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def _para_docs(d):
    """Paragraph-bearing corpus with a universally duplicated leader:
    every doc = the same boilerplate banner + its own text — one
    fingerprint owning n_docs instances, the hot-key worst case for
    paragraph dedup's first-occurrence choice."""
    return d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.lit("we use cookies accept all cookies to continue to this site"),
            F.col("text"),
        ).alias("text"),
    )


def _url_docs(d):
    """URL corpus whose distinct-host count scales with the data
    (host keyed on doc_id), multi-label PSL suffix."""
    return d.select(
        "doc_id",
        F.concat(
            F.lit("https://h"),
            F.col("doc_id").cast("string"),
            F.lit(".example.co.uk/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )


def replicate(df, factor: int, key_cols: list[str], shift: int = 10_000_000):
    """Union ``factor`` copies with key columns shifted per replica so
    join/group cardinalities scale with the data (a plain union would
    multiply duplicate keys instead)."""
    parts = []
    for i in range(factor):
        part = df
        for k in key_cols:
            part = part.withColumn(k, F.col(k) + F.lit(i * shift))
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(label, df):
    start = time.perf_counter()
    n = df.count()
    dt = time.perf_counter() - start
    print(f"# {label}: {dt:.2f}s ({n} rows)", file=sys.stderr)
    return dt, n


def stream_interval_probe(spark, events, factor: int, workdir: str):
    """Watermarked stream-stream interval join at 1× and ``factor``×.

    Replicas shift user_id/event_id (more keys, same time range), so
    buffered join state should scale ~linearly with the data while the
    watermark keeps evicting rows older than the join bound — the two
    numbers that decide whether the operator survives a 100× stream.
    Reports wall time plus the state store's numRowsTotal /
    memoryUsedBytes from the final StreamingQueryProgress.
    """
    import shutil

    from python_dtl_spark.streaming import (
        interval_join,
        run_stream_to_memory,
        stream_events,
    )

    side_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )

    def run_once(ev, tag: str):
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        clicks = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        p_src = os.path.join(workdir, f"purchases_{tag}")
        c_src = os.path.join(workdir, f"clicks_{tag}")
        purchases.write.mode("overwrite").parquet(p_src)
        clicks.write.mode("overwrite").parquet(c_src)
        joined = interval_join(
            stream_events(spark, p_src, side_schema, watermark="2 hours"),
            stream_events(spark, c_src, side_schema, watermark="2 hours"),
            by="user_id",
            ts_col="ts",
            max_delay="2 hours",
            right_cols=["event_id"],
        )
        start = time.perf_counter()
        q = run_stream_to_memory(joined, f"scale_interval_{tag}", mode="append")
        try:
            q.processAllAvailable()
            dt = time.perf_counter() - start
            n = spark.table(f"scale_interval_{tag}").count()
            prog = q.lastProgress or {}
            state = (prog.get("stateOperators") or [{}])[0]
        finally:
            q.stop()
        shutil.rmtree(p_src, ignore_errors=True)
        shutil.rmtree(c_src, ignore_errors=True)
        print(
            f"# interval_join_stream {tag}: {dt:.2f}s ({n} rows, "
            f"state {state.get('numRowsTotal')} rows / "
            f"{state.get('memoryUsedBytes')} B)",
            file=sys.stderr,
        )
        return dt, n, state

    events_n = replicate(events, factor, ["event_id", "user_id"])
    t1, n1, s1 = run_once(events, f"1x_{factor}")
    tn, nn, sn = run_once(events_n, f"{factor}x")
    return (t1, n1, s1, tn, nn, sn)


def stream_dedup_probe(spark, events, factor: int, workdir: str):
    """Streaming dedup state at 1× and ``factor``× distinct keys, both
    tiers: first-seen (exact forever — state must grow linearly with
    KEYS, one boolean each, per-key bytes flat) and
    dedup-within-watermark (retention-bounded — the engine evicts as
    the watermark advances).  Input duplicates every event 3×, so the
    operator provably drops rows (output = distinct keys, not input
    rows)."""
    import shutil

    from python_dtl_spark.streaming import (
        stream_events,
        streaming_dedup_within_watermark,
        streaming_first_seen,
        run_stream_to_memory,
    )

    side_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )

    def run_once(ev, tag: str, variant: str):
        tripled = ev.unionByName(ev).unionByName(ev)
        src = os.path.join(workdir, f"dedup_{variant}_{tag}")
        tripled.select("event_id", "user_id", "ts").write.mode(
            "overwrite"
        ).parquet(src)
        if variant == "first_seen":
            stream = stream_events(spark, src, side_schema, watermark="2 hours")
            out = streaming_first_seen(stream, key_col="event_id")
        else:
            # the operator sets its own watermark (setting one on the
            # source too would be a disallowed redefinition)
            stream = spark.readStream.schema(side_schema).parquet(src)
            out = streaming_dedup_within_watermark(
                stream, key_cols=["event_id"], ts_col="ts", delay="2 hours"
            )
        start = time.perf_counter()
        q = run_stream_to_memory(out, f"scale_dedup_{variant}_{tag}", mode="append")
        try:
            q.processAllAvailable()
            dt = time.perf_counter() - start
            n = spark.table(f"scale_dedup_{variant}_{tag}").count()
            prog = q.lastProgress or {}
            state = (prog.get("stateOperators") or [{}])[0]
        finally:
            q.stop()
        shutil.rmtree(src, ignore_errors=True)
        print(
            f"# stream_dedup {variant} {tag}: {dt:.2f}s ({n} rows, "
            f"state {state.get('numRowsTotal')} rows / "
            f"{state.get('memoryUsedBytes')} B)",
            file=sys.stderr,
        )
        return dt, n, state

    events_n = replicate(events, factor, ["event_id"])
    rows = []
    for variant in ("first_seen", "within_watermark"):
        t1, n1, s1 = run_once(events, f"1x_{factor}", variant)
        tn, nn, sn = run_once(events_n, f"{factor}x", variant)
        rows.append((variant, 1, t1, n1, s1))
        rows.append((variant, factor, tn, nn, sn))
    return rows


def rotate_vec(df, positions: int, vec_col: str = "embedding"):
    """Rotate each embedding array by ``positions`` elements — replicas
    get distinct but identically-distributed vectors (same norm, same
    pairwise geometry within a replica), so ANN recall at N× is measured
    against a genuinely N×-bigger vector population instead of N-fold
    exact duplicates whose cosine ties make top-k ambiguous."""
    p = positions % 64 or 1
    v = F.col(vec_col)
    return df.withColumn(
        vec_col, F.concat(F.slice(v, p + 1, 64 - p), F.slice(v, 1, p))
    )


def ann_recall_probe(spark, embeddings, factor: int):
    """LSH / IVF approximate top-k vs the exact cosine baseline at 1×
    and ``factor``× corpus, reporting wall time and recall@10.

    Ground truth needs findable structure: the sf embeddings are
    near-isotropic noise (top-10 cosine ≈ 0.3-0.45), where ANY
    sublinear ANN has low recall by construction — so each query gets
    10 planted near-neighbors (cosine ≈ 0.999), which ARE the exact
    top-10, and the probe measures whether they still surface as the
    noise population grows ``factor``×.  Runtime scaling shows the
    bucketed candidate generation stays sub-linear; recall shows
    denser buckets don't crowd out the true neighbors — the number
    SCALING.md was missing (runtime alone can look great while recall
    collapses).
    """
    from python_dtl_spark.operators import similarity

    base = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )

    def planted_neighbors():
        parts = []
        for j in range(10):
            parts.append(
                base.filter(F.col("vec_id") < 16).select(
                    (
                        F.lit(10_000_000_000) + F.col("vec_id") * 100 + F.lit(j)
                    ).alias("vec_id"),
                    F.transform(
                        "embedding",
                        lambda x, i: x + ((i + F.lit(j)) % 5 - 2) * F.lit(0.002),
                    ).alias("embedding"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def corpus_at(n: int):
        parts = []
        for i in range(n):
            part = base.withColumn(
                "vec_id", F.col("vec_id") + F.lit(i * 10_000_000)
            )
            parts.append(rotate_vec(part, i) if i else part)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.unionByName(planted_neighbors())

    queries = base.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    rows = []
    for n in (1, factor):
        corpus = corpus_at(n)
        exact = similarity.cosine_topk(corpus, queries, k=10).select(
            "query_id", "neighbor_id"
        )
        exact.persist()
        n_exact = exact.count()
        for label, approx_df in (
            (
                "lsh_topk",
                similarity.lsh_bucketed_topk(
                    corpus, queries, k=10, planes=8, multiprobe_bits=1, dim=64
                ),
            ),
            (
                "ivf_topk",
                similarity.ivf_topk(
                    corpus, queries, k=10, n_centroids=16, n_probe=4
                ),
            ),
            (
                # two-stage flat paths (guarded tier): recall loss can
                # only come from the coarse ranking dropping a true
                # neighbor out of the k×factor candidate pool — probed
                # here as the corpus (and thus candidate competition)
                # grows
                "projected_topk",
                similarity.projected_topk(corpus, queries, k=10, dim=64),
            ),
            (
                "quantized_topk",
                similarity.quantized_topk(corpus, queries, k=10),
            ),
        ):
            start = time.perf_counter()
            hits = approx_df.select("query_id", "neighbor_id").join(
                exact, on=["query_id", "neighbor_id"], how="left_semi"
            )
            n_hits = hits.count()
            dt = time.perf_counter() - start
            recall = n_hits / n_exact if n_exact else float("nan")
            rows.append((label, n, dt, recall))
            print(
                f"# ann {label} {n}x: {dt:.2f}s recall@10={recall:.3f}",
                file=sys.stderr,
            )
        exact.unpersist()
    return rows


def knn_label_probe(spark, embeddings, factor: int):
    """kNN-labeling quality under growth: each of 16 query vectors gets
    10 planted near-copies (cosine ≈ 0.999) carrying a sentinel label
    (777) absent from the natural data — the exact leave-one-out vote
    is therefore 777 by construction (the copies fill all k=10 slots),
    and the probe measures whether (a) the exact-vote machinery and
    (b) the LSH tier still assign 777 as the noise corpus grows
    ``factor``× (planes scale +log2(factor) per the bucket-occupancy
    rule).  Runtime rows for the LSH tier cover the FULL corpus
    labeling job, not just the probe queries — the number a training
    pipeline would pay."""
    from pyspark.sql import Window as W

    from python_dtl_spark.operators import similarity

    base = embeddings.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        "label",
    )

    def planted():
        parts = []
        for j in range(10):
            parts.append(
                base.filter(F.col("vec_id") < 16).select(
                    (
                        F.lit(10_000_000_000) + F.col("vec_id") * 100 + F.lit(j)
                    ).alias("vec_id"),
                    F.transform(
                        "embedding",
                        lambda x, i: x + ((i + F.lit(j)) % 5 - 2) * F.lit(0.002),
                    ).alias("embedding"),
                    F.lit(777).cast("int").alias("label"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def corpus_at(n: int):
        parts = []
        for i in range(n):
            part = base.withColumn(
                "vec_id", F.col("vec_id") + F.lit(i * 10_000_000)
            )
            parts.append(rotate_vec(part, i) if i else part)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.unionByName(planted())

    queries = base.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def vote(topk, corpus):
        labels = corpus.select(
            F.col("vec_id").alias("neighbor_id"), F.col("label").alias("__nl")
        ).filter(F.col("__nl").isNotNull())
        v = (
            topk.join(labels, on="neighbor_id")
            .groupBy("query_id", "__nl")
            .agg(F.count(F.lit(1)).alias("votes"), F.min("rank").alias("__best"))
        )
        w = W.partitionBy("query_id").orderBy(
            F.desc("votes"), F.asc("__best"), F.asc("__nl")
        )
        return {
            r["query_id"]: r["__nl"]
            for r in v.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .collect()
        }

    rows = []
    for n in (1, factor):
        corpus = corpus_at(n)
        start = time.perf_counter()
        exact_preds = vote(
            similarity.cosine_topk(corpus, queries, k=10), corpus
        )
        dt = time.perf_counter() - start
        agree = sum(1 for q in range(16) if exact_preds.get(q) == 777) / 16
        rows.append(("knn_exact_vote", n, dt, agree))
        print(
            f"# knn exact_vote {n}x: {dt:.2f}s planted-label={agree:.3f}",
            file=sys.stderr,
        )
        planes = 12 + (max(1, n.bit_length() - 1) if n > 1 else 0)
        start = time.perf_counter()
        pred = similarity.knn_classify(
            corpus, k=10, method="lsh", planes=planes, dim=64
        )
        lsh_preds = {
            r.vec_id: r.predicted_label
            for r in pred.filter(F.col("vec_id") < 16).collect()
        }
        dt = time.perf_counter() - start
        agree = sum(1 for q in range(16) if lsh_preds.get(q) == 777) / 16
        rows.append(("knn_lsh_label", n, dt, agree))
        print(
            f"# knn lsh_label {n}x: {dt:.2f}s planted-label={agree:.3f}",
            file=sys.stderr,
        )
    return rows


def sim_join_recall_probe(spark, embeddings, factor: int):
    """Match-recall of the asymmetric cross-corpus LSH similarity join
    (``dedup.embedding_similarity_join``) vs an exact cosine baseline,
    at 1× and ``factor``× corpora.

    The self-join's recall curve does not transfer: here the LEFT
    probes Hamming-1 neighbors while the RIGHT anchors at its exact
    signature, so a true pair is missed whenever perturbation flips
    ≥2 hyperplane signs — and the planes count grows with the corpus
    (bucket-occupancy rule), adding sign-flip opportunities.  Identity
    copies hash identically (recall 1.0 by construction), so the
    planted truth is PERTURBED copies (cosine ≈ 0.999) of 64 probe
    rows hidden in a noise right corpus; exact truth comes from a
    64-row broadcast brute-force against the full right side.
    """
    from python_dtl_spark.operators import dedup

    base = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    probe_rows = base.filter(F.col("vec_id") < 64)
    perturbed = probe_rows.select(
        (F.lit(20_000_000_000) + F.col("vec_id")).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x + ((i + F.col("vec_id") % 7) % 5 - 2) * F.lit(0.002),
        ).alias("embedding"),
    )

    def left_at(n: int):
        parts = []
        for i in range(n):
            part = base.withColumn(
                "vec_id", F.col("vec_id") + F.lit(i * 10_000_000)
            )
            parts.append(rotate_vec(part, i) if i else part)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def right_at(n: int):
        # disjoint id space, same geometry (noise), plus the planted
        # perturbed matches
        return left_at(n).withColumn(
            "vec_id", F.col("vec_id") + F.lit(40_000_000_000)
        ).unionByName(perturbed)

    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda v: F.sqrt(dot(v, v))  # noqa: E731

    rows = []
    threshold = 0.95
    for n in (1, factor):
        right = right_at(n)
        planes = 12 + (max(1, n.bit_length() - 1) if n > 1 else 0)
        # exact truth for the 64 probe rows: broadcast brute force
        q = probe_rows.select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
        )
        # truth restricted to the PERTURBED targets (rid in the 20e9
        # block): the noise corpus at +40e9 contains bit-identical
        # copies of the probe vectors, which hash to identical
        # signatures and are found by construction — counting them
        # would put a ~0.5 floor under the recall and mask exactly the
        # sign-flip loss this probe exists to measure
        exact = (
            right.filter(
                (F.col("vec_id") >= 20_000_000_000)
                & (F.col("vec_id") < 40_000_000_000)
            )
            .join(F.broadcast(q))
            .withColumn(
                "cosine",
                dot(F.col("embedding"), F.col("qv"))
                / (norm(F.col("embedding")) * norm(F.col("qv"))),
            )
            .filter(F.col("cosine") >= threshold)
            .select("qid", F.col("vec_id").alias("rid"))
        )
        exact.persist()
        n_exact = exact.count()
        start = time.perf_counter()
        found = (
            dedup.embedding_similarity_join(
                left_at(n), right, threshold=threshold, planes=planes, dim=64
            )
            .filter(F.col("id_l") < 64)
            .select(F.col("id_l").alias("qid"), F.col("id_r").alias("rid"))
        )
        n_hits = found.join(exact, on=["qid", "rid"], how="left_semi").count()
        dt = time.perf_counter() - start
        exact.unpersist()
        recall = n_hits / n_exact if n_exact else float("nan")
        rows.append((f"sim_join planes={planes}", n, dt, recall))
        print(
            f"# sim_join {n}x planes={planes}: {dt:.2f}s "
            f"match-recall={recall:.3f} ({n_hits}/{n_exact})",
            file=sys.stderr,
        )
    return rows


def bpe_fit_probe(spark, documents, factor: int):
    """Sampled BPE fit (the bpe_fit 100 TB valve) at 1× and
    ``factor``×: the merge table fits on a deterministic md5-hash
    sample whose fraction shrinks ∝ 1/factor, so the SAMPLE is
    constant-size under corpus growth — the production tokenizer-fit
    shape (fit on a bounded sample, apply everywhere).  Fit time
    should stay flat-ish: each scoring round runs at sample scale, and
    only round 1's sample materialization scans the corpus.  The
    single-fold ``bpe_encode`` pass over the full corpus is the one
    corpus-linear stage, measured separately."""
    base_frac = 0.08
    rows = []
    for n, docs, frac in (
        (1, documents, base_frac),
        (
            factor,
            replicate(documents, factor, ["doc_id"]),
            base_frac / factor,
        ),
    ):
        start = time.perf_counter()
        enc, merges = text_ops.bpe_fit(
            docs,
            n_merges=3,
            min_count=2,
            sample_fraction=frac,
            sample_seed="probe",
        )
        fit_s = time.perf_counter() - start
        start = time.perf_counter()
        # force the ENCODED column (a bare count() would prune the
        # fold away), and count docs in the same single job
        agg = enc.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size("tokens_merged")).alias("toks"),
        ).collect()[0]
        enc_s = time.perf_counter() - start
        rows.append((n, fit_s, len(merges), enc_s, int(agg["n"])))
        print(
            f"# bpe_fit {n}x frac={frac:g}: fit {fit_s:.2f}s "
            f"({len(merges)} merges), encode {enc_s:.2f}s "
            f"({agg['n']:,} docs, {agg['toks']:,} tokens)",
            file=sys.stderr,
        )
    return rows


def bpe_tier_probe(spark, documents):
    """Measure bpe_encode's two tiers against TABLE SIZE on a fixed
    corpus (factor-independent): the plan-literal F.aggregate fold
    evaluates every table entry's match-filter per document —
    O(n_tokens × n_merges) whether entries match or not — while the
    broadcast ``mapInPandas`` tier's min-rank loop is output-sensitive
    (O(tokens × merges APPLIED)).  Tables are a real bpe_fit prefix
    padded with never-occurring pairs, so the two algorithms provably
    produce identical output (the no-reappearance equivalence holds on
    the real prefix; padding never matches) — asserted via an
    order-independent output hash.  The measured crossover sets
    ``max_literal_entries``'s default."""
    docs = documents
    _, real = text_ops.bpe_fit(docs, n_merges=8, min_count=2)

    def table(n):
        base = [(m[0], m[1]) for m in real][:n]
        return base + [
            (f"P{i}L", f"P{i}R") for i in range(n - len(base))
        ]

    def run(pairs, mle):
        start = time.perf_counter()
        out = text_ops.bpe_encode(docs, pairs, max_literal_entries=mle)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size("tokens_bpe")).alias("toks"),
            F.sum(
                F.xxhash64(F.concat_ws(" ", "tokens_bpe")) % 1_000_000_007
            ).alias("h"),
        ).collect()[0]
        return time.perf_counter() - start, agg

    rows = []
    hashes = set()
    for n in (8, 128, 1024, 4096):
        dt, agg = run(table(n), n)  # len == mle -> fold tier
        rows.append(("fold", n, dt, int(agg["n"])))
        hashes.add((agg["toks"], agg["h"]))
        print(f"# bpe_tier fold {n}: {dt:.2f}s", file=sys.stderr)
    for n in (8, 128, 1024, 4096, 65536):
        dt, agg = run(table(n), 0)  # force broadcast tier
        rows.append(("broadcast", n, dt, int(agg["n"])))
        hashes.add((agg["toks"], agg["h"]))
        print(f"# bpe_tier broadcast {n}: {dt:.2f}s", file=sys.stderr)
    assert len(hashes) == 1, f"tier outputs diverged: {hashes}"
    return rows


def row_local_tier_probe(spark, documents):
    """Measure the STREAMING (row_local=True, plan-literal map) tiers
    of nb_apply and lm_perplexity against MODEL SIZE on a fixed corpus
    — the literal-map analogue of the bpe tier sweep.  The question:
    does `element_at` on a plan-literal map degrade with map size the
    way the bpe fold degrades with table size?  (Answer, measured: no
    — both tiers stay flat as vocab grows, a constant ~1.5–3× premium
    over the broadcast-join tier, so the streaming tiers are sound at
    their max_literal_cells guard.)"""
    from python_dtl_spark.operators import classify

    rows = []
    for mv in (400, 6400, 25600):
        tc, cs = classify.nb_fit(documents, "lang", min_count=1, max_vocab=mv)
        start = time.perf_counter()
        classify.nb_apply(
            documents, tc, cs, row_local=True, max_literal_cells=10**9
        ).groupBy("predicted_label").count().collect()
        rl = time.perf_counter() - start
        start = time.perf_counter()
        classify.nb_apply(documents, tc, cs).groupBy(
            "predicted_label"
        ).count().collect()
        jn = time.perf_counter() - start
        rows.append(("nb_apply", mv, rl, jn))
        print(
            f"# row_local nb vocab={mv}: row_local {rl:.2f}s join {jn:.2f}s",
            file=sys.stderr,
        )
    for mv in (400, 1600, 6400):
        bi, uni = classify.lm_fit(documents, min_count=1, max_vocab=mv)
        start = time.perf_counter()
        classify.lm_perplexity(
            documents, bi, uni, row_local=True, max_literal_cells=10**9
        ).agg(F.sum("n_trans"), F.sum("sum_bigram_freq")).collect()
        rl = time.perf_counter() - start
        start = time.perf_counter()
        classify.lm_perplexity(documents, bi, uni).agg(
            F.sum("n_trans"), F.sum("sum_bigram_freq")
        ).collect()
        jn = time.perf_counter() - start
        rows.append(("lm_perplexity", mv, rl, jn))
        print(
            f"# row_local lm vocab={mv}: row_local {rl:.2f}s join {jn:.2f}s",
            file=sys.stderr,
        )
    # dsir (new r14): both bucket models are <=10k rows by paper
    # construction, so this is a single-point check that the two-map
    # fold matches the nb/lm flatness story rather than a size sweep
    tc = classify.dsir_fit(
        documents.filter(F.col("source") == "src1"), seed="probe-rl"
    )
    rc = classify.dsir_fit(documents, seed="probe-rl")
    start = time.perf_counter()
    classify.dsir_weights(
        documents, tc, rc, seed="probe-rl", row_local=True,
        max_literal_cells=10**9,
    ).agg(F.sum("n_feats"), F.sum("sum_raw_freq")).collect()
    rl = time.perf_counter() - start
    start = time.perf_counter()
    classify.dsir_weights(documents, tc, rc, seed="probe-rl").agg(
        F.sum("n_feats"), F.sum("sum_raw_freq")
    ).collect()
    jn = time.perf_counter() - start
    model_cells = tc.count() + rc.count()
    rows.append(("dsir_weights", model_cells, rl, jn))
    print(
        f"# row_local dsir cells={model_cells}: row_local {rl:.2f}s "
        f"join {jn:.2f}s",
        file=sys.stderr,
    )
    return rows


def dsir_probe(spark, documents, factor: int = 8):
    """DSIR importance weighting (staged r14 row) at 1× and
    ``factor``×: both bucket models fit on a deterministic md5 sample
    whose fraction shrinks ∝ 1/factor (constant-size models — the
    nb/lm probe contract; they are ≤10k rows regardless), then the
    scoring pass (feature explode → two broadcast model joins → one
    doc-grain agg) is the corpus-linear stage."""
    from python_dtl_spark.operators import classify

    base_frac = 0.5
    rows = []
    for n, docs, frac in (
        (1, documents, base_frac),
        (factor, replicate(documents, factor, ["doc_id"]), base_frac / factor),
    ):
        start = time.perf_counter()
        tc = classify.dsir_fit(
            docs.filter(F.col("source") == "src1"),
            seed="probe-d", sample_fraction=frac, sample_seed="probe-d",
        ).persist()
        rc = classify.dsir_fit(
            docs, seed="probe-d", sample_fraction=frac, sample_seed="probe-d"
        ).persist()
        model_rows = tc.count() + rc.count()
        fit_s = time.perf_counter() - start
        start = time.perf_counter()
        scored = classify.dsir_weights(docs, tc, rc, seed="probe-d")
        agg = scored.agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_feats")
        ).collect()[0]
        score_s = time.perf_counter() - start
        tc.unpersist(), rc.unpersist()
        rows.append((n, fit_s, model_rows, score_s, int(agg["n"])))
        print(
            f"# dsir {n}x frac={frac:g}: fit {fit_s:.2f}s "
            f"({model_rows} model rows), score {score_s:.2f}s "
            f"({agg['n']:,} docs)",
            file=sys.stderr,
        )
    return rows


_DSIR_HEADER = "## DSIR importance weighting (staged r14 row), sampled fit + linear score"


def dsir_section(spark, documents) -> list[str]:
    rows = dsir_probe(spark, documents)
    lines = [
        _DSIR_HEADER,
        "",
        "classify.dsir_fit / dsir_weights (Xie et al. 2023): both",
        "hashed-n-gram bucket models fit on a constant-size md5 sample",
        "(fraction ∝ 1/factor) and are ≤10k rows by construction; the",
        "scoring pass — feature explode → TWO broadcast model joins →",
        "one doc-grain agg + id join-back — is the only corpus-linear",
        "stage (the nb_apply / lm_perplexity shape):",
        "",
        "| probe | data | fit time | model rows | score time | docs scored |",
        "|---|---|---|---|---|---|",
    ]
    for n, fit_s, model_rows, score_s, nd in rows:
        lines.append(
            f"| dsir_sampled | {n}× | {fit_s:.2f}s | {model_rows:,} | "
            f"{score_s:.2f}s | {nd:,} |"
        )
    lines.append("")
    return lines


def top_fraction_probe(spark, documents, factors=(1, 8, 32)):
    """Global top-fraction selection (registered r14,
    pipeline_dsir_select's rank stage) at 1×/8×/32×: the two-phase
    recipe — approxQuantile coarse floor, then a literal-k
    TakeOrderedAndProject over the survivor slice — must stay ~linear
    in the corpus (two scans + a per-partition top-k; no global sort,
    no single-task window).  Kept count is asserted to equal the
    exact rational quota at every factor."""
    from fractions import Fraction

    rows = []
    for n in factors:
        docs = (
            documents
            if n == 1
            else replicate(documents, n, ["doc_id"])
        ).select("doc_id", (F.col("n_chars") * 1.0).alias("score"))
        total = docs.count()
        start = time.perf_counter()
        kept = sampling.top_fraction(
            docs, "score", Fraction(1, 4), "doc_id"
        ).count()
        sel_s = time.perf_counter() - start
        assert kept == (total + 3) // 4, (kept, total)
        rows.append((n, total, kept, sel_s))
        print(
            f"# top_fraction {n}x: {total:,} docs -> {kept:,} kept "
            f"in {sel_s:.2f}s",
            file=sys.stderr,
        )
    return rows


_TOP_FRACTION_HEADER = (
    "## global top-fraction selection (registered r14), two-phase rank"
)


def top_fraction_section(spark, documents) -> list[str]:
    rows = top_fraction_probe(spark, documents)
    lines = [
        _TOP_FRACTION_HEADER,
        "",
        "sampling.top_fraction (pipeline_dsir_select's rank stage):",
        "approxQuantile coarse floor (one pass) + literal-k",
        "TakeOrderedAndProject over the ~27% survivor slice — per-",
        "partition top-k with a merge, NO SinglePartition exchange, no",
        "global range sort (plan-asserted).  Runtime should scale",
        "~linearly with the corpus; kept count equals the exact",
        "rational quota at every factor (asserted in the probe):",
        "",
        "| probe | data | input docs | kept (exact quota) | select time |",
        "|---|---|---|---|---|",
    ]
    for n, total, kept, sel_s in rows:
        lines.append(
            f"| top_fraction | {n}× | {total:,} | {kept:,} | {sel_s:.2f}s |"
        )
    lines.append("")
    return lines


def staged_r15_probe(spark, documents, factors=(1, 8, 32)):
    """The two r15-staged sampling verbs under replication:
    token_budget_mix (one per-stratum rank/cumsum window — budgets
    scale with the data so the kept set grows too) and
    importance_resample (row-local Gumbel priority + top_fraction's
    two-phase rank).  Both should stay ~linear."""
    rows = []
    for n in factors:
        docs = (
            documents if n == 1 else replicate(documents, n, ["doc_id"])
        ).select("doc_id", "source", "n_chars")
        budgets = {f"src{i}": 40_000 * n for i in range(20)}
        start = time.perf_counter()
        kept_tb = sampling.token_budget_mix(
            docs, "source", "doc_id", "n_chars", budgets, seed="pr"
        ).count()
        tb_s = time.perf_counter() - start
        weighted = docs.select(
            "doc_id", (F.col("n_chars") / 100.0).alias("w")
        )
        start = time.perf_counter()
        kept_ir = sampling.importance_resample(
            weighted, "w", "doc_id", 0.25, seed="pr"
        ).count()
        ir_s = time.perf_counter() - start
        rows.append((n, kept_tb, tb_s, kept_ir, ir_s))
        print(
            f"# staged r15 {n}x: token_budget kept {kept_tb:,} in "
            f"{tb_s:.2f}s; resample kept {kept_ir:,} in {ir_s:.2f}s",
            file=sys.stderr,
        )
    return rows


_STAGED_R15_HEADER = "## staged r15 verbs under replication (token budget, importance resample)"


def staged_r15_section(spark, documents) -> list[str]:
    rows = staged_r15_probe(spark, documents)
    lines = [
        _STAGED_R15_HEADER,
        "",
        "sampling.token_budget_mix (per-stratum rank/cumsum window,",
        "budgets scaled with the data) and sampling.importance_resample",
        "(row-local Gumbel priority -> top_fraction's coarse floor +",
        "TakeOrderedAndProject).  Both pre-validated against DuckDB at",
        "three SFs; this probe shows the runtime staying ~linear under",
        "1x/8x/32x replication:",
        "",
        "| probe | data | budget-kept | budget time | resample-kept | resample time |",
        "|---|---|---|---|---|---|",
    ]
    for n, ktb, tb_s, kir, ir_s in rows:
        lines.append(
            f"| staged_r15 | {n}× | {ktb:,} | {tb_s:.2f}s | {kir:,} | "
            f"{ir_s:.2f}s |"
        )
    lines.append("")
    return lines


def r15_verbs_probe(spark, documents, factors=(1, 8, 32)):
    """The round-15 registrations under replication: floor-only
    selection (top_fraction's 100 TB escape hatch — quantile pass +
    pushed filter, NO rank at all, so it should be the CHEAPEST
    selection mode and stay ~linear) and the quality-ORDERED token
    budget (same one-window shape as the md5-ordered mode plus the
    scan-side quality_features map stage)."""
    from fractions import Fraction

    rows = []
    for n in factors:
        base = (
            documents if n == 1 else replicate(documents, n, ["doc_id"])
        )
        docs = base.select(
            "doc_id", (F.col("n_chars") * 1.0).alias("score")
        )
        total = docs.count()
        start = time.perf_counter()
        kept_fl = sampling.top_fraction(
            docs, "score", Fraction(1, 4), "doc_id", floor_only=True
        ).count()
        fl_s = time.perf_counter() - start
        scored = text_ops.quality_features(
            base.select("doc_id", "source", "n_chars", "text")
        )
        budgets = {f"src{i}": 40_000 * n for i in range(20)}
        start = time.perf_counter()
        kept_qb = sampling.token_budget_mix(
            scored, "source", "doc_id", "n_chars", budgets,
            order_col="quality_score",
        ).count()
        qb_s = time.perf_counter() - start
        rows.append((n, total, kept_fl, fl_s, kept_qb, qb_s))
        print(
            f"# r15 verbs {n}x: floor_only kept {kept_fl:,}/{total:,} in "
            f"{fl_s:.2f}s; quality budget kept {kept_qb:,} in {qb_s:.2f}s",
            file=sys.stderr,
        )
    return rows


_R15_VERBS_HEADER = "## r15 verbs under replication (floor-only select, quality-ordered budget)"


def r15_verbs_section(spark, documents) -> list[str]:
    rows = r15_verbs_probe(spark, documents)
    lines = [
        _R15_VERBS_HEADER,
        "",
        "sampling.top_fraction(floor_only=True) — the 100 TB escape",
        "hatch as a registered mode (pipeline_floor_select): one",
        "approxQuantile pass + one pushed filter, NO window / take /",
        "exchange (plan-asserted), so it must be the cheapest selection",
        "mode at every factor.  sampling.token_budget_mix(order_col=",
        "'quality_score') — the quality-ordered budget",
        "(pipeline_quality_budget): the md5-mode single window exchange",
        "plus the scan-side quality_features map stage; budgets scale",
        "with the data so the kept set grows too:",
        "",
        "| probe | data | input docs | floor-kept | floor time | budget-kept | budget time |",
        "|---|---|---|---|---|---|---|",
    ]
    for n, total, kfl, fl_s, kqb, qb_s in rows:
        lines.append(
            f"| r15_verbs | {n}× | {total:,} | {kfl:,} | {fl_s:.2f}s | "
            f"{kqb:,} | {qb_s:.2f}s |"
        )
    lines.append("")
    return lines


def ccnet_probe(spark, documents, factors=(1, 8, 32)):
    """pipeline_ccnet_buckets under replication: the audited
    lm_perplexity scoring shape + a per-source percentile aggregation
    whose output stays |sources|-rows whatever the corpus, broadcast
    back.  Should stay ~linear; bucket shares stay ~thirds."""
    from python_dtl_spark.operators import classify, stats as stats_mod

    rows = []
    for n in factors:
        docs = (
            documents if n == 1 else replicate(documents, n, ["doc_id"])
        ).select("doc_id", "source", "text")
        total = docs.count()
        start = time.perf_counter()
        bi, uni = classify.lm_fit(
            docs, sample_fraction=0.5, sample_seed="lm-l",
            min_count=1, max_vocab=300,
        )
        scored = (
            classify.lm_perplexity(docs, bi, uni)
            .filter(F.col("n_trans") > 0)
            .select("doc_id", "source", "perplexity")
            .persist()
        )
        bounds = stats_mod.grouped_percentiles(
            scored, "perplexity", ["source"], ps=[0.33, 0.66]
        ).select(
            F.col("source").alias("__b_source"), F.col("p33"), F.col("p66")
        )
        labeled = scored.join(
            F.broadcast(bounds), on=scored["source"] == F.col("__b_source")
        ).withColumn(
            "bucket",
            F.when(F.col("perplexity") <= F.col("p33"), "head")
            .when(F.col("perplexity") <= F.col("p66"), "middle")
            .otherwise("tail"),
        )
        heads = labeled.filter(F.col("bucket") == "head").count()
        total_s = time.perf_counter() - start
        scored.unpersist()
        rows.append((n, total, heads, total_s))
        print(
            f"# ccnet {n}x: {total:,} docs, {heads:,} head in "
            f"{total_s:.2f}s",
            file=sys.stderr,
        )
    return rows


_CCNET_HEADER = "## CCNet perplexity bucketing under replication (r15)"


def ccnet_section(spark, documents) -> list[str]:
    rows = ccnet_probe(spark, documents)
    lines = [
        _CCNET_HEADER,
        "",
        "pipeline_ccnet_buckets end-to-end (LM fit + scoring + the",
        "per-source percentile boundary table broadcast back + the",
        "row-local CASE label) — the boundary table is |sources| rows",
        "whatever the corpus, so the chain should scale ~linearly and",
        "the head share should stay ~a third:",
        "",
        "| probe | data | input docs | head-bucket docs | end-to-end time |",
        "|---|---|---|---|---|",
    ]
    for n, total, heads, s in rows:
        lines.append(f"| ccnet | {n}× | {total:,} | {heads:,} | {s:.2f}s |")
    lines.append("")
    return lines


def ppl_delta_probe(spark, documents, factors=(1, 8, 32)):
    """pipeline_ppl_delta_select's scoring chain under replication:
    two LM fits (target slice + sampled reference — model size is
    vocab-capped, CONSTANT under corpus growth) and two corpus scoring
    passes + the doc-grain join + rank.  Should stay ~linear."""
    from fractions import Fraction

    from python_dtl_spark.operators import classify

    rows = []
    for n in factors:
        docs = (
            documents if n == 1 else replicate(documents, n, ["doc_id"])
        ).select("doc_id", "source", "text")
        total = docs.count()
        start = time.perf_counter()
        tbi, tuni = classify.lm_fit(
            docs.where(F.col("source") == "src1"),
            min_count=1, max_vocab=300,
        )
        rbi, runi = classify.lm_fit(
            docs, sample_fraction=0.5, sample_seed="lm-l",
            min_count=1, max_vocab=300,
        )
        st = classify.lm_perplexity(docs, tbi, tuni).select(
            "doc_id", "n_trans", "perplexity"
        )
        sr = classify.lm_perplexity(docs, rbi, runi).select(
            F.col("doc_id").alias("__rid"),
            F.col("perplexity").alias("__ppl_r"),
        )
        joined = (
            st.join(sr, st["doc_id"] == sr["__rid"])
            .filter(F.col("n_trans") > 0)
            .withColumn(
                "__delta",
                F.log(F.col("__ppl_r")) - F.log(F.col("perplexity")),
            )
            .select("doc_id", "__delta")
        )
        kept = sampling.top_fraction(
            joined, "__delta", Fraction(1, 4), "doc_id"
        ).count()
        total_s = time.perf_counter() - start
        rows.append((n, total, kept, total_s))
        print(
            f"# ppl_delta {n}x: {total:,} docs -> {kept:,} kept in "
            f"{total_s:.2f}s",
            file=sys.stderr,
        )
    return rows


_PPL_DELTA_HEADER = "## excess-perplexity selection under replication (r15)"


def ppl_delta_section(spark, documents) -> list[str]:
    rows = ppl_delta_probe(spark, documents)
    lines = [
        _PPL_DELTA_HEADER,
        "",
        "pipeline_ppl_delta_select end-to-end (two vocab-capped LM",
        "fits + two broadcast-join scoring passes + doc-grain join +",
        "two-phase rank) — model sizes are CONSTANT under corpus",
        "growth (vocab cap 300), so the chain should scale ~linearly:",
        "",
        "| probe | data | input docs | kept | end-to-end time |",
        "|---|---|---|---|---|",
    ]
    for n, total, kept, s in rows:
        lines.append(
            f"| ppl_delta | {n}× | {total:,} | {kept:,} | {s:.2f}s |"
        )
    lines.append("")
    return lines


def r15_late_probe(spark, documents, factors=(1, 8, 32)):
    """The three late-r15 registrations under replication.

    * soft_dedup_weights — replication repeats TEXT verbatim while
      shifting doc_id, so every content group grows n× (the hot-group
      stress): the agg+join shape must hold because the join build
      side stays 1 row/group whatever the group size.
    * bpe_fertility — row-local fold + row-local ratios; pure map.
    * decontaminate spans — doc_id shifts by a multiple of 10, so the
      eval slice (doc_id%10==0, id-shifted) stays a tenth of the
      corpus; the eval fingerprint set and the flagged-window joins
      grow linearly.
    """
    from python_dtl_spark.operators import dedup as dedup_mod

    merges = [("slow", "slow"), ("a", "a"), ("slow slow", "key")]
    rows = []
    for n in factors:
        docs = (
            documents if n == 1 else replicate(documents, n, ["doc_id"])
        ).select("doc_id", "source", "text", "n_chars")
        total = docs.count()

        start = time.perf_counter()
        sd = dedup_mod.soft_dedup_weights(docs.select("doc_id", "text"), ["text"])
        sd_max = sd.agg(F.max("dup_count")).collect()[0][0]
        sd_s = time.perf_counter() - start

        start = time.perf_counter()
        enc = text_ops.bpe_encode(docs, merges, out_col="tokens_bpe")
        fert = enc.select(
            F.size("tokens_bpe").cast("long").alias("n_tokens"),
            F.size(text_ops.tokens(F.lower(F.col("text"))))
            .cast("long")
            .alias("n_words"),
        ).agg(F.sum("n_tokens")).collect()[0][0]
        bf_s = time.perf_counter() - start

        start = time.perf_counter()
        evals = docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text"
        )
        train = docs.filter(F.col("doc_id") % 10 != 0).select("doc_id", "text")
        cut = text_ops.remove_duplicated_spans(
            train, window_tokens=8, against=evals
        )
        n_cut = cut.filter(F.col("n_spans_removed") > 0).count()
        dc_s = time.perf_counter() - start

        rows.append((n, total, sd_max, sd_s, fert, bf_s, n_cut, dc_s))
        print(
            f"# r15_late {n}x: {total:,} docs; softdedup max_group "
            f"{sd_max} in {sd_s:.2f}s; fertility sum {fert:,} in "
            f"{bf_s:.2f}s; {n_cut:,} docs cut in {dc_s:.2f}s",
            file=sys.stderr,
        )
    return rows


_R15_LATE_HEADER = (
    "## late-r15 verbs under replication "
    "(soft-dedup / bpe-fertility / span-decontamination)"
)


def r15_late_section(spark, documents) -> list[str]:
    rows = r15_late_probe(spark, documents)
    lines = [
        _R15_LATE_HEADER,
        "",
        "doc_softdedup_weights (text repeats verbatim under replication,",
        "so every content group grows n× — the hot-group stress; the",
        "join build side stays 1 row/group), doc_bpe_fertility (pure",
        "row-local map) and doc_decontaminate_spans (eval slice stays a",
        "tenth; fingerprint semi-join linear in the data):",
        "",
        "| probe | data | input docs | max dup group | softdedup time |"
        " token sum | fertility time | docs cut | decon time |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for n, total, sd_max, sd_s, fert, bf_s, n_cut, dc_s in rows:
        lines.append(
            f"| r15_late | {n}× | {total:,} | {sd_max:,} | {sd_s:.2f}s |"
            f" {fert:,} | {bf_s:.2f}s | {n_cut:,} | {dc_s:.2f}s |"
        )
    lines.append("")
    return lines


def r16_verbs_probe(spark, documents, factors=(1, 8, 32)):
    """The two r16 registrations under replication.

    * crawl_delta_pairs — the crawl stays a FIFTH of the corpus under
      replication; the Bloom prefilter + banded bucket join must keep
      candidate work bounded by true collisions, so time tracks data.
    * pipeline_pretrain_full — the five-leg chain; the dedup legs
      bound pair work by bucket occupancy and the decontamination is
      a fingerprint semi-join, so the chain should track data.
    """
    from fractions import Fraction  # noqa: F401 (parity with chain row)

    from python_dtl_spark.operators import classify  # noqa: F401
    from python_dtl_spark.operators import dedup as dedup_mod

    rows = []
    for n in factors:
        docs = (
            documents if n == 1 else replicate(documents, n, ["doc_id"])
        ).select("doc_id", "source", "text")
        total = docs.count()

        start = time.perf_counter()
        crawl = docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text"
        )
        pairs = dedup_mod.crawl_delta_pairs(
            docs, crawl, n=3, num_hashes=32, bands=16, threshold=0.3
        ).count()
        cd_s = time.perf_counter() - start

        start = time.perf_counter()
        evals = docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text"
        )
        train0 = docs.filter(F.col("doc_id") % 10 != 0)
        gated = (
            text_ops.gopher_quality_flags(train0, append=True)
            .filter(F.col("keep"))
            .select("doc_id", "source", "text")
            .persist()
        )
        lsh_pairs = dedup_mod.minhash_lsh_pairs(
            gated, n=3, num_hashes=32, bands=16, threshold=0.3
        )
        labeled = dedup_mod.keep_one_from_pairs(
            gated.select("doc_id"), lsh_pairs, id_col="doc_id"
        )
        survivors = gated.join(
            labeled.filter(F.col("keep")).select("doc_id"),
            on="doc_id",
            how="left_semi",
        )
        clean = text_ops.remove_duplicated_spans(
            survivors.select("doc_id", "text"), window_tokens=8, against=evals
        )
        mixed = sampling.target_mix_resample(
            clean.join(gated.select("doc_id", "source"), on="doc_id"),
            "source",
            "doc_id",
            {"src1": 3, "src2": 2, "src3": 1},
            seed="pf-mix",
        )
        emitted = sampling.shard_assign(mixed, "doc_id", 8, seed="pf-sh").count()
        gated.unpersist()
        labeled.unpersist()
        pf_s = time.perf_counter() - start

        rows.append((n, total, pairs, cd_s, emitted, pf_s))
        print(
            f"# r16_verbs {n}x: {total:,} docs; crawl-delta {pairs:,} "
            f"pairs in {cd_s:.2f}s; pretrain-full {emitted:,} emitted "
            f"in {pf_s:.2f}s",
            file=sys.stderr,
        )
    return rows


def r16_late_probe(spark, documents, factors=(1, 8, 32)):
    """The two late-r16 registrations under replication.

    * char_concentration_flags — pure row-local map (array_sort + one
      struct fold per doc); time must track data.
    * keep_newest_canonical (recrawl refresh) — the URL fixture keys
      the canonical on (source, doc_id % 100), so the GROUP COUNT
      stays constant under replication while every group grows n×:
      the hot-group stress for the map-side partial max-struct claim.
    """
    from python_dtl_spark.operators import dedup as dedup_mod
    from python_dtl_spark.operators import urls as urls_mod

    rows = []
    for n in factors:
        docs = (
            documents if n == 1 else replicate(documents, n, ["doc_id"])
        ).select("doc_id", "source", "text")
        total = docs.count()

        start = time.perf_counter()
        cc = text_ops.char_concentration_flags(docs)
        n_drop = cc.filter(~F.col("keep")).count()
        cc_s = time.perf_counter() - start

        start = time.perf_counter()
        uid = (F.col("doc_id") % 100).cast("string")
        fixture = docs.filter(F.col("source").isNotNull()).select(
            "doc_id",
            F.concat(
                F.lit("https://www."), F.col("source"),
                F.lit(".example.com/p/"), uid,
            ).alias("url"),
            (F.col("doc_id") * 7 % 13).cast("long").alias("fetch_time"),
        )
        canon = urls_mod.canonicalize_urls(fixture, "url")
        kept = dedup_mod.keep_newest_canonical(
            canon.filter(F.col("canonical_url").isNotNull()).select(
                "doc_id", "canonical_url", "fetch_time"
            ),
            "doc_id",
            ["canonical_url"],
            "fetch_time",
        )
        groups, max_crawls = kept.agg(
            F.count(F.lit(1)), F.max("n_crawls")
        ).collect()[0]
        rr_s = time.perf_counter() - start

        rows.append((n, total, n_drop, cc_s, groups, max_crawls, rr_s))
        print(
            f"# r16_late {n}x: {total:,} docs; char-concentration "
            f"{n_drop:,} dropped in {cc_s:.2f}s; recrawl {groups:,} "
            f"groups (max {max_crawls:,} crawls) in {rr_s:.2f}s",
            file=sys.stderr,
        )
    return rows


_R16_LATE_HEADER = (
    "## late-r16 verbs under replication "
    "(char-concentration / recrawl-refresh)"
)


def r16_late_section(spark, documents) -> list[str]:
    rows = r16_late_probe(spark, documents)
    lines = [
        _R16_LATE_HEADER,
        "",
        "doc_char_concentration (pure row-local map: array_sort + one",
        "struct fold per doc) and pipeline_recrawl_refresh (canonical",
        "keyed on (source, doc_id % 100), so the group count stays",
        "CONSTANT under replication while every group grows n× — the",
        "hot-group stress the map-side partial max-struct absorbs):",
        "",
        "| probe | data | input docs | docs dropped | char-conc time |"
        " url groups | max crawls/group | recrawl time |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for n, total, n_drop, cc_s, groups, max_crawls, rr_s in rows:
        lines.append(
            f"| r16_late | {n}× | {total:,} | {n_drop:,} | {cc_s:.2f}s |"
            f" {groups:,} | {max_crawls:,} | {rr_s:.2f}s |"
        )
    lines += [
        "",
        "Interpretation: both verbs run sublinear (time ratio well",
        "under the data ratio at 8× and 32×).  \"docs dropped 0\" is",
        "the filter's false-positive evidence: natural sf0.1 prose",
        "passes the Simpson/modal thresholds (the catalog fixture",
        "plants the blobs it must catch).  Recrawl's group count",
        "stays 100 while max crawls/group grows 32× — the hot-group",
        "work is absorbed by map-side partial aggregation, not a",
        "window sort.",
    ]
    lines.append("")
    return lines


_R16_VERBS_HEADER = (
    "## r16 verbs under replication (crawl-delta / pretrain-full)"
)


def r16_verbs_section(spark, documents) -> list[str]:
    rows = r16_verbs_probe(spark, documents)
    lines = [
        _R16_VERBS_HEADER,
        "",
        "pipeline_crawl_delta (the crawl stays a fifth of the corpus;",
        "Bloom prefilter + banded bucket join keep candidate work",
        "bounded by true collisions) and pipeline_pretrain_full (the",
        "five-leg chain: gate map, bucket-bounded dedup, fingerprint",
        "semi-join decontamination, per-source rank, row-local shard):",
        "",
        "| probe | data | input docs | delta pairs | crawl-delta time |"
        " emitted | pretrain-full time |",
        "|---|---|---|---|---|---|---|",
    ]
    for n, total, pairs, cd_s, emitted, pf_s in rows:
        lines.append(
            f"| r16_verbs | {n}× | {total:,} | {pairs:,} | {cd_s:.2f}s |"
            f" {emitted:,} | {pf_s:.2f}s |"
        )
    lines += [
        "",
        "Interpretation: replication repeats TEXT verbatim, so (a) the",
        "crawl-delta pair count grows ~n² by construction (every",
        "replica of a crawl doc matches every replica of its corpus",
        "source) while TIME tracks the data, not the pairs — the",
        "banded bucket join and Bloom prefilter absorb the n²-pair",
        "output; and (b) pretrain-full's emitted count stays CONSTANT",
        "because the keep-one dedup leg collapses the verbatim",
        "replicas back to one copy per content — the chain does n× the",
        "gate/LSH/decontamination work in ~n/10× the time.",
    ]
    lines.append("")
    return lines


_ROW_LOCAL_HEADER = "## row_local streaming tiers vs model size (fixed corpus)"


def row_local_tier_section(spark, documents) -> list[str]:
    rows = row_local_tier_probe(spark, documents)
    lines = [
        _ROW_LOCAL_HEADER,
        "",
        "The plan-literal streaming tiers (nb_apply / lm_perplexity",
        "row_local=True) probed against model size — the literal-map",
        "analogue of the bpe tier sweep below.  Unlike the bpe fold,",
        "map lookups do NOT degrade with model size: both tiers stay",
        "FLAT as the vocabulary grows (the mild first-row overhead is",
        "plan-build: the documented eager model collects + literal",
        "construction), a constant ~1.5-3x premium over the",
        "broadcast-join tier — the price of a zero-Exchange plan legal",
        "over unbounded streams.  dsir_weights (r14) sits at ~3.5x:",
        "its map keys are md5-hashed per feature (the bucket recipe),",
        "which no literal-map trick removes; its per-feature work is",
        "staged through two transforms so the md5 and both probes run",
        "ONCE per feature (fold steps are not CSE'd — the naive fold",
        "measured 5.4x).  The max_literal_cells guard bounds",
        "plan size, not a hidden quadratic:",
        "",
        "| tier | model cells (vocab / buckets) | row_local time | join-tier time |",
        "|---|---|---|---|",
    ]
    for op, mv, rl, jn in rows:
        lines.append(f"| {op} | {mv:,} | {rl:.2f}s | {jn:.2f}s |")
    lines.append("")
    return lines


_BPE_TIER_HEADER = "## bpe_encode tier crossover (fixed corpus, table size sweep)"


def bpe_tier_section(spark, documents) -> list[str]:
    rows = bpe_tier_probe(spark, documents)
    lines = [
        _BPE_TIER_HEADER,
        "",
        "Why the broadcast `mapInPandas` tier is the big-table default",
        "(the repo's one deliberate Pandas-UDF hot path): the JVM fold",
        "is output-INsensitive — every table entry's match filter runs",
        "against every document — so its cost is linear in table size",
        "(~0.05 s/entry on this corpus) while the Python min-rank loop",
        "only pays for merges that apply, plus a flat Arrow hop.  All",
        "rows below produced the IDENTICAL output hash (asserted); the",
        "65,536-entry fold was killed unfinished at 10 minutes, which",
        "is why `max_literal_entries` now defaults to 128 — fold keeps",
        "the zero-Python single-Project plan for real fitted prefixes,",
        "broadcast carries every real vocabulary (a classic 32k table",
        "is ~250x past the crossover):",
        "",
        "| tier | table entries | time | docs |",
        "|---|---|---|---|",
    ]
    for tier, n, dt, nd in rows:
        lines.append(f"| {tier} | {n:,} | {dt:.2f}s | {nd:,} |")
    lines.append("")
    return lines


def nb_classify_probe(spark, documents, factor: int):
    """Sampled NB fit + full-corpus apply at 1× and ``factor``×: the
    fit sample stays constant-size (fraction ∝ 1/factor — labeled seed
    data does not grow with the crawl), so fit time should stay
    flat-ish; the apply pass (row-local explode → broadcast model join
    → one doc-grain agg + id join-back) is the corpus-linear stage."""
    from python_dtl_spark.operators import classify

    base_frac = 0.2
    rows = []
    for n, docs, frac in (
        (1, documents, base_frac),
        (factor, replicate(documents, factor, ["doc_id"]), base_frac / factor),
    ):
        start = time.perf_counter()
        tc, cs = classify.nb_fit(
            docs, "lang", sample_fraction=frac, sample_seed="probe",
            max_vocab=200,
        )
        tc = tc.persist()
        n_vocab_rows = tc.count()  # materialize the model once
        fit_s = time.perf_counter() - start
        start = time.perf_counter()
        out = classify.nb_apply(docs, tc, cs)
        agg = out.groupBy("predicted_label").count().collect()
        apply_s = time.perf_counter() - start
        tc.unpersist()
        n_docs = sum(r["count"] for r in agg)
        rows.append((n, fit_s, n_vocab_rows, apply_s, n_docs))
        print(
            f"# nb_classify {n}x frac={frac:g}: fit {fit_s:.2f}s "
            f"({n_vocab_rows} model rows), apply {apply_s:.2f}s "
            f"({n_docs:,} docs)",
            file=sys.stderr,
        )
    return rows


def lm_perplexity_probe(spark, documents, factor: int):
    """Sampled bigram-LM fit + corpus perplexity scoring at 1× and
    ``factor``× (staged r13 row): the fit works on a constant-size
    md5-hash sample (flat-ish), the scoring pass — pair explode →
    broadcast model joins → one doc-grain agg — is the corpus-linear
    stage, the nb_classify shape with two model tables."""
    from python_dtl_spark.operators import classify

    rows = []
    for n, docs in (
        (1, documents),
        (factor, replicate(documents, factor, ["doc_id"])),
    ):
        frac = 0.5 / n  # constant-size labeled sample under xN data
        start = time.perf_counter()
        bi, uni = classify.lm_fit(
            docs, sample_fraction=frac, sample_seed="lm-probe",
            max_vocab=300,
        )
        bi = bi.persist()
        n_model = bi.count()
        fit_s = time.perf_counter() - start
        start = time.perf_counter()
        out = classify.lm_perplexity(docs, bi, uni)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("perplexity").isNotNull(), 1).otherwise(0)).alias("scored"),
        ).collect()[0]
        apply_s = time.perf_counter() - start
        bi.unpersist()
        rows.append((n, fit_s, n_model, apply_s, int(agg["scored"])))
        print(
            f"# lm_perplexity {n}x frac={frac:g}: fit {fit_s:.2f}s "
            f"({n_model} bigram rows), score {apply_s:.2f}s "
            f"({agg['scored']:,}/{agg['n']:,} docs scored)",
            file=sys.stderr,
        )
    return rows


def target_mix_probe(spark, documents, factor: int):
    """Exact-mixture resample at 1× and ``factor``×: constant strata
    (the 20 sources), rows ×N — the count agg absorbs growth map-side
    and the rank window carries it in one exchange, so time should be
    near-linear and output counts ≈×N — within the floor rounding of
    K (floor(N·n/w) ≥ N·floor(n/w), so the N× corpus keeps slightly
    MORE than N× the rows) — (quotas are w_s × K with
    K scaling with the data)."""
    weights = {"src1": 3, "src2": 2, "src3": 1}
    rows = []
    for n, docs in (
        (1, documents),
        (factor, replicate(documents, factor, ["doc_id"])),
    ):
        start = time.perf_counter()
        out = sampling.target_mix_resample(
            docs, "source", "doc_id", weights, seed="probe"
        )
        kept = out.count()
        dt = time.perf_counter() - start
        rows.append((n, dt, kept))
        print(
            f"# target_mix {n}x: {dt:.2f}s ({kept:,} kept)", file=sys.stderr
        )
    return rows


def epoch_emit_probe(spark, documents, factor: int):
    """The pipeline_epoch_emit emission chain (exact mix → per-stratum
    epoch replication → composite-key shuffle-sharding) at 1× and
    ``factor``×: the mix's rank window carries growth in one exchange,
    the upsample is a zero-exchange broadcast-join fan-out, and the
    sharder's single hash exchange moves exactly the emitted replicas
    — so time should be near-linear and emitted rows ≈×N, within the
    floor rounding of the mix's K (the
    mix quotas scale with K)."""
    rows = []
    for n, docs in (
        (1, documents),
        (factor, replicate(documents, factor, ["doc_id"])),
    ):
        start = time.perf_counter()
        mixed = sampling.target_mix_resample(
            docs.select("doc_id", "source"),
            "source",
            "doc_id",
            {"src1": 3, "src2": 2, "src3": 1},
            seed="probe-e",
        )
        up = sampling.epoch_upsample(mixed, "source", {"src1": 2, "src3": 3})
        keyed = up.withColumn(
            "__emit_key", F.concat_ws("#", F.col("doc_id"), F.col("epoch"))
        )
        emitted = sampling.shuffle_shards(
            keyed, "__emit_key", 16, seed="probe-e"
        ).count()
        dt = time.perf_counter() - start
        rows.append((n, dt, emitted))
        print(
            f"# epoch_emit {n}x: {dt:.2f}s ({emitted:,} emitted)",
            file=sys.stderr,
        )
    return rows


def target_mix_hot_stratum_probe(spark, documents, factor: int):
    """The documented 100 TB hot-stratum mitigation, executed: one
    deliberately mega stratum (every replica relabeled 'hot', ×factor
    the rows of any real source) funnels its full row count through
    the mix window's per-stratum sort — unless the SAME-SEED
    precap_quota pre-cap restores the WindowGroupLimit map-side prune.
    Both variants must keep the IDENTICAL row set (the pre-cap takes a
    prefix of the same md5 order; quota ≥ w_s × K keeps K intact) —
    checked here, not assumed."""
    from pyspark.sql import functions as F

    hot = replicate(documents, factor, ["doc_id"]).withColumn(
        "source", F.lit("hot")
    )
    docs = documents.unionByName(hot)
    weights = {"hot": 8, "src1": 1}
    # K is bounded by src1's count // 1 ≈ documents/20, so quota =
    # 8 * (src1 rows) always clears w_s x K for both strata
    n_src1 = documents.filter(F.col("source") == "src1").count()
    quota = 8 * n_src1
    rows = []
    for label, kwargs in (
        ("plain", {}),
        ("precap", {"precap_quota": quota}),
    ):
        start = time.perf_counter()
        out = sampling.target_mix_resample(
            docs, "source", "doc_id", weights, seed="hotmix", **kwargs
        )
        kept = out.count()
        dt = time.perf_counter() - start
        rows.append((label, dt, kept))
        print(
            f"# target_mix_hot[{label}] hot={factor}x: {dt:.2f}s "
            f"({kept:,} kept)",
            file=sys.stderr,
        )
    (_, _, kept_plain), (_, _, kept_precap) = rows
    assert kept_plain == kept_precap, (kept_plain, kept_precap)
    return rows


def lineage_probe(spark, orders, factor: int, workdir: str):
    """Traced-run cost at 1× and ``factor``× input, full snapshots vs
    ``snapshot_levels=["EXPORT"]`` (the 100 TB valve): bytes written to
    the trace directory and wall time.  Sampled mode's bytes should
    stay ~flat as data grows — it writes only the narrow rid mappings
    plus the (fixed-size) export — while full mode re-writes every
    working table per statement."""
    import shutil
    import tempfile

    from python_dtl_spark.lineage import FileSystemTracer, run_traced
    from python_dtl_spark.sources import FileSystemImporter, InMemoryExporter

    script = (
        "WITH orders AS IMPORT 'orders';\n"
        "WITH priced AS\n"
        "    SELECT o_orderkey, o_custkey, o_totalprice\n"
        "    FROM orders\n"
        "    WHERE o_totalprice > 100000.0;\n"
        "WITH by_cust AS\n"
        "    SELECT o_custkey, count(o_orderkey) AS n_orders,\n"
        "           sum(o_totalprice) AS total\n"
        "    FROM priced\n"
        "    GROUP BY o_custkey;\n"
        "EXPORT by_cust TO 'by_cust';\n"
    )

    def dir_bytes(path: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(path):
            for name in files:
                total += os.path.getsize(os.path.join(root, name))
        return total

    rows = []
    for n in (1, factor):
        src_dir = os.path.join(workdir, f"lineage_in_{n}x")
        ords = orders if n == 1 else replicate(
            orders, n, ["o_orderkey", "o_custkey"]
        )
        ords.write.mode("overwrite").parquet(
            os.path.join(src_dir, "orders.parquet")
        )
        for mode, levels, sample in (
            ("full", None, None),
            ("export_only", ["EXPORT"], None),
            # second valve: mappings rid-hash-sampled 1-in-16 — bytes
            # should drop ~16x below export_only's mapping share and
            # grow sub-linearly in the data
            ("export_sampled16", ["EXPORT"], 16),
        ):
            trace_dir = tempfile.mkdtemp(prefix=f"scale_trace_{mode}_{n}x_")
            start = time.perf_counter()
            run_traced(
                script,
                spark=spark,
                importer=FileSystemImporter(spark, src_dir),
                exporter=InMemoryExporter(),
                tracer=FileSystemTracer(
                    trace_dir, snapshot_levels=levels, mapping_sample=sample
                ),
            )
            dt = time.perf_counter() - start
            nbytes = dir_bytes(trace_dir)
            rows.append((mode, n, dt, nbytes))
            print(
                f"# lineage {mode} {n}x: {dt:.2f}s {nbytes:,} B",
                file=sys.stderr,
            )
            shutil.rmtree(trace_dir, ignore_errors=True)
        shutil.rmtree(src_dir, ignore_errors=True)
    return rows


def _replace_or_append_section(path: str, header: str, section: list[str]) -> None:
    """Swap the named section (header line .. next '## ' or EOF) in an
    existing SCALING.md, or append it."""
    with open(path) as f:
        text = f.read()
    block = "\n".join(section)
    if header in text:
        pre, rest = text.split(header, 1)
        nxt = rest.find("\n## ")
        post = rest[nxt + 1 :] if nxt != -1 else ""
        text = pre + block + ("\n" + post if post else "\n")
    else:
        text = text.rstrip("\n") + "\n\n" + block + "\n"
    with open(path, "w") as f:
        f.write(text)


def r17_verbs_probe(spark, documents, factors=(1, 8, 32)):
    """The r17 registrations under replication.

    * keep_rate_filter (domain gate) — the SOURCE count stays constant
      under replication while every source grows n×: the hot-group
      stress for the map-side partial count/count_if claim.
    * quality_card — four fused flag batteries + ONE agg; time must
      track data.
    * snapshot_diff — ONE full-outer join, both sides n×.
    * image near-dup — assets n×, groups of 4: decode + pigeonhole
      pairs must grow ~linearly (pairs = 6 per group, never all-pairs).
    * index maintenance asymmetry — the corpus index grows n× but the
      CRAWL stays fixed: probe+merge time must grow far slower than
      the corpus (the whole point of the stored-index design).
    """
    from python_dtl_spark.operators import cdc as cdc_mod
    from python_dtl_spark.operators import dedup as dedup_mod
    from python_dtl_spark.operators import multimodal as mm

    rows = []
    for n in factors:
        docs = (
            documents if n == 1 else replicate(documents, n, ["doc_id"])
        ).select("doc_id", "source", "text")
        total = docs.count()

        # domain gate: plant blobs at a fixed per-source rate
        did = F.col("doc_id")
        blob = ((did % 20).isin(1, 7) & (did % 3 != 0)) | (did % 25 == 4)
        planted = F.when(
            blob, F.repeat(F.lit("z"), (50 + (did % 5) * 30).cast("int"))
        ).otherwise(F.col("text"))
        start = time.perf_counter()
        flags = text_ops.char_concentration_flags(
            docs.withColumn("text", planted), append=True
        )
        gated = sampling.keep_rate_filter(flags, "source", "keep")
        kept_docs, kept_sources = gated.agg(
            F.count(F.lit(1)), F.count_distinct("source")
        ).collect()[0]
        dq_s = time.perf_counter() - start

        # composed quality card: four batteries, one agg
        start = time.perf_counter()
        g = text_ops.gopher_quality_flags(docs, append=True).select(
            "doc_id", "source", "text", F.col("keep").alias("kg")
        )
        r = text_ops.repetition_flags(g, append=True).select(
            "doc_id", "source", "text", "kg", F.col("keep").alias("kr")
        )
        c = text_ops.char_concentration_flags(r, append=True).select(
            "doc_id", "source", "text", "kg", "kr",
            F.col("keep").alias("kc"),
        )
        card_rows = stats_ops.corpus_report(
            c, "source", "text", flag_cols=["kg", "kr", "kc"]
        ).count()
        qc_s = time.perf_counter() - start

        # snapshot diff: both sides n×
        start = time.perf_counter()
        new = docs.filter(did % 7 != 0).withColumn(
            "text",
            F.when(did % 5 == 0, F.concat(F.lit("e "), F.col("text")))
            .otherwise(F.col("text")),
        )
        delta = cdc_mod.snapshot_diff(
            docs.select("doc_id", "text"),
            new.select("doc_id", "text"),
            ["doc_id"],
        ).count()
        sd_s = time.perf_counter() - start

        # image near-dup: assets n×, payload groups of 4
        n_assets = 2048 * n
        assets = spark.range(n_assets).select(
            F.col("id").alias("asset_id"),
            F.sha2((F.col("id") % (n_assets // 4)).cast("string"), 256)
            .cast("binary")
            .alias("payload"),
        )
        start = time.perf_counter()
        img_pairs = mm.image_near_dup_pairs(
            assets, max_hamming=6, fake=True
        ).count()
        im_s = time.perf_counter() - start

        # index-maintenance asymmetry: corpus index n×, crawl FIXED
        corpus = docs.select("doc_id", "text")
        index = dedup_mod.minhash_band_buckets(corpus).persist()
        index.count()  # build outside the timed window: the store
        crawl = documents.select("doc_id", "text").filter(
            F.col("doc_id") % 5 == 0
        ).select((F.col("doc_id") + 90_000_000).alias("doc_id"), "text")
        start = time.perf_counter()
        pairs = dedup_mod.crawl_delta_pairs(
            corpus, crawl, corpus_buckets=index, threshold=0.3
        )
        survivors = crawl.join(
            pairs.select(F.col("crawl_id").alias("doc_id")).dropDuplicates(),
            on="doc_id", how="left_anti",
        ).localCheckpoint(eager=False)
        merged_rows = dedup_mod.merge_crawl_into_index(
            index, survivors
        ).count()
        ix_s = time.perf_counter() - start
        index.unpersist()

        rows.append(
            (n, total, kept_sources, dq_s, card_rows, qc_s, delta, sd_s,
             img_pairs, im_s, merged_rows, ix_s)
        )
        print(
            f"# r17_verbs {n}x: {total:,} docs; domain-gate "
            f"{kept_sources} sources in {dq_s:.2f}s; quality-card "
            f"{card_rows} rows in {qc_s:.2f}s; snapshot-diff {delta:,} "
            f"in {sd_s:.2f}s; image pairs {img_pairs:,} in {im_s:.2f}s; "
            f"fixed-crawl probe+merge {merged_rows:,} index rows in "
            f"{ix_s:.2f}s",
            file=sys.stderr,
        )
    return rows


_R17_VERBS_HEADER = (
    "## r17 verbs under replication (domain-gate / quality-card / "
    "snapshot-diff / image-dedup / index-maintenance)"
)


def r17_verbs_section(spark, documents) -> list[str]:
    rows = r17_verbs_probe(spark, documents)
    lines = [
        _R17_VERBS_HEADER,
        "",
        "pipeline_domain_quality (source count CONSTANT under",
        "replication — hot-group stress for the map-side partial",
        "count), pipeline_quality_card (four fused batteries + ONE",
        "agg), pipeline_snapshot_diff (one full-outer join, both sides",
        "n×), pipeline_image_dedup (assets n×, C(4,2) pairs per",
        "payload group), and the index-maintenance asymmetry: the",
        "corpus index grows n× while the CRAWL stays fixed — probe +",
        "survivor merge must grow far slower than the corpus:",
        "",
        "| probe | data | input docs | gate srcs | gate time |"
        " card time | diff rows | diff time | img pairs | img time |"
        " fixed-crawl probe+merge time |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for (n, total, ks, dq_s, cr, qc_s, delta, sd_s, ip, im_s, mr,
         ix_s) in rows:
        lines.append(
            f"| r17_verbs | {n}× | {total:,} | {ks} | {dq_s:.2f}s |"
            f" {qc_s:.2f}s | {delta:,} | {sd_s:.2f}s | {ip:,} |"
            f" {im_s:.2f}s | {ix_s:.2f}s |"
        )
    lines += [
        "",
        "Interpretation: gate/card/diff/image times must track the",
        "data ratio or better (all shuffles group- or candidate-",
        "sized); the fixed-crawl probe+merge column is the asymmetry",
        "claim — its only corpus-proportional term is reading the",
        "stored index itself (prunable by (band,bucket) partitioning",
        "in a real store; the in-memory probe pays the full scan), so",
        "growth far below the corpus ratio is what 'the 100 TB corpus",
        "never pays for the arrival of a crawl' looks like at probe",
        "scale.",
    ]
    lines.append("")
    return lines


def r17_embed_probe(spark, factors=(1, 8, 32)):
    """Embedding-index asymmetry under replication: the corpus (and
    its stored index) grows n× while the DELTA stays fixed — probe +
    survivor merge must grow far slower than the corpus; the merge
    leg is a pure map over the fixed-size delta, so its cost should
    be flat outright."""
    from python_dtl_spark.operators import dedup as dedup_mod

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    rows = []
    for n in factors:
        corpus = base if n == 1 else replicate(base, n, ["vec_id"])
        total = corpus.count()
        index = dedup_mod.embedding_lsh_buckets(corpus, dim=64).persist()
        index.count()
        delta = base.select(
            (F.col("vec_id") + 90_000_000).alias("vec_id"), "embedding"
        )
        start = time.perf_counter()
        pairs = dedup_mod.embedding_delta_pairs(
            corpus, delta, threshold=0.9, dim=64, corpus_buckets=index
        )
        survivors = delta.join(
            pairs.select(F.col("delta_id").alias("vec_id")).dropDuplicates(),
            on="vec_id",
            how="left_anti",
        ).localCheckpoint(eager=False)
        merged = dedup_mod.merge_delta_into_embedding_index(
            index, survivors, dim=64
        ).count()
        dt = time.perf_counter() - start
        index.unpersist()
        rows.append((n, total, merged, dt))
        print(
            f"# r17_embed {n}x: corpus {total:,} vecs; fixed-delta "
            f"probe+merge -> {merged:,} index rows in {dt:.2f}s",
            file=sys.stderr,
        )
    return rows


_R17_EMBED_HEADER = (
    "## r17 embedding-index asymmetry under replication "
    "(fixed delta vs n× corpus)"
)


def r17_embed_section(spark, documents) -> list[str]:
    rows = r17_embed_probe(spark)
    lines = [
        _R17_EMBED_HEADER,
        "",
        "pipeline_embedding_index's scale claim: the stored hyperplane",
        "index grows n× while the DELTA batch stays fixed — the probe",
        "is an index equi-join + candidate-sized vector verify, and",
        "the merge is a pure map over the delta (zero hash exchanges),",
        "so probe+merge must grow far below the corpus ratio:",
        "",
        "| probe | corpus | vecs | merged index rows | probe+merge time |",
        "|---|---|---|---|---|",
    ]
    for n, total, merged, dt in rows:
        lines.append(
            f"| r17_embed | {n}× | {total:,} | {merged:,} | {dt:.2f}s |"
        )
    lines += [
        "",
        "Interpretation: every planted delta vector is an exact copy",
        "of a corpus vector (identical signature ⇒ every delta row is",
        "a dup ⇒ survivors ≈ 0), so the merged index row count tracks",
        "the corpus — the time column growing far slower than n× is",
        "the asymmetry evidence.",
    ]
    lines.append("")
    return lines


def r17_centroid_probe(spark, factors=(1, 8, 32)):
    """IVF centroid-index asymmetry under replication: the corpus
    (and its stored assignment index) grows n× while the frozen
    centroid table and the DELTA batch stay fixed — delta assignment
    is a pure map over the fixed-size delta (must be FLAT), and the
    merged-index count is the one corpus-proportional term (it scans
    the stored index, exactly like the daily job's index rewrite)."""
    from python_dtl_spark.operators import similarity as sim

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).filter(F.col("vec_id").isNotNull() & F.col("embedding").isNotNull())
    cents = base.filter(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("centroid")
    )
    rows = []
    for n in factors:
        corpus = base if n == 1 else replicate(base, n, ["vec_id"])
        total = corpus.count()
        index = sim.assign_to_centroids(corpus, cents, dim=64).persist()
        index.count()
        delta = base.select(
            (F.col("vec_id") + 90_000_000).alias("vec_id"), "embedding"
        )
        start = time.perf_counter()
        n_delta = sim.assign_to_centroids(delta, cents, dim=64).count()
        t_assign = time.perf_counter() - start
        start = time.perf_counter()
        merged = sim.merge_into_centroid_index(
            index, delta, cents, dim=64
        ).count()
        t_merge = time.perf_counter() - start
        index.unpersist()
        rows.append((n, total, n_delta, t_assign, merged, t_merge))
        print(
            f"# r17_centroid {n}x: corpus {total:,} vecs; fixed-delta "
            f"assign {t_assign:.2f}s, merged-count {t_merge:.2f}s "
            f"({merged:,} index rows)",
            file=sys.stderr,
        )
    return rows


_R17_CENTROID_HEADER = (
    "## r17 centroid-index asymmetry under replication "
    "(fixed delta + frozen centroids vs n× corpus)"
)


def r17_centroid_section(spark, documents) -> list[str]:
    rows = r17_centroid_probe(spark)
    lines = [
        _R17_CENTROID_HEADER,
        "",
        "assign_to_centroids / merge_into_centroid_index's scale claim",
        "(staged pipeline_centroid_index row): the stored assignment",
        "index grows n× while the frozen centroid table and the DELTA",
        "batch stay fixed — delta assignment is a PURE MAP (plan-",
        "asserted zero Exchange), so its cost must be flat outright;",
        "the merged-index count is the one corpus-proportional term",
        "(it scans the stored index, the daily job's index rewrite):",
        "",
        "| probe | corpus | vecs | delta assign | merged rows | merge count |",
        "|---|---|---|---|---|---|",
    ]
    for n, total, n_delta, t_assign, merged, t_merge in rows:
        lines.append(
            f"| r17_centroid | {n}× | {total:,} | {t_assign:.2f}s "
            f"({n_delta:,} rows) | {merged:,} | {t_merge:.2f}s |"
        )
    lines += [
        "",
        "Interpretation: a flat delta-assign column is the design",
        "property — arrivals cost arrival-sized work however large",
        "the corpus; the merge-count column may track the corpus",
        "because COUNTING the merged index scans it (the union itself",
        "adds zero exchanges, test_merge_centroid_index_touches_only_",
        "delta).",
    ]
    lines.append("")
    return lines


def r17_qdrift_probe(spark, factors=(1, 8, 32)):
    """Distribution-drift card under replication: BOTH crawls grow n×
    while the source count stays fixed — the two percentile
    aggregations grow with the data (per-group buffers spill-bounded),
    the card join stays |sources|-sized, so wall time must grow far
    below n×."""
    from python_dtl_spark.operators.stats import quantile_drift

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "text"
    ).filter(F.col("doc_id").isNotNull())
    rows = []
    for n in factors:
        docs = base if n == 1 else replicate(base, n, ["doc_id"])
        old = docs.withColumn("chars", F.length("text").cast("long"))
        new = docs.filter(F.col("doc_id") % 7 != 0).withColumn(
            "chars", F.length("text").cast("long") + 8
        )
        total = docs.count()
        start = time.perf_counter()
        card = quantile_drift(old, new, "chars", ["source"]).count()
        dt = time.perf_counter() - start
        rows.append((n, total, card, dt))
        print(
            f"# r17_qdrift {n}x: {total:,} docs/side -> {card} card rows "
            f"in {dt:.2f}s",
            file=sys.stderr,
        )
    return rows


_R17_QDRIFT_HEADER = (
    "## r17 quantile-drift card under replication (n× crawls, fixed sources)"
)


def r17_qdrift_section(spark, documents) -> list[str]:
    rows = r17_qdrift_probe(spark)
    lines = [
        _R17_QDRIFT_HEADER,
        "",
        "quantile_drift's scale claim (staged pipeline_quantile_drift",
        "row): one percentile aggregation per crawl (per-group buffers",
        "inside the aggregate, spillable) + a |sources|-sized card",
        "join — the card row count is CONSTANT under n× data, so wall",
        "time must grow far below n×:",
        "",
        "| probe | crawls | docs/side | card rows | time |",
        "|---|---|---|---|---|",
    ]
    for n, total, card, dt in rows:
        lines.append(
            f"| r17_qdrift | {n}x | {total:,} | {card} | {dt:.2f}s |"
        )
    lines.append("")
    return lines


def r17_editdist_probe(spark, factors=(1, 8, 32)):
    """Edit-distance dedup under replication with CONSTANT near-dup
    density: titles embed their (shifted) doc_id so replicas stay
    distinct strings — pair count grows ~n× with the data (one planted
    typo per 5 docs), and the deletion-variant join must scale like
    the other bucket joins, far below the brute force's n²."""
    from python_dtl_spark.operators import dedup as dedup_mod

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    ).filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
    rows = []
    for n in factors:
        docs = base if n == 1 else replicate(base, n, ["doc_id"])
        # the replica tag is FOUR substituted characters, so replicas
        # of one doc sit at edit distance 4 from each other — a naive
        # "embed the shifted id" tag leaves replica ids one digit
        # apart (10000123 vs 20000123) and quadratically cross-pairs
        # every duplicated prefix (measured: 1,104x pairs at 32x)
        titles = docs.select(
            "doc_id",
            F.concat(
                F.lower(F.substring(F.trim("text"), 1, 16)),
                F.lit(" "),
                F.repeat(
                    F.expr(
                        "substring('abcdefghijklmnopqrstuvwxyzABCDEF',"
                        " cast(doc_id div 10000000 as int) + 1, 1)"
                    ),
                    4,
                ),
                F.lit(" #"),
                (F.col("doc_id") % 10_000_000).cast("string"),
            ).alias("title"),
        )
        typos = titles.filter(F.col("doc_id") % 5 == 2).select(
            (F.col("doc_id") + 900_000_000).alias("doc_id"),
            F.concat(
                F.substring("title", 1, 2),
                F.lit("~"),
                F.expr("substring(title, 4)"),
            ).alias("title"),
        )
        df = titles.unionByName(typos)
        total = df.count()
        start = time.perf_counter()
        pairs = dedup_mod.edit_distance_pairs(
            df, "doc_id", "title", assume_unique_ids=True
        ).count()
        dt = time.perf_counter() - start
        rows.append((n, total, pairs, dt))
        print(
            f"# r17_editdist {n}x: {total:,} titles -> {pairs:,} pairs "
            f"in {dt:.2f}s",
            file=sys.stderr,
        )
    return rows


_R17_EDITDIST_HEADER = (
    "## r17 edit-distance dedup under replication (constant typo density)"
)


def r17_editdist_section(spark, documents) -> list[str]:
    rows = r17_editdist_probe(spark)
    lines = [
        _R17_EDITDIST_HEADER,
        "",
        "edit_distance_pairs' scale claim (staged dedup_edit_distance",
        "row): the deletion-variant equi-join is bucket-bounded like",
        "every other near-dup blocker — under n× titles with constant",
        "near-dup density (replicas carry a 4-char tag, distance 4",
        "apart), pairs grow ~n× and wall time must grow far below the",
        "brute force's n²:",
        "",
        "| probe | titles | rows | pairs | time |",
        "|---|---|---|---|---|",
    ]
    for n, total, pairs, dt in rows:
        lines.append(
            f"| r17_editdist | {n}x | {total:,} | {pairs:,} | {dt:.2f}s |"
        )
    lines.append("")
    return lines


def r17_wave2_maps_probe(spark, factors=(1, 8, 32)):
    """The second-wave pure-map verbs under replication: html_to_text
    (fixed regex extraction chain) and extract_urls (outlink explode)
    are zero-exchange codegen stages — wall time must track the scan,
    far below any shuffle-bound shape."""
    from python_dtl_spark.operators.text import html_to_text
    from python_dtl_spark.operators.urls import extract_urls

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    ).filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
    rows = []
    for n in factors:
        docs = base if n == 1 else replicate(base, n, ["doc_id"])
        page = F.concat(
            F.lit("<html><head><style>.x{k:v}</style>"
                  "<script>s('<b>x</b>')</script></head><body><p>"),
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("</p><!-- c --> see https://www.site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/a?utm_source=x#f.</body></html>"),
        )
        html = docs.withColumn("text", page)
        total = html.count()
        start = time.perf_counter()
        n_ext = html_to_text(html).count()
        t_html = time.perf_counter() - start
        start = time.perf_counter()
        n_urls = extract_urls(html).count()
        t_urls = time.perf_counter() - start
        rows.append((n, total, t_html, n_urls, t_urls))
        print(
            f"# r17_wave2 {n}x: {total:,} pages; html_to_text "
            f"{t_html:.2f}s, extract_urls {t_urls:.2f}s ({n_urls:,} links)",
            file=sys.stderr,
        )
    return rows


_R17_WAVE2_HEADER = (
    "## r17 second-wave map verbs under replication "
    "(html_to_text / extract_urls)"
)


def r17_wave2_section(spark, documents) -> list[str]:
    rows = r17_wave2_maps_probe(spark)
    lines = [
        _R17_WAVE2_HEADER,
        "",
        "Both staged extraction verbs are zero-exchange codegen map",
        "stages (plan-asserted); under n× pages wall time must track",
        "the scan:",
        "",
        "| probe | pages | rows | html_to_text | extract_urls | links |",
        "|---|---|---|---|---|---|",
    ]
    for n, total, t_html, n_urls, t_urls in rows:
        lines.append(
            f"| r17_wave2 | {n}x | {total:,} | {t_html:.2f}s "
            f"| {t_urls:.2f}s | {n_urls:,} |"
        )
    lines.append("")
    return lines


def r19_verbs_probe(spark, factors=(1, 8, 32)):
    """Replication probes for three window/join shapes that had plan
    evidence (PLANS.md) but no measured SCALING row (r18 verdict item
    7): as-of join (union + running window, one shuffle on the by
    key), batch sessionization (two windows sharing one Exchange) and
    CDC apply_changes (latest-change window + full-outer merge join).
    Replicas shift the KEY columns, so key count grows n× while
    per-key partition size stays constant — each shape's claim is
    per-key-linear work, so wall must grow ≲ n×."""
    from python_dtl_spark.catalog import _read, _read_events
    from python_dtl_spark.operators import cdc
    from python_dtl_spark.operators.joins import asof_join
    from python_dtl_spark.operators.windows import sessionize

    ev_base = _read_events(spark, SF_DIR).select(
        "event_id", "user_id", "ts", "value"
    )
    orders_base = _read(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    li_base = _read(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_partkey",
        "l_linestatus", "l_extendedprice",
    )
    rows = []
    for n in factors:
        ev = (
            ev_base
            if n == 1
            else replicate(ev_base, n, ["event_id", "user_id"])
        )
        n_ev = ev.count()
        # as-of: every event picks the latest reference tick (every
        # 10th event of the same user, still 1/10 after replication —
        # the shift is a multiple of 10) at or before its timestamp
        right = ev.filter(F.col("event_id") % 10 == 0).select(
            "user_id", "ts", F.col("value").alias("ref_value")
        )
        t_asof, _ = timed(
            f"r19 asof {n}x",
            asof_join(ev, right, on="ts", by="user_id",
                      value_cols=["ref_value"]),
        )
        t_sess, n_sess = timed(
            f"r19 sessionize {n}x", sessionize(ev.select("user_id", "ts"))
        )
        snap = (
            orders_base
            if n == 1
            else replicate(orders_base, n, ["o_orderkey"])
        )
        li = li_base if n == 1 else replicate(li_base, n, ["l_orderkey"])
        ch = li.select(
            F.col("l_orderkey").alias("o_orderkey"),
            F.col("l_linenumber").cast("long").alias("seq"),
            F.when(F.col("l_returnflag") == "R", F.lit("delete"))
            .otherwise(F.lit("upsert"))
            .alias("op"),
            F.col("l_partkey").alias("o_custkey"),
            F.col("l_linestatus").alias("o_orderstatus"),
            F.col("l_extendedprice").alias("o_totalprice"),
        )
        t_cdc, n_cdc = timed(
            f"r19 apply_changes {n}x",
            cdc.apply_changes(
                snap, ch, keys=["o_orderkey"], seq_col="seq", op_col="op"
            ),
        )
        rows.append((n, n_ev, t_asof, t_sess, n_sess, t_cdc, n_cdc))
    return rows


_R19_VERBS_HEADER = (
    "## r19 window/join shapes under replication (as-of, sessionize, CDC merge)"
)


def r19_verbs_section(spark, documents) -> list[str]:
    rows = r19_verbs_probe(spark)
    lines = [
        _R19_VERBS_HEADER,
        "",
        "Three shapes whose scale evidence was plan-only until r19.",
        "Keys shift per replica, so key count grows n× at constant",
        "per-key history — per-key-linear shapes must grow ≲ n×:",
        "",
        "| probe | events | asof | sessionize | sessions | apply_changes | merged rows |",
        "|---|---|---|---|---|---|---|",
    ]
    for n, n_ev, t_asof, t_sess, n_sess, t_cdc, n_cdc in rows:
        lines.append(
            f"| r19_verbs {n}x | {n_ev:,} | {t_asof:.2f}s | {t_sess:.2f}s "
            f"| {n_sess:,} | {t_cdc:.2f}s | {n_cdc:,} |"
        )
    lines.append("")
    return lines


def main() -> None:
    scaling_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.md",
    )
    if "--r19-verbs" in sys.argv:
        spark = get_spark("scale-probe")
        spark.sparkContext.setLogLevel("ERROR")
        _replace_or_append_section(
            scaling_path,
            _R19_VERBS_HEADER,
            r19_verbs_section(spark, None),
        )
        print("SCALING.md r19-verbs section updated")
        return
    if "--r17-wave2" in sys.argv:
        spark = get_spark("scale-probe")
        spark.sparkContext.setLogLevel("ERROR")
        documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        _replace_or_append_section(
            scaling_path,
            _R17_WAVE2_HEADER,
            r17_wave2_section(spark, documents),
        )
        print("SCALING.md r17-wave2 section updated")
        return
    if "--r17-editdist" in sys.argv:
        spark = get_spark("scale-probe")
        spark.sparkContext.setLogLevel("ERROR")
        documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        _replace_or_append_section(
            scaling_path,
            _R17_EDITDIST_HEADER,
            r17_editdist_section(spark, documents),
        )
        print("SCALING.md r17-editdist section updated")
        return
    if "--r17-qdrift" in sys.argv:
        spark = get_spark("scale-probe")
        spark.sparkContext.setLogLevel("ERROR")
        documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        _replace_or_append_section(
            scaling_path,
            _R17_QDRIFT_HEADER,
            r17_qdrift_section(spark, documents),
        )
        print("SCALING.md r17-qdrift section updated")
        return
    if "--r17-centroid" in sys.argv:
        spark = get_spark("scale-probe")
        spark.sparkContext.setLogLevel("ERROR")
        documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        _replace_or_append_section(
            scaling_path,
            _R17_CENTROID_HEADER,
            r17_centroid_section(spark, documents),
        )
        print("SCALING.md r17-centroid section updated")
        return
    if "--bpe-tier" in sys.argv:
        spark = get_spark("scale-probe")
        spark.sparkContext.setLogLevel("ERROR")
        documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        _replace_or_append_section(
            scaling_path, _BPE_TIER_HEADER, bpe_tier_section(spark, documents)
        )
        print("SCALING.md bpe-tier section updated")
        return
    if "--row-local-tier" in sys.argv:
        spark = get_spark("scale-probe")
        spark.sparkContext.setLogLevel("ERROR")
        documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        _replace_or_append_section(
            scaling_path,
            _ROW_LOCAL_HEADER,
            row_local_tier_section(spark, documents),
        )
        print("SCALING.md row-local-tier section updated")
        return
    if "--top-fraction" in sys.argv:
        spark = get_spark("scale-probe")
        spark.sparkContext.setLogLevel("ERROR")
        documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        _replace_or_append_section(
            scaling_path,
            _TOP_FRACTION_HEADER,
            top_fraction_section(spark, documents),
        )
        print("SCALING.md top-fraction section updated")
        return
    if "--staged-r15" in sys.argv:
        spark = get_spark("scale-probe")
        spark.sparkContext.setLogLevel("ERROR")
        documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        _replace_or_append_section(
            scaling_path, _STAGED_R15_HEADER, staged_r15_section(spark, documents)
        )
        print("SCALING.md staged-r15 section updated")
        return
    if "--r15-late" in sys.argv:
        spark = get_spark("scale-probe")
        spark.sparkContext.setLogLevel("ERROR")
        documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        _replace_or_append_section(
            scaling_path, _R15_LATE_HEADER, r15_late_section(spark, documents)
        )
        print("SCALING.md r15-late section updated")
        return
    if "--r17-embed" in sys.argv:
        spark = get_spark("scale-probe")
        spark.sparkContext.setLogLevel("ERROR")
        documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        _replace_or_append_section(
            scaling_path, _R17_EMBED_HEADER, r17_embed_section(spark, documents)
        )
        print("SCALING.md r17-embed section updated")
        return
    if "--r17-verbs" in sys.argv:
        spark = get_spark("scale-probe")
        spark.sparkContext.setLogLevel("ERROR")
        documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        _replace_or_append_section(
            scaling_path, _R17_VERBS_HEADER, r17_verbs_section(spark, documents)
        )
        print("SCALING.md r17-verbs section updated")
        return
    if "--r16-late" in sys.argv:
        spark = get_spark("scale-probe")
        spark.sparkContext.setLogLevel("ERROR")
        documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        _replace_or_append_section(
            scaling_path, _R16_LATE_HEADER, r16_late_section(spark, documents)
        )
        print("SCALING.md r16-late section updated")
        return
    if "--r16-verbs" in sys.argv:
        spark = get_spark("scale-probe")
        spark.sparkContext.setLogLevel("ERROR")
        documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        _replace_or_append_section(
            scaling_path, _R16_VERBS_HEADER, r16_verbs_section(spark, documents)
        )
        print("SCALING.md r16-verbs section updated")
        return
    if "--r15-verbs" in sys.argv:
        spark = get_spark("scale-probe")
        spark.sparkContext.setLogLevel("ERROR")
        documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        _replace_or_append_section(
            scaling_path, _R15_VERBS_HEADER, r15_verbs_section(spark, documents)
        )
        _replace_or_append_section(
            scaling_path, _PPL_DELTA_HEADER, ppl_delta_section(spark, documents)
        )
        _replace_or_append_section(
            scaling_path, _CCNET_HEADER, ccnet_section(spark, documents)
        )
        print("SCALING.md r15-verbs + ppl-delta + ccnet sections updated")
        return
    if "--dsir" in sys.argv:
        spark = get_spark("scale-probe")
        spark.sparkContext.setLogLevel("ERROR")
        documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        _replace_or_append_section(
            scaling_path, _DSIR_HEADER, dsir_section(spark, documents)
        )
        print("SCALING.md dsir section updated")
        return
    factors = [int(a) for a in sys.argv[1:]] or [8]
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    from python_dtl_spark.catalog import _read_events

    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    supplier = spark.read.parquet(f"{SF_DIR}/supplier.parquet")
    documents = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    embeddings = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    events = _read_events(spark, SF_DIR)

    emb_base = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )

    def _funnel(ev, steps=("view", "click", "purchase")):
        from python_dtl_spark.operators import analytics

        return analytics.funnel_conversion(
            ev.select("user_id", "ts", "event_type"), list(steps)
        )

    # k=7 funnel: steps 4-7 never occur, so output values match k=3 —
    # but the plan carries 7 chained window aggregates, probing that
    # the single-exchange window chain stays linear in k (the old
    # join-chain shape measured 27 exchanges here)
    _K7 = ("view", "click", "purchase", "s4", "s5", "s6", "s7")

    def emb_at(n: int):
        parts = []
        for i in range(n):
            part = emb_base.withColumn(
                "vec_id", F.col("vec_id") + F.lit(i * 10_000_000)
            )
            parts.append(rotate_vec(part, i) if i else part)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    emb_lab = embeddings.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        "label",
    )

    def emb_lab_at(n: int):
        parts = []
        for i in range(n):
            part = emb_lab.withColumn(
                "vec_id", F.col("vec_id") + F.lit(i * 10_000_000)
            )
            parts.append(rotate_vec(part, i) if i else part)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
    stream_workdir = tempfile.mkdtemp(prefix="scale_probe_stream_")

    def q1(li):
        return (
            li.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.avg("l_extendedprice").alias("avg_price"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    def q3(cu, od, li):
        return (
            cu.filter(F.col("c_mktsegment") == "BUILDING")
            .join(od, F.col("c_custkey") == F.col("o_custkey"))
            .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("l_orderkey")
            .agg(F.sum(F.col("l_extendedprice") * (1.0 - F.col("l_discount"))).alias("rev"))
        )

    def q21(su, li, od):
        # the TPC-H q21 semi/anti self-join chain (catalog
        # dtl_q21_waiting_suppliers), DataFrame form so the probe can
        # feed replicated inputs.  The hazard probed: the `!=` residual
        # must stay residual on equi-keyed SMJ joins as the lineitem
        # self-joins grow — a flip to nested-loop would blow the ratio
        # far past the data factor.
        late = (
            li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
            .filter(
                (F.col("o_orderstatus") == "F")
                & (F.datediff("l_shipdate", "o_orderdate") > 120)
            )
            .select(F.col("l_orderkey").alias("lo"), F.col("l_suppkey").alias("ls"))
            .distinct()
        )
        members = li.select(
            F.col("l_orderkey").alias("mo"), F.col("l_suppkey").alias("ms")
        )
        waiting = late.join(
            members,
            (F.col("lo") == F.col("mo")) & (F.col("ls") != F.col("ms")),
            "left_semi",
        )
        late_b = late.select(F.col("lo").alias("lo2"), F.col("ls").alias("ls2"))
        sole = waiting.join(
            late_b,
            (F.col("lo") == F.col("lo2")) & (F.col("ls") != F.col("ls2")),
            "left_anti",
        )
        return (
            sole.join(su, F.col("ls") == F.col("s_suppkey"))
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
        )

    # warm up JVM + scans once
    q1(lineitem).count()

    lines = [
        "# SCALING — N× data replication probe (local[32], sf0.1 base)",
        "",
        f"Generated by `scripts/scale_probe.py {' '.join(map(str, factors))}`.",
        "Replicas get shifted keys, so join/group cardinality scales with",
        "the data.  A runtime ratio at or below the data ratio means the",
        "plan's work grows linearly (no quadratic candidate blowups, no",
        "broadcast flips to nested loops).",
        "",
        "Probe ↔ catalog query: q1_agg=dtl_q1_pricing_summary,",
        "q21_semi_anti=dtl_q21_waiting_suppliers, minhash_lsh=dedup_minhash_lsh,",
        "dup_windows_alldup=doc_dup_windows, dedup_spans_alldup=doc_dedup_spans,",
        "ngram_dominance=doc_ngram_dominance, kmv_distinct=lineitem_kmv_distinct,",
        "histogram_*=events_value_histogram(+_sketch), tfidf_top_terms=doc_tfidf_top_terms,",
        "semdedup_pairs=dedup_semdedup, domain_quota=doc_domain_quota,",
        "temperature_mix=doc_temperature_mix, vocabulary=doc_vocabulary,",
        "merge_candidates=doc_merge_candidates,",
        "dedup_paragraphs_hotbanner=doc_dedup_paragraphs (hot-fingerprint worst case),",
        "bpe_fit_sampled=pipeline_bpe_tokenize (sampled fit + single-fold",
        "encode — the doc_bpe_encode fold is the probe's encode stage),",
        "nb_classify_sampled / target_mix = classify.nb_fit+nb_apply and",
        "sampling.target_mix_resample (driver rows doc_nb_classify /",
        "lm_perplexity_sampled = classify.lm_fit+lm_perplexity (driver",
        "rows doc_lm_score / pipeline_lm_curate since r13),",
        "epoch_emit = pipeline_epoch_emit (mix → epoch_upsample →",
        "composite-key shuffle_shards, driver row since r13),",
        "pipeline_nb_curate / doc_target_mix since r12;",
        "target_mix_hot = target_mix_resample(precap_quota=) — the",
        "same-seed pre-cap mitigation with asserted kept-row identity),",
        "budget; their DuckDB-replay oracles are already green as unit tests),",
        "psl_domains=doc_url_psl_domains (canonicalize_urls feeds it — the",
        "doc_url_canonicalize / pipeline_domain_cap map stage is probed here too;",
        "canonicalization alone needs only its PLANS.md line: zero Exchange),",
        "doc_apply_merge and pipeline_domain_cap_psl are pure-map / composition",
        "shapes of probes above — their plan evidence is in PLANS.md,",
        "events_funnel*=events_funnel, embed_sim_join=embed_similarity_join,",
        "knn_classify_lsh=embed_knn_classify_lsh, mad_outliers=events_mad_outliers,",
        "shuffle_shards=doc_shuffle_shards, status_cube=orders_status_cube.",
    ]
    for factor in factors:
        lineitem_n = replicate(lineitem, factor, ["l_orderkey"])
        orders_n = replicate(orders, factor, ["o_orderkey", "o_custkey"])
        customer_n = replicate(customer, factor, ["c_custkey"])
        documents_n = replicate(
            documents.withColumn(
                "text",
                F.concat_ws(" ", "text", F.col("doc_id").cast("string")),
            ),
            factor,
            ["doc_id"],
        )
        results = []
        for label, one, many in [
            ("q1_agg", q1(lineitem), q1(lineitem_n)),
            ("q3_join_agg", q3(customer, orders, lineitem), q3(customer_n, orders_n, lineitem_n)),
            (
                "minhash_lsh",
                dedup.minhash_lsh_pairs(documents, n=3, num_hashes=32, bands=16, threshold=0.3),
                dedup.minhash_lsh_pairs(documents_n, n=3, num_hashes=32, bands=16, threshold=0.3),
            ),
            (
                "q21_semi_anti",
                q21(supplier, lineitem, orders),
                q21(
                    replicate(supplier, factor, ["s_suppkey"]),
                    replicate(lineitem, factor, ["l_orderkey", "l_suppkey"]),
                    replicate(orders, factor, ["o_orderkey"]),
                ),
            ),
            (
                # replicas keep IDENTICAL text (only doc_id shifts), so
                # every window is duplicated factor-fold — the worst
                # case for the fingerprint aggregation.  Linear ratio
                # here means cross-doc duplication adds no pairwise
                # blowup (n_docs is a count, not a pair list).
                "dup_windows_alldup",
                text_ops.duplicated_token_windows(documents, window_tokens=16),
                text_ops.duplicated_token_windows(
                    replicate(documents, factor, ["doc_id"]), window_tokens=16
                ),
            ),
            (
                "ngram_dominance",
                text_ops.ngram_dominance(documents, n=2),
                text_ops.ngram_dominance(
                    replicate(documents, factor, ["doc_id"]), n=2
                ),
            ),
            (
                # replicas shift l_partkey too, so distinct cardinality
                # grows with the data; flat-ish time = the sketch's
                # per-reducer work stays bounded at k rows
                "kmv_distinct",
                stats_ops.kmv_distinct(
                    lineitem, "l_partkey", ["l_returnflag"], k=256
                ),
                stats_ops.kmv_distinct(
                    replicate(lineitem, factor, ["l_orderkey", "l_partkey"]),
                    "l_partkey",
                    ["l_returnflag"],
                    k=256,
                ),
            ),
            (
                # exact tier: percentile_disc buffers the whole column
                # in ONE single-group aggregate — the documented bend
                # (the sketch tier below is the 100 TB valve)
                "histogram_exact",
                stats_ops.equi_depth_histogram(
                    events.select("value"), "value", n_buckets=10, exact=True
                ),
                stats_ops.equi_depth_histogram(
                    replicate(events, factor, ["event_id"]).select("value"),
                    "value",
                    n_buckets=10,
                    exact=True,
                ),
            ),
            (
                # sketch tier: t-digest approx_percentile edges merge
                # map-side — memory constant per executor, ratio should
                # stay sub-linear where the exact tier bends
                "histogram_sketch",
                stats_ops.equi_depth_histogram(
                    events.select("value"), "value", n_buckets=10, exact=False
                ),
                stats_ops.equi_depth_histogram(
                    replicate(events, factor, ["event_id"]).select("value"),
                    "value",
                    n_buckets=10,
                    exact=False,
                ),
            ),
            (
                # identical-text replicas: EVERY window is cross-doc
                # duplicated, so the removal cuts ~everything — the
                # worst case for flagged-window volume, island merge,
                # and the splice.  Linear ratio = no pairwise blowup
                # in the removal either.
                "dedup_spans_alldup",
                text_ops.remove_duplicated_spans(documents, window_tokens=16),
                text_ops.remove_duplicated_spans(
                    replicate(documents, factor, ["doc_id"]), window_tokens=16
                ),
            ),
            (
                # no spread (round-7: measured loss at 1× AND 8× —
                # the (doc,term) agg Exchange already redistributes)
                "tfidf_top_terms",
                text_ops.tfidf_top_terms(documents, k=5),
                text_ops.tfidf_top_terms(
                    replicate(documents, factor, ["doc_id"]), k=5
                ),
            ),
            (
                # rotated replicas (distinct geometry): probes the
                # cluster-partitioned pair join as the corpus grows.
                # n_centroids DERIVED (corpus_size/target_cluster_size,
                # the round-8 auto-default) with no count hint — a fixed
                # 16 centroids at 32× measured 229× (within-cluster n_i²
                # is the hazard); the derived count restores ~linear
                # without the caller doing anything
                "semdedup_pairs",
                dedup.semdedup_pairs(emb_base, threshold=0.9),
                dedup.semdedup_pairs(emb_at(factor), threshold=0.9),
            ),
            (
                # doc_id shifts, source values stay: rows-per-domain
                # grow ×factor while the cap stays 15, so output is
                # CONSTANT — flat-ish time proves the rank limit prunes
                # map-side (WindowGroupLimit) instead of sorting each
                # domain's full row set on one reducer.
                "domain_quota",
                sampling.domain_quota(documents, "source", "doc_id", quota=15),
                sampling.domain_quota(
                    replicate(documents, factor, ["doc_id"]),
                    "source",
                    "doc_id",
                    quota=15,
                ),
            ),
            (
                # uniform replication keeps every lang's SHARE fixed, so
                # keep fractions are identical and output grows ×factor;
                # near-linear time = the count agg + broadcast filter
                # shape holds (corpus itself never shuffles).
                "temperature_mix",
                sampling.temperature_resample(
                    documents, "lang", "doc_id", alpha=0.5
                ),
                sampling.temperature_resample(
                    replicate(documents, factor, ["doc_id"]),
                    "lang",
                    "doc_id",
                    alpha=0.5,
                ),
            ),
            (
                # identical text replicated: distinct-token set is
                # constant while token instances grow ×factor — the
                # aggregation's map-side partials absorb the growth and
                # the bounded rank stays TakeOrdered-pruned.
                "vocabulary",
                text_ops.vocabulary(documents, min_count=5, max_size=200),
                text_ops.vocabulary(
                    replicate(documents, factor, ["doc_id"]),
                    min_count=5,
                    max_size=200,
                ),
            ),
            (
                # same replication story one grain up: distinct
                # adjacent-PAIR set is constant while instances grow
                # ×factor — partial pair counts absorb the growth and
                # the merge rank stays TakeOrdered-pruned.
                "merge_candidates",
                text_ops.merge_candidates(documents, min_count=5, top_n=100),
                text_ops.merge_candidates(
                    replicate(documents, factor, ["doc_id"]),
                    min_count=5,
                    top_n=100,
                ),
            ),
            (
                # worst-case paragraph skew: EVERY document leads with
                # the same boilerplate banner, so one fingerprint owns
                # n_docs instances (×factor under replication — the
                # replicas also duplicate each body paragraph
                # factor-fold).  Near-linear ratio = the min(struct)
                # first-occurrence agg combines the hot key map-side;
                # the pre-r10 row_number window funneled all banner
                # instances into ONE task's sort here.
                "dedup_paragraphs_hotbanner",
                text_ops.dedup_paragraphs(_para_docs(documents)),
                text_ops.dedup_paragraphs(
                    _para_docs(replicate(documents, factor, ["doc_id"]))
                ),
            ),
            (
                # distinct hosts grow with the data (host is keyed on
                # doc_id); near-linear ratio = candidate fan-out and the
                # prevailing-rule agg stay at distinct-host grain with a
                # broadcast rules join — no corpus×rules blowup.
                "psl_domains",
                urls_ops.registrable_domains_psl(
                    urls_ops.canonicalize_urls(_url_docs(documents), "url")
                ),
                urls_ops.registrable_domains_psl(
                    urls_ops.canonicalize_urls(
                        _url_docs(replicate(documents, factor, ["doc_id"])), "url"
                    )
                ),
            ),
            (
                # replicated users (distinct ids, same event shapes):
                # output rows scale with users; flat-ish ratio = the
                # chained user-keyed aggs reuse one partitioning and
                # never collect per-user event lists
                "events_funnel",
                _funnel(events),
                _funnel(replicate(events, factor, ["event_id", "user_id"])),
            ),
            (
                "events_funnel_k7",
                _funnel(events, _K7),
                _funnel(replicate(events, factor, ["event_id", "user_id"]), _K7),
            ),
            (
                # cross-corpus join of the corpus against an id-shifted
                # copy: output = identity pairs, linear in the data.
                # planes scale with log2(factor) (2^k more buckets for
                # k more planes) — the docstring's bucket-occupancy
                # rule: FIXED planes at ×N data grow every bucket ×N on
                # BOTH sides, so candidates grow ×N² per bucket.
                "embed_sim_join",
                dedup.embedding_similarity_join(
                    emb_base,
                    emb_base.select(
                        (F.col("vec_id") + 50_000_000).alias("vec_id"),
                        "embedding",
                    ),
                    threshold=0.9,
                    planes=12,
                    dim=64,
                ),
                dedup.embedding_similarity_join(
                    emb_at(factor),
                    emb_at(factor).select(
                        (F.col("vec_id") + 50_000_000).alias("vec_id"),
                        "embedding",
                    ),
                    threshold=0.9,
                    planes=12 + max(1, factor.bit_length() - 1),
                    dim=64,
                ),
            ),
            (
                # kNN labeling, LSH tier (the 100 TB path — the exact
                # tier is a guarded flat broadcast by contract).
                # Rotated replicas, planes scale log2(factor) per the
                # bucket-occupancy rule; votes/window stages add only
                # corpus×k rows on top of the candidate join.
                "knn_classify_lsh",
                similarity.knn_classify(
                    emb_lab, k=10, method="lsh", planes=12, dim=64
                ),
                similarity.knn_classify(
                    emb_lab_at(factor),
                    k=10,
                    method="lsh",
                    planes=12 + max(1, factor.bit_length() - 1),
                    dim=64,
                ),
            ),
            (
                # replicated events (fresh ids, same 5 event types):
                # rows ×N per group — probes the percentile_disc
                # reducer buffering both stat aggs plus the two
                # broadcast join-backs staying linear.
                "mad_outliers",
                stats_ops.mad_outliers(
                    events.select("event_id", "event_type", "value"),
                    "value",
                    ["event_type"],
                    z=3.5,
                ),
                stats_ops.mad_outliers(
                    replicate(events, factor, ["event_id", "user_id"]).select(
                        "event_id", "event_type", "value"
                    ),
                    "value",
                    ["event_type"],
                    z=3.5,
                ),
            ),
            (
                # shards scale WITH the corpus (n_shards ∝ rows — the
                # operator's sizing rule), so per-shard sort volume is
                # constant and the single hash exchange carries the
                # growth; near-linear ratio = no global ordering crept
                # in.
                "shuffle_shards",
                sampling.shuffle_shards(documents, "doc_id", 16, seed="p"),
                sampling.shuffle_shards(
                    replicate(documents, factor, ["doc_id"]),
                    "doc_id",
                    16 * factor,
                    seed="p",
                ),
            ),
            (
                # constant dims, rows ×N: output is FIXED (24 rows), so
                # flat-ish time proves the Expand's ×4 map-side rows are
                # absorbed by partial aggregation before the one
                # exchange.
                "status_cube",
                rollup_ops.dimensional_cube(
                    orders, ["o_orderstatus", "o_orderpriority"], ["o_totalprice"]
                ),
                rollup_ops.dimensional_cube(
                    replicate(orders, factor, ["o_orderkey", "o_custkey"]),
                    ["o_orderstatus", "o_orderpriority"],
                    ["o_totalprice"],
                ),
            ),
        ]:
            t1, n1 = timed(f"{label} 1x", one)
            tn, nn = timed(f"{label} {factor}x", many)
            results.append((label, t1, n1, tn, nn, tn / t1 if t1 else float("inf")))

        lines += [
            "",
            f"| query | 1× time | 1× rows | {factor}× time | {factor}× rows | time ratio (data ×{factor}) |",
            "|---|---|---|---|---|---|",
        ]
        for label, t1, n1, tn, nn, ratio in results:
            lines.append(
                f"| {label} | {t1:.2f}s | {n1:,} | {tn:.2f}s | {nn:,} | {ratio:.1f}× |"
            )

        ann_rows = ann_recall_probe(spark, embeddings, factor)
        ann_rows += sim_join_recall_probe(spark, embeddings, factor)
        ann_rows += knn_label_probe(spark, embeddings, factor)
        lines += [
            "",
            "ANN top-k quality under growth (recall@10 of the bucketed",
            "candidate generators vs the exact cosine baseline over the",
            "same corpus — runtime alone can stay flat while recall",
            "collapses, so both are probed):",
            "",
            "| probe | corpus | time | recall (@10 / match / planted-label) |",
            "|---|---|---|---|",
        ]
        for label, n, dt, recall in ann_rows:
            lines.append(f"| {label} | {n}× | {dt:.2f}s | {recall:.3f} |")
        lines += [
            "",
            "sim_join match-recall reads 63/64 at EVERY factor: the one miss is",
            "a perturbed pair whose noise flips >=2 hyperplane signs at",
            "planes=12 and stays missed — perturbation-determined, not",
            "occupancy-determined.  Flat recall under the +log2(factor) planes",
            "rule is the scale claim; identity copies are excluded from the",
            "truth set (they hash identically and would floor recall at ~0.5).",
        ]

        bpe_rows = bpe_fit_probe(spark, documents, factor)
        lines += [
            "",
            "Sampled BPE fit (the bpe_fit 100 TB valve): the merge table",
            "fits on a deterministic md5-hash sample sized CONSTANT under",
            "corpus growth (fraction ∝ 1/factor), then ONE single-fold",
            "bpe_encode pass tokenizes the full corpus.  Flat-ish fit time",
            "under ×N data = the O(n_merges) scoring passes run at sample",
            "scale (only round 1's sample materialization scans the",
            "corpus); the encode pass is the only corpus-linear stage:",
            "",
            "| probe | data | fit time | merges | encode time | docs encoded |",
            "|---|---|---|---|---|---|",
        ]
        for n, fit_s, n_m, enc_s, nrows in bpe_rows:
            lines.append(
                f"| bpe_fit_sampled | {n}× | {fit_s:.2f}s | {n_m} | "
                f"{enc_s:.2f}s | {nrows:,} |"
            )

        nb_rows = nb_classify_probe(spark, documents, factor)
        lines += [
            "",
            "Sampled NB classifier (fit on a constant-size labeled seed",
            "sample, score the whole crawl): flat-ish fit time under ×N",
            "data; the apply pass — row-local explode → broadcast model",
            "join → one doc-grain agg + id join-back — is the only",
            "corpus-linear stage:",
            "",
            "| probe | data | fit time | model rows | apply time | docs scored |",
            "|---|---|---|---|---|---|",
        ]
        for n, fit_s, n_model, apply_s, n_docs in nb_rows:
            lines.append(
                f"| nb_classify_sampled | {n}× | {fit_s:.2f}s | {n_model} | "
                f"{apply_s:.2f}s | {n_docs:,} |"
            )

        lm_rows = lm_perplexity_probe(spark, documents, factor)
        lines += [
            "",
            "Sampled bigram-LM perplexity scorer (staged r13 row —",
            "CCNet-style quality filter): constant-size md5 fit sample",
            "under ×N data, scoring = pair explode → broadcast bigram +",
            "unigram joins → one doc-grain agg (the nb_classify shape):",
            "",
            "| probe | data | fit time | bigram rows | score time | docs scored |",
            "|---|---|---|---|---|---|",
        ]
        for n, fit_s, n_model, apply_s, n_docs in lm_rows:
            lines.append(
                f"| lm_perplexity_sampled | {n}× | {fit_s:.2f}s | {n_model} | "
                f"{apply_s:.2f}s | {n_docs:,} |"
            )

        mix_rows = target_mix_probe(spark, documents, factor)
        lines += [
            "",
            "Exact target-mixture resample (constant strata, rows ×N):",
            "the count agg absorbs growth map-side, the rank window",
            "carries it in one exchange; kept rows scale ≈×N (within the",
            "floor rounding of K = min floor(n_s/w_s), which can only",
            "round UP under replication)",
            "because the integer K = min floor(n_s/w_s) scales with the",
            "data:",
            "",
            "| probe | data | time | rows kept |",
            "|---|---|---|---|",
        ]
        for n, dt, kept in mix_rows:
            lines.append(f"| target_mix | {n}× | {dt:.2f}s | {kept:,} |")

        emit_rows = epoch_emit_probe(spark, documents, factor)
        lines += [
            "",
            "Emission chain (pipeline_epoch_emit: mix → epoch replication",
            "→ composite-key sharding): upsample adds zero exchanges, the",
            "sharder one hash exchange over exactly the emitted replicas —",
            "near-linear time, emitted rows ≈×N (within the mix's K floor",
            "rounding):",
            "",
            "| probe | data | time | rows emitted |",
            "|---|---|---|---|",
        ]
        for n, dt, emitted in emit_rows:
            lines.append(f"| epoch_emit | {n}× | {dt:.2f}s | {emitted:,} |")

        hot_rows = target_mix_hot_stratum_probe(spark, documents, factor)
        lines += [
            "",
            "Hot-stratum mitigation (one mega stratum at ×N the rows of",
            "any real source): the same-seed `precap_quota` pre-cap",
            "restores the WindowGroupLimit map-side prune ahead of the",
            "mix window's shuffle, and the probe ASSERTS the kept row",
            "count is identical to the un-capped mix (quota ≥ w_s × K",
            "keeps K intact — the prefix-of-same-order argument,",
            "equality-tested at row level in test_operators.py):",
            "",
            "| probe | variant | time | rows kept |",
            "|---|---|---|---|",
        ]
        for label, dt, kept in hot_rows:
            lines.append(
                f"| target_mix_hot (hot={factor}×) | {label} | {dt:.2f}s "
                f"| {kept:,} |"
            )

        lin_rows = lineage_probe(spark, orders, factor, stream_workdir)
        lines += [
            "",
            "Traced-run cost (trace-directory bytes + wall time), full",
            "snapshots vs `snapshot_levels=[\"EXPORT\"]`: sampled mode",
            "writes only the narrow (src_rid, tgt_rid) mappings plus the",
            "fixed-size export, so its bytes grow far slower than full",
            "mode's per-statement table copies:",
            "",
            "| mode | data | time | trace bytes |",
            "|---|---|---|---|",
        ]
        for mode, n, dt, nbytes in lin_rows:
            lines.append(f"| {mode} | {n}× | {dt:.2f}s | {nbytes:,} B |")

        t1, n1, s1, tn, nn, sn = stream_interval_probe(
            spark, events, factor, stream_workdir
        )
        lines += [
            "",
            "Stream-stream interval join (watermarked, append mode; state",
            "metrics from the final StreamingQueryProgress — linear state",
            "rows with bounded per-key memory means the watermark evicts",
            "buffered rows instead of holding both streams forever):",
            "",
            f"| probe | time | output rows | state rows | state memory |",
            "|---|---|---|---|---|",
            f"| interval_join_stream 1× | {t1:.2f}s | {n1:,} | "
            f"{s1.get('numRowsTotal', 0):,} | {s1.get('memoryUsedBytes', 0):,} B |",
            f"| interval_join_stream {factor}× | {tn:.2f}s | {nn:,} | "
            f"{sn.get('numRowsTotal', 0):,} | {sn.get('memoryUsedBytes', 0):,} B |",
        ]

        dedup_rows = stream_dedup_probe(spark, events, factor, stream_workdir)
        lines += [
            "",
            "Streaming dedup state, both tiers (input duplicates every",
            "event 3×; output = distinct keys).  first_seen is exact",
            "forever — state rows grow with DISTINCT KEYS (one boolean",
            "each, per-key bytes flat); dedup-within-watermark bounds",
            "state to the retention horizon (the engine evicts as the",
            "watermark advances past the replayed files' event times):",
            "",
            "| probe | keys | time | output rows | state rows | state memory |",
            "|---|---|---|---|---|---|",
        ]
        for variant, n, dt, nrows, state in dedup_rows:
            lines.append(
                f"| {variant} | {n}× | {dt:.2f}s | {nrows:,} | "
                f"{state.get('numRowsTotal', 0):,} | "
                f"{state.get('memoryUsedBytes', 0):,} B |"
            )
    lines.append("")
    lines += dsir_section(spark, documents)
    lines.append("")
    lines += row_local_tier_section(spark, documents)
    lines.append("")
    lines += bpe_tier_section(spark, documents)
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"), "w") as f:
        f.write("\n".join(lines))
    print("SCALING.md written")


if __name__ == "__main__":
    main()
