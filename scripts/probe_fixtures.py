"""One-off probe: do the approximate operators achieve exact recall on
the sf0.01 / sf0.001 fixtures?  Decides the oracle strategy for
dedup_simhash / dedup_lsh_keep / similarity_topk_lsh / similarity_topk_ivf.
"""
import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from python_dtl_spark.session import get_spark  # noqa: E402
from python_dtl_spark.operators import dedup, similarity  # noqa: E402

spark = get_spark()

for sf_dir in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
    print("=" * 60, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")

    # --- similarity: exact vs lsh vs ivf on the catalog fixture
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in similarity.cosine_topk(emb, queries, k=10).collect()
    }
    lsh = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in similarity.lsh_bucketed_topk(emb, queries, k=10, dim=64).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in similarity.ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=8).collect()
    }
    print(f"topk: exact={len(exact)} lsh==exact: {lsh == exact} (missing {len(exact - lsh)})")
    print(f"      ivf==exact: {ivf == exact} (missing {len(exact - ivf)})")

    # --- simhash: hamming histogram; are hamming<=0 pairs identical-token-multiset?
    pairs = dedup.simhash_near_pairs(docs, max_hamming=8)
    hist = {r.hamming: r.cnt for r in pairs.groupBy("hamming").agg(F.count("*").alias("cnt")).collect()}
    print(f"simhash hamming histogram (<=8): {dict(sorted(hist.items()))}")
    h0 = {(r.id_a, r.id_b) for r in pairs.filter("hamming = 0").collect()}
    # identical sorted-token-array pairs
    toks = docs.select(
        "doc_id",
        F.array_sort(
            F.filter(F.split(F.lower(F.trim("text")), r"\s+"), lambda x: x != "")
        ).alias("t"),
    )
    same = {
        (r.a, r.b)
        for r in toks.alias("l")
        .join(toks.alias("r"), on=[F.col("l.t") == F.col("r.t"), F.col("l.doc_id") < F.col("r.doc_id")])
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .collect()
    }
    print(f"hamming0 pairs={len(h0)}, identical-multiset pairs={len(same)}, equal: {h0 == same}")

    # --- lsh_keep: bucket-co-occurrence graph vs exact-jaccard>=0.3 graph
    # candidate pairs from the banded buckets (recompute like lsh_dedup_keep)
    sigs = dedup.minhash_signatures(docs, "doc_id", "text", 3, 32)
    band_cols = [
        F.xxhash64(*[F.col(f"mh_{b * 2 + r}") for r in range(2)]).alias(f"band_{b}")
        for b in range(16)
    ]
    banded = sigs.select(F.col("doc_id").alias("__id"), *band_cols)
    buckets = banded.select(
        "__id",
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("bucket")) for b in range(16)])
        ).alias("bb"),
    ).select("__id", "bb.band", "bb.bucket")
    cand = (
        buckets.alias("l")
        .join(buckets.alias("r"), on=["band", "bucket"])
        .filter(F.col("l.__id") < F.col("r.__id"))
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .distinct()
    )
    cand_set = {(r.id_a, r.id_b) for r in cand.collect()}
    exact_pairs = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.3).select("id_a", "id_b").collect()
    }
    print(
        f"lsh_keep: candidate pairs={len(cand_set)}, exact j>=0.3 pairs={len(exact_pairs)}, "
        f"cand==exact: {cand_set == exact_pairs}, spurious={len(cand_set - exact_pairs)}, "
        f"missed={len(exact_pairs - cand_set)}"
    )

spark.stop()
