

def test_cluster_assign_semantics(spark):
    """cluster_assign: one opaque long cluster id per non-NULL row,
    ids in [0, k); identical vectors land in the same cluster;
    output-column collision guarded."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from python_dtl_spark.operators import similarity

    base = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    out = similarity.cluster_assign(base, n_centroids=4, seed=7)
    rows = out.select("vec_id", "cluster_id").collect()
    assert len(rows) == base.count()
    assert {r.cluster_id for r in rows} <= set(range(4))
    # identical vectors -> identical cluster
    dup = base.filter(F.col("vec_id") < 3).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    out2 = similarity.cluster_assign(
        base.unionByName(dup), n_centroids=4, seed=7
    )
    got = {r.vec_id: r.cluster_id for r in out2.collect()}
    for v in range(3):
        assert got[v] == got[v + 100000]
    with _pytest.raises(ValueError, match="already exists"):
        similarity.cluster_assign(
            base.withColumn("cluster_id", F.lit(1)), n_centroids=4
        )


def test_cluster_balanced_sample_recovers_planted_groups(spark):
    """On a fixture of 8 well-separated groups (25 exact copies of 8
    natural embeddings), k-means with k=8 provably recovers the
    grouping (global optimum: one center per distinct point), so the
    quota-5 balanced sample keeps EXACTLY the md5-rank top-5 of every
    group — label-invariant, replayable against a literal reference."""
    import hashlib

    from pyspark.sql import functions as F

    from python_dtl_spark.operators import similarity

    base = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
    )
    planted = base.select(
        "vec_id",
        "embedding",
        F.explode(F.array(*[F.lit(j) for j in range(25)])).alias("__j"),
    ).select(
        (F.lit(100000) + F.col("vec_id") * 25 + F.col("__j")).alias(
            "vec_id"
        ),
        "embedding",
    )
    kept = similarity.cluster_balanced_sample(
        planted, quota=5, n_centroids=8, seed=7, sample_seed="cb1"
    )
    got = sorted(r.vec_id for r in kept.select("vec_id").collect())
    want = []
    for g in range(8):
        members = [100000 + g * 25 + j for j in range(25)]
        members.sort(
            key=lambda k: (hashlib.md5(f"cb1{k}".encode()).hexdigest(), k)
        )
        want.extend(members[:5])
    assert got == sorted(want)
    # per-cluster counts all exactly the quota
    counts = [
        r["count"]
        for r in kept.groupBy("cluster_id").count().collect()
    ]
    assert sorted(counts) == [5] * 8
