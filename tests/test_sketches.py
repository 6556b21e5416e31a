from pyspark.sql import functions as F

from parquet_pipeline_spark.operators.vectors import (
    _query_vector,
    ivf_centroids,
    ivf_topk,
    topk,
)


def test_approx_distinct_within_rsd(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
        F.countDistinct("l_orderkey").alias("exact"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.06  # 3x rsd


def test_percentile_approx_close_to_exact(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = li.agg(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("ap"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("ex"),
    ).first()
    assert abs(row["ap"] - row["ex"]) / row["ex"] < 0.01


def test_ivf_recall_vs_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") != 0
    )
    qv = _query_vector(spark, sf_dir, vec_id=0)
    exact = [r["vec_id"] for r in topk(emb, qv, k=10).collect()]
    cents = ivf_centroids(emb, k=8)
    approx = [
        r["vec_id"] for r in ivf_topk(emb, cents, qv, k=10, nprobe=4).collect()
    ]
    # probing half the cells must recover a meaningful share of the
    # true top-10 (the synthetic vectors are near-orthogonal — a lax
    # bound keeps the test meaningful without being flaky)
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.3, f"IVF recall too low: {recall}"
    # and with all cells probed it must equal exact
    full = [r["vec_id"] for r in ivf_topk(emb, cents, qv, k=10, nprobe=8).collect()]
    assert full == exact


def test_kmeans_refinement_reduces_inertia_and_preserves_exactness(spark, sf_dir):
    from parquet_pipeline_spark.operators.vectors import (
        ivf_centroids,
        kmeans_inertia,
        kmeans_refine,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") != 0
    )
    init = ivf_centroids(emb, k=8)
    refined = kmeans_refine(emb, init, iterations=2)
    assert kmeans_inertia(emb, refined) <= kmeans_inertia(emb, init) + 1e-9

    # full-probe top-k with refined cells still equals exact top-k
    qv = _query_vector(spark, sf_dir, vec_id=0)
    exact = [r["vec_id"] for r in topk(emb, qv, k=10).collect()]
    full = [r["vec_id"] for r in ivf_topk(emb, refined, qv, k=10, nprobe=8).collect()]
    assert full == exact
