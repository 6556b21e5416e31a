from pyspark.sql import functions as F

from parquet_pipeline_spark.functions import cosine_similarity
from parquet_pipeline_spark.operators.vectors import (
    _query_vector,
    lsh_signature,
    topk,
)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_cosine_self_similarity_is_one(spark, sf_dir):
    emb = _emb(spark, sf_dir).limit(20)
    vals = emb.select(
        cosine_similarity(F.col("embedding"), F.col("embedding")).alias("s")
    ).collect()
    for r in vals:
        assert abs(r["s"] - 1.0) < 1e-9


def test_topk_matches_bruteforce_ordering(spark, sf_dir):
    qv = _query_vector(spark, sf_dir, vec_id=0)
    emb = _emb(spark, sf_dir).filter(F.col("vec_id") != 0)
    got = [r["vec_id"] for r in topk(emb, qv, k=5).collect()]
    # brute force on the driver
    import math

    rows = emb.select("vec_id", "embedding").collect()

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    expected = [
        vid
        for vid, _ in sorted(
            ((r["vec_id"], cos([float(x) for x in r["embedding"]], qv)) for r in rows),
            key=lambda t: (-t[1], t[0]),
        )[:5]
    ]
    assert got == expected


def test_lsh_signature_deterministic_and_local(spark, sf_dir):
    emb = _emb(spark, sf_dir).limit(50)
    sig = lsh_signature(F.col("embedding"), dim=64, n_planes=16)
    a = emb.select("vec_id", sig.alias("s")).collect()
    b = emb.select("vec_id", sig.alias("s")).collect()
    assert {r["vec_id"]: r["s"] for r in a} == {r["vec_id"]: r["s"] for r in b}
    # 16-bit signatures
    assert all(0 <= r["s"] < 2**16 for r in a)
