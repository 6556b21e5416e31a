"""Scaling probes for the content-family operators whose DRIVER
queries carry fixed id bounds (oracle comparability), and therefore
do not grow with sf in bench.py: d03/d04 dedup, t12 contamination,
e01 embedding, t07 chunking, a01/a05 ANN. Each probe here runs
the underlying operator over the FULL table at each given sf dir,
once cold-ish (first) and once warm; the warm time is reported.

Usage:
    python tools/scale_sweep.py /root/testdata/sf0.1 \
        /root/repo/.scaledata/sf1 [/root/repo/.scaledata/sf5]

Prints one JSON line per sf dir:
    {"sf_dir": ..., "probes": {"d03_full": sec, ...}}

Forcing note: probes materialize through an aggregate over a
computed column (never a bare .count()) so Catalyst cannot satisfy
them from parquet metadata and skip the operator under test.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def probes(spark, sf_dir):
    from parquet_pipeline_spark.operators.dedup import (
        minhash_near_dups,
        simhash_table,
    )
    from parquet_pipeline_spark.operators.embedding import embed_text, hash_embedder
    from parquet_pipeline_spark.operators.text import contamination_hits, greedy_chunk
    from parquet_pipeline_spark.operators.vectors import ann_knn_join

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def d03_full():
        return minhash_near_dups(docs.select("doc_id", "text")).agg(
            F.count(F.lit(1)), F.sum("jac")
        )

    def d04_full():
        # the table path (r10: explode + codegen integer-majority
        # aggregates) — what a full-corpus fingerprint run uses;
        # byte-identical to the Column form (test_dedup pin)
        return simhash_table(docs, "doc_id", "text", out_col="s").agg(
            F.countDistinct("s"), F.sum("s")
        )

    def t12_full():
        bench = docs.filter(F.col("doc_id") < 20).select("doc_id", "text")
        return contamination_hits(docs, bench).agg(
            F.count(F.lit(1)), F.sum("n_shared")
        )

    def e01_full():
        out = embed_text(docs, "text", "doc_id", embedder=hash_embedder(16), dim=16)
        return out.agg(F.sum(F.element_at("embedding", 1)))

    def t07_full():
        grouped = docs.withColumn("g", (F.col("doc_id") % 256).cast("string"))
        out = greedy_chunk(grouped, "g", "doc_id", "text", max_chars=1000)
        return out.agg(F.count(F.lit(1)), F.sum(F.length("chunk_text")))

    def a01_full():
        from parquet_pipeline_spark.operators.vectors import lsh_bucket_topk

        out = lsh_bucket_topk(emb, query_vec_id=0, dim=64, extra_cols=())
        return out.agg(F.count(F.lit(1)), F.sum("score"))

    def a05_full():
        queries = emb.filter(F.col("vec_id") < 20).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
        )
        corpus = emb.filter(F.col("vec_id") >= 20)
        out = ann_knn_join(corpus, queries, dim=64, k=10, n_planes=16, n_bands=8)
        return out.agg(F.count(F.lit(1)), F.sum("score"))

    def d08_full():
        # the documented scale policy: centroids grow with the corpus
        # so per-cluster pairwise work stays ~constant
        from parquet_pipeline_spark.operators.dedup import semdedup_pairs

        n = emb.count()
        out = semdedup_pairs(emb, n_centroids=max(8, n // 64))
        return out.agg(F.count(F.lit(1)), F.sum("cos_sim"))

    def t18_full():
        from parquet_pipeline_spark.operators.corpus import span_dedup

        out = span_dedup(docs)
        return out.agg(F.sum("kept_spans"), F.sum(F.length("clean_text")))

    return {
        "d03_full": d03_full,
        "d04_full": d04_full,
        "t12_full": t12_full,
        "e01_full": e01_full,
        "t07_full": t07_full,
        "a01_full": a01_full,
        "a05_full": a05_full,
        "d08_full": d08_full,
        "t18_full": t18_full,
    }


def main() -> None:
    from parquet_pipeline_spark.session import get_spark, warm_up

    spark = get_spark("scale_sweep")
    warm_up(spark)
    only = os.environ.get("SWEEP_PROBES")
    for sf_dir in sys.argv[1:]:
        out = {}
        for name, build in probes(spark, sf_dir).items():
            if only and name not in only.split(","):
                continue
            best = None
            for _ in range(2):  # warm: report the better of two runs
                t0 = time.time()
                build().collect()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            out[name] = round(best, 3)
            # isolate probes from each other: d03's minhash_near_dups
            # persists its grams projection (by design — shared across
            # its own stages) and never unpersists; at sf5 that cached
            # projection pressured every LATER probe in the session
            # (r10: t12_full read 53 s in-sweep vs 17.3 s solo with the
            # identical broadcast plan). Each probe starts cache-clean.
            spark.catalog.clearCache()
        print(json.dumps({"sf_dir": sf_dir, "probes": out}), flush=True)


if __name__ == "__main__":
    main()
