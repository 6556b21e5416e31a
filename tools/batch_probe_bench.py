"""Sequential vs batched IVF-ADC probe cost (r12, a17's reason to
exist): ivf_pq_topk pays one probe JOB CHAIN per query (pruned scan →
ADC → refine join → window), so a query batch pays nq × fixed job
overhead; ivf_pq_knn_join runs the whole batch in one plan. This
times both legs on the same persisted index.

Usage: python tools/batch_probe_bench.py [sf_dir] [n_queries]
       (defaults: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1, 20)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parquet_pipeline_spark.operators.vectors import (
    ivf_centroids,
    ivf_pq_index,
    ivf_pq_knn_join,
    ivf_pq_topk,
    pq_train,
)
from parquet_pipeline_spark.scratch import scratch_dir
from parquet_pipeline_spark.session import get_spark, warm_up


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("batch_probe_bench")
    warm_up(spark)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= nq)
    qrows = [
        (r["vec_id"], r["embedding"])
        for r in emb.filter(F.col("vec_id") < nq).collect()
    ]
    cents = ivf_centroids(corpus, k=16)
    books = pq_train(corpus, m=8, k_codes=256, sample=2048)
    path = os.path.join(scratch_dir("batchprobe_"), "idx.parquet")
    t0 = time.time()
    ivf_pq_index(corpus, cents, books, path)
    build_s = round(time.time() - t0, 3)

    out = {
        "sf_dir": sf_dir,
        "n_queries": len(qrows),
        "corpus_rows": corpus.count(),
        "build_sec": build_s,
    }
    # warm both code paths once (plan compilation is not the claim)
    ivf_pq_topk(spark, path, cents, books, corpus, *qrows[0], k=20, nprobe=8).count()
    ivf_pq_knn_join(spark, path, cents, books, corpus, qrows[:1], k=20, nprobe=8).count()

    # The sequential leg is nq × ~2 s of fixed job-chain overhead —
    # at nq=1000 (VERDICT r12 item 4's broadcast-LUT scale point)
    # that's half an hour of known-flat cost, so past SEQ_CAP queries
    # it is SAMPLED and extrapolated (per-query cost is flat in nq by
    # construction: each probe is an independent job chain).
    SEQ_CAP = 50
    seq_rows = qrows[: min(len(qrows), SEQ_CAP)]
    legs = {}
    for _ in range(2):
        t0 = time.time()
        for q_id, qv in seq_rows:
            ivf_pq_topk(
                spark, path, cents, books, corpus, q_id, qv, k=20, nprobe=8
            ).count()
        legs["sequential_sec"] = min(
            legs.get("sequential_sec", float("inf")), round(time.time() - t0, 3)
        )
        t0 = time.time()
        ivf_pq_knn_join(
            spark, path, cents, books, corpus, qrows, k=20, nprobe=8
        ).count()
        legs["batched_sec"] = min(
            legs.get("batched_sec", float("inf")), round(time.time() - t0, 3)
        )
    out.update(legs)
    if len(seq_rows) < len(qrows):
        out["sequential_sampled_n"] = len(seq_rows)
        out["sequential_sec"] = round(
            legs["sequential_sec"] / len(seq_rows) * len(qrows), 3
        )
        out["sequential_extrapolated"] = True
    out["speedup"] = round(out["sequential_sec"] / out["batched_sec"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
