"""Throughput of batch ANN retrieval through the persisted IVF index
(ivf_knn_join / a09) vs the exact blocked k-NN join (exact_knn_join /
v07) on the SAME query batch — the measured cost side of the recall
curve in BENCH_NOTES §IVF retrieval quality. The claim under test:
nprobe/k_cells bounds the scanned fraction, so the indexed path's
cost falls with nprobe while exact pays the full corpus scan every
batch.

Usage:
    python tools/ivf_vs_exact_bench.py [sf_dir ...]
      (default: /root/testdata/sf0.1 .scaledata/sf1 .scaledata/sf5)

Prints one JSON line per sf dir. Timing discipline per BENCH LESSON:
every timed run builds a FRESH plan (no DataFrame reuse, no shuffle
file reuse), best-of-2 after a warm run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_QUERIES = 20
K = 10
CELLS = 64


def main() -> None:
    from pyspark.sql import functions as F

    from parquet_pipeline_spark.operators.vectors import (
        exact_knn_join,
        ivf_centroids,
        ivf_knn_join,
        write_ivf_index,
    )
    from parquet_pipeline_spark.session import get_spark

    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/root/repo/.scaledata/sf1",
        "/root/repo/.scaledata/sf5",
    ]
    spark = get_spark("ivf-vs-exact")
    import tempfile

    for sf_dir in dirs:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = [
            (r["vec_id"], [float(x) for x in r["embedding"]])
            for r in emb.orderBy("vec_id").limit(N_QUERIES).collect()
        ]
        corpus = emb.filter(F.col("vec_id") >= queries[-1][0] + 1).select(
            "vec_id", "embedding"
        )
        n = corpus.count()
        cents = ivf_centroids(corpus, k=CELLS)
        # scanned-fraction predictor: the union of the batch's probe
        # sets bounds the partition-pruned read (see BENCH_NOTES
        # §IVF indexed retrieval — this, not wall-clock at test
        # scale, is the quantity that survives a 100-TB corpus)
        from parquet_pipeline_spark.operators.vectors import _probe_cells

        probe_union = {
            nprobe: len(
                set().union(*[set(_probe_cells(cents, q[1], nprobe)) for q in queries])
            )
            for nprobe in (4, 8, 16)
        }
        idx = os.path.join(tempfile.mkdtemp(prefix="ivfbench_"), "idx")
        t0 = time.time()
        write_ivf_index(corpus, cents, idx)
        build_sec = round(time.time() - t0, 2)

        out = {"sf_dir": sf_dir, "corpus": n, "cells": CELLS,
               "queries": N_QUERIES, "k": K, "index_build_sec": build_sec,
               "probe_union_cells": probe_union}

        def timed(build):
            best = float("inf")
            for _ in range(3):  # first run warms; keep best of the rest
                t0 = time.time()
                build().agg(F.sum("score")).collect()
                best = min(best, time.time() - t0)
            return round(best, 3)

        out["exact_sec"] = timed(lambda: exact_knn_join(corpus, queries, k=K))
        for nprobe in (4, 8, 16):
            out[f"ivf_nprobe{nprobe}_sec"] = timed(
                lambda np=nprobe: ivf_knn_join(spark, idx, cents, queries, k=K, nprobe=np)
            )
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
