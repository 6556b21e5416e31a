"""Full-corpus probes for the persisted-index shapes registered in
r7/r8 — a09 (IVF k-NN join through an on-disk index), d11
(incremental dedup against a persisted minhash index), d12
(hierarchical SemDeDup), s01/s02 (the streaming sink over real
micro-batches). The DRIVER queries for these carry fixed id bounds
for oracle comparability and so don't grow with sf; these probes run
the real operators over the FULL tables at each sf dir (VERDICT r7
item 5).

Index BUILD and QUERY are timed separately — at 100 TB the build
amortizes across many query batches, so the per-batch number is the
one that has to stay flat.

Usage:
    python tools/persisted_probe.py /root/testdata/sf0.1 \
        /root/repo/.scaledata/sf1 /root/repo/.scaledata/sf5

Prints one JSON line per sf dir:
    {"sf_dir": ..., "probes": {"a09_build": s, "a09_query": s, ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def run_dir(spark, sf_dir: str) -> dict:
    from parquet_pipeline_spark.operators.dedup import (
        banded_minhash,
        incremental_near_dups,
        semdedup_pairs_hierarchical,
    )
    from parquet_pipeline_spark.operators.vectors import (
        ivf_centroids,
        ivf_knn_join,
        write_ivf_index,
    )
    from parquet_pipeline_spark.scratch import scratch_dir
    from parquet_pipeline_spark.streaming.events import (
        streaming_incremental_dedup,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        r = fn()
        out[name] = round(time.time() - t0, 3)
        return r

    # --- a09: IVF k-NN through the persisted index, full corpus ----
    # 64 cells, nprobe=8 (the recall-curve operating point), 20
    # queries per batch — the per-batch retrieval shape.
    corpus = emb.filter(F.col("vec_id") >= 20)
    q_rows = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 20)
        .select("vec_id", "embedding")
        .collect()  # bounded: 20 rows
    ]
    ivf_path = scratch_dir("probe_a09_")
    cents = ivf_centroids(corpus, k=64)
    timed(
        "a09_build",
        lambda: write_ivf_index(corpus.select("vec_id", "embedding"), cents, ivf_path),
    )
    timed(
        "a09_query",
        lambda: ivf_knn_join(spark, ivf_path, cents, q_rows, k=10, nprobe=8)
        .agg(F.count(F.lit(1)), F.sum("score"))
        .collect(),
    )

    # --- d11: incremental dedup vs the persisted minhash index -----
    d_corpus = docs.filter(F.col("doc_id") % 5 != 0).select("doc_id", "text")
    d_batch = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    idx_path = os.path.join(scratch_dir("probe_d11_"), "idx")
    timed(
        "d11_build",
        lambda: banded_minhash(d_corpus, num_hashes=16, bands=4)
        .write.partitionBy("band_id")
        .parquet(idx_path),
    )
    timed(
        "d11_flags",
        lambda: incremental_near_dups(
            d_batch, spark.read.parquet(idx_path), num_hashes=16, bands=4
        )
        .agg(F.count(F.lit(1)), F.sum("is_dup"))
        .collect(),
    )

    # --- d12: hierarchical SemDeDup at the SCALE policy ------------
    # (64 coarse cells, one fine centroid per 64 members — not the
    # driver query's oracle-pinned 16/32)
    timed(
        "d12_pairs",
        lambda: semdedup_pairs_hierarchical(
            emb, coarse_cells=64, cluster_size=64, threshold=0.30
        )
        .agg(F.count(F.lit(1)), F.sum("cos_sim"))
        .collect(),
    )

    # --- s01/s02: the streaming sink over real micro-batches -------
    # batch docs written by SPARK (no driver collect of the corpus),
    # two jsonl files -> two triggers against the d11 index.
    tmp = scratch_dir("probe_s01_")
    src = os.path.join(tmp, "src")
    d_batch.coalesce(2).write.json(src)
    parts = sorted(
        p for p in os.listdir(src) if p.endswith(".json")
    )
    now = time.time()
    for i, p in enumerate(parts):
        os.utime(os.path.join(src, p), (now + i, now + i))

    def run_stream():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        q = streaming_incremental_dedup(
            stream,
            idx_path,
            os.path.join(tmp, "flags"),
            os.path.join(tmp, "ckpt"),
            num_hashes=16,
            bands=4,
            update_index=False,
        )
        if not q.awaitTermination(1200):
            q.stop()
            raise TimeoutError("streaming probe did not finish")
        return spark.read.parquet(os.path.join(tmp, "flags")).count()

    n_flags = timed("s01_stream", run_stream)
    out["s01_flag_rows"] = n_flags

    # --- r8 registrations at full scale (VERDICT r8 item 6) --------
    # v08: MMR re-rank — the bounded driver greedy is O(pool²·k)
    # regardless of corpus; what grows is the distributed top-pool
    # scan, so this probe times the full-corpus path end to end.
    from parquet_pipeline_spark.operators.vectors import mmr_rerank

    q_vec = q_rows[0][1]
    timed(
        "v08_mmr",
        lambda: mmr_rerank(corpus, q_vec, k=10, pool=50, lam=0.75, quantize=6),
    )

    # d13: connected components over the FULL-corpus LSH pair graph —
    # pair generation (banded candidates, hot-bucket capped) + the
    # iterative min-label propagation join rounds.
    from parquet_pipeline_spark.operators.dedup import (
        connected_components,
        lsh_candidate_pairs,
    )

    def d13_full():
        pairs = lsh_candidate_pairs(
            docs.select("doc_id", "text"),
            num_hashes=16,
            bands=4,
            ngram=3,
            bucket_cap=8,
        )
        return (
            connected_components(pairs, "id_a", "id_b", max_iterations=50)
            .agg(F.count(F.lit(1)), F.countDistinct("component"))
            .collect()
        )

    timed("d13_components", d13_full)

    # t24: sequence packing over the full documents table — one
    # exchange on source, applyInPandas greedy per group.
    from parquet_pipeline_spark.operators.text import pack_sequences

    def t24_full():
        toks = docs.select(
            "source",
            "doc_id",
            F.coalesce(
                F.ceil(F.length("text") / 4.0).cast("bigint"), F.lit(0)
            ).alias("toks"),
        )
        return (
            pack_sequences(toks, "source", "doc_id", "toks", budget=256)
            .agg(F.count(F.lit(1)), F.max("seq_id"))
            .collect()
        )

    timed("t24_pack", t24_full)
    return out


def main() -> None:
    from parquet_pipeline_spark.session import get_spark, warm_up

    spark = get_spark("persisted_probe")
    warm_up(spark)
    for sf_dir in sys.argv[1:]:
        out = run_dir(spark, sf_dir)
        print(json.dumps({"sf_dir": sf_dir, "probes": out}), flush=True)


if __name__ == "__main__":
    main()
