"""Measured evidence for compact_partitioned: a growing incremental
index accumulates small part-files (one-plus per band per appended
batch); after N batches a probe scan schedules hundreds of
kilobyte-tasks. This script builds the sf1 minhash index, appends
BATCHES small batches, measures a probe-join scan before and after
compaction, and reports file counts.

Usage: python tools/index_compaction_bench.py  (prints one JSON line)
Env:   IDX_BENCH_SF_DIR (default .scaledata/sf1), IDX_BENCH_BATCHES=20
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parquet_pipeline_spark.operators.dedup import (
    banded_minhash,
    incremental_near_dups,
)
from parquet_pipeline_spark.session import get_spark
from parquet_pipeline_spark.sources.writers import compact_partitioned

SF_DIR = os.environ.get("IDX_BENCH_SF_DIR", ".scaledata/sf1")
BATCHES = int(os.environ.get("IDX_BENCH_BATCHES", "20"))


def _n_files(path: str) -> int:
    return sum(
        1
        for _root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def _probe_time(spark, idx_path: str, batch) -> float:
    best = float("inf")
    for _ in range(2):
        index = spark.read.parquet(idx_path)
        t0 = time.time()
        incremental_near_dups(batch, index).filter("is_dup = 1").count()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark("index_compaction_bench")
    tmp = tempfile.mkdtemp(prefix="idx_compact_")
    idx = os.path.join(tmp, "idx")
    out: dict = {"sf_dir": SF_DIR, "appended_batches": BATCHES}
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )
        banded_minhash(docs).write.partitionBy("band_id").parquet(idx)
        out["snapshot_files"] = _n_files(idx)

        probe = docs.orderBy("doc_id").limit(200).withColumn(
            "doc_id", F.col("doc_id") + 20_000_000
        )
        probe = probe.localCheckpoint()

        # simulate BATCHES daily appends of 200 docs each
        for i in range(BATCHES):
            b = (
                docs.orderBy("doc_id")
                .limit(200)
                .withColumn("doc_id", F.col("doc_id") + (i + 1) * 1_000_000)
            )
            banded_minhash(b).write.mode("append").partitionBy("band_id").parquet(idx)
        out["littered_files"] = _n_files(idx)
        out["littered_probe_sec"] = _probe_time(spark, idx, probe)

        t0 = time.time()
        out["compacted_files"] = compact_partitioned(
            spark, idx, ["band_id"], sort_cols=["band_hash"]
        )
        out["compact_sec"] = round(time.time() - t0, 3)
        out["compacted_probe_sec"] = _probe_time(spark, idx, probe)
        out["probe_speedup"] = round(
            out["littered_probe_sec"] / out["compacted_probe_sec"], 2
        )

        # same pathology + same fix on the IVF-PQ retrieval index
        # (r12: ivf_pq_compact): appends litter the cell partitions,
        # compaction restores one file per cell
        from parquet_pipeline_spark.operators.vectors import (
            ivf_centroids,
            ivf_pq_append,
            ivf_pq_compact,
            ivf_pq_index,
            ivf_pq_topk,
            pq_train,
        )

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        n_emb = emb.count()
        cents = ivf_centroids(emb, k=16)
        books = pq_train(emb, m=8, k_codes=256, sample=2048)
        vidx = os.path.join(tmp, "vidx")
        ivf_pq_index(emb, cents, books, vidx)
        out["ivfpq_snapshot_files"] = _n_files(vidx)
        for i in range(BATCHES):
            b = emb.orderBy("vec_id").limit(200).withColumn(
                "vec_id", F.col("vec_id") + (i + 1) * 1_000_000
            )
            ivf_pq_append(spark, vidx, b, cents, books)
        out["ivfpq_littered_files"] = _n_files(vidx)

        qv = emb.orderBy("vec_id").first()["embedding"]

        def vprobe() -> float:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                ivf_pq_topk(
                    spark, vidx, cents, books, emb, 0, qv, k=20, nprobe=4
                ).count()
                best = min(best, time.time() - t0)
            return round(best, 3)

        out["ivfpq_littered_probe_sec"] = vprobe()
        t0 = time.time()
        out["ivfpq_compacted_files"] = ivf_pq_compact(spark, vidx)
        out["ivfpq_compact_sec"] = round(time.time() - t0, 3)
        out["ivfpq_compacted_probe_sec"] = vprobe()
        out["ivfpq_probe_speedup"] = round(
            out["ivfpq_littered_probe_sec"] / out["ivfpq_compacted_probe_sec"], 2
        )
        out["ivfpq_corpus_rows"] = n_emb

        # r13 skew leg: repartition on the partition columns alone
        # puts each partition VALUE in one task, so a hot value (90%
        # of rows here) makes compaction a single-straggler job.
        # split_per_partition bounds the hot value's rewrite to N
        # parallel tasks; max_records_per_file is held equal on both
        # legs so the delta isolates task parallelism.
        hot = spark.range(2_000_000).select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise((F.col("id") % 16).cast("int"))
            .alias("cell"),
        )
        for split, key in (
            (1, "skew_compact_sec_nosplit"),
            (8, "skew_compact_sec_split8"),
        ):
            sidx = os.path.join(tmp, f"skew{split}")
            hot.write.partitionBy("cell").parquet(sidx)
            t0 = time.time()
            compact_partitioned(
                spark,
                sidx,
                ["cell"],
                split_per_partition=split,
                max_records_per_file=250_000,
            )
            out[key] = round(time.time() - t0, 3)
        out["skew_split_speedup"] = round(
            out["skew_compact_sec_nosplit"] / out["skew_compact_sec_split8"], 2
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
