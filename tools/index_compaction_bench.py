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
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
