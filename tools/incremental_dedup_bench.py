"""Scale evidence for d10 (incremental cross-snapshot dedup): the
per-batch cost must track the BATCH, not the corpus.

Protocol per scale factor:
  1. one-time: build the banded_minhash index for the corpus and
     persist it partitioned by band_id (the snapshot job);
  2. dedup a fixed-size new batch (500 re-identified corpus docs —
     guaranteed near-dup hits) against the PERSISTED index;
  3. compare with a full-corpus self-dedup (lsh_candidate_pairs) —
     what a pipeline without the index pays every day.

If the design holds, (2) stays ~flat from sf1 to sf5 while (3)
grows with the corpus; at 100 TB the same gap is the difference
between a batch-sized job and a corpus-sized one.

Usage: python tools/incremental_dedup_bench.py [sf_dir ...]
       (default: .scaledata/sf1 .scaledata/sf5; prints one JSON line)
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
    lsh_candidate_pairs,
)
from parquet_pipeline_spark.session import get_spark

BATCH_DOCS = int(os.environ.get("INCR_BENCH_BATCH", "500"))


def main() -> None:
    sf_dirs = sys.argv[1:] or [".scaledata/sf1", ".scaledata/sf5"]
    spark = get_spark("incremental_dedup_bench")
    tmp = tempfile.mkdtemp(prefix="incr_dedup_")
    out: dict = {"batch_docs": BATCH_DOCS, "scales": {}}
    try:
        for sf_dir in sf_dirs:
            docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
            n_corpus = docs.count()
            row: dict = {"corpus_docs": n_corpus}

            idx_path = os.path.join(tmp, os.path.basename(sf_dir) + "_idx")
            t0 = time.time()
            banded_minhash(docs).write.partitionBy("band_id").parquet(idx_path)
            row["index_build_sec"] = round(time.time() - t0, 3)

            batch = (
                docs.orderBy("doc_id")
                .limit(BATCH_DOCS)
                .withColumn("doc_id", F.col("doc_id") + 10_000_000)
            )
            batch = batch.localCheckpoint()  # keep batch prep out of the timing

            best = float("inf")
            for _ in range(2):
                index = spark.read.parquet(idx_path)
                t0 = time.time()
                res = incremental_near_dups(batch, index)
                n_flagged = res.filter("is_dup = 1").count()
                best = min(best, time.time() - t0)
            row["incremental_batch_sec"] = round(best, 3)
            row["batch_flagged"] = n_flagged

            t0 = time.time()
            n_pairs = lsh_candidate_pairs(docs).count()
            row["full_self_dedup_sec"] = round(time.time() - t0, 3)
            row["full_pairs"] = n_pairs
            out["scales"][sf_dir] = row
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
