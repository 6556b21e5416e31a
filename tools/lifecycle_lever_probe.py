"""r12 scale probes for the two lifecycle deliverables:

1. IVF-PQ append vs rebuild (VERDICT r11 item 2): the index used to
   be rebuilt per ingest batch; ivf_pq_append re-encodes only the
   batch. This measures both paths on the full embeddings corpus —
   95% snapshot, 5% batch (the daily-ingest shape) — so BENCH_NOTES
   can record the cost curve the incremental path buys.

2. Incremental near-dup dedup at the d03 precision lever (VERDICT
   r11 item 6): the (num_hashes, bands) knob measured on the batch
   path in r11 ((32,4) = 2.5x faster at 99.6% doc recall at sf5)
   threads through banded_minhash -> incremental_near_dups; this
   measures the INDEX BUILD + BATCH FLAG legs at (32,8) base vs
   (32,4) precision, plus the doc-level agreement between them, on
   the same 95/5 split.

Usage:
    python tools/lifecycle_lever_probe.py /root/repo/.scaledata/sf1 \
        /root/repo/.scaledata/sf5

Prints one JSON line per sf dir. Probe hygiene per the r10/r11
lessons: spark.catalog.clearCache() before each timed leg, inputs
repartitioned so a 3-partition scaled fixture doesn't serialize the
per-row work (the r11 HOF-probe pitfall).
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
    )
    from parquet_pipeline_spark.operators.vectors import (
        ivf_centroids,
        ivf_pq_append,
        ivf_pq_index,
        pq_train,
    )
    from parquet_pipeline_spark.scratch import scratch_dir

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out: dict[str, float | int] = {}

    def timed(name, fn):
        spark.catalog.clearCache()
        t0 = time.time()
        r = fn()
        out[name] = round(time.time() - t0, 3)
        return r

    # --- 1. IVF-PQ append vs rebuild --------------------------------
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .repartition(cpus)
    )
    snap = emb.filter(F.col("vec_id") % 20 != 0)
    batch = emb.filter(F.col("vec_id") % 20 == 0)
    out["n_corpus"] = snap.count()
    out["n_batch"] = batch.count()

    cents = ivf_centroids(snap, k=64)
    books = pq_train(snap, m=8, k_codes=256, sample=2048)
    base = scratch_dir("probe_ivfpq_")
    inc_path = os.path.join(base, "inc.parquet")
    timed("ivfpq_build_snapshot", lambda: ivf_pq_index(snap, cents, books, inc_path))
    timed(
        "ivfpq_append_batch",
        lambda: ivf_pq_append(spark, inc_path, batch, cents, books),
    )
    re_path = os.path.join(base, "re.parquet")
    timed(
        "ivfpq_rebuild_union",
        lambda: ivf_pq_index(emb, cents, books, re_path),
    )
    out["ivfpq_append_speedup"] = round(
        out["ivfpq_rebuild_union"] / max(out["ivfpq_append_batch"], 1e-9), 2
    )
    n_inc = spark.read.parquet(inc_path).count()
    n_re = spark.read.parquet(re_path).count()
    out["ivfpq_rows_match"] = int(n_inc == n_re)
    out["ivfpq_rows"] = n_inc

    # --- 2. incremental dedup at the precision lever ----------------
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .repartition(cpus)
        .localCheckpoint()  # read+decode source bytes once, not per leg
    )
    d_corpus = docs.filter(F.col("doc_id") % 20 != 0)
    d_batch = docs.filter(F.col("doc_id") % 20 == 0)
    flags_by_bands: dict[int, dict] = {}
    for bands in (8, 4):
        tag = f"b{bands}_h32"
        idx = os.path.join(scratch_dir(f"probe_inc_{tag}_"), "idx")
        timed(
            f"inc_index_build_{tag}",
            lambda b=bands, p=idx: banded_minhash(
                d_corpus, num_hashes=32, bands=b
            )
            .write.partitionBy("band_id")
            .parquet(p),
        )
        flags = timed(
            f"inc_flags_{tag}",
            lambda b=bands, p=idx: {
                r["doc_id"]: r["is_dup"]
                for r in incremental_near_dups(
                    d_batch,
                    spark.read.parquet(p),
                    num_hashes=32,
                    bands=b,
                ).collect()
            },
        )
        flags_by_bands[bands] = flags
        out[f"inc_dups_{tag}"] = sum(flags.values())
    base_dups = {d for d, f in flags_by_bands[8].items() if f}
    prec_dups = {d for d, f in flags_by_bands[4].items() if f}
    out["inc_doc_recall_b4_vs_b8"] = round(
        len(base_dups & prec_dups) / max(len(base_dups), 1), 4
    )
    out["inc_precise_subset_of_base"] = int(prec_dups <= base_dups)
    return out


def main() -> None:
    from parquet_pipeline_spark.session import get_spark, warm_up

    spark = get_spark("lifecycle_lever_probe")
    warm_up(spark)
    for sf_dir in sys.argv[1:] or ["/root/testdata/sf0.1"]:
        res = run_dir(spark, sf_dir)
        print(json.dumps({"sf_dir": sf_dir, "probes": res}), flush=True)


if __name__ == "__main__":
    main()
