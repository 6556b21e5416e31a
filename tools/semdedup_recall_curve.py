"""Recall-vs-coarse-cells curve for semdedup_pairs_hierarchical.

VERDICT r6 item 4: 84-86% pair recall at 64 coarse cells is one
setting — measure the full trade so a user can pick it. On a
seeded clustered corpus with planted near-duplicate pairs, compare
the two-level operator's pair set against FLAT semdedup_pairs (the
hash-pinned d08 machinery) at coarse_cells in {16, 64, 256}:

  flat_recall   = |hier ∩ flat| / |flat|   (boundary-pair loss from
                                            double quantization)
  planted_recall = fraction of planted near-identical pairs found

Prints one JSON line; paste into BENCH_NOTES.md. The floor asserted
in tests/test_dedup.py (planted recall >= 0.9 at 16 cells) is the
regression guard for this curve.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CLUSTERS = 48
PER_CLUSTER = 80
N_PLANTED = 150
DIM = 32
THRESHOLD = 0.92


def build_corpus(spark):
    import numpy as np

    rng = np.random.default_rng(42)
    # well-separated cluster directions: random orthonormal-ish
    dirs = rng.normal(size=(N_CLUSTERS, DIM))
    dirs /= np.linalg.norm(dirs, axis=1)[:, None]
    rows, planted = [], []
    vid = 0
    firsts = []
    for c in range(N_CLUSTERS):
        for i in range(PER_CLUSTER):
            v = dirs[c] + rng.normal(scale=0.08, size=DIM)
            rows.append((vid, [float(x) for x in v]))
            if i == 0:
                firsts.append(vid)
            vid += 1
    # planted near-identical twins of cluster seeds (round-robin)
    import numpy as np  # noqa: F811

    for j in range(N_PLANTED):
        src = firsts[j % len(firsts)]
        dup = np.array(rows[src][1]) + rng.normal(scale=0.002, size=DIM)
        rows.append((vid, [float(x) for x in dup]))
        planted.append((src, vid))
        vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return emb.localCheckpoint(), planted, vid


def pair_set(df):
    return {(r["keep_id"], r["dup_id"]) for r in df.collect()}


def main() -> None:
    from parquet_pipeline_spark.operators.dedup import (
        semdedup_pairs,
        semdedup_pairs_hierarchical,
    )
    from parquet_pipeline_spark.session import get_spark

    spark = get_spark("semdedup-recall-curve")
    emb, planted, n = build_corpus(spark)
    planted_set = set(planted)

    t0 = time.time()
    flat = pair_set(
        semdedup_pairs(emb, n_centroids=max(n // 64, 8), threshold=THRESHOLD)
    )
    flat_sec = round(time.time() - t0, 2)

    out = {
        "n_vectors": n,
        "threshold": THRESHOLD,
        "flat_pairs": len(flat),
        "flat_sec": flat_sec,
        "flat_planted_recall": round(
            len(flat & planted_set) / len(planted_set), 4
        ),
        "curve": [],
    }
    for cells in (16, 64, 256):
        t0 = time.time()
        hier = pair_set(
            semdedup_pairs_hierarchical(
                emb, coarse_cells=cells, cluster_size=64, threshold=THRESHOLD
            )
        )
        sec = round(time.time() - t0, 2)
        out["curve"].append(
            {
                "coarse_cells": cells,
                "pairs": len(hier),
                "flat_recall": round(len(hier & flat) / len(flat), 4) if flat else None,
                "planted_recall": round(
                    len(hier & planted_set) / len(planted_set), 4
                ),
                "sec": sec,
            }
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
