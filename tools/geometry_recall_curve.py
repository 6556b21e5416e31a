"""Recall-vs-nprobe curves per corpus GEOMETRY (r14 — the data
behind the r13 nprobe resize, VERDICT r13 item 1/next-round 2).

The gate floors assert recall ≥ 0.4 at nprobe=12; the standing
geometry battery (adversarial_index_check.py::recall_floor_geometry)
re-checks that every round at fresh seeds. This tool records WHY
nprobe=12 is the operating point: it sweeps nprobe for both the
plain-IVF probe (ivf_knn_join — the a04 lever) and the composed
IVF-ADC probe (ivf_pq_knn_join — the a15/a16/a17/s04 shape) over the
three corpus families the battery synthesizes, printing mean and MIN
per-query recall@20 against the exact top-20.

Usage: python tools/geometry_recall_curve.py [seed] [n] [dim]
       (defaults 7, 2000, 64)
Prints one JSON line per (family, index kind).
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F


def _load_battery():
    spec = importlib.util.spec_from_file_location(
        "idx_battery", os.path.join(HERE, "tools", "adversarial_index_check.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    from parquet_pipeline_spark.operators.vectors import (
        exact_knn_join,
        ivf_centroids,
        ivf_knn_join,
        ivf_pq_index,
        ivf_pq_knn_join,
        pq_train,
        write_ivf_index,
    )
    from parquet_pipeline_spark.session import get_spark, warm_up

    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    battery = _load_battery()
    spark = get_spark("geometry_recall_curve")
    warm_up(spark)
    spark.sparkContext.setLogLevel("ERROR")

    k, k_cells = 20, 16
    nprobes = [4, 8, 12, 16]
    tmp = tempfile.mkdtemp(prefix="geomcurve_")
    for family in ("clustered", "lowrank", "neariid"):
        sf_dir = os.path.join(tmp, family)
        battery._write_embeddings_fixture(sf_dir, family, seed, n=n, dim=dim)
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        corpus = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < n))
        qrows = [
            (r["vec_id"], [float(x) for x in r["embedding"]])
            for r in emb.filter(F.col("vec_id") < 5).collect()
        ]
        exact_ids: dict[int, set] = {}
        for r in exact_knn_join(corpus, qrows, k=k).collect():
            exact_ids.setdefault(r["q_id"], set()).add(r["vec_id"])

        cents = ivf_centroids(corpus, k=k_cells)
        ivf_idx = os.path.join(sf_dir, "ivf.parquet")
        write_ivf_index(corpus, cents, ivf_idx)
        books = pq_train(corpus, m=8, k_codes=256, sample=2048)
        ivfpq_idx = os.path.join(sf_dir, "ivfpq.parquet")
        ivf_pq_index(corpus, cents, books, ivfpq_idx)

        for kind in ("ivf", "ivf_pq"):
            curve = {}
            for nprobe in nprobes:
                if kind == "ivf":
                    res = ivf_knn_join(
                        spark, ivf_idx, cents, qrows, k=k, nprobe=nprobe
                    )
                else:
                    res = ivf_pq_knn_join(
                        spark, ivfpq_idx, cents, books, corpus, qrows,
                        k=k, nprobe=nprobe,
                    )
                got: dict[int, set] = {}
                for r in res.collect():  # bounded: nq × k
                    got.setdefault(r["q_id"], set()).add(r["vec_id"])
                recalls = [
                    len(got.get(q, set()) & want) / len(want)
                    for q, want in exact_ids.items()
                ]
                curve[f"nprobe={nprobe}"] = {
                    "mean": round(sum(recalls) / len(recalls), 3),
                    "min": round(min(recalls), 3),
                }
            print(
                json.dumps(
                    {"family": family, "seed": seed, "kind": kind, "recall_at_20": curve}
                )
            )


if __name__ == "__main__":
    main()
