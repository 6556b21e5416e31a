"""Interleaved A/B for d03's verify tail (VERDICT r16 item 4).

A: current minhash_near_dups — verify join reads the FULL persisted
   grams projection on both sides (broadcast at bench scale; at 100 TB
   AQE picks SMJ and the corpus-wide gram arrays shuffle twice).
B: semi-pruned verify — candidate pairs are persisted (bounded:
   2 longs/pair) and each grams side is left-semi pruned to the ids
   that actually appear in candidates BEFORE the verify join, so the
   big-side rows that cannot match never enter the join (guide §3.2).
   Identical output: the inner verify join applies the same id
   equality afterwards.

Usage: SPARK_GRAFT_SF_DIR=... python tools/d03_ab.py [rounds]
"""

from __future__ import annotations

import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, functions as F

from parquet_pipeline_spark import tables
from parquet_pipeline_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_near_dups,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.table(spark, sf_dir, "documents")
    slice_n = int(os.environ.get("D03_SLICE", "200"))  # d03's slice; 0 = full
    if slice_n:
        docs = docs.filter(F.col("doc_id") < slice_n)
    return docs.select("doc_id", "text")


def variant_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_near_dups(_docs(spark, sf_dir), threshold=0.62)


def variant_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    # copy of minhash_near_dups' structure with the pruned verify tail
    df = _docs(spark, sf_dir)
    id_col, ngram, threshold = "doc_id", 3, 0.62
    from parquet_pipeline_spark.operators.dedup import _ensure_parallelism

    df = _ensure_parallelism(df)
    grams = df.selectExpr(
        id_col,
        f"transform(array_distinct(transform("
        f"sequence(1, greatest(length(text) - {ngram - 1}, 1)), "
        f"i -> substring(text, i, {ngram}))), "
        f"g -> xxhash64(g)) AS gs",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    cands = lsh_candidate_pairs(
        grams, id_col, num_hashes=32, bands=8, bucket_cap=64, grams_col="gs"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    ga = grams.join(
        cands.selectExpr(f"id_a AS {id_col}"), id_col, "left_semi"
    ).selectExpr(f"{id_col} AS id_a", "gs AS gs_a")
    gb = grams.join(
        cands.selectExpr(f"id_b AS {id_col}"), id_col, "left_semi"
    ).selectExpr(f"{id_col} AS id_b", "gs AS gs_b")
    inter = "CAST(size(array_intersect(gs_a, gs_b)) AS DOUBLE)"
    union = f"(CAST(size(gs_a) AS DOUBLE) + CAST(size(gs_b) AS DOUBLE) - {inter})"
    jac_sql = f"CASE WHEN {union} > 0 THEN {inter} / {union} ELSE 0.0D END"
    verified = (
        cands.join(ga, "id_a")
        .join(gb, "id_b")
        .selectExpr("id_a", "id_b", f"({jac_sql}) AS jac")
        .where(f"jac >= CAST({float(threshold)!r} AS DOUBLE)")
    )
    return verified.selectExpr("id_a", "id_b", "round(jac, 6) AS jac")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from parquet_pipeline_spark.session import get_spark, warm_up

    spark = get_spark("d03_ab")
    warm_up(spark)

    if not os.environ.get("D03_SKIP_IDENTITY"):
        a = sorted(tuple(r) for r in variant_a(spark, sf_dir).collect())
        b = sorted(tuple(r) for r in variant_b(spark, sf_dir).collect())
        assert a == b, f"variants disagree: {len(a)} vs {len(b)} rows"
        print(f"identity OK ({len(a)} rows) at {sf_dir}")
        spark.catalog.clearCache()

    variants = {"A": variant_a, "B": variant_b}
    times: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(rounds):
        for k in ("A", "B", "B", "A"):
            spark.sparkContext.setJobDescription(f"d03 variant {k} round {r}")
            t0 = time.time()
            variants[k](spark, sf_dir).count()
            times[k].append(time.time() - t0)
            spark.catalog.clearCache()  # per-plan persists must not leak across runs
    for k in variants:
        ts = sorted(times[k])
        print(
            f"{k}: median={statistics.median(ts):.3f} min={ts[0]:.3f} "
            f"n={len(ts)} all={[round(t, 3) for t in ts]}"
        )


if __name__ == "__main__":
    main()
