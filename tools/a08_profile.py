"""a08_bloom_prejoin stage profile (VERDICT r10 item 2).

a08's bench median crept ~1.0 → ~1.4 s (normalized) across r8→r10
with no code change since the r8 xxhash64 probe rewrite. This probe
splits the operator into its stages and times each separately, plus
the whole query under bench-identical conditions, so the creep can be
attributed to a stage — or to the measurement (a08 is the LAST
suite query, so under the r5–r10 endpoint calibration a mid-run load
burst hit it hardest while the factor under-corrected).

Stages:
  build   — dim scan + bloom aggregate + 1024-word collect
  probe   — fact scan + literal-array bit test + count (no join)
  join    — full bloom_prejoin + groupBy/agg (the registry query)
  plain   — the same join WITHOUT the bloom (what the oracle runs)

Usage: python tools/a08_profile.py [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    from parquet_pipeline_spark.functions.bloom import (
        build_bloom,
        with_bloom_hit,
    )
    from parquet_pipeline_spark.operators.sketches import a08_bloom_prejoin
    from parquet_pipeline_spark.session import get_spark, warm_up

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("a08_profile")
    warm_up(spark)

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderpriority", "o_totalprice"
    )
    dim = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )

    def t_build():
        t0 = time.time()
        build_bloom(dim, "c_custkey")
        return time.time() - t0

    bitmap = build_bloom(dim, "c_custkey")

    def t_probe():
        t0 = time.time()
        (
            with_bloom_hit(orders, bitmap, "o_custkey")
            .filter(F.col("_bloom_hit"))
            .count()
        )
        return time.time() - t0

    def t_join():
        t0 = time.time()
        a08_bloom_prejoin(spark, sf_dir).count()
        return time.time() - t0

    def t_plain():
        t0 = time.time()
        (
            orders.join(dim, orders.o_custkey == dim.c_custkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2))
            .count()
        )
        return time.time() - t0

    stages = {"build": t_build, "probe": t_probe, "join": t_join, "plain": t_plain}
    out = {"sf_dir": sf_dir, "repeats": repeats}
    for name, fn in stages.items():
        runs = sorted(fn() for _ in range(repeats))
        out[name] = {
            "median": round(statistics.median(runs), 3),
            "min": round(runs[0], 3),
            "max": round(runs[-1], 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
