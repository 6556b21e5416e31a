"""Generate larger scale factors from the driver's sf0.1 fixtures.

The driver ships sf{0.001,0.01,0.1} (TESTDATA.md, read-only). The
100-TB story needs measured scaling beyond that, so this tool builds
an sfN-equivalent dataset by REPLICATING sf0.1 k times with
key-space offsets — every foreign key is shifted by the same
replica offset, so join fan-outs, key cardinalities, selectivity
ratios, and skew all match what the driver's generator would
produce at that sf (each replica is a disjoint shard of the key
space; fixed dims region/nation keep their 5/25 rows like real
TPC-H). Deterministic: replica i is a pure column shift of the
source — no RNG.

Usage:
    python tools/gen_scaled_data.py SF_OUT_DIR K
e.g.
    python tools/gen_scaled_data.py /root/repo/.scaledata/sf1 10

Output dirs are git-ignored; bench.py picks them up via
$SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

SRC = "/root/testdata/sf0.1"

# per-table key columns to offset, with the sf0.1 key-space stride.
# Strides are the next power-of-10 above the sf0.1 max key so
# replica key ranges never collide.
OFFSETS = {
    "customer": {"c_custkey": 100_000},
    "supplier": {"s_suppkey": 10_000},
    "part": {"p_partkey": 100_000},
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 100_000},
    "lineitem": {
        "l_orderkey": 1_000_000,
        "l_partkey": 100_000,
        "l_suppkey": 10_000,
    },
    "events": {"event_id": 1_000_000, "user_id": 100_000},
    "documents": {"doc_id": 10_000},
    "embeddings": {"vec_id": 10_000},
}
FIXED = ["region", "nation"]  # real dims don't grow with sf


def replicate(df: DataFrame, offsets: dict[str, int], k: int) -> DataFrame:
    reps = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_rep")
    out = df.select("*", reps)
    for col, stride in offsets.items():
        out = out.withColumn(
            col, (F.col(col) + F.col("_rep").cast("long") * stride).cast(df.schema[col].dataType)
        )
    return out.drop("_rep")


def main() -> None:
    out_dir, k = sys.argv[1], int(sys.argv[2])
    os.makedirs(out_dir, exist_ok=True)
    from parquet_pipeline_spark.session import get_spark

    spark = get_spark("gen_scaled_data")
    for name in FIXED:
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
    for name, offsets in OFFSETS.items():
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        replicate(df, offsets, k).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
        print(f"{name}: x{k}", flush=True)
    print("done:", out_dir)


if __name__ == "__main__":
    main()
