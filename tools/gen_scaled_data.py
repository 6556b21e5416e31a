"""Generate larger scale factors from the driver's sf0.1 fixtures.

The driver ships sf{0.001,0.01,0.1} (TESTDATA.md, read-only). The
100-TB story needs measured scaling beyond that, so this tool builds
an sfN-equivalent dataset by REPLICATING sf0.1 k times with
key-space offsets — every foreign key is shifted by the same
replica offset, so join fan-outs, key cardinalities, selectivity
ratios, and skew all match what the driver's generator would
produce at that sf for RELATIONAL/JOIN workloads (each replica is a
disjoint shard of the key space; fixed dims region/nation keep
their 5/25 rows like real TPC-H). Deterministic: no RNG anywhere.

Content columns are SALTED per replica so dedup/LSH/contamination
and ANN workloads don't see pathological k-fold duplicate structure:
replica i>0 document text gets a replica token inserted between
every word (changes nearly every char/word shingle, so cross-replica
copies are neither exact nor near duplicates; n_chars is recomputed),
and replica i>0 embeddings get a small deterministic sin-based
perturbation keyed on (vec_id, dim). Residual fidelity caveat:
within-replica duplicate structure repeats k times (the same planted
near-dup pairs appear in every replica shard), which is what a real
generator would also produce for a corpus with a constant dup rate.

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


_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _salt_documents(df: DataFrame) -> DataFrame:
    """Replica i>0: per-replica alphabet substitution cipher
    (rotation by ``_rep % 25``; replicas hitting rotation 0 get the
    reversed alphabet). Length-, token-count- and structure-
    PRESERVING — per-doc work in text operators is identical across
    replicas, so scaling exponents measure data volume, not salt
    artifacts — while every char n-gram and word shingle differs
    from replica 0, so cross-replica copies are not near-dups. The
    cipher is bijective, so WITHIN-replica planted near-dup
    structure is preserved exactly. Period 25: at k>25, replicas i
    and i+25 share a cipher and are mutual exact duplicates (a
    realistic cross-shard duplication rate for web-scale corpora;
    documented, not hidden)."""
    rot = F.col("_rep") % 25
    cases = F.when(F.col("_rep") == 0, F.col("text"))
    for r in range(1, 25):
        mapped = _ALPHA[r:] + _ALPHA[:r]
        cases = cases.when(rot == r, F.translate(F.col("text"), _ALPHA, mapped))
    cases = cases.otherwise(F.translate(F.col("text"), _ALPHA, _ALPHA[::-1]))
    return df.withColumn("text", cases)  # length-preserving: n_chars stays valid


def _salt_embeddings(df: DataFrame) -> DataFrame:
    """Replica i>0: deterministic small sin perturbation keyed on the
    (already replica-offset) vec_id and the dimension index, so
    cross-replica vectors are distinct but the overall geometry and
    norm distribution are preserved."""
    perturbed = F.expr(
        "transform(embedding, (x, i) -> cast("
        "x + 0.02 * sin(cast(vec_id as double) * 0.754 + cast(i as double) * 1.37)"
        " as float))"
    )
    return df.withColumn(
        "embedding",
        F.when(F.col("_rep") == 0, F.col("embedding")).otherwise(perturbed),
    )


SALTS = {"documents": _salt_documents, "embeddings": _salt_embeddings}


def replicate(df: DataFrame, offsets: dict[str, int], k: int, salt=None) -> DataFrame:
    reps = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_rep")
    out = df.select("*", reps)
    for col, stride in offsets.items():
        out = out.withColumn(
            col, (F.col(col) + F.col("_rep").cast("long") * stride).cast(df.schema[col].dataType)
        )
    if salt is not None:
        out = salt(out)
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
        replicate(df, offsets, k, salt=SALTS.get(name)).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{name}.parquet")
        print(f"{name}: x{k}", flush=True)
    print("done:", out_dir)


if __name__ == "__main__":
    main()
