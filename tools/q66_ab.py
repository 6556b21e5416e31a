"""Interleaved A/B/C for q66_waiting_supplier (VERDICT r16 item 1).

Variants (identical results, pinned by the q66 oracle row):
  A: r16 single-shuffle collect_list(struct) + order-insensitive HOFs
     (ObjectHashAggregate, 2 data exchanges)
  B: r15 two-level codegen HashAggregate
     (groupBy(l_orderkey, l_suppkey) -> groupBy(l_orderkey), 3 exchanges)
  C: repartition('l_orderkey') + two-level codegen HashAggregate —
     HashPartitioning(l_orderkey) satisfies ClusteredDistribution for
     BOTH aggregations (subset rule), so the pair agg and the order agg
     run exchange-free behind ONE shuffle: B's codegen without B's
     second exchange.

Timing: count() per run (bench methodology) in interleaved rotation
A,B,C,C,B,A,... so box drift cancels; reports per-variant median/min.

Usage: SPARK_GRAFT_SF_DIR=... python tools/q66_ab.py [rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from parquet_pipeline_spark import tables


def _flagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tables.table(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        tables.table(spark, sf_dir, "orders")
        .where("o_orderstatus = 'F'")
        .selectExpr("o_orderkey", "o_orderdate")
    )
    return li.join(orders, F.expr("l_orderkey = o_orderkey")).selectExpr(
        "l_orderkey",
        "l_suppkey",
        "(l_shipdate > o_orderdate + INTERVAL 60 DAYS) AS is_late",
    )


def _tail(spark: SparkSession, sf_dir: str, qual: DataFrame) -> DataFrame:
    supp = tables.table(spark, sf_dir, "supplier").selectExpr("s_suppkey", "s_name")
    return (
        qual.join(supp, F.expr("l_suppkey = s_suppkey"))
        .groupBy("s_name")
        .agg(F.expr("CAST(sum(n_late_rows) AS BIGINT) AS numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


def variant_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_order = (
        _flagged(spark, sf_dir)
        .groupBy("l_orderkey")
        .agg(F.expr("collect_list(struct(l_suppkey, is_late)) AS _rows"))
        .selectExpr(
            "l_orderkey",
            "size(array_distinct(transform(_rows, r -> r.l_suppkey))) AS n_supp",
            "size(array_distinct(transform(filter(_rows, r -> r.is_late), "
            "r -> r.l_suppkey))) AS n_late_supp",
            "array_max(transform(filter(_rows, r -> r.is_late), r -> r.l_suppkey)) "
            "AS l_suppkey",
            "CAST(size(filter(_rows, r -> r.is_late)) AS BIGINT) AS n_late_rows",
        )
    )
    qual = per_order.where("n_supp >= 2 AND n_late_supp = 1").selectExpr(
        "l_suppkey", "n_late_rows"
    )
    return _tail(spark, sf_dir, qual)


def _two_level(flagged: DataFrame) -> DataFrame:
    per_os = flagged.groupBy("l_orderkey", "l_suppkey").agg(
        F.expr("sum(CASE WHEN is_late THEN 1 ELSE 0 END) AS late_rows")
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.expr("count(1) AS n_supp"),
        F.expr("sum(CAST(late_rows > 0 AS INT)) AS n_late_supp"),
        F.expr("max(CASE WHEN late_rows > 0 THEN l_suppkey END) AS l_suppkey"),
        F.expr("sum(late_rows) AS n_late_rows"),
    )
    return per_order.where("n_supp >= 2 AND n_late_supp = 1").selectExpr(
        "l_suppkey", "CAST(n_late_rows AS BIGINT) AS n_late_rows"
    )


def variant_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _tail(spark, sf_dir, _two_level(_flagged(spark, sf_dir)))


def variant_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _tail(
        spark, sf_dir, _two_level(_flagged(spark, sf_dir).repartition("l_orderkey"))
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from parquet_pipeline_spark.session import get_spark, warm_up

    spark = get_spark("q66_ab")
    warm_up(spark)
    variants = {"A": variant_a, "B": variant_b, "C": variant_c}

    # result-identity check first (cheap, and fails loudly)
    rows = {k: [tuple(r) for r in fn(spark, sf_dir).collect()] for k, fn in variants.items()}
    assert rows["A"] == rows["B"] == rows["C"], "variants disagree!"
    print(f"identity OK ({len(rows['A'])} rows) at {sf_dir}")

    times: dict[str, list[float]] = {k: [] for k in variants}
    order = ["A", "B", "C", "C", "B", "A"]
    for r in range(rounds):
        for k in order:
            spark.sparkContext.setJobDescription(f"q66 variant {k} round {r}")
            t0 = time.time()
            variants[k](spark, sf_dir).count()
            times[k].append(time.time() - t0)
    for k in variants:
        ts = sorted(times[k])
        print(
            f"{k}: median={statistics.median(ts):.3f} min={ts[0]:.3f} "
            f"n={len(ts)} all={[round(t, 3) for t in ts]}"
        )


if __name__ == "__main__":
    main()
