"""Measured evidence for the bucketed co-located fact-join claim
(sources/writers.py:write_bucketed): lineitem ⋈ orders on orderkey
at sf1, plain-parquet shuffle SMJ vs both sides bucketed on the
join key.

Bucketing is the layout answer to the q08/q63/q66/q82/q83 scaling
exponents (0.57-0.69, all shuffle-driven): a fact-fact join that
repeats every day at 100 TB should pay its shuffle ONCE at write
time. This script records the one-time bucketed-write cost, asserts
the bucketed plan is exchange-free on the join key, and times the
join both ways.

Usage: python tools/bucketed_join_bench.py  (prints one JSON line)
Env:   BUCKET_BENCH_SF_DIR (default .scaledata/sf1), BUCKET_BENCH_N=32
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parquet_pipeline_spark.session import get_spark
from parquet_pipeline_spark.sources.writers import write_bucketed

SF_DIR = os.environ.get("BUCKET_BENCH_SF_DIR", ".scaledata/sf1")
N_BUCKETS = int(os.environ.get("BUCKET_BENCH_N", "32"))


def _agg(li, od):
    """The repeated fact-fact shape: join on orderkey, monthly
    revenue rollup (q08's skeleton)."""
    return (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def _time(make_df, runs: int = 3) -> float:
    """make_df is a THUNK returning a freshly-built DataFrame:
    re-executing one DataFrame object would reuse its shuffle files
    across runs (identical RDD lineage skips the map stages), timing
    only the final stage. A fresh plan per run pays the real cost."""
    best = float("inf")
    for _ in range(runs):
        df = make_df()
        t0 = time.time()
        df._jdf.queryExecution().executedPlan().execute().count()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    spark = get_spark("bucketed_join_bench")
    # force the SMJ path on both sides so the comparison isolates the
    # exchange, not join-strategy choice (orders at sf1 would not
    # broadcast anyway under the 10 MB default, but pin it)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_orderdate"
    )

    out = {
        "sf_dir": SF_DIR,
        "n_buckets": N_BUCKETS,
        "lineitem_rows": li.count(),
        "orders_rows": od.count(),
    }

    out["plain_join_sec"] = _time(
        lambda: _agg(
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet"),
            spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
                "o_orderkey", "o_orderdate"
            ),
        )
    )

    t0 = time.time()
    write_bucketed(
        li, "bb_lineitem", ["l_orderkey"], num_buckets=N_BUCKETS, sort_cols=["l_orderkey"]
    )
    write_bucketed(
        od, "bb_orders", ["o_orderkey"], num_buckets=N_BUCKETS, sort_cols=["o_orderkey"]
    )
    out["bucketed_write_sec"] = round(time.time() - t0, 3)

    bli, bod = spark.table("bb_lineitem"), spark.table("bb_orders")
    bucketed = _agg(bli, bod)
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    join_part = plan.split("HashAggregate")[-1]  # below the agg: the join subtree
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in join_part, join_part
    assert "Bucketed: true" in plan, plan
    out["bucketed_plan_exchange_free"] = True

    out["bucketed_join_sec"] = _time(
        lambda: _agg(spark.table("bb_lineitem"), spark.table("bb_orders"))
    )
    out["speedup"] = round(out["plain_join_sec"] / out["bucketed_join_sec"], 2)
    # joins until the write cost amortizes vs the plain path
    saved = out["plain_join_sec"] - out["bucketed_join_sec"]
    out["breakeven_joins"] = round(out["bucketed_write_sec"] / saved, 1) if saved > 0 else None

    for t in ("bb_lineitem", "bb_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
