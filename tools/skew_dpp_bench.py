"""Measured evidence for the two 100-TB claims tested in
tests/test_scale_proofs.py:

1. AQE skew-join: a fact-fact join where one hot key holds ~30% of
   rows, timed with the skew-join rule ON vs OFF (same data, same
   shuffle partition count). ON splits the hot partition across
   tasks; OFF serializes it in one straggler task.
2. Dynamic partition pruning: a date-partitioned events table joined
   to a 2-day calendar dim, DPP ON vs OFF — ON reads only the two
   matching day directories.

Usage: python tools/skew_dpp_bench.py   (prints one JSON line)
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

from parquet_pipeline_spark.session import get_spark
from parquet_pipeline_spark.sources.writers import write_parquet


def _run(df) -> float:
    t0 = time.time()
    df._jdf.queryExecution().executedPlan().execute().count()
    return round(time.time() - t0, 3)


def main() -> None:
    spark = get_spark("skew_dpp_bench")
    sc = spark.conf
    tmp = tempfile.mkdtemp(prefix="skew_dpp_")
    out: dict = {}
    try:
        # ---- skew join: 20M fact rows, hot key = 30% ----
        n = 20_000_000
        a_path = os.path.join(tmp, "fact_a")
        b_path = os.path.join(tmp, "fact_b")
        a = spark.range(n).select(
            F.when(F.col("id") % 10 < 3, F.lit("hot"))
            .otherwise((F.col("id") % 100_000).cast("string"))
            .alias("k"),
            F.col("id").alias("a_val"),
        )
        b = spark.range(100_001).select(
            F.when(F.col("id") == 100_000, F.lit("hot"))
            .otherwise(F.col("id").cast("string"))
            .alias("k"),
            (F.col("id") * 2).alias("b_val"),
        )
        write_parquet(a, a_path)
        write_parquet(b, b_path)
        af, bf = spark.read.parquet(a_path), spark.read.parquet(b_path)
        af.count(), bf.count()  # warm the parquet reader / page cache

        sc.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        sc.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        # local-scale stand-ins for the cluster defaults (256MB/64MB):
        # the hot partition here is ~50MB of shuffle bytes, so the same
        # relative skew that trips the rule at cluster scale trips it here
        sc.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16MB")
        sc.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")

        # a fresh DataFrame per config — a re-used one would replay its
        # already-finalized adaptive plan (and reuse shuffle output)
        def join_df():
            return af.join(bf, "k").select(
                F.sum(F.col("a_val") + F.col("b_val")).alias("s")
            )

        sc.set("spark.sql.adaptive.skewJoin.enabled", "false")
        out["skew_join_aqe_off_s"] = _run(join_df())
        sc.set("spark.sql.adaptive.skewJoin.enabled", "true")
        on = join_df()
        out["skew_join_aqe_on_s"] = _run(on)
        plan = on._jdf.queryExecution().executedPlan().toString()
        out["skew_split_in_plan"] = "skew=true" in plan
        sc.unset("spark.sql.autoBroadcastJoinThreshold")
        sc.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        sc.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        sc.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")

        # ---- DPP: 30-day partitioned events, 2-day dim filter ----
        ev_path = os.path.join(tmp, "events_part")
        ev = spark.range(10_000_000).select(
            F.col("id").alias("event_id"),
            F.date_add(F.lit("2024-01-01"), (F.col("id") % 30).cast("int")).alias(
                "event_date"
            ),
            (F.col("id") % 997).alias("user_id"),
        )
        write_parquet(ev, ev_path, partition_by=["event_date"])
        evf = spark.read.parquet(ev_path)
        evf.count()  # warm
        # DPP needs a *selective predicate* on the dim side — the
        # filter is what makes runtime pruning applicable at all
        dim = spark.createDataFrame(
            [("2024-01-%02d" % d, "a" if d in (3, 4) else "b") for d in range(1, 31)],
            "d string, campaign string",
        ).select(F.to_date("d").alias("event_date"), "campaign")

        def dpp_join():
            return evf.join(
                dim.filter(F.col("campaign") == "a"), "event_date"
            ).agg(F.count(F.lit(1)).alias("n"), F.sum("user_id").alias("s"))

        sc.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
        out["dpp_off_s"] = _run(dpp_join())
        sc.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
        on = dpp_join()
        out["dpp_on_s"] = _run(on)
        plan = on._jdf.queryExecution().executedPlan().toString()
        out["dpp_in_plan"] = "dynamicpruning" in plan.lower()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
