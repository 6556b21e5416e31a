"""a08 subquery-dedup proof + interleaved A/B (VERDICT r16 item 3).

Variants (identical results — the Bloom prefilter is semantically
transparent; pinned by the a08 oracle row = the PLAIN join):
  S: current bloom_prejoin — bitmap built as an uncorrelated scalar
     subquery, textually repeated in each of the k probe terms.
  L: r15 explicit form — build_bloom() collect() + literal-array
     probe (with_bloom_hit) + plain join.
  P: plain join, no prefilter (context floor).

Proof: runs with spark.ui.enabled=true and, per timed action, pulls
job/stage/task/input-byte totals from the REST API scoped by job
description. If S's k textual subquery copies did NOT dedupe at
execution, S's input bytes read ≈ fact + (k+1)×dim instead of
fact + 2×dim, and its task total exceeds L's by ~k−1 dim-agg stages.

Usage: SPARK_GRAFT_SF_DIR=... python tools/a08_proof.py [rounds]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from parquet_pipeline_spark import tables
from parquet_pipeline_spark.functions.bloom import (
    bloom_prejoin,
    build_bloom,
    with_bloom_hit,
)


def _sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    # mirror operators/sketches.py::a08_bloom_prejoin exactly
    orders = tables.table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dim = (
        tables.table(spark, sf_dir, "customer")
        .where("c_mktsegment = 'BUILDING' AND c_acctbal > 5000")
        .selectExpr("c_custkey", "c_name")
    )
    return orders, dim


def variant_s(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, dim = _sides(spark, sf_dir)
    return bloom_prejoin(orders, dim, "o_custkey", "c_custkey")


def variant_l(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, dim = _sides(spark, sf_dir)
    bitmap = build_bloom(dim, "c_custkey")
    pre = with_bloom_hit(orders, bitmap, "o_custkey").where("_bloom_hit").drop(
        "_bloom_hit"
    )
    return pre.join(dim, pre["o_custkey"] == dim["c_custkey"], "inner")


def variant_p(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, dim = _sides(spark, sf_dir)
    return orders.join(dim, orders["o_custkey"] == dim["c_custkey"], "inner")


def _rest(app_base: str, path: str):
    with urllib.request.urlopen(app_base + path) as r:
        return json.loads(r.read())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from parquet_pipeline_spark.session import get_spark, warm_up

    spark = get_spark("a08_proof", extra_conf={"spark.ui.enabled": "true"})
    warm_up(spark)
    variants = {"S": variant_s, "L": variant_l, "P": variant_p}

    rows = {
        k: sorted(tuple(r) for r in fn(spark, sf_dir).collect())
        for k, fn in variants.items()
    }
    assert rows["S"] == rows["L"] == rows["P"], "variants disagree!"
    print(f"identity OK ({len(rows['S'])} rows) at {sf_dir}")

    times: dict[str, list[float]] = {k: [] for k in variants}
    order = ["S", "L", "P", "P", "L", "S"]
    for r in range(rounds):
        for k in order:
            spark.sparkContext.setJobDescription(f"a08:{k}:{r}")
            t0 = time.time()
            variants[k](spark, sf_dir).count()
            times[k].append(time.time() - t0)
    spark.sparkContext.setJobDescription(None)

    # REST accounting, scoped by description
    ui = "http://localhost:4040"
    apps = _rest(ui, "/api/v1/applications")
    app_base = f"{ui}/api/v1/applications/{apps[0]['id']}"
    jobs = _rest(app_base, "/jobs?status=succeeded")
    stages = {s["stageId"]: s for s in _rest(app_base, "/stages?status=COMPLETE")}
    acc: dict[str, dict] = {}
    seen_stage: dict[str, set] = {}
    for j in jobs:
        d = j.get("description") or ""
        if not d.startswith("a08:"):
            continue
        k = d.split(":")[1]
        a = acc.setdefault(k, {"jobs": 0, "tasks": 0, "input": 0, "stages": 0})
        ss = seen_stage.setdefault(k, set())
        a["jobs"] += 1
        for sid in j["stageIds"]:
            s = stages.get(sid)
            if s is None or sid in ss:
                continue  # skipped (reused) stages don't appear COMPLETE
            ss.add(sid)
            a["stages"] += 1
            a["tasks"] += s["numTasks"]
            a["input"] += s["inputBytes"]
    n = rounds * 2
    for k in variants:
        ts = sorted(times[k])
        a = acc.get(k, {})
        print(
            f"{k}: median={statistics.median(ts):.3f} min={ts[0]:.3f} "
            f"| per-action avg: jobs={a.get('jobs', 0) / n:.1f} "
            f"stages={a.get('stages', 0) / n:.1f} "
            f"tasks={a.get('tasks', 0) / n:.1f} "
            f"inputMB={a.get('input', 0) / n / 1e6:.1f}"
        )


if __name__ == "__main__":
    main()
