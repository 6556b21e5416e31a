"""Plan-shape assertions: broadcast hints must only target fixed-size
data. Key-cardinality inputs (the as-of bucket spine, TPC-H supplier)
must NOT carry a forced broadcast hint — at the 100-TB design point a
forced hint OOMs the driver regardless of AQE. We assert on the
*optimized logical plan* string, where Spark renders forced hints as
``strategy=broadcast`` inside the Join node, so the check is
deterministic and independent of AQE's runtime choices.
"""
from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from parquet_pipeline_spark.operators.temporal import asof_join
from parquet_pipeline_spark.operators.advanced import q63_local_supplier_volume
from tests.conftest import SF_DIR


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_spine_not_force_broadcast(spark):
    """The (by-key × bucket) spine grows with distinct keys × time —
    the join must be a plain key join, leaving broadcast to AQE."""
    n_keys = 500
    probes = spark.createDataFrame(
        [(f"k{i}", _ts("2024-01-01T12:00:00"), i) for i in range(n_keys)],
        "sym string, ts timestamp, id int",
    )
    quotes = spark.createDataFrame(
        [(f"k{i}", _ts("2024-01-01T09:00:00"), float(i)) for i in range(n_keys)],
        "sym string, ts timestamp, rate double",
    )
    out = asof_join(probes, quotes, "ts", "rate", by=["sym"])
    plan = _optimized_plan(out)
    assert "strategy=broadcast" not in plan, plan
    # semantics unchanged: every probe gets its key's earlier quote
    got = {r["sym"]: r["rate"] for r in out.collect()}
    assert got["k7"] == 7.0 and len(got) == n_keys


def test_q63_broadcasts_only_fixed_dims(spark, sf_dir):
    """q63 keeps broadcast hints on nation+region (fixed-size dims)
    and exactly those — supplier scales with SF and must not be
    hint-forced."""
    plan = _optimized_plan(q63_local_supplier_volume(spark, sf_dir))
    assert plan.count("strategy=broadcast") == 2, plan
