"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``parquet_pipeline_spark.registry`` — operator
modules register a Spark builder and (where SQL-expressible) its
DuckDB oracle twin with identical column aliases.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parquet_pipeline_spark import registry

registry.load_all()

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Scan → filter → group → multi-aggregate → (driver collects):
    the TPC-H-Q1-shaped pricing summary.
    """
    return registry.QUERIES["q01_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL twins (same aliases). Queries without an
    entry here (hash-based dedup/fingerprints, applyInPandas
    chunker, LSH ANN) get the driver's weaker rows-only check."""
    return dict(registry.ORACLES)
