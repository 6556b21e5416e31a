"""SparkSession factory (singleton, warm-up, Arrow on, AQE on).

Replaces the reference's cached-DuckDB-connection pattern
(reference: duckdb_util.py:21-24, 64-128 — a double-checked-lock
global connection with an atexit close and a warm-up probe). Spark
already gives us a process-wide singleton via
``SparkSession.builder.getOrCreate()``; this module centralizes the
configuration we want everywhere:

- AQE (adaptive query execution) for runtime re-planning, skew-join
  handling and partition coalescing — important at cluster scale.
- Arrow for pandas interop (vectorized Pandas-UDF path).
- shuffle partitions sized to local cores for tests; on a real
  cluster this should be ~2-3x total executor cores (or left to AQE
  with ``spark.sql.adaptive.coalescePartitions.enabled``).
- UTC session timezone so timestamp semantics are stable across
  environments and match the parquet test fixtures.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "parquet_pipeline_spark"


def _default_parallelism() -> str:
    return os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the singleton SparkSession.

    In local mode there is a single JVM; ``spark.driver.memory``
    is the only memory knob that matters and must be set before the
    JVM starts, so we only set it if no session exists yet.
    """
    cpus = _default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None else cpus),
        )
        # zstd everywhere, mirroring the reference's parquet sink
        # (reference: duckdb_util.py:316 COMPRESSION ZSTD).
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
    )
    if master is not None:
        builder = builder.config("spark.master", master)
    else:
        builder = builder.config("spark.master", f"local[{cpus}]")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def warm_up(spark: SparkSession, probe_path: str | None = None) -> bool:
    """Touch the cluster so the first real query isn't cold.

    Mirrors the reference's warm-up probe on its cached connection
    (reference: duckdb_util.py:103-108) — there it avoided a cold
    Azure handshake; here it forces executor spin-up and codegen
    warm-up.
    """
    try:
        if probe_path:
            spark.read.parquet(probe_path).limit(1).count()
        else:
            spark.range(1).count()
        return True
    except Exception:
        return False
