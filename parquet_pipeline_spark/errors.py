"""Error-as-data convention (SURVEY §2 A48).

The reference converts failed SQL into a single-row DataFrame with
an ``Error`` column that flows through the pipeline instead of
raising (reference: duckdb_util.py:242-243; consumed at
langgraph_pipeline.py:33-35 and summary_util.py:32-33). We keep the
same convention so downstream stages (summaries, serialization)
need no special-casing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def error_frame(spark: SparkSession, message: str) -> DataFrame:
    """One-row, one-column ``Error`` DataFrame."""
    return spark.createDataFrame([(str(message),)], ["Error"])


def is_error_frame(df: DataFrame) -> bool:
    return df.columns == ["Error"]


def run_sql_safe(spark: SparkSession, sql: str) -> DataFrame:
    """The engine's ``execute_duckdb_query`` analog (reference:
    duckdb_util.py:234-243): run SQL against registered temp views;
    on failure return an error frame instead of raising."""
    try:
        return spark.sql(sql)
    except Exception as e:  # noqa: BLE001 — error-as-data by contract
        return error_frame(spark, str(e))
