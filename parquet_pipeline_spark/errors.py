"""Error-as-data convention (SURVEY §2 A48).

The reference converts failed SQL into a single-row DataFrame with
an ``Error`` column that flows through the pipeline instead of
raising (reference: duckdb_util.py:242-243; consumed at
langgraph_pipeline.py:33-35 and summary_util.py:32-33). We keep the
same convention so downstream stages (summaries, serialization)
need no special-casing.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def error_frame(spark: SparkSession, message: str) -> DataFrame:
    """One-row, one-column ``Error`` DataFrame."""
    return spark.createDataFrame([(str(message),)], ["Error"])


def is_error_frame(df: DataFrame) -> bool:
    return df.columns == ["Error"]


# statements the NL→SQL path may execute: reads only. The SQL here is
# MODEL OUTPUT (the reference pipes LLM text straight into
# conn.execute, duckdb_util.py:234-243) — a garbage or hostile
# completion must not be able to DROP/INSERT/ALTER anything. Leading
# comments are stripped before classification so `/* hi */ DROP ...`
# can't smuggle past the check.
_READ_ONLY_HEAD = re.compile(r"^\s*(SELECT|WITH|VALUES|TABLE|EXPLAIN|DESC|DESCRIBE|SHOW)\b", re.I)
_LEADING_COMMENTS = re.compile(r"^(\s*(--[^\n]*\n|/\*.*?\*/))*", re.S)


def run_sql_safe(spark: SparkSession, sql: str) -> DataFrame:
    """The engine's ``execute_duckdb_query`` analog (reference:
    duckdb_util.py:234-243): run SQL against registered temp views;
    on failure return an error frame instead of raising. Refuses
    non-read-only statements (DDL/DML) the same way — generated SQL
    is untrusted input, and error-as-data beats a mutated catalog."""
    head = _LEADING_COMMENTS.sub("", sql or "")
    if not _READ_ONLY_HEAD.match(head):
        return error_frame(
            spark,
            "refused to execute non-read-only statement (generated SQL may "
            f"only SELECT): {sql[:120]!r}",
        )
    try:
        return spark.sql(sql)
    except Exception as e:  # noqa: BLE001 — error-as-data by contract
        return error_frame(spark, str(e))
