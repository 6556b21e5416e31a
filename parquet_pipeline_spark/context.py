"""LLM-context helpers (SURVEY §2 A17-A20).

Small, driver-side utilities that prepare schema/sample context the
way the reference does for its prompts: sample heads (reference:
duckdb_util.py:182, 218-219 LIMIT 10; ingestion LIMIT 5), provenance
tagging for JOIN-mode samples (duckdb_util.py:222), markdown
rendering capped at 20 rows (langgraph_pipeline.py:61-65), and the
DataFrame↔JSON-records codec used for pipeline state
(langgraph_pipeline.py:31-58).

All of these intentionally collect tiny bounded slices (≤20 rows) —
the only places the engine ever pulls data to the driver.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_pipeline_spark.errors import is_error_frame


def sample_head(df: DataFrame, n: int = 10) -> DataFrame:
    """First n rows for LLM context (A17)."""
    return df.limit(n)


def with_provenance(df: DataFrame, tag: str, col: str = "__TABLE__") -> DataFrame:
    """Prepend a provenance column (A18: ``__TABLE__ = "T{i}:{name}"``)."""
    return df.select(F.lit(tag).alias(col), "*")


def to_markdown(df: DataFrame, max_rows: int = 20) -> str:
    """Bounded markdown rendering (A19). Uses pandas' to_markdown
    when tabulate is present; falls back to a plain pipe table."""
    return _pdf_markdown(df.limit(max_rows).toPandas())


def _pdf_markdown(pdf) -> str:
    """Markdown for an already-fetched pandas frame (shared by
    ``to_markdown`` and ``summarize_result`` so the latter renders
    from its one fetch instead of running a second Spark job)."""
    try:
        return pdf.to_markdown(index=False)
    except ImportError:
        header = "| " + " | ".join(map(str, pdf.columns)) + " |"
        sep = "| " + " | ".join("---" for _ in pdf.columns) + " |"
        rows = ["| " + " | ".join(map(str, r)) + " |" for r in pdf.values.tolist()]
        return "\n".join([header, sep, *rows])


def df_to_json_records(df: DataFrame, max_rows: int | None = None) -> str:
    """DataFrame → JSON-records string (A20). The reference ships
    whole results through graph state this way; we only ever use it
    for bounded slices."""
    if max_rows is not None:
        df = df.limit(max_rows)
    return json.dumps([r.asDict(recursive=True) for r in df.collect()], default=str)


def json_records_to_df(spark: SparkSession, payload: str) -> DataFrame:
    """JSON-records string → DataFrame (A20 inverse)."""
    records = json.loads(payload)
    if not records:
        return spark.createDataFrame([], "dummy string").limit(0)
    return spark.createDataFrame(records)


def summarize_result(question: str, df: DataFrame, max_rows: int = 10) -> str:
    """Deterministic result summary (the keyless fallback for the
    reference's LLM summarizer, summary_util.py:10-84): row/column
    counts + a bounded markdown sample, with the reference's
    error-frame phrasing preserved."""
    if is_error_frame(df):
        return "No data found or error occurred"
    # ONE fetch of max_rows+1 serves both the row count and the
    # markdown sample (r16, guide §5: this ran the result query twice
    # — a collect for the count, then to_markdown's own toPandas job)
    pdf = df.limit(max_rows + 1).toPandas()
    n_shown = min(len(pdf), max_rows)
    more = " and more" if len(pdf) > max_rows else ""
    cols = ", ".join(df.columns)
    return (
        f"Question: {question}\n"
        f"Result: {n_shown} row(s){more} with columns [{cols}].\n"
        f"{_pdf_markdown(pdf.head(max_rows))}"
    )
