"""parquet_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
repo ``QasimGardaizi-AITeam/parquet-pipeline`` (a DuckDB+RAG parquet
pipeline; see SURVEY.md) in idiomatic Spark: DataFrame/SQL plans
optimized by Catalyst, Parquet sources/sinks, a logical-table
catalog, text/vector operators for LLM-data-pipeline workloads
(dedup, similarity search, text analysis), a deterministic NL
planning layer with a pluggable LLM client, and a Structured
Streaming analog for incremental ingestion.

Nothing here is copied from the reference — the reference delegates
all relational execution to DuckDB; we delegate it to Catalyst and
implement the pipeline/vector/text operators Spark-first.
"""

__version__ = "0.1.0"

from parquet_pipeline_spark.session import get_spark  # noqa: F401
from parquet_pipeline_spark.catalog import Catalog, register_tables  # noqa: F401
