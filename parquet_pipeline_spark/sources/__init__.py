"""Sources & sinks: multi-format ingestion to parquet (SURVEY §2 A4-A15)."""

from parquet_pipeline_spark.sources.cleaning import clean_column_names, clean_columns  # noqa: F401
from parquet_pipeline_spark.sources.readers import (  # noqa: F401
    detect_file_format,
    read_any,
    read_csv,
    read_excel_sheets,
    read_json,
    read_tsv,
)
from parquet_pipeline_spark.sources.writers import write_parquet, append_parquet  # noqa: F401
