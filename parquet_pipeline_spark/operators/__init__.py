"""Operator modules. Importing a module registers its queries into
``parquet_pipeline_spark.registry``."""
