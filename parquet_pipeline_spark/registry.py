"""Query registry — the single source of truth for the driver contract.

Every operator we claim from SURVEY.md §2 registers here:
- a named builder ``(spark, sf_dir) -> DataFrame`` (the Spark plan), and
- optionally its DuckDB-oracle ANSI SQL twin (same column aliases!).

``__spark_entry__.queries()`` / ``oracle_sql()`` simply expose these
dicts. Keeping builder + oracle adjacent (one ``register`` call)
keeps aliases in sync — the driver's comparator sorts columns by
name before hashing, so *every* computed column must carry the same
alias on both sides.

Numeric discipline: floating-point aggregates are ROUND()ed on both
sides (2dp for money sums, more for ratios) so accumulation-order
differences between Spark and DuckDB can't flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query builder and (optionally) its oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so its registrations run."""
    from parquet_pipeline_spark.operators import (  # noqa: F401
        relational,
        vectors,
        dedup,
        text,
        temporal,
        sketches,
        embedding,
        quality,
        advanced,
        tpch_extra,
        corpus,
        ingestion,
    )
