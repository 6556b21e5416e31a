"""Logical-table catalog: name → path / schema / row-count.

The reference's data model is "one logical table per parquet file",
with a global catalog ``Dict[logical_name -> {parquet_path,
columns}]`` plus a formatted human-readable string (reference:
duckdb_util.py:372-406) and a richer production catalog with
per-column types, row counts and LLM metadata (reference:
ingestion_pipeline_langgraph.py:529-604).

Here a logical table is a parquet *path* (file or directory — Spark
writes directories of part-files) registered as a Spark temp view.
Schema introspection is free (``spark.read.parquet(p).schema``
reads footers only); row counts use a parquet-metadata-only count
(Spark optimizes ``count()`` on a plain scan to footer metadata).

At 100 TB the catalog stays cheap: it never reads data, only
footers, and registration is lazy — nothing is scanned until a
query runs against a view.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession

#: canonical table set of the driver's synthetic fixtures
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def logical_name(path: str) -> str:
    """Logical table name = file/dir basename minus extension,
    sanitized to a valid SQL identifier.

    Mirrors the reference's naming rule (reference:
    duckdb_util.py:388 ``os.path.splitext(os.path.basename(p))[0]``)
    — but Spark temp-view names must be identifiers, so spaces and
    punctuation become underscores (``loans raw.csv`` → ``loans_raw``;
    the reference never hits this because DuckDB sees only quoted
    paths, not view names).
    """
    base = os.path.basename(path.rstrip("/"))
    name, _ext = os.path.splitext(base)
    import re

    name = re.sub(r"[^\w]+", "_", name.strip()).strip("_").lower()
    return name or "table"


@dataclass
class TableEntry:
    name: str
    path: str
    columns: list[str] = field(default_factory=list)
    dtypes: list[tuple[str, str]] = field(default_factory=list)
    row_count: int | None = None

    def describe(self) -> str:
        """Human-readable one-liner, same shape as the reference's
        ``"Logical Table: X (Columns: a, b, c)"`` string
        (reference: duckdb_util.py:393-394)."""
        return f"Logical Table: {self.name} (Columns: {', '.join(self.columns)})"


class Catalog:
    """Registry of logical tables over parquet paths."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.tables: dict[str, TableEntry] = {}

    # -- registration ------------------------------------------------
    def register_path(
        self, path: str, name: str | None = None, with_count: bool = False
    ) -> TableEntry:
        name = name or logical_name(path)
        df = self.spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        entry = TableEntry(
            name=name,
            path=path,
            columns=list(df.columns),
            dtypes=df.dtypes,
            row_count=df.count() if with_count else None,
        )
        self.tables[name] = entry
        return entry

    def register_dir(
        self, directory: str, names: Iterable[str] | None = None, with_count: bool = False
    ) -> list[TableEntry]:
        """Register every ``*.parquet`` under a directory as its own
        logical table (the reference's glob-discovery, reference:
        config.py:103-109 — but one *table per file*, not one merged
        relation). A table that fails to read (e.g. a parquet type
        the session can't map, like TIMESTAMP(NANOS) without the
        legacy flag) is skipped with a warning — discovery registers
        what it can, error-as-data like the rest of the pipeline."""
        import logging

        entries = []
        if names is None:
            names = sorted(
                logical_name(f)
                for f in os.listdir(directory)
                if f.endswith(".parquet")
            )
        for n in names:
            p = os.path.join(directory, f"{n}.parquet")
            if os.path.exists(p):
                try:
                    entries.append(self.register_path(p, n, with_count=with_count))
                except Exception as e:
                    logging.getLogger(__name__).warning(
                        "register_dir: skipping %s (%s)", p, str(e).split("\n")[0]
                    )
        return entries

    # -- introspection -------------------------------------------------
    def get(self, name: str) -> TableEntry:
        return self.tables[name]

    def df(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def catalog_string(self) -> str:
        """The formatted catalog string fed to planning (reference:
        duckdb_util.py:393-394, 401-404)."""
        return "\n".join(e.describe() for e in self.tables.values())

    def as_dict(self) -> dict[str, dict]:
        return {
            n: {
                "parquet_path": e.path,
                "columns": e.columns,
                "dtypes": e.dtypes,
                "row_count": e.row_count,
            }
            for n, e in self.tables.items()
        }


def register_tables(
    spark: SparkSession, sf_dir: str, names: Iterable[str] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Register the driver's synthetic tables as temp views and
    return them keyed by name. Cheap (footer-only) and idempotent."""
    out: dict[str, DataFrame] = {}
    for n in names:
        path = os.path.join(sf_dir, f"{n}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(n)
            out[n] = df
    return out


def load(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Load specific testdata tables as DataFrames (no view side effects)."""
    return [
        spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet")) for n in names
    ]
