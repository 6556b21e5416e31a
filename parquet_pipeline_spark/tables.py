"""Session-scoped base-table handle cache (metadata only).

``spark.read.parquet(path)`` builds a fresh ``InMemoryFileIndex``
(file listing) and re-reads the parquet footer schema on EVERY call,
plus a burst of py4j round-trips — measured ~0.3 s per call on the
bench box even for a path read a millisecond earlier, because
path-based reads never share listing/schema state the way catalog
tables do. The optimization guide (§6 I/O) calls out exactly this:
file-listing metadata should be cached across repeated scans of the
same table (Spark does it for catalog tables via
``spark.sql.hive.filesourcePartitionFileCacheSize``; table formats
carry manifests for the same reason).

This module is that catalog behavior for the bare-path fixture
tables the driver contract reads: it memoizes the ANALYZED DataFrame
handle per (SparkSession, canonical path). Only schema + file-listing
METADATA is reused — every action against the handle still scans the
parquet data files, so each bench/oracle invocation computes from
the inputs (a session catalog, not a result cache).

Scope guard: callers must use this ONLY for read-only corpus inputs
(the ``/root/testdata/sf*`` fixture tables and equivalents). Paths
that are ever rewritten in-process (scratch sinks, persisted ANN
index directories, compaction staging) must keep calling
``spark.read.parquet`` directly — a cached listing of a rewritten
directory would serve stale or deleted file names.
"""

from __future__ import annotations

import os
import threading
from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession

# RLock: cached_view builders may themselves call table()/
# read_parquet_cached (the events normalization does), so the guard
# must be reentrant from the owning thread.
_LOCK = threading.RLock()
_HANDLES: "WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    WeakKeyDictionary()
)


def read_parquet_cached(spark: SparkSession, path: str) -> DataFrame:
    """The memoized twin of ``spark.read.parquet(path)`` for
    read-only inputs. Thread-safe; keyed by the canonical path so
    ``sf_dir`` spelling variants share one handle."""
    key = os.path.realpath(path)
    with _LOCK:
        cache = _HANDLES.setdefault(spark, {})
        df = cache.get(key)
        if df is None:
            df = spark.read.parquet(path)
            cache[key] = df
        return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Fixture-table accessor: ``<sf_dir>/<name>.parquet``."""
    return read_parquet_cached(spark, os.path.join(sf_dir, f"{name}.parquet"))


def cached_view(spark: SparkSession, key: str, builder) -> DataFrame:
    """Memoize a deterministic post-read PROJECTION of a cached
    table (e.g. the events nanos→TIMESTAMP_NTZ normalization) per
    session. Same contract as ``read_parquet_cached``: the memo
    holds an analyzed plan handle, never data, and the key must
    identify a read-only input."""
    with _LOCK:
        cache = _HANDLES.setdefault(spark, {})
        df = cache.get(key)
        if df is None:
            df = builder()
            cache[key] = df
        return df
