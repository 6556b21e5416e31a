"""Distributed Bloom-filter join pre-filtering.

The classic big-join optimization Spark applies automatically only
under runtime filtering (spark.sql.optimizer.runtime.bloomFilter.*):
build a Bloom filter over the SMALL side's join keys, probe it on
the BIG side before the shuffle, and let the exact join afterwards
remove the (bounded-rate) false positives. Because a Bloom filter
has NO false negatives, the final result is bit-identical to the
plain join — which is exactly what makes the a08 driver query fully
value-hash-checkable against a plain-SQL oracle.

Scale design (100 TB): the filter build is one map-side-combined
shuffle of k bit positions per dim key collapsing to <= bits/64
longs (8 KiB at the default 2^16 bits); the single driver collect
is that bounded word table, never data rows. The probe is pure
whole-stage-codegen'd long arithmetic on a broadcast literal array —
the fact table sheds non-matching rows BEFORE its join shuffle,
which is where the win lives when the fact side is 1000x the dim.

False-positive rate: (1 - e^(-k*n/m))^k; at the defaults
(k=4, m=65536) a 3k-key dim side sits around 0.3%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_BITS = 1 << 16  # 65536 bits = 1024 longs
BLOOM_K = 4
_WORDS = BLOOM_BITS // 64


def _position(i: int, key: Column) -> Column:
    """Bit position for hash row i: first 8 md5 hex chars of
    'i:key' as a long, mod the filter width."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{i}:"), key.cast("string")).cast("binary")), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return h % BLOOM_BITS


def build_bloom(dim: DataFrame, key: str, k: int = BLOOM_K) -> list[int]:
    """Aggregate the dim side's keys into a Bloom bitmap, returned
    as ``_WORDS`` longs. The only collect is the bounded word table
    (<= 1024 rows), never data rows."""
    kc = F.col(key)
    pos = dim.select(
        F.explode(F.array(*[_position(i, kc) for i in range(k)])).alias("p")
    )
    words = (
        pos.select(
            (F.col("p") / 64).cast("int").alias("w"),
            (F.col("p") % 64).cast("int").alias("bitpos"),
        )
        .groupBy("w")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bitpos)")).alias("word"))
    )
    bitmap = [0] * _WORDS
    for row in words.collect():
        bitmap[row["w"]] = row["word"]
    return bitmap


def with_bloom_hit(
    df: DataFrame,
    bitmap: list[int],
    key: str,
    k: int = BLOOM_K,
    hit_col: str = "_bloom_hit",
) -> DataFrame:
    """Append a boolean membership column: all k bits set.

    The bit test is built as a SQL expression because Spark SQL's
    shiftright accepts a column shift amount (the PySpark function
    wrapper only takes a literal int)."""
    out = df.withColumn("_bloom_arr", F.lit(bitmap))
    for i in range(k):
        out = out.withColumn(f"_bp{i}", _position(i, F.col(key)))
    probe = " AND ".join(
        f"(shiftright(element_at(_bloom_arr, CAST(_bp{i} / 64 AS INT) + 1), "
        f"CAST(_bp{i} % 64 AS INT)) & 1) = 1"
        for i in range(k)
    )
    return out.withColumn(hit_col, F.expr(probe)).drop(
        "_bloom_arr", *[f"_bp{i}" for i in range(k)]
    )


def bloom_prejoin(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
    k: int = BLOOM_K,
) -> DataFrame:
    """Exact fact-to-dim join with the fact side pre-filtered
    through a Bloom filter of the dim keys. Result is identical to
    the plain join (no false negatives; the exact join removes the
    false positives) — only the shuffle volume changes."""
    bitmap = build_bloom(dim, dim_key, k)
    pre = (
        with_bloom_hit(fact, bitmap, fact_key, k)
        .filter(F.col("_bloom_hit"))
        .drop("_bloom_hit")
    )
    return pre.join(dim, pre[fact_key] == dim[dim_key], how)
