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


def _positions_sql(key_sql: str, k: int) -> list[str]:
    """SQL-text twin of ``_positions`` — parses to the identical
    expressions (xxhash64 seeds: ``-1`` is an INT literal exactly
    like ``F.lit(-1)``, so the hashes match byte-for-byte; pinned by
    test_bloom_prejoin_matches_plain_join + the a08 oracle row).
    Kept next to ``_positions`` so the two stay in lockstep."""
    h1 = f"pmod(xxhash64({key_sql}), {BLOOM_BITS})"
    h2 = f"(pmod(xxhash64(-1, {key_sql}), {BLOOM_BITS}) | 1)"
    return [f"pmod({h1} + {i} * {h2}, {BLOOM_BITS})" for i in range(k)]


def _positions(key: Column, k: int) -> list[Column]:
    """k bit positions via Kirsch–Mitzenmaier double hashing:
    pos_i = (h1 + i·h2) mod m from TWO xxhash64 evaluations instead
    of k (r11: the probe was ~4 independent hash chains per row;
    this halves+ the per-row arithmetic — 0.84→0.55 s on the sf0.1
    orders probe — while keeping the asymptotic FP rate, the
    standard result for partitioned Bloom hashing). h2 is forced odd
    so it cycles the full power-of-two bit space. Nothing here needs
    cross-engine hash parity: the a08 oracle is the PLAIN join,
    because the bloom is semantically transparent (build and probe
    share this function, which is the only invariant that matters)."""
    # both hashes reduced mod m BEFORE combining: i·h2 on the raw
    # 64-bit values overflows long, which ANSI mode turns into a job
    # abort; reduced first, h1 + (k-1)·h2 < k·m ≪ 2^63
    h1 = F.pmod(F.xxhash64(key), F.lit(BLOOM_BITS))
    h2 = F.pmod(F.xxhash64(F.lit(-1), key), F.lit(BLOOM_BITS)).bitwiseOR(F.lit(1))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(BLOOM_BITS)) for i in range(k)]


def build_bloom(dim: DataFrame, key: str, k: int = BLOOM_K) -> list[int]:
    """Aggregate the dim side's keys into a Bloom bitmap, returned
    as ``_WORDS`` longs. The only collect is the bounded word table
    (<= 1024 rows), never data rows."""
    kc = F.col(key)
    pos = dim.select(F.explode(F.array(*_positions(kc, k))).alias("p"))
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

    The bitmap enters the plan as one array literal used ONLY inside
    the probe predicate — never projected through withColumn, which
    would copy the 8 KiB array into every row (measured 5-10x
    slower). element_at + getbit stay inside whole-stage codegen.

    The literal is built JVM-side via ONE ``F.expr`` parse, not
    ``F.lit(list)``: lit on a 1024-element Python list constructs a
    1024-child array column through per-element py4j calls (~0.7 s)
    and embedding that Python-side tree in the k probe positions
    costs ~1 s more of driver time PER PLAN BUILD — which the bench
    pays on every fresh-plan run and a real pipeline pays per query.
    The expr parse is ~4 ms and embeds as a cheap JVM reference
    (r11: this was the whole 'a08 creep' residue — pure driver-side
    plan construction, zero executor time)."""
    arr = F.expr("array(" + ",".join(f"{int(w)}L" for w in bitmap) + ")")
    cond = None
    for p in _positions(F.col(key), k):
        word = F.element_at(arr, (p / F.lit(64)).cast("int") + 1)
        bit_ok = F.getbit(word, (p % 64).cast("int")) == 1
        cond = bit_ok if cond is None else (cond & bit_ok)
    return df.withColumn(hit_col, cond)


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
    false positives) — only the shuffle volume changes.

    Only ``inner`` and ``left_semi`` preserve that identity: any
    outer variant must keep unmatched fact rows, which the Bloom
    prefilter drops. Other join types raise."""
    if how not in ("inner", "left_semi", "leftsemi", "semi"):
        raise ValueError(
            "bloom_prejoin preserves join semantics only for inner/"
            f"left_semi joins; got how={how!r} (outer joins must keep "
            "unmatched fact rows that the Bloom prefilter removes)"
        )
    # r16 round 2 (guide §3.2, the runtime-filter shape): the bitmap
    # is built INSIDE the probe plan as an uncorrelated scalar
    # subquery — the same shape Spark's own runtime Bloom filter
    # injects (bloom_filter_agg + might_contain, SPARK-32268) —
    # instead of ``build_bloom``'s separate collect() job. Same
    # aggregation, same bitmap values (holes filled with 0 exactly
    # like the driver-side word loop), but: no py4j collect round
    # trip, no Python-side job boundary (one action runs subquery +
    # probe + join), and the driver never blocks mid-plan-build.
    # The subquery result is evaluated once per action and embedded
    # as a constant in codegen, so the probe predicate is the same
    # literal-array long arithmetic as before (k textual copies of
    # the subquery dedupe via ReuseSubquery). ``build_bloom`` +
    # ``with_bloom_hit`` remain the explicit-bitmap API for callers
    # that genuinely need a materialized filter (the streaming
    # prefilter builds it once per epoch, outside any single plan).
    spark = fact.sparkSession
    arr_sql = (
        f"(SELECT transform(sequence(0, {_WORDS - 1}), "
        "i -> coalesce(m[i], CAST(0 AS BIGINT))) "
        "FROM (SELECT map_from_entries(collect_list(struct(w, word))) AS m "
        "FROM (SELECT CAST(p / 64 AS INT) AS w, "
        "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))) AS word "
        f"FROM (SELECT explode(array({','.join(_positions_sql(dim_key, k))})) AS p "
        "FROM {dim}) GROUP BY w)))"
    )
    cond = " AND ".join(
        f"getbit(element_at({arr_sql}, CAST({p} / 64 AS INT) + 1), "
        f"CAST({p} % 64 AS INT)) = 1"
        for p in _positions_sql(fact_key, k)
    )
    pre = spark.sql("SELECT * FROM {fact} WHERE " + cond, fact=fact, dim=dim)
    return pre.join(dim, pre[fact_key] == dim[dim_key], how)
