"""Interleaved A/B for t18_span_dedup (VERDICT r16 item 7, guide §8).

A: current span_dedup — two exchanges BOTH carrying span text
   (window on md5(span), then groupBy(doc_id) reassembly of spans).
B: proxy-shuffle variant — the decision pass shuffles ONLY
   (doc_id, span_idx, md5) fixed-width rows; the dropped-span indexes
   (a few % of spans) aggregate per doc and re-attach to the original
   document rows with a left join (AQE broadcasts the small dropped
   side), and the rewrite is a narrow per-row transform — span text
   never enters ANY exchange.

Identity: output rows compared exactly (both orderings canonicalized).

Usage: SPARK_GRAFT_SF_DIR=... python tools/t18_ab.py [rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from parquet_pipeline_spark import tables
from parquet_pipeline_spark.operators.corpus import span_dedup


def variant_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    return span_dedup(tables.table(spark, sf_dir, "documents"))


def span_dedup_proxy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 15,
) -> DataFrame:
    n = int(span_words)
    # decision pass: md5-per-span proxy rows only (guide §8) — the
    # window exchange ships (id, span_idx, md5), never the span text
    spans = df.selectExpr(
        id_col,
        f"split({text_col}, ' ') AS _words",
        f"CAST(ceil(size(split({text_col}, ' ')) / {n}) AS INT) AS _n",
    ).selectExpr(
        id_col,
        "explode(sequence(0, _n - 1)) AS span_idx",
        "_words",
    ).selectExpr(
        id_col,
        "span_idx",
        f"md5(array_join(slice(_words, span_idx * {n} + 1, {n}), ' ')) AS _h",
    )
    dropped = (
        spans.selectExpr(
            id_col,
            "span_idx",
            f"(row_number() OVER (PARTITION BY _h "
            f"ORDER BY {id_col}, span_idx) = 1) AS kept",
        )
        .where("NOT kept")
        .groupBy(id_col)
        .agg(F.expr("collect_list(span_idx) AS _dropped"))
    )
    docs = df.selectExpr(
        id_col, f"split({text_col}, ' ') AS _words"
    ).selectExpr(
        id_col, "_words", f"CAST(ceil(size(_words) / {n}) AS INT) AS _n"
    ).where("_n IS NOT NULL")
    return docs.join(dropped, id_col, "left").selectExpr(
        id_col,
        "CAST(_n AS BIGINT) AS n_spans",
        "CAST(_n - coalesce(size(_dropped), 0) AS BIGINT) AS kept_spans",
        "array_join(transform("
        "  filter(sequence(0, _n - 1), "
        "         i -> _dropped IS NULL OR NOT array_contains(_dropped, i)), "
        f" i -> array_join(slice(_words, i * {n} + 1, {n}), ' ')), ' ') "
        "AS clean_text",
    )


def variant_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    return span_dedup_proxy(tables.table(spark, sf_dir, "documents"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from parquet_pipeline_spark.session import get_spark, warm_up

    spark = get_spark("t18_ab")
    warm_up(spark)

    a = {r["doc_id"]: tuple(r) for r in variant_a(spark, sf_dir).collect()}
    b = {r["doc_id"]: tuple(r) for r in variant_b(spark, sf_dir).collect()}
    assert a == b, (
        f"variants disagree: {len(a)} vs {len(b)} rows; "
        f"sample diff: {[(k, a.get(k), b.get(k)) for k in list(set(a) ^ set(b) or [k for k in a if a[k] != b.get(k)])[:3]]}"
    )
    print(f"identity OK ({len(a)} rows) at {sf_dir}")

    variants = {"A": variant_a, "B": variant_b}
    times: dict[str, list[float]] = {k: [] for k in variants}
    for r in range(rounds):
        for k in ("A", "B", "B", "A"):
            spark.sparkContext.setJobDescription(f"t18 variant {k} round {r}")
            t0 = time.time()
            variants[k](spark, sf_dir).count()
            times[k].append(time.time() - t0)
    for k in variants:
        ts = sorted(times[k])
        print(
            f"{k}: median={statistics.median(ts):.3f} min={ts[0]:.3f} "
            f"n={len(ts)} all={[round(t, 3) for t in ts]}"
        )


if __name__ == "__main__":
    main()
