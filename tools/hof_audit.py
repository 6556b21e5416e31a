"""Interpreted-HOF audit probes (VERDICT r10 item 5).

Catalyst evaluates higher-order-function lambdas INTERPRETED (~0.5 µs
per element evaluation, never codegen'd — the r10 lesson that bought
banded_minhash 9.5×). This tool measures every remaining HOF surface
that touches corpus-scale arrays, plus candidate rewrites where the
r10 stop-rules allow one (order-insensitive integer work only; float
folds and calibration pins stay), so the classification table in
BENCH_NOTES §HOF classification is numbers, not prose.

Each candidate rewrite is EQUALITY-CHECKED against the current
formulation (exceptAll both ways) before its timing means anything.

Usage:
    python tools/hof_audit.py [sf_dir ...]   # default .scaledata/sf5
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def probes(spark, sf_dir):
    from parquet_pipeline_spark.functions import char_ngrams, word_shingles, word_tokens
    from parquet_pipeline_spark.operators.text import t03_langid, t04_quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # -- current formulations ------------------------------------------------
    def t03_current():
        return t03_langid(spark, sf_dir).agg(
            F.count(F.lit(1)), F.sum("stop_ratio")
        )

    def t04_current():
        return t04_quality_score(spark, sf_dir).agg(
            F.count(F.lit(1)), F.sum("quality")
        )

    def tokens_build():
        # word_tokens = split + interpreted F.filter, 1 eval/token —
        # the shared substrate of t03/t04/t05/t08/t10/t22
        return docs.select(word_tokens("text").alias("ws")).agg(
            F.sum(F.size("ws")), F.count(F.lit(1))
        )

    def tokens_build_nofilter():
        # the non-HOF lower bound: split only (keeps empty tokens, so
        # NOT equivalent — this isolates what the filter lambda costs)
        return docs.select(F.split(F.trim("text"), r"\s+").alias("ws")).agg(
            F.sum(F.size("ws")), F.count(F.lit(1))
        )

    def gram_build():
        # char_ngrams (transform substr, 1 eval/gram) + xxhash
        # transform (1 eval/gram) — the d03/d02 projection stage
        return docs.select(
            F.transform(char_ngrams("text", 3), lambda g: F.xxhash64(g)).alias("gs")
        ).agg(F.sum(F.size("gs")), F.count(F.lit(1)))

    def shingle_build():
        # word_shingles(5): n F.get's per shingle inside a transform —
        # the t12 contamination substrate
        return docs.select(word_shingles("text", 5).alias("sh")).agg(
            F.sum(F.size("sh")), F.count(F.lit(1))
        )

    # -- t08-style pair building: transform→explode vs explode→codegen ------
    def t08_pairs_current():
        def bigrams_of(ws):
            return F.transform(
                F.when(
                    F.size(ws) >= 2, F.sequence(F.lit(1), F.size(ws) - 1)
                ).otherwise(F.array().cast("array<int>")),
                lambda i: F.concat_ws(
                    " ", F.element_at(ws, i), F.element_at(ws, i + 1)
                ),
            )

        bigrams = F.element_at(
            F.transform(F.array(word_tokens("text")), bigrams_of), 1
        )
        return (
            docs.select(F.explode(bigrams).alias("bigram"))
            .groupBy("bigram")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.count(F.lit(1)), F.sum("n"))
        )

    def t08_pairs_exploded():
        # candidate rewrite: explode the INDEX sequence (native
        # generator), then concat via codegen'd element_at — no
        # per-element lambda anywhere
        toks = docs.select("doc_id", word_tokens("text").alias("ws")).filter(
            F.size("ws") >= 2
        )
        idx = toks.select(
            "ws", F.explode(F.sequence(F.lit(1), F.size("ws") - 1)).alias("i")
        )
        return (
            idx.select(
                F.concat_ws(
                    " ", F.element_at("ws", F.col("i")), F.element_at("ws", F.col("i") + 1)
                ).alias("bigram")
            )
            .groupBy("bigram")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.count(F.lit(1)), F.sum("n"))
        )

    return {
        "t03_current": t03_current,
        "t04_current": t04_current,
        "tokens_build": tokens_build,
        "tokens_build_nofilter": tokens_build_nofilter,
        "gram_build": gram_build,
        "shingle_build": shingle_build,
        "t08_pairs_current": t08_pairs_current,
        "t08_pairs_exploded": t08_pairs_exploded,
    }


def equality_checks(spark, sf_dir) -> dict[str, bool]:
    """Candidate rewrites must be row-identical to the current form."""
    from parquet_pipeline_spark.functions import word_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def bigrams_of(ws):
        return F.transform(
            F.when(F.size(ws) >= 2, F.sequence(F.lit(1), F.size(ws) - 1)).otherwise(
                F.array().cast("array<int>")
            ),
            lambda i: F.concat_ws(" ", F.element_at(ws, i), F.element_at(ws, i + 1)),
        )

    cur = (
        docs.select(
            F.explode(
                F.element_at(F.transform(F.array(word_tokens("text")), bigrams_of), 1)
            ).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    toks = docs.select(word_tokens("text").alias("ws")).filter(F.size("ws") >= 2)
    new = (
        toks.select(
            "ws", F.explode(F.sequence(F.lit(1), F.size("ws") - 1)).alias("i")
        )
        .select(
            F.concat_ws(
                " ", F.element_at("ws", F.col("i")), F.element_at("ws", F.col("i") + 1)
            ).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ok = cur.exceptAll(new).count() == 0 and new.exceptAll(cur).count() == 0
    return {"t08_pairs_exploded_equal": ok}


def main() -> None:
    from parquet_pipeline_spark.session import get_spark, warm_up

    spark = get_spark("hof_audit")
    warm_up(spark)
    dirs = sys.argv[1:] or ["/root/repo/.scaledata/sf5"]
    for sf_dir in dirs:
        eq = equality_checks(spark, sf_dir)
        out = {"sf_dir": sf_dir, "equality": eq, "probes": {}}
        for name, build in probes(spark, sf_dir).items():
            best = None
            for _ in range(2):  # warm: report the better of two
                spark.catalog.clearCache()
                t0 = time.time()
                build().collect()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            out["probes"][name] = round(best, 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
