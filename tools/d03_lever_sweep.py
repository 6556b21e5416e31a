"""d03 banding-precision lever sweep (VERDICT r10 item 3).

BENCH_NOTES named rows-per-band precision "the scale lever for
100 TB" — d03's remaining sf5 cost is exact-verify volume on a ~12×
band false-positive ratio. This sweep turns that prose into a
measured curve: for each (bands, num_hashes, sig_prefilter) config it
reports candidate volume, post-prefilter volume, verified output,
wall time, and recall against the base config's verified pairs
(exact verify ⇒ precision is 1.0 for every config, so recall is the
only quality axis).

Usage:
    python tools/d03_lever_sweep.py /root/repo/.scaledata/sf5

Prints one JSON line per config. Probe isolation per the r10 lesson:
clearCache before every timed run (cache leakage across probes faked
a t12 regression in the r10 sweep).

Config notes:
- r = num_hashes/bands is the PRECISION knob: P(candidate | j) =
  1-(1-j^r)^bands. Base (32,8) accepts ~0.72 at j=0.62 but ~1.6e-3
  at j=0.2; (32,4) (r=8) cuts junk candidates ~50× at the cost of
  threshold-marginal recall (~0.37 at 0.62, ~0.83 at 0.8).
- (64,16) keeps r=4 (same per-band precision as base) and doubles
  the bands: recall ~0.92 at the threshold for 2× signature cost.
- r=2 configs are EXCLUDED by design: P = 1-(1-j²)^16 ≈ 0.15 even
  at j=0.1, which is ~5e9 candidates on 250k docs — a scale killer,
  recorded here so nobody re-tries it.
- sig_prefilter estimates Jaccard from matching signature positions
  (already-computed integers, codegen'd — see minhash_near_dups)
  and skips the exact verify below the cutoff.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

CONFIGS = [
    # name, bands, num_hashes, sig_prefilter
    ("base_b8_h32", 8, 32, None),
    ("pre40_b8_h32", 8, 32, 0.40),
    ("pre50_b8_h32", 8, 32, 0.50),
    ("prec_b4_h32", 4, 32, None),
    ("prec_b4_h32_pre40", 4, 32, 0.40),
    ("recall_b16_h64", 16, 64, None),
    ("recall_b16_h64_pre40", 16, 64, 0.40),
]

THRESHOLD = 0.62


def main() -> None:
    from parquet_pipeline_spark.functions import char_ngrams
    from parquet_pipeline_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_near_dups,
        minhash_sig_table,
    )
    from parquet_pipeline_spark.session import get_spark, warm_up

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaledata/sf5"
    spark = get_spark("d03_lever_sweep")
    warm_up(spark)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    )
    n_docs = docs.count()

    base_pairs = None
    for name, bands, num_hashes, pre in CONFIGS:
        spark.catalog.clearCache()
        # timed leg: the full operator, fresh plan
        t0 = time.time()
        out = minhash_near_dups(
            docs,
            threshold=THRESHOLD,
            num_hashes=num_hashes,
            bands=bands,
            sig_prefilter=pre,
        )
        n_verified = out.count()
        wall = round(time.time() - t0, 2)

        # diagnostic legs (untimed): candidate volume and, for
        # prefilter configs, the post-prefilter volume — rebuilt from
        # the same public pieces the operator composes
        spark.catalog.clearCache()
        grams = docs.select(
            "doc_id",
            F.transform(char_ngrams("text", 3), lambda g: F.xxhash64(g)).alias("gs"),
        ).persist()
        sigs = minhash_sig_table(
            grams, "doc_id", num_hashes=num_hashes, grams_col="gs"
        ).persist()
        cands = lsh_candidate_pairs(
            grams, "doc_id", num_hashes=num_hashes, bands=bands,
            grams_col="gs", sigs=sigs,
        ).persist()
        n_cands = cands.count()
        n_after_pre = n_cands
        if pre is not None:
            import math

            sa = sigs.select(
                F.col("doc_id").alias("id_a"),
                *[F.col(f"_h{i}").alias(f"_ha{i}") for i in range(num_hashes)],
            )
            sb = sigs.select(
                F.col("doc_id").alias("id_b"),
                *[F.col(f"_h{i}").alias(f"_hb{i}") for i in range(num_hashes)],
            )
            matches = sum(
                F.when(F.col(f"_ha{i}").eqNullSafe(F.col(f"_hb{i}")), 1).otherwise(0)
                for i in range(num_hashes)
            )
            n_after_pre = (
                cands.join(sa, "id_a")
                .join(sb, "id_b")
                .filter(matches >= F.lit(int(math.ceil(pre * num_hashes))))
                .count()
            )

        # recall vs the base config, on two levels. PAIR recall is
        # honest but pessimistic on cluster-heavy corpora: a 1000-doc
        # duplicate cluster has ~500k true pairs and every config
        # samples a different ~bucket-cap-bounded slice of them, so
        # two configs can agree on WHICH DOCS are near-dups while
        # sharing few literal pairs. DOC recall — the fraction of
        # base-flagged documents the config also flags — is the
        # metric dedup semantics actually ride on (a flagged doc
        # enters the component/survivor computation either way).
        spark.catalog.clearCache()
        pairs = out.select("id_a", "id_b").persist()
        docs_flagged = (
            pairs.select(F.col("id_a").alias("d"))
            .unionByName(pairs.select(F.col("id_b").alias("d")))
            .distinct()
            .persist()
        )
        n_flagged = docs_flagged.count()
        if base_pairs is None:
            base_pairs, base_docs = pairs, docs_flagged
            base_n, base_docs_n = n_verified, n_flagged
            pair_recall = doc_recall = 1.0
        else:
            hit = pairs.join(base_pairs, ["id_a", "id_b"]).count()
            pair_recall = round(hit / base_n, 4) if base_n else 1.0
            dhit = docs_flagged.join(base_docs, "d").count()
            doc_recall = round(dhit / base_docs_n, 4) if base_docs_n else 1.0
            pairs.unpersist()
            docs_flagged.unpersist()
        for d in (grams, sigs, cands):
            d.unpersist()

        print(
            json.dumps(
                {
                    "config": name,
                    "bands": bands,
                    "num_hashes": num_hashes,
                    "sig_prefilter": pre,
                    "n_docs": n_docs,
                    "wall_sec": wall,
                    "n_candidates": n_cands,
                    "n_after_prefilter": n_after_pre,
                    "n_verified": n_verified,
                    "n_docs_flagged": n_flagged,
                    "pair_recall_vs_base": pair_recall,
                    "doc_recall_vs_base": doc_recall,
                    "sf_dir": sf_dir,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
