"""Secondary timed suite: put a cost on record for registry queries
that postdate the headline bench composition (VERDICT r9 item 7 —
i01–i05/a11/a12 had no timed record; r10 adds i06–i08).

The headline suite (bench.py) is a PINNED composition — adding
queries there would break calibration against the historical pins —
so late registrations get their timings here instead, recorded in
BENCH_NOTES.md per round. Each query is built fresh and timed over
``reps`` runs (median); the action is the driver's own shape
(count()).

Usage:
    python tools/registry_timed.py [sf_dir] [name ...]
    # defaults: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1,
    #           the i01–i08 + a11/a12 set

Prints one JSON line: {"sf_dir": ..., "reps": N, "timings": {...}}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_NAMES = [
    "i01_xlsx_roundtrip",
    "i02_csv_roundtrip",
    "i03_jsonl_roundtrip",
    "i04_tsv_roundtrip",
    "i05_upsert_roundtrip",
    "i06_http_roundtrip",
    "i07_orc_roundtrip",
    "i08_json_multiline_roundtrip",
    "i09_schema_evolution_roundtrip",
    "i10_resilient_read",
    "a11_hll_accuracy",
    "a12_tdigest_accuracy",
    "d14_minhash_prefilter_verified",
    # r11/r12 PQ + IVF-ADC family (VERDICT r11 item 8). a15 builds
    # its index once per process (ivf_pq_build_cached), so with
    # reps>=2 the median reflects the PROBE — run the repeats and
    # read the spread to see build vs probe.
    "a13_pq_recall_floor",
    "a14_pq_compression",
    "a15_ivf_pq_recall_floor",
    "a16_ivf_pq_incremental",
    "a17_ivf_pq_batch_knn",
    # r15: the filtered-ANN gate row (shares a15's cached index, so
    # reps>=2 medians price the FILTERED probe — the eligibility
    # semi-join rides the same one-plan batch probe)
    "a18_ivf_pq_filtered_knn",
    # r15: int8 scalar quantization — the pure-codegen batched probe
    "a19_sq8_recall_floor",
    # r13 (VERDICT r12 item 8): the streaming rows — each runs a real
    # availableNow stream (checkpoint + sink under scratch), so these
    # medians price the per-trigger machinery, not just the operators
    "s01_streaming_incremental_dedup",
    "s02_streaming_batch_equivalence",
    "s03_streaming_knn_equivalence",
    "s04_streaming_index_append_equivalence",
    # r16: hybrid retrieval (BM25 keyword + RRF fusion) and the SQ8
    # streaming tier — t25's median prices the two-pass text plan
    # (PLANS.md §t25); v09 composes it with the vector top-k + fuse
    "t25_bm25_topk",
    "t26_bm25_batch",
    "v09_hybrid_rrf",
    "s05_streaming_sq8_equivalence",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    names = sys.argv[2:] or DEFAULT_NAMES
    reps = int(os.environ.get("REGISTRY_TIMED_REPS", "2"))

    from parquet_pipeline_spark import registry
    from parquet_pipeline_spark.session import get_spark

    registry.load_all()
    spark = get_spark(
        "registry-timed",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for name in names:
        fn = registry.QUERIES[name]
        runs = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).count()
            runs.append(time.time() - t0)
        timings[name] = round(statistics.median(runs), 3)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "timings": timings}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
