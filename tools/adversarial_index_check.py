"""Tenth adversarial battery: hostile PERSISTED-INDEX artifacts
(VERDICT r11 item 5).

The engine reads back several kinds of self-written state — the
minhash band index (d10/d11/s01), the IVF and IVF-PQ vector indexes
(a09/a15/a16), and streaming checkpoints — but until r12 only
parquet-lake reads (i09/i10) and xlsx containers had hostile-input
batteries. This one fuzzes the index artifacts themselves. Contract
taxonomy (the zip battery's):

- STRUCTURAL damage (truncated parquet footer, missing metadata,
  future metadata version, drifted model fingerprint) must be LOUD —
  a raise, never silently-partial results.
- CELL-LEVEL dirt (a code row that is out-of-range / negative /
  truncated / NULL; an embedding of the wrong dimension; an index
  row in a cell no centroid defines) must stay cell-level: the dirty
  row is excluded ("not a candidate" / dead row), clean rows'
  results are BYTE-IDENTICAL to a clean index, and the job finishes.
- CHECKPOINT staleness (re-run against the same checkpoint; index
  snapshot rebuilt under a live checkpoint) must preserve
  exactly-once flags semantics: committed batches are not
  reprocessed, new batches flag against the CURRENT index.

Usage: python tools/adversarial_index_check.py [seed]
Prints PASS/FAIL per check; exits 1 on any failure.
"""

from __future__ import annotations

import glob
import json
import os
import random
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def _truncate_one_parquet(root: str, rng: random.Random) -> str:
    """Chop a random tail off one data file (corrupt footer)."""
    files = sorted(glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True))
    victim = files[rng.randrange(len(files))]
    size = os.path.getsize(victim)
    keep = rng.randrange(1, max(size // 2, 2))
    with open(victim, "rb") as fh:
        head = fh.read(keep)
    with open(victim, "wb") as fh:
        fh.write(head)
    return victim


def check_minhash_index(spark, tmp, rng) -> list[str]:
    from parquet_pipeline_spark.operators.dedup import (
        banded_minhash,
        incremental_near_dups,
    )

    errs: list[str] = []
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    corpus = docs.filter("doc_id % 5 != 0 AND doc_id < 500")
    batch = docs.filter("doc_id % 5 = 0 AND doc_id < 500")

    def flags_of(index_df):
        return sorted(
            (r["doc_id"], r["dup_of"], r["is_dup"])
            for r in incremental_near_dups(
                batch, index_df, num_hashes=16, bands=4, hash_fn="md5"
            ).collect()
        )

    clean_path = os.path.join(tmp, "mh_clean")
    banded_minhash(corpus, num_hashes=16, bands=4, hash_fn="md5").write.partitionBy(
        "band_id"
    ).parquet(clean_path)
    clean = flags_of(spark.read.parquet(clean_path))

    # truncated data file -> LOUD at action time
    broken_path = os.path.join(tmp, "mh_trunc")
    banded_minhash(corpus, num_hashes=16, bands=4, hash_fn="md5").write.partitionBy(
        "band_id"
    ).parquet(broken_path)
    _truncate_one_parquet(broken_path, rng)
    try:
        flags_of(spark.read.parquet(broken_path))
        errs.append("truncated minhash index produced flags silently")
    except Exception:  # noqa: BLE001 — loud is the contract
        pass

    # mixed schema: band_hash column dropped -> LOUD analysis error
    narrow_path = os.path.join(tmp, "mh_narrow")
    spark.read.parquet(clean_path).drop("band_hash").write.parquet(narrow_path)
    try:
        flags_of(spark.read.parquet(narrow_path))
        errs.append("band_hash-less index joined silently")
    except Exception:  # noqa: BLE001
        pass

    # type-coerced index (band_hash stringified): must not DIVERGE
    # silently — either refuse or produce the clean flags (numeric
    # strings cast back losslessly under Spark's join coercion)
    s_path = os.path.join(tmp, "mh_str")
    spark.read.parquet(clean_path).withColumn(
        "band_hash", F.col("band_hash").cast("string")
    ).write.parquet(s_path)
    try:
        got = flags_of(spark.read.parquet(s_path))
        if got != clean:
            errs.append("stringified band_hash index DIVERGED silently")
    except Exception:  # noqa: BLE001
        pass
    return errs


def check_ivfpq_index(spark, tmp, rng) -> list[str]:
    from parquet_pipeline_spark.operators.vectors import (
        ivf_centroids,
        ivf_pq_append,
        ivf_pq_index,
        ivf_pq_topk,
        pq_train,
    )

    errs: list[str] = []
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    corpus = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 400))
    batch = emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 450))
    cents = ivf_centroids(corpus, k=8)
    books = pq_train(corpus, m=8, k_codes=16, sample=256)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]

    clean_path = os.path.join(tmp, "pq_clean")
    ivf_pq_index(corpus, cents, books, clean_path)
    full_probe = dict(nprobe=len(cents), k=10, shortlist=500)
    clean = [
        tuple(r)
        for r in ivf_pq_topk(
            spark, clean_path, cents, books, corpus, 0, qv, **full_probe
        ).collect()
    ]

    # cell-level dirt: corrupt code rows + rows in an unknown cell.
    # Injected the hostile way — straight into the parquet tree, not
    # through our writers.
    dirty_path = os.path.join(tmp, "pq_dirty")
    ivf_pq_index(corpus, cents, books, dirty_path)
    oob = rng.randrange(16, 1000)
    neg = -rng.randrange(1, 8)
    dirty_rows = spark.createDataFrame(
        [
            (800001, [oob] + [0] * 7, 0),
            (800002, [neg] + [0] * 7, 1),
            (800003, [0, 0, 0], 2),          # truncated codes
            (800004, None, 3),               # null codes
            (800005, [0] * 8, 99),           # cell no centroid defines
        ],
        "vec_id long, codes array<int>, cell int",
    )
    dirty_rows.write.mode("append").partitionBy("cell").parquet(dirty_path)
    try:
        got = [
            tuple(r)
            for r in ivf_pq_topk(
                spark, dirty_path, cents, books, corpus, 0, qv, **full_probe
            ).collect()
        ]
        if any(row[0] >= 800001 for row in got):
            errs.append("corrupt/unknown-cell code row was retrieved")
        elif got != clean:
            errs.append("cell-level dirt changed CLEAN rows' results")
    except Exception as e:  # noqa: BLE001
        errs.append(f"cell-level code dirt aborted the probe: {type(e).__name__}")

    # same contract through the BATCHED probe (r12, a17): its numpy
    # validity mask must drop exactly what pq_topk's F.get drops
    from parquet_pipeline_spark.operators.vectors import ivf_pq_knn_join

    try:
        clean_b = sorted(
            tuple(r)
            for r in ivf_pq_knn_join(
                spark, clean_path, cents, books, corpus, [(0, qv)], **full_probe
            ).collect()
        )
        got_b = sorted(
            tuple(r)
            for r in ivf_pq_knn_join(
                spark, dirty_path, cents, books, corpus, [(0, qv)], **full_probe
            ).collect()
        )
        if any(row[1] >= 800001 for row in got_b):
            errs.append("batched probe retrieved a corrupt code row")
        elif got_b != clean_b:
            errs.append("cell-level dirt changed batched probe results")
    except Exception as e:  # noqa: BLE001
        errs.append(f"code dirt aborted the batched probe: {type(e).__name__}")

    # structural damage: truncated data file -> LOUD
    trunc_path = os.path.join(tmp, "pq_trunc")
    ivf_pq_index(corpus, cents, books, trunc_path)
    _truncate_one_parquet(trunc_path, rng)
    try:
        ivf_pq_topk(spark, trunc_path, cents, books, corpus, 0, qv, **full_probe).collect()
        errs.append("truncated PQ index probed silently")
    except Exception:  # noqa: BLE001
        pass

    # metadata fuzz: garbage bytes / random json / missing / version /
    # drifted hashes must all REFUSE an append, leaving bytes alone
    meta_path = os.path.join(clean_path, "_ivfpq_meta.json")
    with open(meta_path) as fh:
        good_meta = fh.read()
    n0 = spark.read.parquet(clean_path).count()
    hostile_metas = [
        bytes(rng.randrange(256) for _ in range(rng.randrange(1, 64))),
        b"[]",
        b"{}",
        json.dumps({**json.loads(good_meta), "version": 2 + rng.randrange(98)}).encode(),
        json.dumps({**json.loads(good_meta), "codebook_hash": "%032x" % rng.getrandbits(128)}).encode(),
        json.dumps({**json.loads(good_meta), "n_cells": 999}).encode(),
    ]
    for blob in hostile_metas:
        with open(meta_path, "wb") as fh:
            fh.write(blob)
        try:
            ivf_pq_append(spark, clean_path, batch, cents, books)
            errs.append(f"append accepted hostile metadata {blob[:24]!r}")
        except ValueError:
            pass
        except Exception as e:  # noqa: BLE001
            errs.append(
                f"hostile metadata {blob[:24]!r} raised {type(e).__name__}, want ValueError"
            )
    os.remove(meta_path)
    try:
        ivf_pq_append(spark, clean_path, batch, cents, books)
        errs.append("append accepted a metadata-less index")
    except ValueError:
        pass
    with open(meta_path, "w") as fh:
        fh.write(good_meta)
    if spark.read.parquet(clean_path).count() != n0:
        errs.append("a refused append mutated the index")
    return errs


def check_replayed_append(spark, tmp, rng) -> list[str]:
    """At-least-once replay (VERDICT r12 item 2): append the SAME
    batch twice — the crash-between-append-and-checkpoint state — and
    require every probe path to return k DISTINCT ids identical to a
    clean index's, with ivf_pq_compact reclaiming the duplicate rows.
    Batch bounds and probe shape are rng-fuzzed."""
    from parquet_pipeline_spark.operators.vectors import (
        ivf_centroids,
        ivf_pq_append,
        ivf_pq_compact,
        ivf_pq_index,
        ivf_pq_knn_join,
        ivf_pq_topk,
        pq_train,
    )

    errs: list[str] = []
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    lo = 5 + rng.randrange(0, 50)
    mid = lo + 300 + rng.randrange(0, 100)
    hi = mid + 150 + rng.randrange(0, 100)
    snap = emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < mid))
    batch = emb.filter((F.col("vec_id") >= mid) & (F.col("vec_id") < hi))
    full = emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
    cents = ivf_centroids(snap, k=8)
    books = pq_train(snap, m=8, k_codes=16, sample=256)
    qrows = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 3).collect()
    ]
    k = rng.choice([5, 10])
    nprobe = rng.choice([4, 8])

    clean_path = os.path.join(tmp, "rp_clean")
    ivf_pq_index(snap, cents, books, clean_path)
    ivf_pq_append(spark, clean_path, batch, cents, books)
    replay_path = os.path.join(tmp, "rp_replay")
    ivf_pq_index(snap, cents, books, replay_path)
    ivf_pq_append(spark, replay_path, batch, cents, books)
    ivf_pq_append(spark, replay_path, batch, cents, books)  # the replay

    def probe_rows(path):
        return sorted(
            tuple(r)
            for r in ivf_pq_knn_join(
                spark, path, cents, books, full, qrows, k=k, nprobe=nprobe
            ).collect()
        )

    clean_rows = probe_rows(clean_path)
    replay_rows = probe_rows(replay_path)
    if replay_rows != clean_rows:
        errs.append("replayed append changed batched probe results")
    per_q: dict[int, list] = {}
    for q, vid, _s in replay_rows:
        per_q.setdefault(q, []).append(vid)
    for q, vids in per_q.items():
        if len(vids) != len(set(vids)):
            errs.append(f"batched probe returned a duplicate id for q {q}")
        if len(vids) != k:
            errs.append(f"batched probe returned {len(vids)} ids for q {q}, want {k}")

    q0, qv0 = qrows[0]
    tk = lambda p: sorted(
        tuple(r)
        for r in ivf_pq_topk(
            spark, p, cents, books, full, q0, qv0, k=k, nprobe=nprobe
        ).collect()
    )
    if tk(replay_path) != tk(clean_path):
        errs.append("replayed append changed single-query probe results")

    # filtered ANN (r14): eligibility must compose with replay safety —
    # the filtered probe of the replayed index equals the filtered
    # probe of the clean index, and never leaks an ineligible id
    parity = rng.choice([0, 1])
    eligible = full.filter(F.col("vec_id") % 2 == parity)

    def probe_filtered(path):
        return sorted(
            tuple(r)
            for r in ivf_pq_knn_join(
                spark, path, cents, books, full, qrows, k=k,
                nprobe=nprobe, eligible=eligible,
            ).collect()
        )

    f_clean = probe_filtered(clean_path)
    f_replay = probe_filtered(replay_path)
    if f_replay != f_clean:
        errs.append("replayed append changed FILTERED probe results")
    if any(vid % 2 != parity for _q, vid, _s in f_replay):
        errs.append("filtered probe leaked an ineligible id")

    n_clean = spark.read.parquet(clean_path).count()
    ivf_pq_compact(spark, replay_path)
    if spark.read.parquet(replay_path).count() != n_clean:
        errs.append("compact did not reclaim replay-duplicated rows")
    if probe_rows(replay_path) != clean_rows:
        errs.append("compacted replay index changed probe results")
    if probe_filtered(replay_path) != f_clean:
        errs.append("compacted replay index changed FILTERED probe results")
    return errs


def _write_embeddings_fixture(path: str, family: str, seed: int, n: int = 2000, dim: int = 64) -> None:
    """Synthesize an embeddings.parquet in the testdata schema
    (vec_id int64, embedding list<float>, label int32) drawn from one
    of three corpus GEOMETRIES. The gate recall floors were once
    sized on a single family (near-iid Gaussian) and had to be
    reactively resized when a fresh seed exposed a geometry the
    sizing never saw (VERDICT r13 item 1 / next-round 2) — this
    generator exists so every floor is exercised across families
    every round, making any future floor failure a geometry finding
    instead of a gate edit."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rs = np.random.RandomState(seed)
    if family == "clustered":
        # planted clusters (the test_vectors family): tight Gaussian
        # blobs — IVF's best case, centroid ranking is informative
        centers = rs.normal(size=(16, dim))
        assign = rs.randint(0, 16, size=n)
        x = centers[assign] + 0.3 * rs.normal(size=(n, dim))
    elif family == "lowrank":
        # anisotropic / low-rank: mass concentrated in an 8-dim
        # subspace + small ambient noise — PQ subspaces see wildly
        # unequal variance, centroids crowd the subspace
        basis = rs.normal(size=(8, dim))
        x = rs.normal(size=(n, 8)) @ basis + 0.05 * rs.normal(size=(n, dim))
    elif family == "neariid":
        # structureless Gaussian: centroid ranking weakly informative
        # (the family that forced the r13 nprobe resize)
        x = rs.normal(size=(n, dim))
    else:  # pragma: no cover - caller bug
        raise ValueError(f"unknown family {family!r}")
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [row for row in x.astype(np.float32).tolist()],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(
                (np.arange(n) % 7).astype(np.int32), type=pa.int32()
            ),
        }
    )
    os.makedirs(path, exist_ok=True)
    pq.write_table(tbl, os.path.join(path, "embeddings.parquet"))


# every gate row whose correctness includes an in-gate recall floor,
# with the boolean column that carries the floor verdict
_FLOOR_ROWS = [
    ("a13_pq_recall_floor", "pq_ok"),
    ("a15_ivf_pq_recall_floor", "ivf_pq_ok"),
    ("a16_ivf_pq_incremental", "inc_ok"),
    ("a17_ivf_pq_batch_knn", "batch_ok"),
    ("s04_streaming_index_append_equivalence", "append_ok"),
    # r15: the filtered-ANN gate row (label-scoped eligible set; the
    # fixture's label = vec_id % 7, so "label = 0" ≈ 14% selectivity)
    ("a18_ivf_pq_filtered_knn", "filtered_ok"),
    # r15: int8 scalar quantization — the near-exact 4× tier; its 0.8
    # floor must hold across corpus geometry like every other floor
    ("a19_sq8_recall_floor", "sq8_ok"),
]


def check_recall_floor_geometry(spark, tmp, rng) -> list[str]:
    """Standing geometry-diverse recall battery (VERDICT r13 next-
    round 2): rebuild the embeddings fixture in three corpus
    families — planted clusters, anisotropic/low-rank, near-iid
    Gaussian — at 2 fresh seeds each, and run EVERY recall-floor gate
    row (a13/a15/a16/a17/s04) against each fixture, requiring every
    floor boolean to hold. Plus the a04 leg: the plain-IVF probe's
    recall curve on each fixture must clear the a15 floor at
    nprobe=12 and collapse to the exact-identity at nprobe=k_cells
    (probing every cell IS the exact scan, geometry-free)."""
    from parquet_pipeline_spark import registry
    from parquet_pipeline_spark.operators.vectors import (
        exact_knn_join,
        ivf_centroids,
        ivf_knn_join,
        write_ivf_index,
    )

    registry.load_all()
    errs: list[str] = []
    for family in ("clustered", "lowrank", "neariid"):
        for seed in (rng.randrange(10_000), rng.randrange(10_000)):
            tag = f"{family}/seed={seed}"
            sf_dir = os.path.join(tmp, f"{family}_{seed}")
            _write_embeddings_fixture(sf_dir, family, seed)
            for name, flag_col in _FLOOR_ROWS:
                try:
                    rows = registry.QUERIES[name](spark, sf_dir).collect()
                except Exception as e:  # noqa: BLE001
                    errs.append(f"{tag} {name} crashed: {type(e).__name__}: {e}")
                    continue
                if len(rows) != 100:  # 5 queries x exact top-20
                    errs.append(f"{tag} {name}: {len(rows)} rows, want 100")
                bad = sorted({r["q_id"] for r in rows if not r[flag_col]})
                if bad:
                    errs.append(
                        f"{tag} {name}: {flag_col} false for queries {bad}"
                    )
            # a04 leg: plain-IVF recall curve on this geometry
            emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
            corpus = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 2000))
            qrows = [
                (r["vec_id"], [float(x) for x in r["embedding"]])
                for r in emb.filter(F.col("vec_id") < 5).collect()
            ]
            exact_ids: dict[int, set] = {}
            for r in exact_knn_join(corpus, qrows, k=10).collect():
                exact_ids.setdefault(r["q_id"], set()).add(r["vec_id"])
            cents = ivf_centroids(corpus, k=16)
            idx = os.path.join(sf_dir, "ivf_idx.parquet")
            write_ivf_index(corpus, cents, idx)
            for nprobe, floor in ((12, 0.4), (16, 1.0)):
                got: dict[int, set] = {}
                for r in ivf_knn_join(
                    spark, idx, cents, qrows, k=10, nprobe=nprobe
                ).collect():
                    got.setdefault(r["q_id"], set()).add(r["vec_id"])
                for q_id, want in exact_ids.items():
                    rec = len(got.get(q_id, set()) & want) / len(want)
                    if rec < floor:
                        errs.append(
                            f"{tag} a04 curve: recall {rec:.2f} < {floor} "
                            f"at nprobe={nprobe} for q {q_id}"
                        )
    return errs


def check_filtered_recall_geometry(spark, tmp, rng) -> list[str]:
    """Filtered-ANN selectivity battery (VERDICT r14 next-round 2):
    sweep eligible fraction {1%, 10%, 50%} × the 3 corpus families
    through the composed IVF-ADC probe (`ivf_pq_knn_join(eligible=…)`,
    gate params: nprobe=12/16, shortlist=200) and measure recall vs
    the exact top-10 over the FILTERED corpus. Prints the measurement
    table BENCH_NOTES §Filtered ANN records.

    What the sweep establishes (and the floors pin):

    - Uniform scopes do NOT need a bigger shortlist: at any fraction,
      eligible-rows-per-probed-cell only SHRINKS, so the 200-shortlist
      is even deeper relative to the candidates than unfiltered —
      recall is governed by nprobe cell coverage alone (floor: the
      gate's 0.4 at nprobe=12, every family × fraction).
    - The failure mode is CONCENTRATION, not selectivity: the
      adversarial leg scopes to the rows of ONE IVF cell — if the
      query's nprobe ranking misses that cell, recall is 0 no matter
      the shortlist. Probing every cell restores the exact answer
      (floor: 1.0 at nprobe=k_cells), so the operating rule is to
      grow/steer NPROBE for concentrated tenants (per-cell tenant
      mass is exactly what ivf_pq_stats-style introspection exposes),
      never the shortlist."""
    from parquet_pipeline_spark.operators.vectors import (
        exact_knn_join,
        ivf_assign,
        ivf_pq_build_cached,
        ivf_pq_knn_join,
    )

    errs: list[str] = []
    for family in ("clustered", "lowrank", "neariid"):
        seed = rng.randrange(10_000)
        tag = f"{family}/seed={seed}"
        sf_dir = os.path.join(tmp, f"{family}_{seed}")
        _write_embeddings_fixture(sf_dir, family, seed)
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        corpus = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 2000))
        qrows = [
            (r["vec_id"], [float(x) for x in r["embedding"]])
            for r in emb.filter(F.col("vec_id") < 5).collect()
        ]
        # one index per fixture, shared across every fraction (the
        # gate's own cached build — same params as a15/a18)
        path, cents, books = ivf_pq_build_cached(
            corpus,
            cache_key=(os.path.realpath(sf_dir), "a15", 5, 2000),
            k_cells=16,
            m=8,
            k_codes=256,
            sample=2048,
        )

        def min_recall(eligible, nprobe, extra_cells=None, shortlist=200):
            exact_ids: dict[int, set] = {}
            for r in exact_knn_join(eligible, qrows, k=10).collect():
                exact_ids.setdefault(r["q_id"], set()).add(r["vec_id"])
            got: dict[int, set] = {}
            for r in ivf_pq_knn_join(
                spark, path, cents, books, corpus, qrows,
                k=10, nprobe=nprobe, shortlist=shortlist,
                eligible=eligible.select("vec_id"),
                extra_cells=extra_cells,
            ).collect():
                got.setdefault(r["q_id"], set()).add(r["vec_id"])
            recs = [
                len(got.get(q, set()) & want) / len(want)
                for q, want in exact_ids.items()
            ]
            return min(recs), sum(recs) / len(recs)

        # uniform scopes: modulus of the id — selectivity without
        # geometric concentration (ids are independent of geometry)
        for mod, frac in ((100, "1%"), (10, "10%"), (2, "50%")):
            lo, mean = min_recall(
                corpus.filter(F.col("vec_id") % mod == 0), nprobe=12
            )
            print(
                f"      [filtered {tag}] fraction={frac} nprobe=12 "
                f"min_recall={lo:.2f} mean={mean:.2f}"
            )
            if lo < 0.4:
                errs.append(
                    f"{tag} fraction={frac}: min recall {lo:.2f} < 0.4 "
                    f"at nprobe=12/16 shortlist=200"
                )

        # concentrated scope: one IVF cell's rows — the tenant whose
        # vectors all hash together. nprobe=12 is REPORTED (can be
        # anything down to 0 if the ranking misses the cell);
        # nprobe=k_cells must restore the exact filtered answer.
        assigned = ivf_assign(corpus, cents)
        cell0 = assigned.groupBy("cell").count().orderBy(
            F.col("count").desc()
        ).first()["cell"]
        tenant = corpus.join(
            assigned.filter(F.col("cell") == cell0).select("vec_id"),
            "vec_id",
        )
        n_tenant = tenant.count()
        lo12, mean12 = min_recall(tenant, nprobe=12)
        # exactness needs shortlist ≥ tenant rows: the heaviest cell
        # can exceed 200 on skewed geometries, and a 200-cut would
        # fail this leg spuriously (code review r15)
        lo16, _ = min_recall(tenant, nprobe=16, shortlist=n_tenant + 50)
        print(
            f"      [filtered {tag}] concentrated(one-cell) "
            f"nprobe=12 min_recall={lo12:.2f} mean={mean12:.2f}; "
            f"nprobe=16 min_recall={lo16:.2f}"
        )
        if lo16 < 1.0:
            errs.append(
                f"{tag} concentrated scope: probing every cell must "
                f"recover the exact filtered answer, got {lo16:.2f}"
            )
        # the operating rule, operationalized (r15): steer the probe
        # set with the scope's mass cells (scope_cell_mass → the one
        # cell here) and the scoped probe is EXACT at shortlist ≥
        # tenant rows, regardless of the query's own cell ranking
        from parquet_pipeline_spark.operators.vectors import scope_cell_mass

        mass = scope_cell_mass(spark, path, tenant).collect()
        steer = [r["cell"] for r in mass[:1]]
        lo_s, _ = min_recall(
            tenant, nprobe=12, extra_cells=steer, shortlist=n_tenant + 50
        )
        print(
            f"      [filtered {tag}] concentrated steered "
            f"(extra_cells={steer}) min_recall={lo_s:.2f}"
        )
        if lo_s < 1.0:
            errs.append(
                f"{tag} steered concentrated scope: extra_cells from "
                f"scope_cell_mass must make the scoped probe exact, "
                f"got {lo_s:.2f}"
            )
    return errs


def check_ivf_dim_mismatch(spark, tmp, rng) -> list[str]:
    from parquet_pipeline_spark.operators.vectors import (
        ivf_centroids,
        ivf_knn_join,
        write_ivf_index,
    )

    errs: list[str] = []
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    corpus = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 400))
    cents = ivf_centroids(corpus, k=4)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]

    path = os.path.join(tmp, "ivf_dim")
    write_ivf_index(corpus, cents, path)
    clean = [
        tuple(r)
        for r in ivf_knn_join(spark, path, cents, [(0, qv)], k=10, nprobe=4).collect()
    ]
    # a wrong-LENGTH embedding appended into a probed cell (same
    # element type as the index — a type change is mixed-schema and
    # loud by contract): its cosine is NULL (zip_with pads with
    # NULL) -> "not a candidate"
    dim = rng.choice([8, 32, 96])
    spark.createDataFrame(
        [(800009, [1.0] * dim, int(cents[0][0]))],
        "vec_id long, embedding array<float>, cell int",
    ).write.mode("append").partitionBy("cell").parquet(path)
    try:
        got = [
            tuple(r)
            for r in ivf_knn_join(spark, path, cents, [(0, qv)], k=10, nprobe=4).collect()
        ]
        if any(row[1] == 800009 for row in got):
            errs.append("wrong-dimension embedding was retrieved")
        elif got != clean:
            errs.append("dim-mismatch row changed clean results")
    except Exception as e:  # noqa: BLE001
        errs.append(f"dim-mismatch row aborted the probe: {type(e).__name__}")
    return errs


def check_checkpoint_staleness(spark, tmp, rng) -> list[str]:
    from parquet_pipeline_spark.operators.dedup import banded_minhash
    from parquet_pipeline_spark.streaming.events import (
        streaming_incremental_dedup,
    )

    errs: list[str] = []
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    corpus_v1 = docs.filter("doc_id % 5 != 0 AND doc_id < 300")
    corpus_v2 = docs.filter("doc_id % 5 != 0 AND doc_id < 600")  # newer snapshot
    idx = os.path.join(tmp, "ck_idx")
    banded_minhash(corpus_v1, num_hashes=16, bands=4, hash_fn="md5").write.partitionBy(
        "band_id"
    ).parquet(idx)

    src = os.path.join(tmp, "ck_src")
    os.makedirs(src)
    texts = [r["text"] for r in docs.filter("doc_id % 5 = 0").limit(3).collect()]
    now = time.time()

    def add_batch(i: int):
        p = os.path.join(src, f"b{i}.jsonl")
        with open(p, "w") as fh:
            fh.write(json.dumps({"doc_id": 810000 + i, "text": texts[i]}))
        os.utime(p, (now + i, now + i))

    dest = os.path.join(tmp, "ck_flags")
    ck = os.path.join(tmp, "ck_ckpt")

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        q = streaming_incremental_dedup(
            stream, idx, dest, ck, num_hashes=16, bands=4, hash_fn="md5",
            update_index=False,
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("stream did not finish")

    add_batch(0)
    run()
    first = sorted(
        map(tuple, spark.read.parquet(dest).select("doc_id", "dup_of", "is_dup").collect())
    )
    if len(first) != 1:
        errs.append(f"first run wrote {len(first)} flag rows, want 1")

    # stale checkpoint + NEWER index snapshot + a new batch: the new
    # batch must process against the CURRENT index; committed batch 0
    # must not be reprocessed (its flags stay byte-identical even
    # though the index underneath changed)
    import shutil

    shutil.rmtree(idx)
    banded_minhash(corpus_v2, num_hashes=16, bands=4, hash_fn="md5").write.partitionBy(
        "band_id"
    ).parquet(idx)
    add_batch(1)
    run()
    second = sorted(
        map(tuple, spark.read.parquet(dest).select("doc_id", "dup_of", "is_dup").collect())
    )
    if len(second) != 2:
        errs.append(f"stale-checkpoint rerun wrote {len(second)} rows, want 2")
    if [r for r in second if r[0] == 810000] != [r for r in first if r[0] == 810000]:
        errs.append("committed batch was reprocessed under the newer snapshot")

    # idle re-run: nothing new -> nothing changes
    run()
    third = sorted(
        map(tuple, spark.read.parquet(dest).select("doc_id", "dup_of", "is_dup").collect())
    )
    if third != second:
        errs.append("idle checkpoint re-run changed the flags sink")
    return errs


def main() -> None:
    import tempfile

    from parquet_pipeline_spark.session import get_spark, warm_up

    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_spark("adversarial_index_check")
    warm_up(spark)
    spark.sparkContext.setLogLevel("ERROR")
    checks = [
        ("minhash_index", check_minhash_index),
        ("ivfpq_index", check_ivfpq_index),
        ("replayed_append", check_replayed_append),
        ("recall_floor_geometry", check_recall_floor_geometry),
        ("filtered_recall_geometry", check_filtered_recall_geometry),
        ("ivf_dim_mismatch", check_ivf_dim_mismatch),
        ("checkpoint_staleness", check_checkpoint_staleness),
    ]
    failed = 0
    for name, fn in checks:
        # crc32, not hash(): str hashing is salted per process
        # (PYTHONHASHSEED), so hash(name) made "seed N" runs
        # irreproducible across invocations — a recall-floor failure
        # must replay from its printed seed alone (r14)
        rng = random.Random(seed * 1009 + zlib.crc32(name.encode()) % 997)
        tmp = tempfile.mkdtemp(prefix=f"idxbat_{name}_")
        try:
            errs = fn(spark, tmp, rng)
        except Exception as e:  # noqa: BLE001
            errs = [f"check crashed: {type(e).__name__}: {e}"]
        if errs:
            failed += 1
            print(f"FAIL  {name} (seed {seed})")
            for e in errs:
                print(f"      - {e}")
        else:
            print(f"PASS  {name} (seed {seed})")
    print("all green" if not failed else f"{failed} checks failed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
