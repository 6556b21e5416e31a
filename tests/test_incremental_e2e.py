"""System-level proof of the incremental-corpus loop (VERDICT r6
item 6): streaming ingest → streaming_incremental_dedup (flags +
fingerprint-index growth) → streaming_vector_index_append →
compact_partitioned → ivf_knn_join, across 3 micro-batches on a tmp
dir — asserting the streamed path agrees with the batch twins the
per-operator tests pin (incremental_near_dups with an inline-grown
index; write_ivf_index built in one shot)."""

from __future__ import annotations

import pytest

import json
import os
import time


def _n_files(root):
    total = 0
    for dirpath, _dirs, files in os.walk(root):
        total += sum(1 for f in files if f.endswith(".parquet"))
    return total


@pytest.mark.slow
def test_incremental_corpus_loop_matches_batch_twins(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from parquet_pipeline_spark.operators.dedup import (
        banded_minhash,
        incremental_near_dups,
    )
    from parquet_pipeline_spark.operators.vectors import (
        ivf_centroids,
        ivf_knn_join,
        write_ivf_index,
    )
    from parquet_pipeline_spark.sources.writers import compact_partitioned
    from parquet_pipeline_spark.streaming.events import (
        streaming_incremental_dedup,
        streaming_vector_index_append,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus_docs = docs.filter("doc_id % 4 != 0").select("doc_id", "text")
    corpus_emb = emb.filter("vec_id % 4 != 0")

    # --- initial snapshot indexes ------------------------------------
    mh_idx = str(tmp_path / "minhash_idx")
    banded_minhash(corpus_docs, num_hashes=16, bands=4).write.partitionBy(
        "band_id"
    ).parquet(mh_idx)
    cents = ivf_centroids(corpus_emb, k=8)
    ivf_idx = str(tmp_path / "ivf_idx")
    write_ivf_index(corpus_emb.select("vec_id", "embedding"), cents, ivf_idx)

    # --- 3 doc micro-batches: new docs + dups of corpus and of an
    # EARLIER batch (only findable because the index grows in-stream).
    # Novel texts are synthetic: fixture documents contain natural
    # near-dups, which would make min-id attribution land on a
    # corpus id instead of the planted earlier-batch id.
    novel = [
        " ".join(f"{tag}{i}qzx" for i in range(40))
        for tag in ("wm", "yb", "pf")
    ]
    c_text = corpus_docs.orderBy("doc_id").first()["text"]
    batches = [
        [
            {"doc_id": 910000, "text": novel[0]},
            {"doc_id": 910001, "text": c_text},        # dup of corpus
        ],
        [
            {"doc_id": 920000, "text": novel[1]},
            {"doc_id": 920001, "text": novel[0]},      # dup of batch 0's doc
        ],
        [
            {"doc_id": 930000, "text": novel[2]},
            {"doc_id": 930001, "text": novel[1]},      # dup of batch 1's doc
        ],
    ]
    src = tmp_path / "doc_stream"
    src.mkdir()
    now = time.time()
    for i, b in enumerate(batches):
        p = src / f"b{i}.jsonl"
        p.write_text("\n".join(json.dumps(r) for r in b))
        os.utime(p, (now + i, now + i))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    flags_dest = str(tmp_path / "flags")
    q = streaming_incremental_dedup(
        stream, mh_idx, flags_dest, str(tmp_path / "ck_docs"),
        num_hashes=16, bands=4,
    )
    q.awaitTermination(180)

    # --- 3 embedding micro-batches streamed into the IVF index ------
    new_vecs = [
        (700000 + i, [float(x) for x in r["embedding"]])
        for i, r in enumerate(
            emb.filter("vec_id % 4 = 0").orderBy("vec_id").limit(3).collect()
        )
    ]
    vsrc = tmp_path / "vec_stream"
    vsrc.mkdir()
    for i, (vid, v) in enumerate(new_vecs):
        p = vsrc / f"v{i}.jsonl"
        p.write_text(json.dumps({"vec_id": vid, "embedding": v}))
        os.utime(p, (now + i, now + i))
    vstream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .json(str(vsrc))
    )
    vq = streaming_vector_index_append(
        vstream, cents, ivf_idx, str(tmp_path / "ck_vecs")
    )
    vq.awaitTermination(180)

    # --- flags agree with the batch twin (inline-grown index) --------
    streamed_flags = sorted(
        map(
            tuple,
            spark.read.parquet(flags_dest)
            .select("doc_id", "dup_of", "is_dup")
            .collect(),
        )
    )
    twin_index = banded_minhash(corpus_docs, num_hashes=16, bands=4)
    twin_rows = []
    for b in batches:
        bdf = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for r in b], "doc_id long, text string"
        )
        twin_rows += (
            incremental_near_dups(bdf, twin_index, num_hashes=16, bands=4)
            .collect()
        )
        twin_index = twin_index.unionByName(
            banded_minhash(bdf, num_hashes=16, bands=4)
        ).localCheckpoint()
    twin_flags = sorted((r["doc_id"], r["dup_of"], r["is_dup"]) for r in twin_rows)
    assert streamed_flags == twin_flags
    flag_map = {d: (o, f) for d, o, f in streamed_flags}
    assert flag_map[910001][1] == 1                      # corpus dup found
    assert flag_map[920001] == (910000, 1)               # cross-batch dup
    assert flag_map[930001] == (920000, 1)               # cross-batch dup
    assert flag_map[910000][1] == 0                      # novel doc clean

    # --- compaction shrinks small-file litter, changes nothing -------
    before_mh, before_ivf = _n_files(mh_idx), _n_files(ivf_idx)
    compact_partitioned(spark, mh_idx, ["band_id"])
    compact_partitioned(spark, ivf_idx, ["cell"])
    assert _n_files(mh_idx) < before_mh
    assert _n_files(ivf_idx) < before_ivf
    mh_ids = {
        r["doc_id"]
        for r in spark.read.parquet(mh_idx).select("doc_id").distinct().collect()
    }
    assert {910000, 910001, 920000, 920001, 930000, 930001} <= mh_ids

    # --- retrieval through the streamed+compacted index agrees with
    # an index built in one batch shot, and sees streamed vectors ----
    queries = [(q_id, v) for q_id, v in new_vecs]
    got = sorted(
        map(
            tuple,
            ivf_knn_join(spark, ivf_idx, cents, queries, k=3, nprobe=3).collect(),
        )
    )
    oneshot = str(tmp_path / "ivf_oneshot")
    all_emb = corpus_emb.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(new_vecs, "vec_id long, embedding array<float>")
    )
    write_ivf_index(all_emb, cents, oneshot)
    want = sorted(
        map(
            tuple,
            ivf_knn_join(spark, oneshot, cents, queries, k=3, nprobe=3).collect(),
        )
    )
    assert got == want
    # each streamed vector's own query retrieves itself at score 1
    by_q = {}
    for q_id, vec_id, score in got:
        by_q.setdefault(q_id, []).append((score, vec_id))
    for q_id, _v in queries:
        top = max(by_q[q_id])
        assert top[1] == q_id and abs(top[0] - 1.0) < 1e-6


def test_incremental_lever_precision_banding(spark, sf_dir, tmp_path):
    """The d03 bands lever (r11: (32,4) = 2.5x faster at 99.6% doc
    recall at sf5) cashed into the INCREMENTAL family (VERDICT r11
    item 6): the same (num_hashes, bands) knob threads through
    banded_minhash -> incremental_near_dups -> the streaming twin,
    and at the precision setting the paths still agree with each
    other. Pins:
    - stream flags == batch flags at (32,4) (the lever setting, not
      just the gate's (16,4) portability config);
    - r=8 banding is strictly more precise: every (32,4) hit is a
      (32,8) hit (fewer junk candidates is WHY it is 2.5x faster).
    """
    import json as _json
    import time as _time

    from parquet_pipeline_spark.operators.dedup import (
        banded_minhash,
        incremental_near_dups,
    )
    from parquet_pipeline_spark.streaming.events import (
        streaming_incremental_dedup,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter("doc_id % 5 != 0").select("doc_id", "text")
    batch = docs.filter("doc_id % 5 = 0").select("doc_id", "text")

    flags_by_cfg = {}
    for bands in (8, 4):
        flags_by_cfg[bands] = {
            r["doc_id"]: (r["dup_of"], r["is_dup"])
            for r in incremental_near_dups(
                batch,
                banded_minhash(corpus, num_hashes=32, bands=bands),
                num_hashes=32,
                bands=bands,
            ).collect()
        }
    # precision monotonicity: a (32,4) band match means 8 consecutive
    # signature positions agree, which implies both covering (32,8)
    # 4-position bands agree -> every precise hit is a base hit
    for doc_id, (dup_of, is_dup) in flags_by_cfg[4].items():
        if is_dup:
            assert flags_by_cfg[8][doc_id][1] == 1, doc_id
    assert sum(f for _, f in flags_by_cfg[4].values()) <= sum(
        f for _, f in flags_by_cfg[8].values()
    )

    # streaming twin at the lever setting
    idx = str(tmp_path / "idx32x4")
    banded_minhash(corpus, num_hashes=32, bands=4).write.partitionBy(
        "band_id"
    ).parquet(idx)
    src = tmp_path / "stream32x4"
    src.mkdir()
    rows = [
        {"doc_id": r["doc_id"], "text": r["text"]}
        for r in batch.orderBy("doc_id").limit(40).collect()
    ]
    p = src / "b0.jsonl"
    p.write_text("\n".join(_json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    dest = str(tmp_path / "flags32x4")
    q = streaming_incremental_dedup(
        stream, idx, dest, str(tmp_path / "ck32x4"),
        num_hashes=32, bands=4, update_index=False,
    )
    q.awaitTermination(120)
    streamed = {
        r["doc_id"]: (r["dup_of"], r["is_dup"])
        for r in spark.read.parquet(dest)
        .select("doc_id", "dup_of", "is_dup")
        .collect()
    }
    want = {r["doc_id"] for r in rows}
    assert set(streamed) == want
    for doc_id in want:
        assert streamed[doc_id] == flags_by_cfg[4][doc_id], doc_id
