"""Null-row contract: dirty upstream data routinely carries null
text or null embedding cells. The numpy-kernel operators must not
crash on them (nulls are filtered JVM-side — a vector that doesn't
exist can't be anyone's neighbor or duplicate), and the documented
degenerate-text semantics of the fingerprint path are pinned here.
"""

from __future__ import annotations


def test_knn_joins_skip_null_embeddings(spark, tmp_path):
    from parquet_pipeline_spark.operators.vectors import (
        exact_knn_join,
        ivf_centroids,
        ivf_knn_join,
        write_ivf_index,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None), (2, [0.6, 0.8]), (3, None)],
        "vec_id long, embedding array<double>",
    )
    got = exact_knn_join(emb, [(9, [1.0, 0.0])], k=10).collect()
    assert sorted(r["vec_id"] for r in got) == [0, 2]  # null rows skipped

    cents = ivf_centroids(emb, k=2)  # seeds 0 and 2 (the non-null rows)
    idx = str(tmp_path / "ivf")
    write_ivf_index(emb, cents, idx)
    got2 = ivf_knn_join(
        spark, idx, cents, [(9, [1.0, 0.0])], k=10, nprobe=2
    ).collect()
    assert sorted(r["vec_id"] for r in got2) == [0, 2]


def test_semdedup_skips_null_embeddings(spark):
    from parquet_pipeline_spark.operators.dedup import (
        semdedup_pairs,
        semdedup_pairs_hierarchical,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [1.0, 0.001]), (4, None), (5, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    pairs = semdedup_pairs(emb, n_centroids=1, threshold=0.99).collect()
    assert {(r["keep_id"], r["dup_id"]) for r in pairs} == {(1, 3)}
    hier = semdedup_pairs_hierarchical(
        emb, coarse_cells=1, cluster_size=8, threshold=0.99
    ).collect()
    assert {(r["keep_id"], r["dup_id"]) for r in hier} == {(1, 3)}


def test_degenerate_text_fingerprint_semantics(spark):
    """Null-text docs collide with null-text docs, empty with empty
    (two empty docs ARE trivially identical), and neither collides
    with real text — the documented behavior behind the 'route
    degenerate docs through exact dedup first' scale note."""
    from parquet_pipeline_spark.operators.dedup import (
        banded_minhash,
        incremental_near_dups,
    )

    corpus = spark.createDataFrame(
        [(10, None), (11, ""), (12, "a real document with several words")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(20, None), (21, ""), (22, "completely different real content")],
        "doc_id long, text string",
    )
    flags = {
        r["doc_id"]: (r["dup_of"], r["is_dup"])
        for r in incremental_near_dups(batch, banded_minhash(corpus)).collect()
    }
    assert flags[20] == (10, 1)   # null ≈ null
    assert flags[21] == (11, 1)   # empty ≈ empty
    assert flags[22] == (-1, 0)   # real text matches neither
    # and the operator never crashed on the null-text rows
    assert len(flags) == 3


def test_zero_norm_vectors_not_retrievable(spark, tmp_path):
    """A single all-zeros embedding (failed encode) must not abort
    the job under ANSI mode (DIVIDE_BY_ZERO) and must never be
    retrieved or deduped — cosine against it is undefined. Pinned
    across the expression path (topk), the kernel paths (exact/IVF
    k-NN), the index path, and semantic dedup."""
    from parquet_pipeline_spark.operators.dedup import semdedup_pairs
    from parquet_pipeline_spark.operators.vectors import (
        ann_knn_join,
        exact_knn_join,
        ivf_centroids,
        ivf_knn_join,
        topk,
        write_ivf_index,
    )

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 0.0]),   # zero norm
            (2, [0.6, 0.8]),
            (3, [0.0, 0.0]),   # zero norm
        ],
        "vec_id long, embedding array<double>",
    )
    qv = [1.0, 0.0]

    got = topk(emb, qv, k=10).collect()  # would raise DIVIDE_BY_ZERO before
    assert sorted(r["vec_id"] for r in got) == [0, 2]

    got = exact_knn_join(emb, [(9, qv)], k=10).collect()
    assert sorted(r["vec_id"] for r in got) == [0, 2]

    cents = ivf_centroids(emb, k=2)
    assert all(any(x != 0 for x in vec) for _cid, vec in cents)
    idx = str(tmp_path / "ivf")
    write_ivf_index(emb, cents, idx)
    got = ivf_knn_join(spark, idx, cents, [(9, qv)], k=10, nprobe=2).collect()
    assert sorted(r["vec_id"] for r in got) == [0, 2]

    queries = spark.createDataFrame(
        [(9, qv), (8, [0.0, 0.0])], "q_id long, q_emb array<double>"
    )
    got = ann_knn_join(emb, queries, dim=2, k=10, n_planes=4, n_bands=4).collect()
    assert all(r["q_id"] == 9 for r in got)          # zero query: no rows
    assert sorted({r["vec_id"] for r in got}) == [0, 2]

    pairs = semdedup_pairs(
        emb.unionByName(
            spark.createDataFrame([(4, [1.0, 0.001])], "vec_id long, embedding array<double>")
        ),
        n_centroids=1,
        threshold=0.99,
    ).collect()
    ids = {r["keep_id"] for r in pairs} | {r["dup_id"] for r in pairs}
    assert 1 not in ids and 3 not in ids
    assert {(r["keep_id"], r["dup_id"]) for r in pairs} == {(0, 4)}


def test_temporal_null_ts_and_null_value_contract(spark):
    """Time operators exclude rows that have no position in time
    (NULL ts) and as-of quotes that carry no value — otherwise
    Spark's NULLS-FIRST window ordering vs SQL's NULLS-LAST silently
    diverges, and ignorenulls fills skip PAST a null-valued quote to
    an older one no SQL ASOF join would pick."""
    import datetime as dt

    from parquet_pipeline_spark.operators.temporal import asof_join, sessionize

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    events = spark.createDataFrame(
        [
            (1, 100, t0),
            (2, 100, None),                       # no position in time
            (3, 100, t0 + dt.timedelta(seconds=10)),
            (4, 100, t0 + dt.timedelta(hours=2)),  # new session
        ],
        "event_id long, user_id long, ts timestamp",
    )
    sess = sessionize(events, "user_id", "ts", "event_id", gap_seconds=1800)
    got = {r["event_id"]: r["session_id"] for r in sess.collect()}
    assert got == {1: 0, 3: 0, 4: 1}  # null-ts event 2 excluded

    probe = spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=30)), (2, None)],
        "event_id long, ts timestamp",
    )
    quote = spark.createDataFrame(
        [
            (t0, 1.0),
            (t0 + dt.timedelta(minutes=10), None),  # null-valued quote
        ],
        "ts timestamp, rate double",
    )
    got = {r["event_id"]: r["rate"] for r in asof_join(probe, quote, "ts", "rate").collect()}
    # probe 1's nearest REAL quote is t0 (the null-valued one is not
    # a quote); the null-ts probe is excluded entirely
    assert got == {1: 1.0}
