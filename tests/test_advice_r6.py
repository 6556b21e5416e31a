"""Regression tests for the round-5 ADVICE findings (round 6).

Each test pins a latent edge case the sf-fixture gate could not
reach: ANSI-mode descending ``sequence`` on short inputs (t22 /
t08 / raw frames), bloom_prejoin outer-join misuse, the
exact_knn_join in-batch tie-break, and the d08 oracle's centroid
pin under non-contiguous vec_id layouts.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from parquet_pipeline_spark import registry

registry.load_all()


def _normalize(pdf):
    """Driver-style order-insensitive compare key (6dp floats)."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        col = pdf[c]
        if str(col.dtype).startswith(("float", "Float")):
            pdf[c] = col.map(lambda v: "NULL" if pd.isna(v) else f"{v:.6f}")
        else:
            pdf[c] = col.map(lambda v: "NULL" if pd.isna(v) else str(v))
    return sorted(map(tuple, pdf.values.tolist()))


def _oracle_on(tmp_dir: str, name: str):
    import duckdb

    import os

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        path = f"{tmp_dir}/{t}.parquet"
        if not os.path.exists(path):
            continue  # fixture dir only carries the tables the test wrote
        glob = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')"
        )
    return con.execute(registry.ORACLES[name]).df()


def _write_short_docs(spark, tmp_path) -> str:
    rows = [
        (1, "", "en", "web", 0),
        (2, "solo", "en", "web", 4),
        (3, "two words", "en", "web", 9),
        (4, "alpha beta alpha beta gamma", "en", "books", 27),
        (5, "   ", "en", "web", 3),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


@pytest.mark.slow
def test_t22_lm_score_survives_short_docs(spark, tmp_path):
    """A <=1-token doc must contribute zero bigrams, not crash with
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT (descending sequence under
    ANSI). Result must still hash-match the DuckDB oracle."""
    d = _write_short_docs(spark, tmp_path)
    got = registry.QUERIES["t22_lm_score"](spark, d).toPandas()
    assert set(got["doc_id"]) == {3, 4}  # only multi-token docs score
    want = _oracle_on(d, "t22_lm_score")
    assert _normalize(got) == _normalize(want)


def test_t08_bigrams_no_phantom_unigram(spark, tmp_path):
    """1-token docs must not emit a bogus (w, null)->"w" bigram."""
    d = _write_short_docs(spark, tmp_path)
    got = registry.QUERIES["t08_word_bigrams"](spark, d).toPandas()
    assert "solo" not in set(got["bigram"])
    want = _oracle_on(d, "t08_word_bigrams")
    assert _normalize(got) == _normalize(want)


@pytest.mark.slow
def test_bloom_prejoin_rejects_outer_joins(spark):
    from parquet_pipeline_spark.functions.bloom import bloom_prejoin

    fact = spark.range(100).withColumnRenamed("id", "fk")
    dim = spark.range(10).withColumnRenamed("id", "dk")
    for how in ("left", "right", "full", "left_outer", "cross"):
        with pytest.raises(ValueError, match="bloom_prejoin"):
            bloom_prejoin(fact, dim, "fk", "dk", how=how)
    # inner still works and equals the plain join
    got = bloom_prejoin(fact, dim, "fk", "dk", how="inner")
    assert got.count() == 10


def test_extract_raw_frames_short_payload(spark):
    """Payload shorter than one frame -> zero frame rows (no bogus
    frame_idx 0 / -1 rows from a descending sequence)."""
    from parquet_pipeline_spark.operators.multimodal import extract_raw_frames

    w = h = 2  # frame_size = 12 bytes
    rows = [
        (1, bytearray(b"\x01" * 5)),     # < one frame -> 0 rows
        (2, bytearray(b"")),              # empty -> 0 rows
        (3, bytearray(b"\x02" * 24)),    # exactly 2 frames
        (4, bytearray(b"\x03" * 30)),    # 2 frames + partial tail
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    for every_n in (1, 2):
        out = extract_raw_frames(media, w, h, every_n=every_n).toPandas()
        assert set(out[out["media_id"].isin([1, 2])].index) == set()
        assert (out["frame_idx"] >= 0).all()
        per_id = out.groupby("media_id")["frame_idx"].apply(list).to_dict()
        expect = [0] if every_n == 2 else [0, 1]
        assert per_id.get(3, []) == expect
        assert per_id.get(4, []) == expect
        assert all(len(b) == 12 for b in out["frame_bytes"])


@pytest.mark.slow
def test_exact_knn_join_tie_break_across_batches(spark):
    """Candidates tied at the k-th score must be kept by (score
    desc, vec_id asc) even when the tie straddles a per-batch
    top-k cut: duplicate vectors spread over 4 partitions."""
    from parquet_pipeline_spark.operators.vectors import exact_knn_join

    vec = [1.0, 0.0, 0.0]
    corpus = spark.createDataFrame(
        [(int(i), vec) for i in range(40, 0, -1)],
        "vec_id long, embedding array<float>",
    ).repartition(4)
    out = exact_knn_join(corpus, [(0, vec)], k=5).toPandas()
    assert sorted(out["vec_id"]) == [1, 2, 3, 4, 5]


def test_d08_oracle_matches_on_offset_vec_ids(spark, tmp_path):
    """The d08 centroid set is 'the 8 lowest ids' — both sides must
    agree even when vec_ids don't start at 0 (the old oracle pinned
    WHERE vec_id < 8, which only coincided for contiguous ids)."""
    import numpy as np

    rng = np.random.default_rng(42)
    n, dim = 48, 8
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64) + 1000,
            "embedding": [rng.normal(size=dim).astype(np.float32).tolist() for _ in range(n)],
            "label": np.zeros(n, dtype=np.int32),
        }
    )
    d = str(tmp_path)
    spark.createDataFrame(
        pdf, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    got = registry.QUERIES["d08_semdedup_pairs"](spark, d).toPandas()
    want = _oracle_on(d, "d08_semdedup_pairs")
    assert len(got) > 0  # fixture must actually exercise pair output
    assert _normalize(got) == _normalize(want)
