from pyspark.sql import functions as F

from parquet_pipeline_spark.operators.text import (
    assign_chunks,
    greedy_chunk,
    serialize_rows,
    stopword_ratio,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_serialize_format(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "lang").limit(3)
    rows = docs.select(serialize_rows(docs, "doc_id").alias("t")).collect()
    for r in rows:
        assert r["t"].startswith("[index ")
        assert " | lang:" in r["t"]


def test_serialize_null_becomes_NULL(spark):
    df = spark.createDataFrame([(1, None)], "id long, v string")
    out = df.select(serialize_rows(df, "id").alias("t")).first()["t"]
    assert out == "[index 1] id:1 | v:NULL"


def test_greedy_chunk_invariants(spark, sf_dir):
    """FIXTURES.md §5: every row in exactly one chunk, order
    preserved, chunk closes when the next row would overflow."""
    docs = _docs(spark, sf_dir).select("doc_id", "text", "source")
    chunks = greedy_chunk(docs, "source", "doc_id", "text", max_chars=1000).collect()
    by_group: dict[str, list] = {}
    for row in chunks:
        by_group.setdefault(row["source"], []).append(row)

    src_rows = docs.collect()
    texts = {r["doc_id"]: r["text"] for r in src_rows}
    for source, rows in by_group.items():
        rows.sort(key=lambda r: r["chunk_id"])
        seen = [rid for r in rows for rid in r["row_ids"]]
        expected = sorted(r["doc_id"] for r in src_rows if r["source"] == source)
        assert seen == expected, "every row exactly once, order preserved"
        for r in rows:
            # size bound holds unless a single row exceeds the limit
            if len(r["row_ids"]) > 1:
                assert len(r["chunk_text"]) <= 1000
            assert r["chunk_text"] == "\n".join(texts[i] for i in r["row_ids"])


def test_assign_chunks_monotone(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    out = assign_chunks(docs, "doc_id", F.col("n_chars"), max_chars=2000).collect()
    out.sort(key=lambda r: r["doc_id"])
    ids = [r["chunk_id"] for r in out]
    assert ids == sorted(ids), "chunk ids non-decreasing in row order"
    assert ids[0] == 0


def test_stopword_ratio_bounds(spark, sf_dir):
    vals = (
        _docs(spark, sf_dir)
        .select(stopword_ratio("text").alias("r"))
        .agg(F.min("r"), F.max("r"))
        .first()
    )
    assert 0.0 <= vals[0] <= vals[1] <= 1.0


def test_bpe_regex_tokenizer_contractions_and_runs(spark):
    """t15's pre-tokenizer splits contractions ('ll), letter runs,
    digit runs, and punctuation runs exactly like the GPT-2 pattern
    on ASCII text — pinned on a hand-checked example."""
    from pyspark.sql import functions as F

    from parquet_pipeline_spark.operators.text import bpe_regex_tokens

    df = spark.createDataFrame([("I'll say it`s 42 cats, dogs!",)], "text string")
    got = df.select(bpe_regex_tokens(F.col("text")).alias("t")).collect()[0]["t"]
    assert got == ["I", "'ll", "say", "it", "`", "s", "42", "cats", ",", "dogs", "!"]


def test_quality_percentile_filter_per_source_quartile(spark, sf_dir):
    """t16: each source independently keeps ~75% of its docs (the
    bottom quartile by quality is dropped per source, not globally),
    and every kept row's pct is >= 0.25."""
    from pyspark.sql import functions as F

    from parquet_pipeline_spark import registry

    registry.load_all()
    t16 = registry.QUERIES["t16_quality_percentile_filter"]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    kept_rows = t16(spark, sf_dir).collect()
    assert all(r["pct"] >= 0.25 for r in kept_rows)
    kept: dict = {}
    for r in kept_rows:
        kept[r["source"]] = kept.get(r["source"], 0) + 1
    for src, n in total.items():
        frac = kept.get(src, 0) / n
        assert 0.6 <= frac <= 0.8, (src, frac)
