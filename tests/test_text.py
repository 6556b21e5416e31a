import pytest

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


# ---------------------------------------------------------------------------
# t24 sequence packing (r8): greedy first-fit-in-order semantics
# ---------------------------------------------------------------------------
def test_pack_sequences_greedy_boundaries(spark):
    """Budget 10 over token counts [4, 4, 4, 3, 9]: [4,4] fill seq 0
    (4+4=8, next 4 would hit 12), [4,3] seq 1, [9] seq 2."""
    from parquet_pipeline_spark.operators.text import pack_sequences

    df = spark.createDataFrame(
        [("a", 1, 4), ("a", 2, 4), ("a", 3, 4), ("a", 4, 3), ("a", 5, 9)],
        "source string, doc_id long, toks long",
    )
    out = {
        r["doc_id"]: r["seq_id"]
        for r in pack_sequences(df, "source", "doc_id", "toks", budget=10).collect()
    }
    assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: 2}


def test_pack_sequences_oversized_doc_gets_own_sequence(spark):
    """A doc over budget opens (and monopolizes) its own sequence —
    never dropped, never merged."""
    from parquet_pipeline_spark.operators.text import pack_sequences

    df = spark.createDataFrame(
        [("a", 1, 3), ("a", 2, 25), ("a", 3, 3), ("a", 4, 3)],
        "source string, doc_id long, toks long",
    )
    out = {
        r["doc_id"]: r["seq_id"]
        for r in pack_sequences(df, "source", "doc_id", "toks", budget=10).collect()
    }
    assert out == {1: 0, 2: 1, 3: 2, 4: 2}


def test_pack_sequences_null_tokens_pack_free_and_groups_independent(spark):
    """NULL token counts cost 0 (the NULL-text contract), and each
    group packs independently from seq_id 0."""
    from parquet_pipeline_spark.operators.text import pack_sequences

    df = spark.createDataFrame(
        [("a", 1, 8), ("a", 2, None), ("a", 3, 2), ("b", 1, 9), ("b", 2, 9)],
        "source string, doc_id long, toks long",
    )
    out = {
        (r["source"], r["doc_id"]): r["seq_id"]
        for r in pack_sequences(df, "source", "doc_id", "toks", budget=10).collect()
    }
    assert out == {("a", 1): 0, ("a", 2): 0, ("a", 3): 0,
                   ("b", 1): 0, ("b", 2): 1}


def test_t24_fill_never_exceeds_budget_except_oversized(spark, sf_dir):
    """Invariant over the real fixture: every sequence's token fill
    is <= budget unless it holds exactly one (oversized) doc."""
    from parquet_pipeline_spark import registry

    registry.load_all()
    rows = registry.QUERIES["t24_sequence_packing"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["seq_tokens"] <= 256 or r["n_docs"] == 1


def test_bm25_rank_matches_duckdb_replica(spark, sf_dir):
    """BM25 (r15): the whole scoring pipeline — tokenize, tf, df,
    idf, length normalization — value-matches an independent DuckDB
    replica of the same formula at 6dp on the documents table.
    (Registered as gate row t25_bm25_topk in r16; this replica stays
    as the in-tree twin with different query terms.)"""
    import duckdb

    from parquet_pipeline_spark.operators.text import bm25_rank

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    terms = ["spark", "table", "merge"]
    got = {
        r["doc_id"]: r["score_bm25"]
        for r in bm25_rank(docs, terms).collect()
    }

    con = duckdb.connect()
    want_rows = con.execute(
        f"""
        WITH docs AS (
          SELECT doc_id, string_split(lower(text), ' ') AS toks
          FROM read_parquet('{sf_dir}/documents.parquet')
          WHERE text IS NOT NULL
        ), dl AS (
          SELECT doc_id, len(toks) AS dl FROM docs
        ), stats AS (
          SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl
        ), tf AS (
          SELECT doc_id, term, COUNT(*) AS tf
          FROM (SELECT doc_id, unnest(toks) AS term FROM docs)
          WHERE term IN ('spark', 'table', 'merge')
          GROUP BY doc_id, term
        ), dfreq AS (
          SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        )
        SELECT tf.doc_id,
               ROUND(SUM(
                 ln(1.0 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                 * tf.tf * 2.2
                 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))
               ), 6) AS score
        FROM tf, dfreq, dl, stats
        WHERE tf.term = dfreq.term AND tf.doc_id = dl.doc_id
        GROUP BY tf.doc_id
        """
    ).fetchall()
    want = {int(d): s for d, s in want_rows}
    assert got == pytest.approx(want, abs=2e-6)
    assert len(got) > 0

    with pytest.raises(ValueError, match="empty query"):
        bm25_rank(docs, [])


def test_hybrid_rrf_fusion(spark, sf_dir):
    """RRF (r15): fuse the BM25 keyword ranking with the vector
    cosine ranking over the shared doc/vec id space — hand-replayed
    rank math, full-outer id coverage, deterministic tie-break."""
    from pyspark.sql import functions as F

    from parquet_pipeline_spark.operators.text import bm25_rank
    from parquet_pipeline_spark.operators.vectors import rrf_fuse, topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") == 0).first()["embedding"]

    kw = (
        bm25_rank(docs, ["spark", "window", "sort"])
        .orderBy(F.col("score_bm25").desc(), "doc_id").limit(10)
    )
    vec = (
        topk(emb.filter(F.col("vec_id") != 0), qv, k=10)
        .select(F.col("vec_id").alias("doc_id"), "score")
    )
    fused = rrf_fuse([kw, vec]).collect()

    kw_rank = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            kw.orderBy(F.col("score_bm25").desc(), "doc_id").collect()
        )
    }
    vec_rank = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            vec.orderBy(F.col("score").desc(), "doc_id").collect()
        )
    }
    want = {
        d: round(
            (1.0 / (60 + kw_rank[d]) if d in kw_rank else 0.0)
            + (1.0 / (60 + vec_rank[d]) if d in vec_rank else 0.0),
            6,
        )
        for d in set(kw_rank) | set(vec_rank)
    }
    got = {r["doc_id"]: r["score_rrf"] for r in fused}
    assert got == want
    # output ordering: fused score desc, id asc
    pairs = [(r["score_rrf"], r["doc_id"]) for r in fused]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))
    # an id present in BOTH rankings outscores one present in one
    both = set(kw_rank) & set(vec_rank)
    only = (set(kw_rank) | set(vec_rank)) - both
    if both and only:
        assert max(got[d] for d in both) > min(got[d] for d in only)


def test_bm25_hot_term_cap(spark):
    """VERDICT r15 item 6 (the LSH hot-bucket-cap precedent applied
    to keyword search): with max_df_ratio set, a stopword-grade term
    — one matching more than that fraction of the corpus — is
    dropped from scoring, so it can't blow the result frame (and the
    per-doc aggregate behind it) up to corpus size. Docs matching
    ONLY the hot term disappear; surviving docs score as if the
    query never contained it (classic stopword elimination). A
    constructed corpus, because the synthetic fixture's vocabulary
    is dense (every word sits at ~0.8 df ratio — nothing selective
    to contrast against)."""
    from pyspark.sql import functions as F

    from parquet_pipeline_spark.operators.text import bm25_rank

    # 'the' in every doc; 'quartz' in exactly 2 of 40
    rows = [
        (i, "the quick row " + ("quartz gem " if i < 2 else "plain ") * 3)
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = bm25_rank(docs, ["the", "quartz"])
    assert uncapped.count() == 40  # hot term -> corpus-sized result
    capped = bm25_rank(docs, ["the", "quartz"], max_df_ratio=0.5)
    quartz_only = bm25_rank(docs, ["quartz"])
    got = sorted(tuple(r) for r in capped.collect())
    want = sorted(tuple(r) for r in quartz_only.collect())
    assert got == want and len(got) == 2  # hot term fully eliminated
    # default None keeps classic BM25: every matching doc scored
    assert bm25_rank(docs, ["the"]).count() == 40


def test_bm25_batch_equals_solo(spark, sf_dir):
    """bm25_rank_batch scores each query EXACTLY as its solo
    bm25_rank run (per-term df is query-independent), in one corpus
    pass — including under the hot-term cap."""
    from parquet_pipeline_spark.operators.text import bm25_rank, bm25_rank_batch

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    queries = {
        0: ["spark", "merge"],
        1: ["table", "sort"],
        2: ["window", "spark", "filter"],
    }
    batch = bm25_rank_batch(docs, queries)
    got = {
        (r["q_id"], r["doc_id"]): r["score_bm25"] for r in batch.collect()
    }
    for qid, terms in queries.items():
        solo = {
            (qid, r["doc_id"]): r["score_bm25"]
            for r in bm25_rank(docs, terms).collect()
        }
        assert {k: v for k, v in got.items() if k[0] == qid} == solo

    import pytest as _pytest

    with _pytest.raises(ValueError, match="no query terms"):
        bm25_rank_batch(docs, {0: []})
