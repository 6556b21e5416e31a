import pytest

from pyspark.sql import functions as F

from parquet_pipeline_spark.functions import char_ngrams, jaccard
from parquet_pipeline_spark.operators.dedup import (
    dedup_exact,
    dedup_exact_keep_min,
    minhash_near_dups,
    simhash,
)


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "aaa")], "id long, text string"
    )
    assert dedup_exact(df, ["text"]).count() == 2
    kept = {r["text"]: (r["id"], r["n_copies"])
            for r in dedup_exact_keep_min(df, "text", "id").collect()}
    assert kept == {"aaa": (1, 3), "bbb": (2, 1)}


def test_minhash_finds_planted_near_dups(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun light"
    )
    mutated = base.replace("afternoon", "evening")  # near-dup
    other = (
        "completely different content about spark shuffle partitions "
        "broadcast joins and adaptive query execution at terabyte scale"
    )
    df = spark.createDataFrame(
        [(0, base), (1, mutated), (2, other)], "doc_id long, text string"
    )
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_near_dups(df, threshold=0.6).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_minhash_recall_vs_exact(spark, sf_dir):
    """LSH candidates must recover truly-similar pairs at (at least)
    the banded-LSH theoretical rate. For 32 hashes / 8 bands of 4,
    P(candidate | j) = 1-(1-j^4)^8: ≈0.72 AT the 0.62 threshold and
    ≈0.99 by j=0.8 — so the floors are theory-derived, not tuned to
    one hash draw: ≥0.65 overall (threshold-marginal pairs are
    coin-flips in any banded scheme at this cost) and ≥0.9 for
    strongly-similar pairs, where near-dedup actually operates."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 80)
        .select("doc_id", "text")
    )
    grams = docs.select("doc_id", char_ngrams("text", 3).alias("gs"))
    a = grams.select(F.col("doc_id").alias("id_a"), F.col("gs").alias("gs_a"))
    b = grams.select(F.col("doc_id").alias("id_b"), F.col("gs").alias("gs_b"))
    exact = {
        (r["id_a"], r["id_b"]): r["j"]
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("j", jaccard(F.col("gs_a"), F.col("gs_b")))
        .filter(F.col("j") >= 0.62)
        .collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dups(docs, threshold=0.62).collect()
    }
    assert got.issubset(set(exact)), "verify step must not admit false positives"
    if exact:
        recall = len(got & set(exact)) / len(exact)
        assert recall >= 0.65, f"LSH recall below theory floor: {recall}"
    strong = {p for p, j in exact.items() if j >= 0.8}
    if strong:
        strong_recall = len(got & strong) / len(strong)
        assert strong_recall >= 0.9, f"strong-pair recall too low: {strong_recall}"


def test_minhash_sig_prefilter_lever(spark, sf_dir):
    """The sig_prefilter lever (VERDICT r10 item 3): estimates
    Jaccard from matching signature positions to skip the exact
    verify on obviously-dissimilar banded candidates.

    Contracts: a 0.0 prefilter is a no-op (EXACTLY the base output —
    every candidate still reaches the exact verify); a production
    margin (0.40 under the 0.62 threshold ≈ 2.5σ at 32 hashes) never
    admits a false positive (the exact verify still runs) and keeps
    every strongly-similar pair on this corpus."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 120)
        .select("doc_id", "text")
    )
    base = minhash_near_dups(docs, threshold=0.62)
    noop = minhash_near_dups(docs, threshold=0.62, sig_prefilter=0.0)
    assert noop.exceptAll(base).count() == 0
    assert base.exceptAll(noop).count() == 0

    pre = {
        (r["id_a"], r["id_b"]): r["jac"]
        for r in minhash_near_dups(
            docs, threshold=0.62, sig_prefilter=0.40
        ).collect()
    }
    full = {(r["id_a"], r["id_b"]): r["jac"] for r in base.collect()}
    assert set(pre) <= set(full), "prefilter must not create pairs"
    for p, j in pre.items():
        assert j == full[p], "surviving pairs must carry the exact jaccard"
    strong = {p for p, j in full.items() if j >= 0.8}
    assert strong <= set(pre), "a 2.5-sigma margin must keep strong pairs"


def test_simhash_close_for_near_identical(spark):
    a = "spark makes distributed data processing simple and fast for everyone"
    b = "spark makes distributed data processing simple and fast for anyone"
    c = "unrelated words entirely about cooking pasta with tomato sauce tonight"
    df = spark.createDataFrame([(0, a), (1, b), (2, c)], "id long, text string")
    sigs = {r["id"]: r["s"] for r in df.select("id", simhash("text").alias("s")).collect()}

    def hamming(x, y):
        return bin((x ^ y) & 0xFFFFFFFF).count("1")

    assert hamming(sigs[0], sigs[1]) < hamming(sigs[0], sigs[2])
    # one word changed out of 10: only bits with a thin majority
    # margin can flip — at most a quarter of the 32 bits, far below
    # the ~16 expected between unrelated docs (the exact count is a
    # property of the hash; <= 6 was tuned to the old xxhash64 bits)
    assert hamming(sigs[0], sigs[1]) <= 8
    assert hamming(sigs[0], sigs[2]) >= 10


def test_connected_components_chain(spark):
    """a~b, b~c, d~e → clusters {a,b,c} and {d,e}."""
    from parquet_pipeline_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    comp = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dedup_transitive_keeps_one_per_cluster(spark):
    from parquet_pipeline_spark.operators.dedup import dedup_transitive

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    kept = sorted(r["doc_id"] for r in dedup_transitive(docs, pairs).collect())
    # cluster {0,1,2} → keep 0; {4,5} → keep 4; 3 untouched
    assert kept == [0, 3, 4]


def test_transitive_dedup_on_minhash_pairs(spark, sf_dir):
    """End-to-end: minhash pairs → clusters → deduped corpus is
    smaller and contains no surviving near-dup pair."""
    from pyspark.sql import functions as F

    from parquet_pipeline_spark.operators.dedup import (
        dedup_transitive,
        minhash_near_dups,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )
    pairs = minhash_near_dups(docs, threshold=0.6)
    if pairs.count() == 0:
        return  # nothing to dedup at this threshold/SF
    deduped = dedup_transitive(docs, pairs)
    assert deduped.count() < docs.count()
    kept = {r["doc_id"] for r in deduped.select("doc_id").collect()}
    for r in pairs.collect():
        assert not (r["id_a"] in kept and r["id_b"] in kept), "pair survived dedup"


def test_stratified_sample_deterministic_and_proportional(spark, sf_dir):
    from parquet_pipeline_spark.operators.dedup import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fractions = {"en": 0.5, "fr": 1.0, "de": 0.0}
    s1 = stratified_sample(docs, "lang", fractions, "doc_id")
    s2 = stratified_sample(docs, "lang", fractions, "doc_id")
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    assert ids1 == sorted(r["doc_id"] for r in s2.collect()), "deterministic"

    by_lang = {r["lang"]: r["n"] for r in s1.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    assert by_lang.get("de", 0) == 0
    assert by_lang["fr"] == totals["fr"]          # fraction 1.0 keeps all
    # hash bucketing is approximate: en should be near half
    assert 0.2 * totals["en"] < by_lang["en"] < 0.8 * totals["en"]
    # appending new rows must not change old membership
    s_small = stratified_sample(docs.filter("doc_id < 100"), "lang", fractions, "doc_id")
    small_ids = {r["doc_id"] for r in s_small.collect()}
    assert small_ids == {i for i in ids1 if i < 100}


@pytest.mark.slow
def test_lsh_hot_bucket_cap(spark):
    """A mega-bucket (many shingle-identical docs) must not explode
    into O(n^2) candidates: capped at bucket_cap members, candidates
    from the cluster stay <= cap*(cap-1)/2, and pairs among normal
    docs are unchanged by the cap."""
    from parquet_pipeline_spark.operators.dedup import lsh_candidate_pairs

    boiler = (
        "permission is hereby granted free of charge to any person "
        "obtaining a copy of this software and associated files"
    )
    normal = [
        (10_000, "the quick brown fox jumps over the lazy dog at dawn today"),
        (10_001, "the quick brown fox jumps over the lazy dog at dusk today"),
        (10_002, "adaptive query execution reoptimizes shuffle partitions at runtime"),
    ]
    rows = [(i, boiler) for i in range(2_000)] + normal
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)

    cap = 16
    n_cluster = 2_000
    cands = lsh_candidate_pairs(df, bucket_cap=cap).collect()
    cluster_pairs = [
        (r["id_a"], r["id_b"])
        for r in cands
        if r["id_a"] < n_cluster and r["id_b"] < n_cluster
    ]
    # head pairs all-with-all + one (min_id, member) pair per capped-out
    # member — never O(n^2)
    assert len(cluster_pairs) <= cap * (cap - 1) // 2 + (n_cluster - cap)
    # deterministic: lowest ids survive the cap, so the min id (the
    # transitive-dedup survivor) is still in every kept pair's reach
    assert any(a == 0 for a, _ in cluster_pairs)
    # NO member of the mega-cluster is dropped: every doc beyond the
    # cap still appears in a pair (reachable from the survivor), so
    # transitive dedup removes the whole boilerplate cluster
    members = {a for a, _ in cluster_pairs} | {b for _, b in cluster_pairs}
    assert members == set(range(n_cluster))

    # normal buckets unaffected: the near-dup pair among normal docs
    # is found with and without a tight cap
    normal_pairs = {
        (r["id_a"], r["id_b"]) for r in cands if r["id_a"] >= 10_000
    }
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(df, bucket_cap=1_000_000).collect()
        if r["id_a"] >= 10_000
    }
    assert normal_pairs == uncapped
    assert (10_000, 10_001) in normal_pairs


def test_source_resample_deterministic_and_duplicate_consistent(spark, sf_dir):
    """t14: (a) rerun-stable, (b) exact duplicate texts are kept or
    dropped together regardless of source (hash keyed on content),
    (c) even-index sources survive at ~0.75 and odd at ~0.25."""
    from pyspark.sql import functions as F

    from parquet_pipeline_spark.operators.dedup import source_weighted_resample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept1 = source_weighted_resample(docs).select("doc_id")
    kept2 = source_weighted_resample(docs).select("doc_id")
    assert kept1.subtract(kept2).count() == 0
    assert kept2.subtract(kept1).count() == 0

    # duplicate-consistency: give the same text two sources; the pair
    # must be kept together or dropped together when weights are equal
    dup = spark.createDataFrame(
        [(1, "same words here", "src0"), (2, "same words here", "src2")],
        "doc_id long, text string, source string",
    )
    got = source_weighted_resample(dup).count()
    assert got in (0, 2)

    total = docs.groupBy("source").count().withColumnRenamed("count", "n")
    kept = (
        source_weighted_resample(docs)
        .groupBy("source")
        .count()
        .withColumnRenamed("count", "k")
    )
    rates = (
        total.join(kept, "source", "left")
        .fillna(0, subset=["k"])
        .withColumn("idx", F.substring("source", 4, 10).cast("int"))
        .collect()
    )
    for r in rates:
        expect = 0.75 if r["idx"] % 2 == 0 else 0.25
        assert abs(r["k"] / r["n"] - expect) < 0.25, (r["source"], r["k"], r["n"])


def test_semdedup_pairs_clusters_confine_comparisons(spark):
    """Two well-separated clusters: near-dup pairs appear only
    within a cluster, the planted near-identical pair is found, and
    cross-cluster near-dups are (by design) invisible."""
    from parquet_pipeline_spark.operators.dedup import semdedup_pairs

    a, b = [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]
    rows = [
        (0, a), (1, b),                       # centroids (lowest ids)
        (10, [0.99, 0.01, 0.0, 0.0]),         # cluster A
        (11, [0.98, 0.02, 0.0, 0.0]),         # near-dup of 10
        (20, [0.01, 0.99, 0.0, 0.0]),         # cluster B
        (21, [0.015, 0.985, 0.0, 0.0]),       # near-dup of 20
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = semdedup_pairs(emb, n_centroids=2, threshold=0.95).collect()
    got = {(r["keep_id"], r["dup_id"]) for r in pairs}
    assert (10, 11) in got and (20, 21) in got
    # no pair spans the two clusters
    cluster_of = {0: 0, 10: 0, 11: 0, 1: 1, 20: 1, 21: 1}
    assert all(cluster_of[x] == cluster_of[y] for x, y in got)
    # ids ordered within each pair
    assert all(x < y for x, y in got)


def test_incremental_dedup_persisted_index_roundtrip(spark, sf_dir, tmp_path):
    """The cross-snapshot path: write the banded_minhash index to
    parquet (partitioned by band_id, as a snapshot job would), read
    it back, and dedup a new batch against it. Results must equal
    the inline-index run, the new side must be broadcast (the index
    scan stays shuffle-free), and planted near-identical new docs
    must be flagged with the right corpus attribution."""
    from parquet_pipeline_spark.operators.dedup import (
        banded_minhash,
        incremental_near_dups,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter("doc_id % 4 != 0")
    # new batch: held-out fixture docs + a planted exact copy of a
    # corpus doc under a fresh id
    planted_src = corpus.orderBy("doc_id").first()
    batch = docs.filter("doc_id % 4 = 0").unionByName(
        spark.createDataFrame(
            [(900000, planted_src["text"], "en", "web", len(planted_src["text"]))],
            docs.schema,
        )
    )

    idx_path = str(tmp_path / "minhash_index")
    banded_minhash(corpus, num_hashes=16, bands=4).write.partitionBy(
        "band_id"
    ).parquet(idx_path)
    index = spark.read.parquet(idx_path)

    out = incremental_near_dups(batch, index, num_hashes=16, bands=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # batch side broadcast

    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == batch.count()
    planted = rows[900000]
    assert planted["is_dup"] == 1
    assert planted["dup_of"] == planted_src["doc_id"]

    inline = incremental_near_dups(
        batch,
        banded_minhash(corpus, num_hashes=16, bands=4),
        num_hashes=16,
        bands=4,
    )
    assert sorted(map(tuple, inline.collect())) == sorted(
        (r["doc_id"], r["dup_of"], r["is_dup"]) for r in rows.values()
    )


def test_d09_semdedup_scaled_invariants(spark):
    """d09's rows-only driver check is backed here: pairs exist on
    the fixture, every pair respects the threshold / id-order /
    same-cluster contracts, and the centroid count follows the
    n/64 policy."""
    from parquet_pipeline_spark import registry

    registry.load_all()
    out = registry.QUERIES["d09_semdedup_scaled"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(out) > 0
    n_vec = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    ).count()
    k = max(n_vec // 64, 8)
    for r in out:
        assert r["cos_sim"] >= 0.30 - 1e-9
        assert r["keep_id"] < r["dup_id"]
    # cluster ids are centroid vec_ids: the k lowest ids
    assert {r["cluster_id"] for r in out} <= set(range(k))


def test_incremental_dedup_shuffle_fallback_matches_broadcast(spark, sf_dir):
    """broadcast_new=False (backfill-sized batches) must produce the
    identical result via a shuffle join."""
    from parquet_pipeline_spark.operators.dedup import (
        banded_minhash,
        incremental_near_dups,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter("doc_id % 4 != 0")
    batch = docs.filter("doc_id % 4 = 0")
    index = banded_minhash(corpus, num_hashes=16, bands=4)
    kw = dict(num_hashes=16, bands=4)
    a = incremental_near_dups(batch, index, broadcast_new=True, **kw)
    b = incremental_near_dups(batch, index, broadcast_new=False, **kw)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    plan_b = b._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan_b or "ShuffledHashJoin" in plan_b


def test_semdedup_hierarchical_invariants_and_planted_pair(spark):
    """Two-level SemDeDup: planted near-identical pairs are found,
    every pair respects threshold/id-order, and comparisons stay
    inside one fine cluster (cluster_id = a real vector id)."""
    import numpy as np

    from parquet_pipeline_spark.operators.dedup import (
        semdedup_pairs_hierarchical,
    )

    rng = np.random.default_rng(7)
    rows = []
    # 4 well-separated directions, 30 vectors each + planted dups
    base = np.eye(4)
    vid = 0
    planted = []
    for c in range(4):
        for i in range(30):
            v = base[c] + rng.normal(scale=0.05, size=4)
            rows.append((vid, v.astype(float).tolist()))
            vid += 1
        # planted near-duplicate of the cluster's first member
        src_id = c * 30
        dup = np.array(rows[src_id][1]) + rng.normal(scale=0.001, size=4)
        rows.append((vid, dup.astype(float).tolist()))
        planted.append((src_id, vid))
        vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = semdedup_pairs_hierarchical(
        emb, coarse_cells=8, cluster_size=16, threshold=0.98
    ).collect()
    got = {(r["keep_id"], r["dup_id"]) for r in out}
    all_ids = {r[0] for r in rows}
    for r in out:
        assert r["cos_sim"] >= 0.98 - 1e-9
        assert r["keep_id"] < r["dup_id"]
        assert r["cluster_id"] in all_ids
    for a, b in planted:
        assert (a, b) in got, (a, b, sorted(got)[:10])


def test_verify_incremental_candidates_drops_false_positives(spark, sf_dir):
    """The exact-Jaccard verify pass keeps planted true duplicates
    and drops band-collision false positives, touching only the
    matched corpus ids' text."""
    from parquet_pipeline_spark.functions import char_ngrams, jaccard
    from parquet_pipeline_spark.operators.dedup import (
        banded_minhash,
        incremental_near_dups,
        verify_incremental_candidates,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter("doc_id % 4 != 0").select("doc_id", "text")
    src = corpus.orderBy("doc_id").first()
    batch = docs.filter("doc_id % 4 = 0").select("doc_id", "text").unionByName(
        spark.createDataFrame([(900001, src["text"])], "doc_id long, text string")
    )
    index = banded_minhash(corpus, num_hashes=16, bands=4)
    flags = incremental_near_dups(batch, index, num_hashes=16, bands=4)
    n_cand = flags.filter("is_dup = 1").count()

    verified = verify_incremental_candidates(
        flags, corpus, batch, threshold=0.62
    ).collect()
    by_id = {r["doc_id"]: r for r in verified}
    # the planted exact copy survives with jaccard 1.0 against its source
    assert by_id[900001]["dup_of"] == src["doc_id"]
    assert by_id[900001]["jaccard"] == 1.0
    # verification can only shrink the candidate set
    assert 0 < len(verified) <= n_cand
    # every surviving pair really clears the threshold (recompute)
    g = {r["doc_id"]: set() for r in verified}
    texts = {r["doc_id"]: r["text"] for r in batch.collect()}
    texts.update({r["doc_id"]: r["text"] for r in corpus.collect()})
    def grams(t):
        return {t[i:i+3] for i in range(max(len(t)-2, 1))}
    for r in verified:
        a, b = grams(texts[r["doc_id"]]), grams(texts[r["dup_of"]])
        jac = len(a & b) / len(a | b)
        assert abs(jac - r["jaccard"]) < 1e-4, (r, jac)


def test_semdedup_hierarchical_recall_floor_across_cells(spark):
    """Regression guard for the recall curve measured in
    tools/semdedup_recall_curve.py (BENCH_NOTES r7): near-identical
    planted pairs must survive the double quantization at >= 0.9
    recall at EVERY coarse-cell setting — the measured loss
    concentrates on mid-similarity boundary pairs, never on true
    duplicates."""
    import numpy as np

    from parquet_pipeline_spark.operators.dedup import (
        semdedup_pairs_hierarchical,
    )

    rng = np.random.default_rng(11)
    dirs = rng.normal(size=(12, 16))
    dirs /= np.linalg.norm(dirs, axis=1)[:, None]
    rows, planted = [], []
    vid = 0
    firsts = []
    for c in range(12):
        for i in range(60):
            v = dirs[c] + rng.normal(scale=0.08, size=16)
            rows.append((vid, [float(x) for x in v]))
            if i == 0:
                firsts.append(vid)
            vid += 1
    for j in range(40):
        src = firsts[j % len(firsts)]
        dup = np.array(rows[src][1]) + rng.normal(scale=0.002, size=16)
        rows.append((vid, [float(x) for x in dup]))
        planted.append((src, vid))
        vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).localCheckpoint()

    for cells in (4, 16, 64):
        got = {
            (r["keep_id"], r["dup_id"])
            for r in semdedup_pairs_hierarchical(
                emb, coarse_cells=cells, cluster_size=64, threshold=0.95
            ).collect()
        }
        recall = len(got & set(planted)) / len(planted)
        assert recall >= 0.9, (cells, recall)


def test_simhash_table_matches_column_form(spark):
    """r10: simhash_table (explode + codegen integer-majority
    aggregates) is byte-identical to the Column-form spec, including
    the degenerate rows — NULL text → 0, zero tokens → all bits set
    (0 ≥ 0 majority). Integer bit counts are order-insensitive, so
    the aggregate restructure cannot flip a bit (unlike float folds)."""
    from parquet_pipeline_spark.operators.dedup import simhash, simhash_table

    rows = [
        (1, None),
        (2, ""),
        (3, "   "),
        (4, "one"),
        (5, "a b a b b"),
        (6, "the quick brown fox jumps over the lazy dog"),
        (7, "ünïcode tökens\tand\nnewlines everywhere"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    old = df.select("doc_id", simhash("text", 32).alias("s"))
    new = simhash_table(df, "doc_id", "text", 32, out_col="s")
    assert old.exceptAll(new).count() == 0 and new.exceptAll(old).count() == 0


def test_minhash_sig_array_matches_columns_form(spark):
    """r16 round 2: minhash_sig_table(as_array=True) builds the whole
    32-seed aggregation as ONE SQL-parsed array expression (a plan-
    construction optimization); it must stay byte-identical to the
    columns form assembled into an array, for both hash_fns and for
    degenerate docs (NULL/empty text -> all-NULL signature)."""
    from parquet_pipeline_spark.operators.dedup import minhash_sig_table

    rows = [
        (1, None),
        (2, ""),
        (3, "ab"),
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, "the quick brown fox jumps over the lazy cat"),
        (6, "ünïcode tökens and more"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for hash_fn in ("xxhash64", "md5"):
        cols = minhash_sig_table(df, "doc_id", "text", 16, hash_fn=hash_fn)
        old = cols.selectExpr(
            "doc_id", "array(" + ",".join(f"_h{i}" for i in range(16)) + ") AS sig"
        )
        new = minhash_sig_table(
            df, "doc_id", "text", 16, hash_fn=hash_fn, as_array=True
        )
        assert old.exceptAll(new).count() == 0, hash_fn
        assert new.exceptAll(old).count() == 0, hash_fn
