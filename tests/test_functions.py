from pyspark.sql import functions as F

from parquet_pipeline_spark.functions import (
    char_ngrams,
    jaccard,
    salted_join,
    word_tokens,
)


def test_char_ngrams(spark):
    df = spark.createDataFrame([("abcd",), ("ab",)], "t string")
    out = [r["g"] for r in df.select(char_ngrams("t", 3).alias("g")).collect()]
    assert out[0] == ["abc", "bcd"]
    assert out[1] == ["ab"]  # short string → single truncated gram


def test_jaccard_identity_and_disjoint(spark):
    df = spark.createDataFrame([(["a", "b"], ["a", "b"]), (["a"], ["b"])], "x array<string>, y array<string>")
    vals = [r["j"] for r in df.select(jaccard(F.col("x"), F.col("y")).alias("j")).collect()]
    assert vals == [1.0, 0.0]


def test_word_tokens_strips_empties(spark):
    df = spark.createDataFrame([("  a   b  ",)], "t string")
    assert df.select(word_tokens("t").alias("w")).first()["w"] == ["a", "b"]


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = (
        orders.join(cust, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("v"))
    )
    salted = (
        salted_join(orders, cust, "o_custkey", salt=8)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("v"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_semantics(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, lv string")
    right = spark.createDataFrame([(1, "x"), (1, "y")], "k int, rv string")
    plain = left.join(right, "k", "left")
    salted = salted_join(left, right, "k", salt=4, how="left")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_word_shingles_edges(spark):
    from parquet_pipeline_spark.functions import word_shingles

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "solo"), (3, ""), (4, None),
         (5, "  spaced   out  tokens ")],
        "id int, text string",
    )
    out = {r["id"]: r["sh"] for r in df.select("id", word_shingles("text", 2).alias("sh")).collect()}
    assert out[1] == ["the quick", "quick brown", "brown fox"]
    assert out[2] == [] and out[3] == []  # fewer than n tokens
    assert out[5] == ["spaced out", "out tokens"]  # whitespace-robust


def test_bloom_prejoin_matches_plain_join(spark, sf_dir):
    """No false negatives: the bloom-prefiltered join returns exactly
    the plain join's rows."""
    from parquet_pipeline_spark.functions.bloom import bloom_prejoin

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    dim = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .select("c_custkey")
    )
    plain = orders.join(dim, orders.o_custkey == dim.c_custkey)
    pre = bloom_prejoin(orders, dim, "o_custkey", "c_custkey")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, pre.collect()))


def test_bloom_probe_selectivity(spark):
    """The probe actually sheds non-member rows: with 1k member keys
    in a 2^16-bit filter, non-members pass at well under 5%."""
    from parquet_pipeline_spark.functions.bloom import build_bloom, with_bloom_hit

    members = spark.range(0, 1000).withColumnRenamed("id", "k")
    probes = spark.range(1000, 21000).withColumnRenamed("id", "k")
    bitmap = build_bloom(members, "k")
    hits = with_bloom_hit(probes, bitmap, "k").filter(F.col("_bloom_hit")).count()
    assert hits / 20000 < 0.05, hits
    # ...and every member passes
    mh = with_bloom_hit(members, bitmap, "k").filter(F.col("_bloom_hit")).count()
    assert mh == 1000


def test_span_dedup_first_occurrence_and_lossless(spark):
    """Unique docs survive byte-identical; a doc that repeats an
    earlier doc's span loses exactly that span, and the earlier
    (lower doc_id) occurrence is the one kept."""
    from parquet_pipeline_spark.operators.corpus import span_dedup

    base = " ".join(f"w{i}" for i in range(30))        # 2 full spans
    tail = " ".join(f"t{i}" for i in range(7))          # partial span
    copier = " ".join(f"w{i}" for i in range(15)) + " " + tail
    df = spark.createDataFrame(
        [(1, base), (2, copier), (3, "solo words only")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in span_dedup(df, span_words=15).collect()}
    assert out[1]["clean_text"] == base and out[1]["kept_spans"] == 2
    # doc 2's first span duplicated doc 1's first span -> dropped
    assert out[2]["clean_text"] == tail
    assert out[2]["n_spans"] == 2 and out[2]["kept_spans"] == 1
    assert out[3]["clean_text"] == "solo words only"


def test_cms_never_underestimates(spark, sf_dir):
    """CMS guarantees estimate >= exact count, with equality for the
    heavy tokens when collisions are light."""
    from parquet_pipeline_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["a07_cms_heavy_hitters"](spark, sf_dir).collect()
    assert len(rows) == 10
    assert all(r["cms_count"] >= r["exact_count"] for r in rows)


def test_quarantine_split_partitions_exactly(spark, sf_dir):
    """clean + quarantined = input, disjoint; every quarantined row's
    reasons string names exactly its violated rules."""
    from parquet_pipeline_spark.operators.quality import quarantine_split

    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, None, "A"), (3, 5.0, "X"), (4, -1.0, "X")],
        "id int, price double, flag string",
    )
    clean, bad = quarantine_split(
        df, [("range", "price", 0, 100), ("in_set", "flag", ["A", "B"])]
    )
    assert {r["id"] for r in clean.collect()} == {1}
    reasons = {r["id"]: r["reasons"] for r in bad.collect()}
    assert reasons == {
        2: "range:price",
        3: "in_set:flag",
        4: "in_set:flag,range:price",
    }


def test_bloom_prejoin_builds_bitmap_in_plan(spark):
    """r16 round 2: bloom_prejoin assembles its bitmap as an
    uncorrelated scalar subquery inside the probe plan (the
    SPARK-32268 runtime-filter shape) instead of a driver-side
    collect() job. Pin the shape: the probe plan hosts subqueries
    (so no collect can run during plan construction) and the probe
    predicate still references the getbit arithmetic."""
    from parquet_pipeline_spark.functions.bloom import bloom_prejoin

    fact = spark.range(0, 1000).selectExpr("id AS fk", "id % 7 AS payload")
    dim = spark.range(0, 100).selectExpr("(id * 3) AS dk")
    joined = bloom_prejoin(fact, dim, "fk", "dk")
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Subquery" in plan, "bitmap subquery missing from probe plan"
    assert "getbit" in plan, "bloom probe predicate missing"
    # result identity with the plain join (the operator's contract)
    plain = fact.join(dim, fact.fk == dim.dk)
    assert joined.exceptAll(plain).count() == 0
    assert plain.exceptAll(joined).count() == 0
