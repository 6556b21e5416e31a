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
