import datetime as dt

from pyspark.sql import functions as F

from parquet_pipeline_spark.operators.temporal import (
    asof_join,
    range_join_within,
    sessionize,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    probes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:15:00")),  # before any quote → NULL
            (2, _ts("2024-01-01 01:00:00")),  # exactly at q1 → q1 (tie incl.)
            (3, _ts("2024-01-03 12:00:00")),  # bucket with no quote → carry q2
        ],
        "id long, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            (_ts("2024-01-01 01:00:00"), 10.0),
            (_ts("2024-01-02 05:00:00"), 20.0),
        ],
        "ts timestamp, rate double",
    )
    out = {r["id"]: r["rate"] for r in asof_join(probes, quotes, "ts", "rate").collect()}
    assert out == {1: None, 2: 10.0, 3: 20.0}


def test_asof_join_with_by_keys(spark):
    probes = spark.createDataFrame(
        [("A", 1, _ts("2024-01-01 02:00:00")), ("B", 2, _ts("2024-01-01 02:00:00"))],
        "sym string, id long, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 01:00:00"), 1.0),
            ("B", _ts("2024-01-01 01:30:00"), 2.0),
            ("B", _ts("2024-01-01 01:59:00"), 3.0),
        ],
        "sym string, ts timestamp, rate double",
    )
    out = {
        r["id"]: r["rate"]
        for r in asof_join(probes, quotes, "ts", "rate", by=["sym"]).collect()
    }
    assert out == {1: 1.0, 2: 3.0}


def test_sessionize_gap_rule(spark):
    ev = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01 00:00:00")),
            (2, 100, _ts("2024-01-01 00:10:00")),   # same session (10 min)
            (3, 100, _ts("2024-01-01 01:00:00")),   # gap 50 min > 30 → new
            (4, 200, _ts("2024-01-01 00:00:00")),   # other user → own session 0
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = {
        r["event_id"]: r["session_id"]
        for r in sessionize(ev, gap_seconds=1800).collect()
    }
    assert out == {1: 0, 2: 0, 3: 1, 4: 0}


def test_range_join_bucket_boundary(spark):
    """Pairs straddling a bucket boundary must still match (the
    explode-into-next-bucket part of the trick)."""
    ev = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-01 00:04:50")),
            (2, 7, _ts("2024-01-01 00:05:10")),  # 20s later, next 5-min bucket
            (3, 7, _ts("2024-01-01 00:20:00")),  # too far from both
            (4, 8, _ts("2024-01-01 00:04:55")),  # right time, wrong user
        ],
        "event_id long, user_id long, ts timestamp",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["delta_seconds"]
        for r in range_join_within(ev, "user_id", "ts", "event_id", 300).collect()
    }
    assert pairs == {(1, 2): 20}


def test_asof_join_forward_direction(spark):
    probes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:15:00")),  # next quote q1
            (2, _ts("2024-01-01 01:00:00")),  # exactly at q1 → q1 (tie incl.)
            (3, _ts("2024-01-01 12:00:00")),  # carry forward across buckets → q2
            (4, _ts("2024-01-05 00:00:00")),  # after all quotes → NULL
        ],
        "id long, ts timestamp",
    )
    quotes = spark.createDataFrame(
        [
            (_ts("2024-01-01 01:00:00"), 10.0),
            (_ts("2024-01-02 05:00:00"), 20.0),
        ],
        "ts timestamp, rate double",
    )
    out = {
        r["id"]: r["rate"]
        for r in asof_join(
            probes, quotes, "ts", "rate", direction="forward"
        ).collect()
    }
    assert out == {1: 10.0, 2: 10.0, 3: 20.0, 4: None}


def test_interval_overlap_join_half_open_boundary(spark):
    """Touching intervals (a.end == b.start) do NOT overlap under
    half-open semantics; containment and partial overlap do. Pairs
    spanning several shared buckets appear exactly once."""
    from parquet_pipeline_spark.operators.temporal import interval_overlap_join

    rows = [
        # k, id, start, end
        ("u", 1, "2024-01-01 00:00:00", "2024-01-03 00:00:00"),
        ("u", 2, "2024-01-03 00:00:00", "2024-01-04 00:00:00"),  # touches 1: no
        ("u", 3, "2024-01-02 00:00:00", "2024-01-05 00:00:00"),  # overlaps 1,2
        ("u", 4, "2024-01-02 06:00:00", "2024-01-02 07:00:00"),  # inside 1 and 3
        ("v", 5, "2024-01-01 00:00:00", "2024-01-09 00:00:00"),  # other key
    ]
    iv = spark.createDataFrame(rows, "k string, id int, s string, e string").select(
        "k", "id", F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in interval_overlap_join(iv, "k", "s", "e", "id", bucket="1 day").collect()
    }
    assert got == {(1, 3), (2, 3), (1, 4), (3, 4)}


def test_interval_overlap_join_degenerate_intervals(spark):
    """Empty (end == start) and inverted (end < start) intervals are
    dropped before the bucket explode — they can overlap nothing
    under half-open semantics, and previously made F.sequence throw
    (start > stop with a positive step), failing the whole job."""
    from parquet_pipeline_spark.operators.temporal import interval_overlap_join

    rows = [
        ("u", 1, "2024-01-01 00:00:00", "2024-01-03 00:00:00"),
        ("u", 2, "2024-01-02 00:00:00", "2024-01-02 00:00:00"),  # empty
        ("u", 3, "2024-01-05 00:00:00", "2024-01-01 00:00:00"),  # inverted
        ("u", 4, "2024-01-02 00:00:00", "2024-01-04 00:00:00"),  # overlaps 1
    ]
    iv = spark.createDataFrame(rows, "k string, id int, s string, e string").select(
        "k", "id", F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in interval_overlap_join(iv, "k", "s", "e", "id", bucket="1 day").collect()
    }
    assert got == {(1, 4)}
