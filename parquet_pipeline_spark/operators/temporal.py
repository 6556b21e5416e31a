"""Temporal operators: as-of join, sessionization, range self-join.

None of these exist in the reference (SURVEY §2B: "as-of/range/
interval joins … not present") — they're part of the beyond-reference
surface a time-series-capable engine needs, built as compositions of
existing DataFrame ops (no custom physical operators required).

Scale design:
- ``asof_join`` is the distributed two-pass pattern: a *bucketed*
  union-window pass (windows partitioned by (keys, time-bucket) →
  parallel) plus a tiny bucket-summary prefix pass broadcast back.
  No global single-task window anywhere, so it survives 100 TB of
  probes against millions of quotes.
- ``sessionize`` is the classic lag/gap/cumsum window per entity —
  partitioned by the entity key, the natural shuffle.
- ``range_join_within`` avoids Spark's O(n·m) broadcast-nested-loop
  range join by exploding each row into its time bucket and the
  successor bucket, equi-joining on (key, bucket), then filtering the
  exact range predicate — linear in data size for bounded ranges.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from parquet_pipeline_spark import tables
from parquet_pipeline_spark.registry import register


def asof_join(
    probe: DataFrame,
    quote: DataFrame,
    ts_col: str,
    value_col: str,
    by: list[str] | None = None,
    bucket: str = "1 day",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each probe row gets the nearest ``value_col`` from
    ``quote`` at-or-before its timestamp (``direction="backward"``,
    the default) or at-or-after it (``"forward"`` — pandas
    merge_asof parity), optionally per ``by`` keys. Ties include
    equality. Probe rows with no matching quote keep NULL (left
    semantics).

    Two passes, both parallel:
    1. union probes+quotes, window *within* (by, time-bucket) to find
       the nearest qualifying quote inside each probe's bucket;
    2. per-(by, bucket) boundary-quote summary (tiny), filled across
       buckets via a window over buckets, joined back; the final
       value is coalesce(within-bucket, other-buckets).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    back = direction == "backward"
    by = by or []
    # rows without a timestamp have no position in time: a null-ts
    # probe can never match and a null-ts quote can never be matched —
    # excluded by contract (otherwise the bucket expression silently
    # loses them, and engines disagree on NULL ordering). A quote with
    # a NULL value is not a quote either: the window's ignorenulls
    # fill would otherwise skip PAST it to an older quote, which no
    # SQL ASOF join would do — excluding it makes "nearest quote"
    # mean the same thing on both sides.
    probe = probe.filter(F.col(ts_col).isNotNull())
    quote = quote.filter(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    )
    q = quote.select(
        *by, F.col(ts_col).alias(ts_col), F.col(value_col).alias("_q_val")
    ).withColumn("_is_probe", F.lit(0))
    p = probe.withColumn("_is_probe", F.lit(1))
    u = p.unionByName(q, allowMissingColumns=True).withColumn(
        "_bkt", F.window(F.col(ts_col), bucket)["start"]
    )

    # pass 1: within-bucket fill. Tie order puts the quote on the
    # probe's qualifying side at equal ts → equality included:
    # backward scans the preceding frame (quotes sort first), forward
    # scans the following frame (quotes sort last).
    tie = F.col("_is_probe").asc() if back else F.col("_is_probe").desc()
    w_in = W.partitionBy(*by, "_bkt").orderBy(F.col(ts_col).asc(), tie)
    if back:
        w_in = w_in.rowsBetween(W.unboundedPreceding, W.currentRow)
        within = F.last("_q_val", ignorenulls=True).over(w_in)
    else:
        w_in = w_in.rowsBetween(W.currentRow, W.unboundedFollowing)
        within = F.first("_q_val", ignorenulls=True).over(w_in)
    u = u.withColumn("_within", within)

    # pass 2: boundary quote per bucket (small: one row per bucket),
    # then for each bucket the nearest quote from any earlier
    # (backward) / later (forward) bucket. The spine must include
    # PROBE buckets too — a probe bucket with no quotes still needs
    # the carried value.
    spine = u.select(*by, "_bkt").distinct()
    boundary_agg = F.max_by("_q_val", F.col(ts_col)) if back else F.min_by(
        "_q_val", F.col(ts_col)
    )
    bucket_edge = (
        q.withColumn("_bkt", F.window(F.col(ts_col), bucket)["start"])
        .groupBy(*by, "_bkt")
        .agg(boundary_agg.alias("_bkt_edge"))
    )
    w_out = W.partitionBy(*by).orderBy("_bkt")
    if back:
        w_out = w_out.rowsBetween(W.unboundedPreceding, -1)
        carried = F.last("_bkt_edge", ignorenulls=True).over(w_out)
    else:
        w_out = w_out.rowsBetween(1, W.unboundedFollowing)
        carried = F.first("_bkt_edge", ignorenulls=True).over(w_out)
    other = (
        spine.join(bucket_edge, [*by, "_bkt"], "left")
        .withColumn("_other_edge", carried)
        .select(*by, "_bkt", "_other_edge")
    )

    out = (
        u.filter(F.col("_is_probe") == 1)
        # No broadcast hint: the spine has one row per (by-key × active
        # bucket), which grows linearly with distinct keys × time range —
        # unbounded at scale. Both sides key on [*by, "_bkt"], so this is
        # a co-partitioned shuffle join; AQE still converts it to a
        # broadcast join at runtime when the spine is genuinely small.
        .join(other, [*by, "_bkt"], "left")
        .withColumn(value_col, F.coalesce("_within", "_other_edge"))
        .drop("_is_probe", "_bkt", "_within", "_other_edge", "_q_val")
    )
    return out


def sessionize(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based session assignment: a new session starts when the
    time since the entity's previous event exceeds ``gap_seconds``.
    Adds ``session_id`` (0-based per entity). One shuffle on the
    entity key; state is a window, bounded per entity. Events with a
    NULL timestamp are excluded by contract — they have no position
    in time (and Spark's NULLS-FIRST vs SQL's NULLS-LAST window
    ordering would otherwise diverge)."""
    # string-form build (r16 round 2): the Window-spec Column chain
    # cost ~180 py4j round-trips per build; identical expressions,
    # pinned by the x02/x04 oracle rows + the sessionize tests.
    #
    # unix_timestamp: epoch seconds for TIMESTAMP, and (crucially)
    # UTC-interpreted wall-clock seconds for TIMESTAMP_NTZ — i.e.
    # independent of the session timezone for both types (a plain
    # cast-to-long is illegal on NTZ)
    events = events.where(f"{ts_col} IS NOT NULL")
    order = f"PARTITION BY {entity_col} ORDER BY {ts_col}, {order_tiebreak}"
    secs = f"unix_timestamp({ts_col})"
    gap = f"({secs} - lag({secs}) OVER ({order}))"
    new_session = (
        f"CASE WHEN {gap} IS NULL OR {gap} > {gap_seconds} THEN 1 ELSE 0 END"
    )
    return events.selectExpr(
        "*",
        f"(sum({new_session}) OVER ({order} ROWS BETWEEN UNBOUNDED PRECEDING "
        "AND CURRENT ROW) - 1) AS session_id",
    )


def range_join_within(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    within_seconds: int,
) -> DataFrame:
    """Self range-join: pairs (a, b) with the same key, ``b`` within
    ``(a.ts, a.ts + within_seconds]``, a.id < b's allowed (dedup by
    id ordering on equal plans is the caller's concern; we emit
    a→b ordered pairs with 0 < delta ≤ within).

    Bucket trick: a row joins only rows in its own or the next time
    bucket (bucket width = the range), so the join is an equi-join on
    (key, bucket) — no nested-loop range join, linear at scale."""
    bkt = (F.unix_timestamp(F.col(ts_col)) / within_seconds).cast("long")
    left = df.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts_a"),
        F.col(id_col).alias("id_a"),
        bkt.alias("_bkt_a"),
    ).withColumn("_bkt", F.explode(F.array(F.col("_bkt_a"), F.col("_bkt_a") + 1)))
    right = df.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts_b"),
        F.col(id_col).alias("id_b"),
        bkt.alias("_bkt"),
    )
    delta = F.unix_timestamp(F.col("_ts_b")) - F.unix_timestamp(F.col("_ts_a"))
    return (
        left.join(right, ["_k", "_bkt"])
        .filter((delta > 0) & (delta <= within_seconds))
        .select(
            F.col("_k").alias(key_col),
            "id_a",
            "id_b",
            delta.alias("delta_seconds"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# driver queries
# ---------------------------------------------------------------------------
def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from parquet_pipeline_spark.operators.relational import _events as ev

    return ev(spark, sf_dir)


@register(
    "x01_asof_join",
    oracle="""
    WITH quotes AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS qts,
             AVG(value) AS rate
      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
      GROUP BY 1
      HAVING AVG(value) IS NOT NULL
    ),
    probes AS (
      -- null-ts rows have no position in time (matches asof_join)
      SELECT event_id, ts FROM events WHERE event_type = 'click' AND ts IS NOT NULL
    )
    SELECT p.event_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
           ROUND(q.rate, 6) AS rate
    FROM probes p ASOF LEFT JOIN quotes q ON p.ts >= q.qts
    """,
)
def x01_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click event gets the most recent hourly purchase rate
    at-or-before its timestamp (classic quotes/trades as-of)."""
    ev = _events(spark, sf_dir)
    quotes = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.window("ts", "1 hour")["start"].alias("ts"))
        .agg(F.avg("value").alias("rate"))
        # the quote aggregate is consumed three times inside asof_join
        # (union, bucket summary, spine) — cache the small result
        # instead of re-aggregating the event scan each time
        .cache()
    )
    probes = ev.filter(F.col("event_type") == "click").select("event_id", "ts")
    joined = asof_join(probes, quotes, ts_col="ts", value_col="rate", bucket="6 hours")
    return joined.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.round("rate", 6).alias("rate"),
    )


@register(
    "x02_sessionize",
    oracle="""
    SELECT user_id, session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM (
      SELECT user_id, ts,
             CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - 1
               AS session_id
      FROM (
        SELECT user_id, ts, event_id,
               FLOOR(epoch(ts)) - lag(FLOOR(epoch(ts)))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events WHERE ts IS NOT NULL
      )
    )
    GROUP BY user_id, session_id
    """,
)
def x02_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    sessions = sessionize(ev, "user_id", "ts", "event_id", gap_seconds=1800)
    return sessions.groupBy("user_id", "session_id").agg(
        F.expr("count(1) AS n_events"),
        F.expr("date_format(min(ts), 'yyyy-MM-dd HH:mm:ss') AS session_start"),
        F.expr("date_format(max(ts), 'yyyy-MM-dd HH:mm:ss') AS session_end"),
    )


@register(
    "x03_range_join",
    oracle="""
    SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
           CAST(FLOOR(epoch(b.ts)) - FLOOR(epoch(a.ts)) AS BIGINT) AS delta_seconds
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND FLOOR(epoch(b.ts)) - FLOOR(epoch(a.ts)) > 0
     AND FLOOR(epoch(b.ts)) - FLOOR(epoch(a.ts)) <= 300
    """,
)
def x03_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of same-user events within 5 minutes — executed as a
    bucketed equi-join, not a nested-loop range join."""
    ev = _events(spark, sf_dir)
    return range_join_within(ev, "user_id", "ts", "event_id", within_seconds=300)


# ---------------------------------------------------------------------------
# x04 — native session windows (F.session_window: the built-in
# gap-based grouping; same semantics as x02's lag/cumsum
# sessionization, so they share oracle logic — and the construct
# works unchanged on a stream with a watermark)
# ---------------------------------------------------------------------------
@register(
    "x04_session_window",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM (
      SELECT user_id, ts,
             CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - 1
               AS session_id
      FROM (
        SELECT user_id, ts, event_id,
               FLOOR(epoch(ts)) - lag(FLOOR(epoch(ts)))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events WHERE ts IS NOT NULL
      )
    )
    GROUP BY user_id, session_id
    """,
)
def x04_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session aggregation via the built-in session_window.

    Boundary alignment with the lag-based oracle: timestamps are
    floored to whole seconds first (the oracle floors epochs too),
    and session_window's merge rule is INCLUSIVE at the gap endpoint
    (an event exactly ``gap`` after the previous one extends the
    session), matching the oracle's "new session iff gap > 1800"."""
    # floor to whole seconds with date_trunc — unlike a unix_timestamp
    # round-trip it PRESERVES the TIMESTAMP_NTZ type, so rendering
    # stays session-timezone-independent
    ev = _events(spark, sf_dir).withColumn("ts", F.date_trunc("second", F.col("ts")))
    return (
        ev.groupBy("user_id", F.session_window("ts", "1800 seconds").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
        .select("user_id", "n_events", "session_start", "session_end")
    )


@register(
    "x05_asof_forward",
    oracle="""
    WITH quotes AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS qts,
             AVG(value) AS rate
      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
      GROUP BY 1
      HAVING AVG(value) IS NOT NULL
    ),
    probes AS (
      -- null-ts rows have no position in time (matches asof_join)
      SELECT event_id, ts FROM events WHERE event_type = 'click' AND ts IS NOT NULL
    )
    SELECT p.event_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
           ROUND(q.rate, 6) AS rate
    FROM probes p LEFT JOIN LATERAL (
      SELECT rate FROM quotes q WHERE q.qts >= p.ts
      ORDER BY q.qts LIMIT 1
    ) q ON true
    """,
)
def x05_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each click gets the NEXT hourly purchase rate
    at-or-after its timestamp (pandas merge_asof direction='forward'
    parity; oracle via LATERAL nearest-next lookup)."""
    ev = _events(spark, sf_dir)
    quotes = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.window("ts", "1 hour")["start"].alias("ts"))
        .agg(F.avg("value").alias("rate"))
        .cache()
    )
    probes = ev.filter(F.col("event_type") == "click").select("event_id", "ts")
    joined = asof_join(
        probes, quotes, ts_col="ts", value_col="rate", bucket="6 hours",
        direction="forward",
    )
    return joined.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.round("rate", 6).alias("rate"),
    )


def interval_overlap_join(
    iv: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    id_col: str,
    bucket: str = "1 day",
) -> DataFrame:
    """Self overlap-join: pairs (id_a < id_b) of same-key intervals
    that overlap (half-open: a.start < b.end AND b.start < a.end).

    Scale shape: each interval explodes to the time buckets it spans
    and the join runs as an EQUI-join on (key, bucket) — two
    intervals can only overlap if they share a bucket, so the pair
    space is bounded by per-bucket density and the shuffle key is
    (key, bucket), never a theta-join/crossJoin (which Spark would
    plan as a broadcast nested loop — unusable at 100 TB). Work is
    O(intervals × span/bucket + true_pairs); pick ``bucket`` near
    the typical interval length. Exact overlap is re-checked after
    the bucket match, and pairs spanning several shared buckets are
    deduped by the final ``distinct`` on the id pair."""
    # Built as selectExpr/where strings — the expressions are the
    # same ones the Column-API form parsed to (r16 round 2:
    # tools/py4j_count.py measured this builder at 845 py4j round
    # trips, the suite's worst; strings parse server-side in a
    # handful of calls). Semantics pinned by the half-open-boundary
    # and degenerate-interval tests + the x06 oracle row.
    #
    # Degenerate intervals (end <= start) are empty under half-open
    # semantics and can overlap nothing — and their last-bucket
    # expression (end - 1µs) would precede the first bucket, making
    # sequence(start, stop, +step) throw with start > stop. Filter
    # them out before the explode. Half-open interval: the bucket
    # containing (end - 1µs) is the last one the interval truly
    # touches.
    b = iv.where(f"{start_col} < {end_col}").selectExpr(
        f"{key_col} AS _k",
        f"{id_col} AS _id",
        f"{start_col} AS _s",
        f"{end_col} AS _e",
        f"explode(sequence(window({start_col}, '{bucket}').start, "
        f"window({end_col} - INTERVAL 1 MICROSECOND, '{bucket}').start, "
        f"INTERVAL {bucket})) AS _bkt",
    )
    a = b.selectExpr("_k", "_bkt", "_id AS id_a", "_s AS _s_a", "_e AS _e_a")
    c = b.selectExpr("_k", "_bkt", "_id AS id_b", "_s AS _s_b", "_e AS _e_b")
    return (
        a.join(c, ["_k", "_bkt"])
        .where("id_a < id_b AND _s_a < _e_b AND _s_b < _e_a")
        .selectExpr(f"_k AS {key_col}", "id_a", "id_b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# x06 — interval overlap join: pairs of a customer's orders whose
# 7-day fulfillment windows overlap. DuckDB states the overlap
# predicate directly (fine single-node); the Spark plan is the
# bucketed equi-join above.
# ---------------------------------------------------------------------------
@register(
    "x06_interval_overlap",
    oracle="""
    WITH iv AS (
      SELECT o_custkey, o_orderkey, o_orderdate AS s,
             o_orderdate + INTERVAL 7 DAY AS e
      FROM orders WHERE o_custkey < 200
    )
    SELECT a.o_custkey, a.o_orderkey AS id_a, b.o_orderkey AS id_b
    FROM iv a JOIN iv b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
     AND a.s < b.e AND b.s < a.e
    """,
)
def x06_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        tables.table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").alias("s"),
            (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("e"),
        )
    )
    return interval_overlap_join(
        orders, "o_custkey", "s", "e", "o_orderkey", bucket="7 days"
    )


# ---------------------------------------------------------------------------
# x07 — last-touch attribution: every purchase is credited to the
# user's most recent preceding click's channel (the classic
# marketing-analytics application of the per-key as-of join —
# asof_join does the heavy lifting, so this query demonstrates the
# operator composing into a business answer, not new machinery).
# Unattributed purchases (no prior click) keep the 'none' bucket.
# ---------------------------------------------------------------------------
@register(
    "x07_last_touch_attribution",
    oracle="""
    WITH clicks AS (
      -- malformed props -> NULL channel -> not an attributable touch
      -- (asof_join excludes null-valued quotes); null-ts excluded
      SELECT * FROM (
        SELECT user_id, ts,
               'ch' || CAST(TRY_CAST(CASE WHEN json_valid(props)
                                          THEN props ->> 'k' END AS INT) % 4
                            AS VARCHAR) AS channel
        FROM events WHERE event_type = 'click' AND ts IS NOT NULL
      ) WHERE channel IS NOT NULL
    ),
    purchases AS (
      SELECT user_id, ts, value
      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
    )
    SELECT COALESCE(c.channel, 'none') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           ROUND(SUM(p.value), 2) AS revenue
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    GROUP BY 1
    """,
)
def x07_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.concat(
            F.lit("ch"),
            (F.get_json_object("props", "$.k").try_cast("int") % 4).cast("string"),
        ).alias("channel"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    attributed = asof_join(
        purchases, clicks, "ts", "channel", by=["user_id"], bucket="1 day"
    )
    return attributed.groupBy(
        F.coalesce(F.col("channel"), F.lit("none")).alias("channel")
    ).agg(
        F.count("*").alias("n_purchases"),
        F.round(F.sum("value"), 2).alias("revenue"),
    )
