"""The relational SQL surface (SURVEY.md §2B) as Spark plans.

The reference implements none of this itself — it executes arbitrary
LLM-generated DuckDB SQL (reference: duckdb_util.py:234-243) whose
prompt contract demands projection, WHERE (incl. numeric + date
ranges), SUM/COUNT/AVG/MAX/MIN, GROUP BY, ORDER BY, LIMIT, equi-join
on an inferred key, UNION-by-name, and NULL handling (reference:
langgraph_pipeline.py:477-485; duckdb_util.py:166-225). Spark SQL
supplies all of it natively; each query below declares one construct
as a Catalyst-optimizable DataFrame plan with a DuckDB oracle twin.

Beyond the demanded surface we also expose what "execute arbitrary
SQL" implies a real engine must have (windows, rollup/cube, set ops,
semi/anti joins, pivot, JSON extraction) — explicitly beyond the
reference (SURVEY.md §2B "Not present in the reference").

Scale notes (100 TB thinking, verified via .explain on each):
- filters/projections sit directly on the parquet scan (pushed
  filters + pruned ReadSchema) — Catalyst does this when the plan is
  declarative, which all of these are;
- dimension joins (region/nation/supplier/part) are broadcast — at
  sf1000 these stay tiny relative to facts, so we hint
  ``F.broadcast`` where the dimension is known-small by schema;
- fact-fact joins (orders⋈lineitem) shuffle on the join key; AQE
  (enabled in session.py) handles skew and coalesces partitions;
- aggregates are partial (map-side combine) automatically.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from parquet_pipeline_spark import tables
from parquet_pipeline_spark.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # cached HANDLE (schema + file listing), not cached data — r16
    # optimization: spark.read.parquet costs ~0.3 s of listing/
    # footer/py4j work per call on the bench box (tables.py docstring)
    return tables.table(spark, sf_dir, name)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ``ts`` as parquet TIMESTAMP(NANOS),
    which Spark's vectorized reader rejects. Read nanos as long
    (legacy conf) and truncate to microsecond timestamps — the same
    truncation DuckDB applies when converting nanos to its
    micro-precision TIMESTAMP, so oracle comparisons line up.

    The normalized projection is memoized per session alongside the
    raw handle (tables.cached_view) — deterministic plan metadata,
    the same rationale as the ``_t`` handle cache."""

    def build() -> DataFrame:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ev = tables.table(spark, sf_dir, "events")
        if dict(ev.dtypes).get("ts") in ("bigint", "long"):
            # timestamp_micros yields an epoch-based TIMESTAMP whose
            # *rendering* depends on the session timezone; convert to
            # TIMESTAMP_NTZ at UTC so the wall-clock values equal the
            # file's naive nanos regardless of the driver's session tz
            # (verified: a New-York session otherwise shifts every
            # windowed/event query by the UTC offset)
            ev = ev.withColumn(
                "ts",
                F.convert_timezone(
                    None, F.lit("UTC"), F.timestamp_micros(F.expr("ts div 1000"))
                ),
            )
        return ev

    key = os.path.join(os.path.realpath(sf_dir), "events.parquet#ntz")
    return tables.cached_view(spark, key, build)


# ---------------------------------------------------------------------------
# q01 — flagship: scan → filter → group → multi-agg → sort
# (TPC-H Q1 shape; covers the reference's SUM/AVG/COUNT + GROUP BY +
#  ORDER BY contract in one plan.)
# ---------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 2)        AS avg_qty,
           ROUND(AVG(l_extendedprice), 2)   AS avg_price,
           ROUND(AVG(l_discount), 4)        AS avg_disc,
           CAST(COUNT(*) AS BIGINT)         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # string-form plan build (r16 round 2): 365 → ~90 py4j round
    # trips (tools/py4j_count.py); identical expressions, pinned by
    # the q01 oracle row. Pin query — bases re-derived this round.
    li = _t(spark, sf_dir, "lineitem")
    disc_price = "l_extendedprice * (1 - l_discount)"
    return (
        li.where("l_shipdate <= TIMESTAMP '1998-09-02'")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr("round(sum(l_quantity), 2) AS sum_qty"),
            F.expr("round(sum(l_extendedprice), 2) AS sum_base_price"),
            F.expr(f"round(sum({disc_price}), 2) AS sum_disc_price"),
            F.expr(f"round(sum({disc_price} * (1 + l_tax)), 2) AS sum_charge"),
            F.expr("round(avg(l_quantity), 2) AS avg_qty"),
            F.expr("round(avg(l_extendedprice), 2) AS avg_price"),
            F.expr("round(avg(l_discount), 4) AS avg_disc"),
            F.expr("count(1) AS count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q02 — projection + numeric filter (pushdown check: both predicates
# reach the parquet scan; ReadSchema carries only 5 columns)
# ---------------------------------------------------------------------------
@register(
    "q02_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
    FROM lineitem
    WHERE l_quantity > 45 AND l_discount < 0.05
    """,
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 0.05D: a DOUBLE literal exactly like F.lit(0.05) (bare 0.05
    # lexes as DECIMAL in SQL — same folded value, but D keeps the
    # pushed-filter literal byte-identical to the Column form)
    return (
        _t(spark, sf_dir, "lineitem")
        .where("l_quantity > 45 AND l_discount < 0.05D")
        .selectExpr(
            "l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount",
        )
    )


# ---------------------------------------------------------------------------
# q03 — date-range filter (reference router rule: date ranges →
# SQL_QUERY, langgraph_pipeline.py:309)
# ---------------------------------------------------------------------------
@register(
    "q03_date_range",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_value
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY o_orderstatus
    """,
)
def q03_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# q04 — all five demanded aggregates in one ungrouped pass
# ---------------------------------------------------------------------------
@register(
    "q04_global_aggs",
    oracle="""
    SELECT ROUND(MIN(l_extendedprice), 2) AS min_price,
           ROUND(MAX(l_extendedprice), 2) AS max_price,
           ROUND(SUM(l_extendedprice), 2) AS sum_price,
           ROUND(AVG(l_extendedprice), 2) AS avg_price,
           CAST(COUNT(*) AS BIGINT)       AS n_rows,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem
    """,
)
def q04_global_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").agg(
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# q05 — GROUP BY + HAVING
# ---------------------------------------------------------------------------
@register(
    "q05_group_having",
    oracle="""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING SUM(o_totalprice) > 1500000
    """,
)
def q05_group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("_spend"),
        )
        .filter(F.col("_spend") > 1500000)
        .select("o_custkey", "n_orders", F.round("_spend", 2).alias("spend"))
    )


# ---------------------------------------------------------------------------
# q06 — ORDER BY + LIMIT (top-k; Spark plans TakeOrderedAndProject —
# no global sort materialized, which is the right plan at 100 TB)
# ---------------------------------------------------------------------------
@register(
    "q06_topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q06_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
        .selectExpr(
            "o_orderkey",
            "o_custkey",
            "round(o_totalprice, 2) AS o_totalprice",
            "date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate",
        )
    )


# ---------------------------------------------------------------------------
# q07 — equi-join on inferred key (reference join_key contract,
# multi_file_util.py:21-25): orders ⋈ customer, revenue by segment
# ---------------------------------------------------------------------------
@register(
    "q07_join_customer_orders",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q07_join_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    # customer is the small side at every SF (1 cust : 10 orders : 40 items)
    # but grows with SF — leave strategy to Catalyst/AQE rather than
    # forcing broadcast of something that's 1.5B rows at sf1000.
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q08 — multi-way join through the star: lineitem⋈orders⋈customer⋈
# nation⋈region, revenue by nation (broadcast the true dims)
# ---------------------------------------------------------------------------
@register(
    "q08_join_multiway",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND o.o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q08_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    # string-form plan build (r16 round 2): 308 → ~90 py4j round
    # trips; identical expressions, pinned by the q08 oracle row.
    # Pin query — bases re-derived this round.
    li = _t(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .where("o_orderdate >= TIMESTAMP '1997-01-01'")
        .selectExpr("o_orderkey", "o_custkey")
    )
    cust = _t(spark, sf_dir, "customer").selectExpr("c_custkey", "c_nationkey")
    # nation/region are fixed-size dims (25 / 5 rows at EVERY scale
    # factor) — always broadcast; the fact-fact joins shuffle.
    nation = F.broadcast(
        _t(spark, sf_dir, "nation").selectExpr(
            "n_nationkey", "n_name", "n_regionkey"
        )
    )
    region = F.broadcast(
        _t(spark, sf_dir, "region").where("r_name = 'ASIA'").selectExpr(
            "r_regionkey"
        )
    )
    return (
        li.join(orders, F.expr("l_orderkey = o_orderkey"))
        .join(cust, F.expr("o_custkey = c_custkey"))
        .join(nation, F.expr("c_nationkey = n_nationkey"))
        .join(region, F.expr("n_regionkey = r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.expr(
                "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue"
            ),
            F.expr("count(1) AS n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q09 — broadcast dimension join: lineitem ⋈ part, revenue by brand
# ---------------------------------------------------------------------------
@register(
    "q09_join_broadcast_dim",
    oracle="""
    SELECT p.p_brand,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           ROUND(AVG(l.l_quantity), 3) AS avg_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 15
    GROUP BY p.p_brand
    """,
)
def q09_join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").selectExpr(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = (
        _t(spark, sf_dir, "part")
        .where("p_size <= 15")
        .selectExpr("p_partkey", "p_brand")
    )
    # part is ~0.13% the rows of lineitem and shrinks further after
    # the p_size filter — broadcast avoids shuffling the fact table.
    return (
        li.join(F.broadcast(part), F.expr("l_partkey = p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.expr(
                "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue"
            ),
            F.expr("round(avg(l_quantity), 3) AS avg_qty"),
        )
    )


# ---------------------------------------------------------------------------
# q10 — UNION by name across heterogeneous schemas (reference:
# duckdb_util.py:166-182 read_parquet(union_by_name=true)); missing
# columns become NULL on the side that lacks them
# ---------------------------------------------------------------------------
@register(
    "q10_union_by_name",
    oracle="""
    SELECT * FROM (
      SELECT c_custkey AS entity_id, c_name AS name, c_acctbal AS acctbal,
             c_mktsegment AS mktsegment, 'customer' AS src
      FROM customer
      UNION ALL BY NAME
      SELECT s_suppkey AS entity_id, s_name AS name, s_acctbal AS acctbal,
             'supplier' AS src
      FROM supplier
    )
    WHERE acctbal > 9000
    """,
)
def q10_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.lit("customer").alias("src"),
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("src"),
    )
    return cust.unionByName(supp, allowMissingColumns=True).filter(
        F.col("acctbal") > 9000
    )


# ---------------------------------------------------------------------------
# q11 — NULL handling: outer join produces NULLs; coalesce + null-aware
# aggregation (reference prompt instruction #7, langgraph_pipeline.py:484)
# ---------------------------------------------------------------------------
@register(
    "q11_null_handling",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_without_big_order,
           ROUND(SUM(COALESCE(o.o_totalprice, 0.0)), 2) AS big_order_value
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
      ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q11_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    joined = cust.join(big, cust.c_custkey == big.o_custkey, "left")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias(
            "n_without_big_order"
        ),
        F.round(F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))), 2).alias(
            "big_order_value"
        ),
    )


# ---------------------------------------------------------------------------
# q12 — DISTINCT
# ---------------------------------------------------------------------------
@register(
    "q12_distinct",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
)
def q12_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


# ---------------------------------------------------------------------------
# q13 — conditional aggregation (CASE WHEN inside agg — the pivot
# pattern the reference's "monthly volumes" README example implies)
# ---------------------------------------------------------------------------
@register(
    "q13_conditional_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_extendedprice ELSE 0 END), 2) AS open_value,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_extendedprice ELSE 0 END), 2) AS filled_value,
           CAST(SUM(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q13_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_extendedprice")).otherwise(0.0)),
            2,
        ).alias("open_value"),
        F.round(
            F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_extendedprice")).otherwise(0.0)),
            2,
        ).alias("filled_value"),
        F.sum(F.when(F.col("l_quantity") >= 25, 1).otherwise(0)).alias("n_bulk"),
    )


# ---------------------------------------------------------------------------
# q14 — scalar string functions (upper/lower/substr/length/trim/
# concat/replace/LIKE — SURVEY §2B "scalar string functions")
# ---------------------------------------------------------------------------
@register(
    "q14_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand)                         AS brand_u,
           LOWER(p_type)                          AS type_l,
           SUBSTRING(p_name, 1, 8)                AS name_prefix,
           CAST(LENGTH(p_name) AS INT)            AS name_len,
           -- CONCAT_WS, not CONCAT: on a NULL p_brand Spark's
           -- concat_ws drops the value AND its separator while
           -- CONCAT(NULL, ':', x) keeps the ':' — concat_ws has
           -- identical skip-null semantics in both engines (caught
           -- by the dirty-dims battery, r8)
           CONCAT_WS(':', p_brand, p_type)        AS brand_type,
           REPLACE(p_brand, 'Brand#', 'B')        AS brand_short
    FROM part
    WHERE p_name LIKE '%red%'
    """,
)
def q14_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_u"),
            F.lower("p_type").alias("type_l"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.length("p_name").alias("name_len"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.regexp_replace("p_brand", "Brand#", "B").alias("brand_short"),
        )
    )


# ---------------------------------------------------------------------------
# q15 — date functions / monthly pivot (the README's "monthly volumes
# from January to June" example, README.md:266-269)
# ---------------------------------------------------------------------------
@register(
    "q15_monthly_volumes",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT)  AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(COUNT(*) AS BIGINT)        AS n_orders,
           ROUND(SUM(o_totalprice), 2)     AS volume
    FROM orders
    WHERE month(o_orderdate) BETWEEN 1 AND 6 AND year(o_orderdate) = 1998
    GROUP BY 1, 2
    """,
)
def q15_monthly_volumes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn("order_year", F.year("o_orderdate"))
        .withColumn("order_month", F.month("o_orderdate"))
        .filter((F.col("order_month").between(1, 6)) & (F.col("order_year") == 1998))
        .groupBy("order_year", "order_month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("volume"),
        )
    )


# ---------------------------------------------------------------------------
# q16 — scalar math functions
# ---------------------------------------------------------------------------
@register(
    "q16_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * l_discount, 4)      AS discount_value,
           CAST(CEIL(l_quantity / 7.0) AS BIGINT)      AS qty_bucket,
           CAST(FLOOR(l_extendedprice / 10000) AS BIGINT) AS price_decile,
           ROUND(ABS(l_extendedprice - 30000.0), 2)    AS dist_from_30k,
           ROUND(CASE WHEN l_quantity >= 0 THEN SQRT(l_quantity) END, 4) AS sqrt_qty
    FROM lineitem
    WHERE l_orderkey < 500
    """,
)
def q16_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 500)
        .select(
            "l_orderkey",
            "l_linenumber",
            # round to 4dp, not 2: the product of two 2-decimal values
            # is an exact 4-decimal number, so rounding at 4 is the
            # identity on both engines, while rounding at 2 would sit
            # exactly on .xx5 boundaries where Spark (HALF_UP on the
            # shortest decimal repr) and DuckDB (binary-value) disagree
            F.round(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("discount_value"),
            F.ceil(F.col("l_quantity") / 7.0).alias("qty_bucket"),
            F.floor(F.col("l_extendedprice") / 10000).alias("price_decile"),
            F.round(F.abs(F.col("l_extendedprice") - 30000.0), 2).alias("dist_from_30k"),
            # sqrt of a negative is undefined and the engines diverge
            # on it (Spark NaN, DuckDB errors) — NULL by contract
            F.round(
                F.when(F.col("l_quantity") >= 0, F.sqrt("l_quantity")), 4
            ).alias("sqrt_qty"),
        )
    )


# ---------------------------------------------------------------------------
# q17 — IN-subquery (planned as a left-semi join in Spark)
# ---------------------------------------------------------------------------
@register(
    "q17_semi_join",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_orderpriority
    """,
)
def q17_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    building = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    return (
        orders.join(building, orders.o_custkey == building.c_custkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# q18 — NOT EXISTS (left-anti join): customers with no orders
# ---------------------------------------------------------------------------
@register(
    "q18_anti_join",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers_without_orders
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    GROUP BY c_mktsegment
    """,
)
def q18_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_custkey")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers_without_orders"))
    )


# ---------------------------------------------------------------------------
# q19 — window ranking: top-3 orders per market segment
# (beyond the reference's demanded surface — SURVEY §2B note)
# ---------------------------------------------------------------------------
@register(
    "q19_window_rank",
    oracle="""
    SELECT c_mktsegment, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, rn
    FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY c.c_mktsegment
               ORDER BY o.o_totalprice DESC, o.o_orderkey) AS INT) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 3
    """,
)
def q19_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").selectExpr("c_custkey", "c_mktsegment")
    return (
        orders.join(cust, F.expr("o_custkey = c_custkey"))
        .selectExpr(
            "*",
            "row_number() OVER (PARTITION BY c_mktsegment "
            "ORDER BY o_totalprice DESC, o_orderkey) AS rn",
        )
        .where("rn <= 3")
        .selectExpr(
            "c_mktsegment",
            "o_orderkey",
            "round(o_totalprice, 2) AS o_totalprice",
            "rn",
        )
    )


# ---------------------------------------------------------------------------
# q20 — running window aggregate (deterministic frame order →
# identical accumulation order on both engines)
# ---------------------------------------------------------------------------
@register(
    "q20_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate NULLS FIRST, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    WHERE o_custkey < 50
    """,
)
def q20_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        )
    )


# ---------------------------------------------------------------------------
# q21 — ROLLUP (hierarchical subtotals)
# ---------------------------------------------------------------------------
@register(
    "q21_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           CAST(COUNT(*) AS BIGINT)  AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q21_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# q22 — CUBE (all grouping-set combinations)
# ---------------------------------------------------------------------------
@register(
    "q22_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           ROUND(SUM(o_totalprice), 2) AS total_value,
           CAST(COUNT(*) AS BIGINT)    AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q22_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# q23 — set operations: INTERSECT and EXCEPT
# ---------------------------------------------------------------------------
@register(
    "q23_set_ops",
    oracle="""
    SELECT 'both' AS bucket, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    UNION ALL
    SELECT 'f_only' AS bucket, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    """,
)
def q23_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    f_cust = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_cust = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    both = f_cust.intersect(o_cust).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("bucket"), "n"
    )
    # subtract = set-semantics EXCEPT (exceptAll would keep keys that
    # merely appear more often in F than in O — wrong for EXCEPT)
    f_only = f_cust.subtract(o_cust).agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("f_only").alias("bucket"), "n")
    return both.unionByName(f_only)


# ---------------------------------------------------------------------------
# q24 — JSON extraction from a string column (events.props)
# ---------------------------------------------------------------------------
@register(
    "q24_events_json",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           -- malformed props / wrong-typed k -> NULL (engines would
           -- otherwise diverge: Spark's get_json_object is lenient,
           -- DuckDB's json functions and ANSI casts throw)
           ROUND(AVG(TRY_CAST(CASE WHEN json_valid(props)
                                   THEN json_extract_string(props, '$.k')
                              END AS BIGINT)), 3) AS avg_k,
           CAST(SUM(TRY_CAST(CASE WHEN json_valid(props)
                                  THEN json_extract_string(props, '$.k')
                             END AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def q24_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    # try_cast: wrong-typed k ('{"k": "str"}') must yield NULL,
    # not an ANSI cast error aborting the job
    ev = _events(spark, sf_dir).selectExpr(
        "*", "try_cast(get_json_object(props, '$.k') AS BIGINT) AS k"
    )
    return ev.groupBy("event_type").agg(
        F.expr("count(1) AS n_events"),
        F.expr("round(avg(k), 3) AS avg_k"),
        F.expr("sum(k) AS sum_k"),
    )


# ---------------------------------------------------------------------------
# q25 — tumbling time-window aggregation over events (batch analog of
# the Structured Streaming path in streaming/; oracle = time_bucket)
# ---------------------------------------------------------------------------
@register(
    "q25_events_hourly",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 3)     AS total_value
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q25_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.expr("window(ts, '1 hour')").alias("w"), "event_type")
        .agg(
            F.expr("count(1) AS n_events"),
            F.expr("round(sum(value), 3) AS total_value"),
        )
        .selectExpr(
            "date_format(w.start, 'yyyy-MM-dd HH:mm:ss') AS window_start",
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# q26 — pivot (groupBy().pivot() — wide conditional agg)
# ---------------------------------------------------------------------------
@register(
    "q26_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_open,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_filled
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q26_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    pivoted = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .sum("l_quantity")
    )
    return pivoted.select(
        "l_returnflag",
        F.round(F.col("O"), 2).alias("qty_open"),
        F.round(F.col("F"), 2).alias("qty_filled"),
    )


# ---------------------------------------------------------------------------
# q27 — comparison against a group-level aggregate (window AVG):
# parts priced above their brand's average
# ---------------------------------------------------------------------------
@register(
    "q27_above_brand_avg",
    oracle="""
    SELECT p_partkey, p_brand, ROUND(p_retailprice, 2) AS price
    FROM (
      SELECT p_partkey, p_brand, p_retailprice,
             AVG(p_retailprice) OVER (PARTITION BY p_brand) AS brand_avg
      FROM part
    ) WHERE p_retailprice > brand_avg * 1.047
    """,
)
def q27_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("p_brand")
    return (
        _t(spark, sf_dir, "part")
        .withColumn("brand_avg", F.avg("p_retailprice").over(w))
        # 1.047 (not a round decimal) keeps avg*multiplier off exact
        # 2-decimal price values, and the avg itself is not output —
        # an avg of 2-decimal values can land exactly on a .xx5
        # rounding boundary where the engines' rounding modes differ
        .filter(F.col("p_retailprice") > F.col("brand_avg") * 1.047)
        .select(
            "p_partkey",
            "p_brand",
            F.round("p_retailprice", 2).alias("price"),
        )
    )


# ---------------------------------------------------------------------------
# q28 — EXISTS against the fact table: suppliers with recent shipments
# ---------------------------------------------------------------------------
@register(
    "q28_exists_semi",
    oracle="""
    SELECT s.s_suppkey, s.s_name, ROUND(s.s_acctbal, 2) AS acctbal
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_shipdate >= TIMESTAMP '2001-09-01'
    )
    """,
)
def q28_exists_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier")
    recent = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("2001-09-01").cast("timestamp"))
        .select("l_suppkey")
    )
    return supp.join(
        recent, supp.s_suppkey == recent.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal"))


# ===========================================================================
# batch 2 — wider SQL-surface coverage
# ===========================================================================

# ---------------------------------------------------------------------------
# q29 — GROUPING SETS (explicit; rollup/cube are its sugar)
# ---------------------------------------------------------------------------
@register(
    "q29_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q29_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_extendedprice), 2) AS total_price
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# ---------------------------------------------------------------------------
# q30 — regexp functions (extract + filter)
# ---------------------------------------------------------------------------
@register(
    "q30_regexp",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
           CAST(regexp_matches(p_name, 'r.d') AS BOOLEAN) AS has_rd
    FROM part
    WHERE regexp_matches(p_type, '^(STANDARD|SMALL)')
    """,
)
def q30_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(F.regexp_like("p_type", F.lit("^(STANDARD|SMALL)")))
        .select(
            "p_partkey",
            F.regexp_extract("p_type", "^([A-Z]+)", 1).alias("type_head"),
            F.regexp_like("p_name", F.lit("r.d")).alias("has_rd"),
        )
    )


# ---------------------------------------------------------------------------
# q31 — null functions: NULLIF / NVL / NVL2 shapes
# ---------------------------------------------------------------------------
@register(
    "q31_null_funcs",
    oracle="""
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'O')                    AS status_or_null,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN')  AS status_label,
           CASE WHEN NULLIF(o_orderstatus, 'O') IS NULL THEN 0.0
                ELSE ROUND(o_totalprice, 2) END          AS closed_value
    FROM orders
    WHERE o_orderkey < 300
    """,
)
def q31_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        status_or_null.alias("status_or_null"),
        F.coalesce(status_or_null, F.lit("OPEN")).alias("status_label"),
        F.when(status_or_null.isNull(), F.lit(0.0))
        .otherwise(F.round("o_totalprice", 2))
        .alias("closed_value"),
    )


# ---------------------------------------------------------------------------
# q32 — comparison against a global aggregate (scalar subquery shape)
# ---------------------------------------------------------------------------
@register(
    "q32_vs_global_avg",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(o.o_totalprice), 2) AS spend
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    HAVING SUM(o.o_totalprice) > 5 * (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def q32_vs_global_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # scalar aggregate computed once, broadcast as a crossJoin of a
    # 1-row frame (Catalyst folds it; no per-row recomputation)
    avg_row = orders.agg(F.avg("o_totalprice").alias("_global_avg"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum("o_totalprice").alias("_spend"))
        .crossJoin(F.broadcast(avg_row))
        .filter(F.col("_spend") > 5 * F.col("_global_avg"))
        .select("c_custkey", "c_name", F.round("_spend", 2).alias("spend"))
    )


# ---------------------------------------------------------------------------
# q33 — TPC-H Q3 shape: filtered 3-way join, grouped revenue, top-10
# ---------------------------------------------------------------------------
@register(
    "q33_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q33_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # string-form plan build (r16 round 2): 325 → ~90 py4j round
    # trips; identical expressions, pinned by the q33 oracle row
    cust = (
        _t(spark, sf_dir, "customer")
        .where("c_mktsegment = 'BUILDING'")
        .selectExpr("c_custkey")
    )
    orders = _t(spark, sf_dir, "orders").where(
        "o_orderdate < TIMESTAMP '1998-03-15'"
    )
    li = _t(spark, sf_dir, "lineitem").where(
        "l_shipdate > TIMESTAMP '1998-03-15'"
    )
    return (
        cust.join(orders, F.expr("c_custkey = o_custkey"))
        .join(li, F.expr("o_orderkey = l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.expr(
                "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .selectExpr(
            "l_orderkey",
            "revenue",
            "date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate",
            "o_orderpriority",
        )
    )


# ---------------------------------------------------------------------------
# q34 — exact percentiles (continuous interpolation)
# ---------------------------------------------------------------------------
@register(
    "q34_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4)  AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4)  AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q34_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 4).alias("p99"),
    )


# ---------------------------------------------------------------------------
# q35 — variance / stddev (sample semantics on both engines)
# ---------------------------------------------------------------------------
@register(
    "q35_stddev",
    oracle="""
    SELECT o_orderstatus,
           ROUND(STDDEV_SAMP(o_totalprice), 3) AS sd_price,
           ROUND(VAR_SAMP(o_totalprice), 1)    AS var_price,
           ROUND(AVG(o_totalprice), 3)         AS avg_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q35_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.stddev_samp("o_totalprice"), 3).alias("sd_price"),
            F.round(F.var_samp("o_totalprice"), 1).alias("var_price"),
            F.round(F.avg("o_totalprice"), 3).alias("avg_price"),
        )
    )


# ---------------------------------------------------------------------------
# q36 — NOT IN subquery (the classic null-semantics trap: with a
# null-free subquery it's exactly an anti join; we keep the subquery
# provably null-free so both engines agree)
# ---------------------------------------------------------------------------
@register(
    "q36_not_in",
    oracle="""
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM part
    WHERE p_partkey NOT IN (
      SELECT l_partkey FROM lineitem WHERE l_quantity >= 48 AND l_partkey IS NOT NULL
    )
    GROUP BY p_brand
    """,
)
def q36_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    heavy = (
        _t(spark, sf_dir, "lineitem")
        .filter((F.col("l_quantity") >= 48) & F.col("l_partkey").isNotNull())
        .select("l_partkey")
    )
    return (
        part.join(heavy, part.p_partkey == heavy.l_partkey, "left_anti")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# ---------------------------------------------------------------------------
# q37 — TPC-H Q18 shape: large-volume customers via IN (grouped
# HAVING subquery) — aggregate subquery feeding a semi join
# ---------------------------------------------------------------------------
@register(
    "q37_large_volume_customers",
    oracle="""
    SELECT c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q37_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 250)
        .select("l_orderkey")
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big_orders, orders.o_orderkey == big_orders.l_orderkey, "left_semi")
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
    )


# ---------------------------------------------------------------------------
# q38 — sliding time windows (2h window, 1h slide): each event lands
# in two overlapping windows; oracle = union of the two shifted
# hour-aligned buckets
# ---------------------------------------------------------------------------
@register(
    "q38_events_sliding",
    oracle="""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type, value
      FROM events WHERE ts IS NOT NULL
      UNION ALL
      SELECT time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour' AS wstart, event_type, value
      FROM events WHERE ts IS NOT NULL
    )
    SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 3) AS total_value
    FROM assigned
    GROUP BY 1, 2
    """,
)
def q38_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 3).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# q39 — navigation window functions: lag / lead / first_value
# ---------------------------------------------------------------------------
@register(
    "q39_window_nav",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(o_totalprice, 2) AS price,
           ROUND(lag(o_totalprice) OVER w, 2)        AS prev_price,
           ROUND(lead(o_totalprice) OVER w, 2)       AS next_price,
           ROUND(first_value(o_totalprice) OVER w, 2) AS first_price
    FROM orders
    WHERE o_custkey < 30
    -- NULLS FIRST pins Spark's ASC default (DuckDB defaults NULLS LAST)
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey)
    """,
)
def q39_window_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 30)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
            F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
            F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        )
    )


# ---------------------------------------------------------------------------
# q40 — deterministic sampling (modulo on a key: reproducible across
# engines/runs, unlike RNG TABLESAMPLE; the pattern for stable
# training-data subsets)
# ---------------------------------------------------------------------------
@register(
    "q40_deterministic_sample",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_orderkey % 20 = 0
    """,
)
def q40_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 20 == 0)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


# ---------------------------------------------------------------------------
# q41 — text normalization chain (lowercase, punctuation strip,
# whitespace collapse — the canonical pre-dedup normalizer)
# ---------------------------------------------------------------------------
@register(
    "q41_text_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))
             AS norm_text,
           CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS INT)
             AS norm_len
    FROM documents
    WHERE doc_id < 100
    """,
)
def q41_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 100
    )
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    return docs.select(
        "doc_id", norm.alias("norm_text"), F.length(norm).alias("norm_len")
    )


# ---------------------------------------------------------------------------
# q42 — column profiling (null rate / distinct / min / max) — the
# data-quality pass a training pipeline runs before ingestion
# ---------------------------------------------------------------------------
@register(
    "q42_profile_columns",
    oracle="""
    SELECT 'o_totalprice' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(o_totalprice) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS n_distinct,
           ROUND(MIN(o_totalprice), 2) AS min_val,
           ROUND(MAX(o_totalprice), 2) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           ROUND(MIN(o_custkey), 2),
           ROUND(MAX(o_custkey), 2)
    FROM orders
    """,
)
def q42_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")

    def profile(col: str) -> DataFrame:
        return o.agg(
            F.lit(col).alias("column_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(col).alias("n_nonnull"),
            F.countDistinct(col).alias("n_distinct"),
            F.round(F.min(F.col(col).cast("double")), 2).alias("min_val"),
            F.round(F.max(F.col(col).cast("double")), 2).alias("max_val"),
        )

    return profile("o_totalprice").unionByName(profile("o_custkey"))


# ---------------------------------------------------------------------------
# q43 — histogram (fixed-width bucketing; integer-exact)
# ---------------------------------------------------------------------------
@register(
    "q43_histogram",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def q43_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.floor(F.col("o_totalprice") / 50000).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# q44 — correlation / covariance (sample semantics both engines)
# ---------------------------------------------------------------------------
@register(
    "q44_corr_covar",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 4)       AS qty_price_corr,
           ROUND(covar_samp(l_quantity, l_discount), 6)      AS qty_disc_covar
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q44_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
            F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("qty_disc_covar"),
        )
    )


# ---------------------------------------------------------------------------
# q45 — array operations over the embedding column (slice,
# element_at, per-row aggregate) — the array-typed column surface
# ---------------------------------------------------------------------------
@register(
    "q45_array_ops",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(embedding[1]::DOUBLE, 6) AS first_component,
           ROUND(list_sum(embedding[1:8]::DOUBLE[]), 6) AS head_sum,
           ROUND(list_max(embedding::DOUBLE[]), 6) AS max_component
    FROM embeddings
    WHERE vec_id < 50
    """,
)
def q45_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables.table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 50
    )
    head = F.slice(F.col("embedding"), 1, 8)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_component"),
        F.round(
            F.aggregate(head, F.lit(0.0), lambda a, x: a + x.cast("double")), 6
        ).alias("head_sum"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_component"),
    )


# ---------------------------------------------------------------------------
# q46 — ordered string aggregation (listagg analog: sorted
# collect_list → concat, deterministic)
# ---------------------------------------------------------------------------
@register(
    "q46_string_agg",
    oracle="""
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q46_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.concat_ws(
                ",", F.array_sort(F.collect_set("o_orderpriority"))
            ).alias("priorities")
        )
    )


# ---------------------------------------------------------------------------
# q47 — date arithmetic (datediff / date_add / month truncation)
# ---------------------------------------------------------------------------
@register(
    "q47_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since_epoch_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month
    FROM orders
    WHERE o_orderkey < 500
    """,
)
def q47_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.trunc(F.col("o_orderdate"), "month"), "yyyy-MM-dd").alias("order_month"),
    )


# ---------------------------------------------------------------------------
# q48 — UNPIVOT / melt (wide → long)
# ---------------------------------------------------------------------------
@register(
    "q48_unpivot",
    oracle="""
    SELECT p_partkey, metric, ROUND(val, 2) AS val
    FROM (
      SELECT p_partkey, ROUND(p_retailprice, 2) AS retail_price,
             CAST(p_size AS DOUBLE) AS size_val
      FROM part WHERE p_partkey < 200
    )
    UNPIVOT (val FOR metric IN (retail_price, size_val))
    """,
)
def q48_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 200)
        .select(
            "p_partkey",
            F.round("p_retailprice", 2).alias("retail_price"),
            F.col("p_size").cast("double").alias("size_val"),
        )
    )
    return (
        p.unpivot(
            ids=["p_partkey"],
            values=["retail_price", "size_val"],
            variableColumnName="metric",
            valueColumnName="_v",
        )
        # standard-SQL UNPIVOT contract (and DuckDB's default):
        # NULL cells produce NO row. Spark's DataFrame unpivot is
        # melt-shaped and RETAINS them — filter to pin the SQL
        # semantics (caught by the dirty-dims battery: NULL
        # p_retailprice/p_size rows, r8)
        .filter(F.col("_v").isNotNull())
        .select("p_partkey", "metric", F.round("_v", 2).alias("val"))
    )


# ---------------------------------------------------------------------------
# q49 — explode / UNNEST with position (lateral array expansion)
# ---------------------------------------------------------------------------
@register(
    "q49_explode",
    oracle="""
    SELECT vec_id,
           CAST(i - 1 AS INT) AS pos,
           ROUND(embedding[CAST(i AS INT)]::DOUBLE, 6) AS component
    FROM embeddings, range(1, 5) r(i)
    WHERE vec_id < 20
    """,
)
def q49_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tables.table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 20
    )
    return (
        emb.select("vec_id", F.slice("embedding", 1, 4).alias("head"))
        .select("vec_id", F.posexplode("head").alias("pos", "_c"))
        .select("vec_id", "pos", F.round(F.col("_c").cast("double"), 6).alias("component"))
    )


# ---------------------------------------------------------------------------
# q50 — TPC-H Q2 shape: match rows against their group's minimum
# (correlated min subquery → per-group min join)
# ---------------------------------------------------------------------------
@register(
    "q50_min_per_group",
    oracle="""
    SELECT l.l_partkey, l.l_suppkey, ROUND(l.l_extendedprice, 2) AS best_price
    FROM lineitem l
    JOIN (
      SELECT l_partkey, MIN(l_extendedprice) AS min_price
      FROM lineitem GROUP BY l_partkey
    ) m ON l.l_partkey = m.l_partkey AND l.l_extendedprice = m.min_price
    WHERE l.l_partkey < 200
    """,
)
def q50_min_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 200)
    # rename the aggregate side before the self-join — both branches
    # descend from the same scan, so shared attribute names would be
    # ambiguous (Spark's "trivially true predicate" trap)
    mins = (
        li.groupBy("l_partkey")
        .agg(F.min("l_extendedprice").alias("min_price"))
        .withColumnRenamed("l_partkey", "m_partkey")
    )
    return (
        li.join(
            mins,
            (F.col("l_partkey") == F.col("m_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .select(
            "l_partkey",
            "l_suppkey",
            F.round("l_extendedprice", 2).alias("best_price"),
        )
    )


# ---------------------------------------------------------------------------
# q51 — LATERAL correlated subquery (top-N per outer row without a
# window: the lateral form both engines optimize independently).
# Scale note (caught by the sf1 sweep): Spark decorrelates
# LATERAL...LIMIT into a row_number window over the WHOLE inner
# table, and the filter it infers from the outer bound is placed
# ABOVE that window — it never reaches the inner scan, so a query
# touching 1000 orders was double-sorting all of lineitem. The
# outer key bound is therefore REPEATED inside the subquery: with it
# the scan carries PushedFilters l_orderkey<1000 and the window runs
# over only the matching rows (plan-asserted in test_plans.py). At
# 100 TB this is the difference between reading a few row groups and
# a full-table sort.
# ---------------------------------------------------------------------------
@register(
    "q51_lateral_topn",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, ROUND(l.l_extendedprice, 2) AS price
    FROM orders o JOIN LATERAL (
      SELECT l_linenumber, l_extendedprice FROM lineitem
      WHERE l_orderkey = o.o_orderkey
      ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2
    ) l ON true
    WHERE o.o_orderkey < 1000
    """,
)
def q51_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("_lat_lineitem")
    return spark.sql(
        """
        SELECT o.o_orderkey, l.l_linenumber, ROUND(l.l_extendedprice, 2) AS price
        FROM _lat_orders o JOIN LATERAL (
          SELECT l_linenumber, l_extendedprice FROM _lat_lineitem
          WHERE l_orderkey = o.o_orderkey AND l_orderkey < 1000
          ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2
        ) l
        WHERE o.o_orderkey < 1000
        """
    )


# ---------------------------------------------------------------------------
# q52 — EXCEPT ALL / INTERSECT ALL (bag semantics, vs q23's set ops)
# ---------------------------------------------------------------------------
@register(
    "q52_bag_set_ops",
    oracle="""
    SELECT 'except_all' AS op, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    UNION ALL
    SELECT 'intersect_all' AS op, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    """,
)
def q52_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    f_cust = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_cust = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    ea = f_cust.exceptAll(o_cust).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("except_all").alias("op"), "n"
    )
    ia = f_cust.intersectAll(o_cust).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("intersect_all").alias("op"), "n"
    )
    return ea.unionByName(ia)


# ---------------------------------------------------------------------------
# q53 — array membership / split on a derived array
# ---------------------------------------------------------------------------
@register(
    "q53_split_contains",
    oracle="""
    SELECT p_partkey, words[1] AS first_word,
           CAST(len(words) AS INT) AS n_words
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
    WHERE list_contains(words, 'red')
    """,
)
def q53_split_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").withColumn("words", F.split("p_name", " "))
    return p.filter(F.array_contains("words", "red")).select(
        "p_partkey",
        F.element_at("words", 1).alias("first_word"),
        F.size("words").alias("n_words"),
    )


# ---------------------------------------------------------------------------
# q54 — case-insensitive matching (ILIKE / lower-normalized)
# ---------------------------------------------------------------------------
@register(
    "q54_case_insensitive",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    WHERE lower(o_orderpriority) LIKE '%urgent%'
    GROUP BY o_orderpriority
    """,
)
def q54_case_insensitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.lower("o_orderpriority").like("%urgent%"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# q55 — GROUP BY a derived expression + HAVING on COUNT(DISTINCT)
# ---------------------------------------------------------------------------
@register(
    "q55_group_by_expr",
    oracle="""
    SELECT CAST(FLOOR(o_totalprice / 100000) AS BIGINT) AS price_band,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    GROUP BY 1
    HAVING COUNT(DISTINCT o_custkey) > 50
    """,
)
def q55_group_by_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.floor(F.col("o_totalprice") / 100000).alias("price_band"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .filter(F.col("n_customers") > 50)
    )


# ---------------------------------------------------------------------------
# q57/q58 — feature preparation: per-group standardization (z-score)
# and min-max scaling — the numeric-normalization pass before model
# training, as window expressions (one shuffle per grouping)
# ---------------------------------------------------------------------------
@register(
    "q57_zscore_outliers",
    oracle="""
    SELECT o_orderkey, o_orderstatus, ROUND(z, 3) AS z
    FROM (
      SELECT o_orderkey, o_orderstatus,
             (o_totalprice - AVG(o_totalprice) OVER (PARTITION BY o_orderstatus))
               / STDDEV_SAMP(o_totalprice) OVER (PARTITION BY o_orderstatus) AS z
      FROM orders
    ) WHERE ABS(z) > 2.33
    """,
)
def q57_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_orderstatus")
    z = (F.col("o_totalprice") - F.avg("o_totalprice").over(w)) / F.stddev_samp(
        "o_totalprice"
    ).over(w)
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > 2.33)
        .select("o_orderkey", "o_orderstatus", F.round("z", 3).alias("z"))
    )


@register(
    "q58_minmax_scale",
    oracle="""
    SELECT p_partkey, p_brand,
           ROUND((p_retailprice - MIN(p_retailprice) OVER (PARTITION BY p_brand))
                 / NULLIF(MAX(p_retailprice) OVER (PARTITION BY p_brand)
                          - MIN(p_retailprice) OVER (PARTITION BY p_brand), 0), 4)
             AS price_scaled
    FROM part
    WHERE p_partkey < 500
    """,
)
def q58_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("p_brand")
    lo, hi = F.min("p_retailprice").over(w), F.max("p_retailprice").over(w)
    scaled = (F.col("p_retailprice") - lo) / F.nullif(hi - lo, F.lit(0))
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 500)
        .select("p_partkey", "p_brand", F.round(scaled, 4).alias("price_scaled"))
    )


# ---------------------------------------------------------------------------
# q59 — calendar functions (quarter / day-of-month / week-of-year-free
# subset that both engines define identically)
# ---------------------------------------------------------------------------
@register(
    "q59_calendar",
    oracle='''
    SELECT CAST(year(o_orderdate) AS INT)    AS y,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(COUNT(*) AS BIGINT)          AS n_orders,
           CAST(MIN(day(o_orderdate)) AS INT) AS first_dom,
           CAST(MAX(day(o_orderdate)) AS INT) AS last_dom
    FROM orders
    WHERE year(o_orderdate) IN (1997, 1998)
    GROUP BY 1, 2
    ''',
)
def q59_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.year("o_orderdate").isin(1997, 1998))
    return o.groupBy(
        F.year("o_orderdate").alias("y"), F.quarter("o_orderdate").alias("q")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min(F.dayofmonth("o_orderdate")).alias("first_dom"),
        F.max(F.dayofmonth("o_orderdate")).alias("last_dom"),
    )


# ---------------------------------------------------------------------------
# q77 — ordered conversion funnel over events (view → click →
# purchase): each stage's timestamp must strictly follow the previous
# stage's FIRST occurrence for that user. The correlated "first event
# after X" predicates decorrelate into three chained per-user
# aggregations — each one shuffle on user_id, no window over the raw
# event stream, no self-join fan-out; the product-analytics twin of
# x02's sessionization. At 100 TB the three aggs are partial-agg
# friendly and the chain reuses the user_id partitioning.
# ---------------------------------------------------------------------------
@register(
    "q77_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS vt FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS ct
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.vt
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS pt
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.ct
      GROUP BY e.user_id
    )
    SELECT 1 AS stage, 'view' AS name, CAST(COUNT(*) AS BIGINT) AS users FROM v
    UNION ALL
    SELECT 2, 'view>click', CAST(COUNT(*) AS BIGINT) FROM c
    UNION ALL
    SELECT 3, 'view>click>purchase', CAST(COUNT(*) AS BIGINT) FROM p
    ORDER BY stage
    """,
)
def q77_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("ct"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )

    def stage(df, n, name):
        return df.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(n).alias("stage"), F.lit(name).alias("name"), "users"
        )

    return (
        stage(v, 1, "view")
        .unionByName(stage(c, 2, "view>click"))
        .unionByName(stage(p, 3, "view>click>purchase"))
        .orderBy("stage")
    )


# ---------------------------------------------------------------------------
# q78 — weekly retention cohorts over events: users grouped by the
# ISO week of their FIRST event; for each (cohort, weeks-since-
# cohort) cell, distinct active users. Two shuffles total (first-seen
# agg on user_id, then the cohort-cell distinct count); the fact
# stream joins the per-user cohort on user_id — broadcastable when
# the user dimension fits, AQE decides. Both engines truncate weeks
# to ISO Monday, so the day difference is an exact multiple of 7.
# ---------------------------------------------------------------------------
@register(
    "q78_retention_cohorts",
    oracle="""
    WITH fs AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
      FROM events GROUP BY user_id
    )
    SELECT strftime(fs.cohort, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', fs.cohort, date_trunc('week', e.ts)) / 7 AS INT) AS wk,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS users
    FROM events e JOIN fs ON e.user_id = fs.user_id
    GROUP BY 1, 2
    """,
)
def q78_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    fs = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    return (
        ev.join(fs, "user_id")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            (
                F.datediff(
                    F.to_date(F.date_trunc("week", F.col("ts"))),
                    F.to_date("cohort"),
                )
                / 7
            )
            .cast("int")
            .alias("wk"),
            "user_id",
        )
        .groupBy("cohort_week", "wk")
        .agg(F.countDistinct("user_id").alias("users"))
    )


# ---------------------------------------------------------------------------
# q79 — SCD-2 history build from a change stream: each event is a
# change record for its user; the validity interval of a record runs
# from its timestamp to the NEXT change for the same user (NULL =
# current). One window (lead over user_id ordered by ts, event_id for
# a total order) — a single shuffle on the natural key, no self-join.
# This is the standard "CDC change log -> slowly-changing dimension"
# materialization; at 100 TB the window partitions by user_id so
# state per partition is one row, and the shuffle is the same
# exchange a downstream temporal join on user_id would reuse.
# Complements q-CDC latest-per-key (which keeps only the tip);
# reference parity: the NL engine answers "history of X" questions
# with exactly this shape.
# ---------------------------------------------------------------------------
@register(
    "q79_scd2_intervals",
    oracle="""
    SELECT user_id,
           event_id,
           event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    '%Y-%m-%d %H:%M:%S') AS valid_to,
           CAST(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                AS BOOLEAN) AS is_current
    FROM events
    WHERE user_id < 50 AND ts IS NOT NULL
    """,
)
def q79_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # null-ts change records have no validity interval (and window
    # NULL ordering diverges between engines) — excluded by contract
    ev = _events(spark, sf_dir).filter(F.col("user_id") < 50).filter(
        F.col("ts").isNotNull()
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
