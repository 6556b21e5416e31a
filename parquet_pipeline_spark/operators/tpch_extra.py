"""Remaining classic TPC-H query shapes (round-5 widening, q81-q91).

The earlier rounds covered Q1/Q2/Q3/Q5/Q8/Q10/Q11/Q18/Q21/Q22; this
module adds the rest of the benchmark's distinct *plan shapes*,
adapted to the synthetic star schema (which has no partsupp table,
no l_shipmode/l_receiptdate and no p_container — each query keeps
the original's join/subquery structure on the columns that exist):

- q81 (Q4)  EXISTS-decorrelated priority counts over a date window
- q82 (Q7)  symmetric nation-pair volume (OR of two nation pairings)
- q83 (Q9)  profit by supplier nation x ship year with LIKE part filter
- q84 (Q12) conditional-count split of late shipments (CASE-sum join)
- q85 (Q13) two-level aggregate: per-customer order counts -> histogram
            over a filtered LEFT OUTER join (customers with 0 kept)
- q86 (Q14) promo revenue share (ratio of conditional sums, one scan)
- q87 (Q15) top-revenue supplier via scalar-max subquery on a CTE
- q88 (Q16) COUNT(DISTINCT supplier) per part group with NOT-IN
            exclusion of negative-balance suppliers
- q89 (Q17) small-quantity revenue vs per-part average (correlated
            aggregate, decorrelated into an aggregate + rejoin)
- q90 (Q19) disjunction of conjunctive brand/size/quantity predicates
            evaluated inside one equi-join (OR-of-ANDs pushdown)
- q91 (Q20) supplier semi-join against a HAVING-filtered shipment
            aggregate (nested semi-join chain)

Scale notes (100 TB discipline, same as advanced.py): facts join on
their natural keys with one shuffle each; the fixed-cardinality dims
(nation, region) are broadcast explicitly; part/supplier/customer
GROW with scale factor so they are left to AQE, which broadcasts
them only while they are genuinely small. All predicates are plain
column comparisons that push to the parquet scan.

Reference parity: the reference delegates its SQL surface to DuckDB
(duckdb_util.py: execute_duckdb_query); these queries extend that
delegated surface Spark-first, one DataFrame plan per shape.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_pipeline_spark import tables
from parquet_pipeline_spark.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # cached handle (schema + listing), not cached data — see tables.py
    return tables.table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q81 — TPC-H Q4 shape: order-priority checking. EXISTS(lineitem
# shipped >30 days after order date) decorrelates to a left-semi
# join on l_orderkey; the date window pushes to the orders scan.
# ---------------------------------------------------------------------------
@register(
    "q81_priority_late_exists",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate <  DATE '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND CAST(l.l_shipdate AS DATE) >
              CAST(o.o_orderdate AS DATE) + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def q81_priority_late_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (F.to_date(li.l_shipdate) > F.date_add(F.to_date(orders.o_orderdate), 30)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


# ---------------------------------------------------------------------------
# q82 — TPC-H Q7 shape: volume shipping between two nations, both
# directions, by ship year. The two nation dims broadcast; the
# OR-of-pairings is a post-join filter on two tiny dim columns.
# ---------------------------------------------------------------------------
def _dec_revenue():
    """l_extendedprice * (1 - l_discount) in EXACT DECIMAL — the q83
    half-cent contract (see q83's oracle comment), extended r9 to the
    non-headline money queries after the seed-11 dirty-lineitem
    battery flapped q65's double sum on a .xx5 boundary. The five
    HEADLINE money queries (q01/q08/q09/q33/q63) deliberately stay on
    double: measured at sf5, Decimal128 aggregation is 5.5x slower
    (11.6 s vs 2.1 s on the q01 shape) and integer-cents-in-double
    loses exactness past 2^53 (observed at the sf5 full-table sum) —
    the wrong trade for the hot path; their 2dp rounding keeps a
    100x error margin and the boundary class is documented in
    BENCH_NOTES."""
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )


@register(
    "q82_nation_pair_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS ship_year,
           -- exact DECIMAL money (the q83 contract, extended r9 after
           -- the seed-11 battery flapped q65 by a half cent)
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)
def q82_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        # supplier grows with sf — AQE decides its join strategy
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
    ).agg(
        F.round(F.sum(_dec_revenue()), 2).cast("double").alias("revenue")
    )


# ---------------------------------------------------------------------------
# q83 — TPC-H Q9 shape: product-type profit. No partsupp table, so
# supply cost is modeled as 0.5 * p_retailprice per unit (structure
# preserved: revenue minus a part-joined per-unit cost). LIKE filter
# on p_name prunes the part side before the fact join.
# ---------------------------------------------------------------------------
@register(
    "q83_product_profit",
    oracle="""
    -- profit in EXACT DECIMAL (r8, caught by the dirty-dims
    -- battery): a double SUM rounded at 2dp flaps when planted
    -- part prices put the true sum on an exact .xx5 boundary —
    -- Spark rounds the shortest-decimal rendering HALF_UP while
    -- DuckDB rounds the binary double. Decimal inputs make every
    -- product, the sum, and the final ROUND exact and identical
    -- in both engines (and model the right practice for money:
    -- TPC-H itself types these columns DECIMAL).
    SELECT sn.n_name AS nation, CAST(year(l.l_shipdate) AS INT) AS ship_year,
           CAST(ROUND(SUM(
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
             - CAST(0.5 AS DECIMAL(2,1))
               * CAST(p.p_retailprice AS DECIMAL(18,2))
               * CAST(l.l_quantity AS DECIMAL(18,2))
           ), 2) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q83_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount",
        "l_quantity",
    )
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # exact-decimal money arithmetic (see the oracle comment)
    profit = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        - F.lit("0.5").cast("decimal(2,1)")
        * F.col("p_retailprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(18,2)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("l_shipdate").alias("ship_year")
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("profit"))
    )


# ---------------------------------------------------------------------------
# q84 — TPC-H Q12 shape: late-shipment split by priority class. The
# CASE-sum pair computes both counts in the single post-join
# aggregate (one shuffle); the lateness predicate is a join-time
# comparison of the two date columns.
# ---------------------------------------------------------------------------
@register(
    "q84_late_shipment_split",
    oracle="""
    SELECT l.l_linestatus, CAST(year(l.l_shipdate) AS INT) AS ship_year,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE CAST(l.l_shipdate AS DATE) >
          CAST(o.o_orderdate AS DATE) + INTERVAL 45 DAY
    GROUP BY 1, 2
    """,
)
def q84_late_shipment_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (
                F.to_date(li.l_shipdate)
                > F.date_add(F.to_date(orders.o_orderdate), 45)
            ),
        )
        .groupBy("l_linestatus", F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# q85 — TPC-H Q13 shape: customer order-count distribution. LEFT
# OUTER join keeps zero-order customers; the filter lives in the
# join condition (not WHERE) so those zeros survive; two stacked
# aggregations build the histogram.
# ---------------------------------------------------------------------------
@register(
    "q85_custdist",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
)
def q85_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey",
                                                "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# q86 — TPC-H Q14 shape: promo revenue share. One scan, one join,
# the ratio of two conditional sums collapses to a single row —
# no second pass over the data.
# ---------------------------------------------------------------------------
@register(
    "q86_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '1997-01-01'
      AND l.l_shipdate <  DATE '1997-02-01'
    """,
)
def q86_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
    )


# ---------------------------------------------------------------------------
# q87 — TPC-H Q15 shape: top supplier by quarterly revenue. The
# revenue aggregate is computed once; the scalar max re-joins as a
# one-row broadcast (no correlated re-evaluation).
# ---------------------------------------------------------------------------
@register(
    "q87_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             -- exact DECIMAL money (q83 contract, r9)
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q87_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_dec_revenue()), 2).cast("double").alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# q88 — TPC-H Q16 shape: supplier diversity per part group. The
# NOT-IN exclusion (negative-balance suppliers) is a null-safe
# left-anti join; COUNT(DISTINCT) is the two-phase Expand aggregate.
# ---------------------------------------------------------------------------
@register(
    "q88_supplier_diversity",
    oracle="""
    SELECT p.p_brand, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand NOT IN ('Brand#1', 'Brand#2')
      AND p.p_size IN (1, 5, 9, 13)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2
    """,
)
def q88_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (
        _t(spark, sf_dir, "part")
        .filter(
            ~F.col("p_brand").isin("Brand#1", "Brand#2")
            & F.col("p_size").isin(1, 5, 9, 13)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_suppkey"))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(bad_supp),
            li.l_suppkey == F.col("bad_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q89 — TPC-H Q17 shape: small-quantity revenue. The correlated
# per-part average decorrelates into a groupBy-avg on the SAME
# filtered fact slice, re-joined on l_partkey (one extra shuffle on
# a key the join already uses — AQE reuses the exchange).
# ---------------------------------------------------------------------------
@register(
    "q89_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
    """,
)
def q89_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    # the per-part average must cover ALL lineitems of the part (the
    # correlated subquery is unfiltered), so compute it before the
    # brand restriction
    part_avg = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(brand_parts, li.l_partkey == F.col("p_partkey"))
        .join(part_avg, li.l_partkey == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# q90 — TPC-H Q19 shape: disjunctive conjunctions. The OR-of-ANDs
# sits in one equi-join on l_partkey; Catalyst extracts the common
# p_brand/p_size/l_quantity bounds as scan-level filters on both
# sides before the join evaluates the full disjunction.
# ---------------------------------------------------------------------------
@register(
    "q90_disjunctive_predicates",
    oracle="""
    SELECT -- exact DECIMAL money (q83 contract, r9)
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#5'  AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 5 AND 20
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 10 AND 40
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q90_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#5") & F.col("p_size").between(1, 10)
         & qty.between(1, 20))
        | ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(5, 20)
           & qty.between(10, 30))
        | ((F.col("p_brand") == "Brand#21") & F.col("p_size").between(10, 40)
           & qty.between(20, 50))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.round(F.sum(_dec_revenue()), 2).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q91 — TPC-H Q20 shape: suppliers with excess shipped volume of
# 'small%' parts in 1997. part filters first, the shipment aggregate
# applies HAVING, and supplier enters via left-semi — no correlated
# re-scan, one shuffle on l_suppkey.
# ---------------------------------------------------------------------------
@register(
    "q91_excess_volume_suppliers",
    oracle="""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'small%'
        AND l.l_shipdate >= DATE '1997-01-01'
        AND l.l_shipdate <  DATE '1998-01-01'
      GROUP BY l.l_suppkey
      HAVING SUM(l.l_quantity) > 400)
    """,
)
def q91_excess_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    small_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    heavy = (
        li.join(small_parts, li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 400)
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    return supp.join(
        heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select("s_name", "s_acctbal")
