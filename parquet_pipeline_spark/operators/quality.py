"""Data-quality validation (expectations) over logical tables.

The training-data analog of a deequ/great-expectations pass: declare
rules, get per-rule violation counts and a pass/fail verdict in ONE
scan (all rules evaluate as conditional aggregates — no per-rule
jobs, which is what makes this usable on a 100 TB table).

Rule forms:
- ("not_null", col)
- ("unique", col)                       # no duplicate values
- ("range", col, lo, hi)                # inclusive bounds
- ("in_set", col, [allowed values])
- ("matches", col, regex)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_pipeline_spark import tables
from parquet_pipeline_spark.registry import register

Rule = tuple


def _violation_expr(df: DataFrame, rule: Rule):
    kind, col = rule[0], rule[1]
    c = F.col(col)
    if kind == "not_null":
        return F.sum(F.when(c.isNull(), 1).otherwise(0))
    if kind == "range":
        _, _, lo, hi = rule
        return F.sum(F.when(c.isNull() | (c < lo) | (c > hi), 1).otherwise(0))
    if kind == "in_set":
        allowed = rule[2]
        return F.sum(F.when(~c.isin(*allowed) | c.isNull(), 1).otherwise(0))
    if kind == "matches":
        pattern = rule[2]
        return F.sum(F.when(~c.rlike(pattern) | c.isNull(), 1).otherwise(0))
    raise ValueError(f"unknown rule kind: {kind}")


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """→ (rule, column, n_violations, passed). Single-scan for the
    row-local rules; each ``unique`` rule adds one aggregation over
    the key (can't be row-local)."""
    row_rules = [r for r in rules if r[0] != "unique"]
    uniq_rules = [r for r in rules if r[0] == "unique"]

    parts: list[DataFrame] = []
    if row_rules:
        aggs = [
            _violation_expr(df, r).cast("long").alias(f"_v{i}")
            for i, r in enumerate(row_rules)
        ]
        wide = df.agg(*aggs)
        stacked = wide.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r[0]).alias("rule"),
                            F.lit(r[1]).alias("column"),
                            F.col(f"_v{i}").alias("n_violations"),
                        )
                        for i, r in enumerate(row_rules)
                    ]
                )
            ).alias("s")
        ).select("s.rule", "s.column", "s.n_violations")
        parts.append(stacked)
    for r in uniq_rules:
        col = r[1]
        dup = (
            df.groupBy(col)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .agg(F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("n_violations"))
            .select(
                F.lit("unique").alias("rule"),
                F.lit(col).alias("column"),
                "n_violations",
            )
        )
        parts.append(dup)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("n_violations") == 0)


@register(
    "q56_data_quality",
    oracle="""
    SELECT 'not_null' AS rule, 'o_custkey' AS column,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
           SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'range', 'o_totalprice',
           CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0 OR o_totalprice > 1000000 THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0 OR o_totalprice > 1000000 THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'in_set', 'o_orderstatus',
           CAST(SUM(CASE WHEN o_orderstatus IS NULL OR o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN o_orderstatus IS NULL OR o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'unique', 'o_orderkey',
           CAST(COALESCE((SELECT SUM(n) FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)), 0) AS BIGINT),
           COALESCE((SELECT SUM(n) FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)), 0) = 0
    """,
)
def q56_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = tables.table(spark, sf_dir, "orders")
    return validate(
        orders,
        [
            ("not_null", "o_custkey"),
            ("range", "o_totalprice", 0, 1_000_000),
            ("in_set", "o_orderstatus", ["O", "F", "P"]),
            ("unique", "o_orderkey"),
        ],
    )


def _row_violation_cond(rule: Rule):
    """Boolean per-row violation expression for a row-local rule."""
    kind, col = rule[0], rule[1]
    c = F.col(col)
    if kind == "not_null":
        return c.isNull()
    if kind == "range":
        _, _, lo, hi = rule
        return c.isNull() | (c < lo) | (c > hi)
    if kind == "in_set":
        return ~c.isin(*rule[2]) | c.isNull()
    if kind == "matches":
        return ~c.rlike(rule[2]) | c.isNull()
    raise ValueError(f"row-local rule required, got: {kind}")


def quarantine_split(df: DataFrame, rules: list[Rule]) -> tuple[DataFrame, DataFrame]:
    """Split one scan into (clean, quarantined): rows violating ANY
    row-local rule land in quarantine carrying a ``reasons`` column
    (sorted comma-joined rule names) so downstream triage knows WHY
    — the deequ-style row-level expectations pattern. Both outputs
    share the one annotated plan; no second scan."""
    # evaluate rules in sorted-name order so concat_ws (which skips
    # nulls natively) yields the sorted reasons string WITHOUT any
    # per-row array build/sort — measured 11.2 s -> scan-bound at
    # sf1's 6M rows
    ordered = sorted(rules, key=lambda r: f"{r[0]}:{r[1]}")
    flags = [
        F.when(_row_violation_cond(r), F.lit(f"{r[0]}:{r[1]}")) for r in ordered
    ]
    annotated = df.withColumn("reasons", F.concat_ws(",", *flags))
    clean = annotated.filter(F.col("reasons") == "").drop("reasons")
    quarantined = annotated.filter(F.col("reasons") != "")
    return clean, quarantined


@register(
    "q94_quarantine_reasons",
    oracle="""
    SELECT reasons, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(l_orderkey) AS BIGINT) AS first_orderkey
    FROM (
      SELECT l_orderkey,
             array_to_string(list_sort(list_filter([
               CASE WHEN l_discount IS NULL OR l_discount < 0 OR l_discount > 0.06
                    THEN 'range:l_discount' END,
               CASE WHEN l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 30
                    THEN 'range:l_quantity' END,
               CASE WHEN l_returnflag NOT IN ('A', 'N') OR l_returnflag IS NULL
                    THEN 'in_set:l_returnflag' END
             ], x -> x IS NOT NULL)), ',') AS reasons
      FROM lineitem
    )
    WHERE reasons <> ''
    GROUP BY reasons
    """,
)
def q94_quarantine_reasons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantine triage report: how many rows violate which rule
    combinations (the quarantined side of quarantine_split,
    aggregated by reason set)."""
    li = tables.table(spark, sf_dir, "lineitem")
    _clean, bad = quarantine_split(
        li,
        [
            ("range", "l_discount", 0, 0.06),
            ("range", "l_quantity", 1, 30),
            ("in_set", "l_returnflag", ["A", "N"]),
        ],
    )
    return bad.groupBy("reasons").agg(
        F.count("*").alias("n_rows"),
        F.min("l_orderkey").alias("first_orderkey"),
    )
