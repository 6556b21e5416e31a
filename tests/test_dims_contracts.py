"""Contracts caught by the dirty-dims battery (r8) — pinned as unit
regressions so the fixes can't silently revert:

1. q48 UNPIVOT: NULL cells produce NO row (standard-SQL / DuckDB
   default; Spark's melt-shaped unpivot retains them and must be
   filtered).
2. q76 rank windows: ORDER BY over a nullable key pins NULLS FIRST
   on both sides (Spark's ASC default vs DuckDB's NULLS LAST).
3. q14 CONCAT_WS: a NULL argument drops its separator too —
   identical in both engines, unlike CONCAT.
4. q83 money: profit sums run in exact decimal, so a term landing on
   an exact .xx5 cent boundary rounds identically in both engines.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _write_sf(spark, tmp_path, table, df):
    sf = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(os.path.join(sf, f"{table}.parquet"))
    return sf


def test_q48_unpivot_drops_null_cells(spark, tmp_path):
    from parquet_pipeline_spark import registry

    registry.load_all()
    part = spark.createDataFrame(
        [(1, "n1", "B#1", "t", 5, 10.0), (2, "n2", "B#2", "t", None, None)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    sf = _write_sf(spark, tmp_path, "part", part)
    rows = registry.QUERIES["q48_unpivot"](spark, sf).collect()
    # part 2's two NULL metrics emit no rows; part 1 emits both
    assert sorted((r["p_partkey"], r["metric"]) for r in rows) == [
        (1, "retail_price"),
        (1, "size_val"),
    ]


def test_q76_null_balance_ranks_first_and_matches_oracle(spark, tmp_path):
    import duckdb

    from parquet_pipeline_spark import registry

    registry.load_all()
    cust = spark.createDataFrame(
        [
            (1, "a", 0, 50.0, "SEG"),
            (2, "b", 0, None, "SEG"),   # NULL balance
            (3, "c", 0, 10.0, "SEG"),
            (4, "d", 0, 99.0, "SEG"),
        ],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double,"
        " c_mktsegment string",
    )
    sf = _write_sf(spark, tmp_path, "customer", cust)
    got = {
        r["c_custkey"]: r["bal_quartile"]
        for r in registry.QUERIES["q76_ntile_buckets"](spark, sf).collect()
    }
    # NULLS FIRST: the NULL-balance customer is rank 1 -> quartile 1
    assert got[2] == 1 and got[4] == 4
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM read_parquet("
        f"'{os.path.join(sf, 'customer.parquet')}/*.parquet')"
    )
    oracle = {
        r[1]: r[2]
        for r in con.execute(registry.ORACLES["q76_ntile_buckets"]).fetchall()
    }
    assert got == {k: int(v) for k, v in oracle.items()}


def test_q14_concat_ws_skips_null_and_separator(spark, tmp_path):
    import duckdb

    from parquet_pipeline_spark import registry

    registry.load_all()
    part = spark.createDataFrame(
        [(1, "redish", None, "TYPE", 3, 1.0), (2, "red two", "B#2", None, 3, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    sf = _write_sf(spark, tmp_path, "part", part)
    got = {
        r["p_partkey"]: r["brand_type"]
        for r in registry.QUERIES["q14_string_funcs"](spark, sf).collect()
    }
    assert got == {1: "TYPE", 2: "B#2"}  # no dangling ':'
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW part AS SELECT * FROM read_parquet("
        f"'{os.path.join(sf, 'part.parquet')}/*.parquet')"
    )
    odf = con.execute(registry.ORACLES["q14_string_funcs"]).df()
    assert dict(zip(odf["p_partkey"], odf["brand_type"])) == got


def test_q83_decimal_sum_is_exact_on_half_cent_boundary(spark, tmp_path):
    """A profit term of exactly x.xx5 dollars (0.5 * -5.0 * odd qty
    shape) must round identically in Spark and DuckDB — the double
    path flapped by one cent here (dirty-dims battery, r8)."""
    import duckdb

    from parquet_pipeline_spark import registry

    registry.load_all()
    sf = str(tmp_path / "sf")
    li = spark.createDataFrame(
        # extprice*(1-disc) = 10.0; cost = 0.5*(-5.0)*3.37 = -8.425
        # -> profit term 18.425: exact half-cent boundary
        [(1, 1, "1995-01-01", 10.0, 0.0, 3.37)],
        "l_partkey long, l_suppkey long, l_shipdate string,"
        " l_extendedprice double, l_discount double, l_quantity double",
    ).withColumn("l_shipdate", F.to_date("l_shipdate"))
    part = spark.createDataFrame(
        [(1, "red part", "B#1", "t", 1, -5.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    supp = spark.createDataFrame(
        [(1, "s1", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double",
    )
    nation = spark.createDataFrame(
        [(0, "N0", 0)], "n_nationkey long, n_name string, n_regionkey long"
    )
    for t, df in (("lineitem", li), ("part", part), ("supplier", supp), ("nation", nation)):
        df.write.parquet(os.path.join(sf, f"{t}.parquet"))
    got = registry.QUERIES["q83_product_profit"](spark, sf).collect()
    assert len(got) == 1
    con = duckdb.connect()
    for t in ("lineitem", "part", "supplier", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet("
            f"'{os.path.join(sf, t + '.parquet')}/*.parquet')"
        )
    oracle = con.execute(registry.ORACLES["q83_product_profit"]).fetchall()
    assert got[0]["profit"] == oracle[0][2] == 18.43  # decimal HALF_UP
