"""Smoke tests for the relational surface. Full correctness runs via
tools/check_oracle.py (Spark vs DuckDB at sf0.01) — these tests keep
the driver-contract shape healthy and fast at sf0.001."""

import sys

sys.path.insert(0, "/root/repo")


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_every_query_runs_at_smallest_sf(spark, sf_dir):
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 40
    # spot-run a representative subset end-to-end at sf0.001
    for name in (
        "q02_filter_project",
        "q08_join_multiway",
        "q21_rollup",
        "v01_cosine_topk",
        "d01_exact_dedup",
        "t03_langid",
    ):
        df = qs[name](spark, sf_dir)
        assert df.count() >= 0


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """The q02 plan must push both predicates into the parquet scan
    and prune the schema to the 5 selected columns."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["q02_filter_project"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThan(l_quantity" in plan
    assert "l_returnflag" not in plan.split("ReadSchema")[1][:400]


def test_broadcast_join_for_dims(spark, sf_dir):
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["q09_join_broadcast_dim"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
