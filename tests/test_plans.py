"""Plan-shape assertions: broadcast hints must only target fixed-size
data. Key-cardinality inputs (the as-of bucket spine, TPC-H supplier)
must NOT carry a forced broadcast hint — at the 100-TB design point a
forced hint OOMs the driver regardless of AQE. We assert on the
*optimized logical plan* string, where Spark renders forced hints as
``strategy=broadcast`` inside the Join node, so the check is
deterministic and independent of AQE's runtime choices.
"""
from __future__ import annotations

import pytest

from datetime import datetime

from pyspark.sql import functions as F

from parquet_pipeline_spark.operators.temporal import asof_join
from parquet_pipeline_spark.operators.advanced import q63_local_supplier_volume
from tests.conftest import SF_DIR


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_spine_not_force_broadcast(spark):
    """The (by-key × bucket) spine grows with distinct keys × time —
    the join must be a plain key join, leaving broadcast to AQE."""
    n_keys = 500
    probes = spark.createDataFrame(
        [(f"k{i}", _ts("2024-01-01T12:00:00"), i) for i in range(n_keys)],
        "sym string, ts timestamp, id int",
    )
    quotes = spark.createDataFrame(
        [(f"k{i}", _ts("2024-01-01T09:00:00"), float(i)) for i in range(n_keys)],
        "sym string, ts timestamp, rate double",
    )
    out = asof_join(probes, quotes, "ts", "rate", by=["sym"])
    plan = _optimized_plan(out)
    assert "strategy=broadcast" not in plan, plan
    # semantics unchanged: every probe gets its key's earlier quote
    got = {r["sym"]: r["rate"] for r in out.collect()}
    assert got["k7"] == 7.0 and len(got) == n_keys


def test_flagship_plan_properties(spark, sf_dir):
    """Regression guards for the plan features PLANS.md documents:
    pushed scan filters, pruned ReadSchema, partial (map-side)
    aggregation before the exchange, TakeOrderedAndProject for top-k
    (O(k) per partition, no global sort)."""
    from parquet_pipeline_spark import registry

    registry.load_all()

    def plan(name):
        return (
            registry.QUERIES[name](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    p = plan("q01_pricing_summary")
    assert "PushedFilters: [" in p and "PushedFilters: []" not in p
    assert "partial_" in p  # map-side combine before the one shuffle

    p = plan("q02_filter_project")
    assert "PushedFilters: [" in p and "PushedFilters: []" not in p
    # column pruning: the scan must not read all 11 lineitem columns
    schema = p.split("ReadSchema: ")[1].splitlines()[0]
    assert schema.count(",") < 10, schema

    p = plan("q06_topk_orders")
    assert "TakeOrderedAndProject" in p  # top-k without a global sort


def test_q63_broadcasts_only_fixed_dims(spark, sf_dir):
    """q63 keeps broadcast hints on nation+region (fixed-size dims)
    and exactly those — supplier scales with SF and must not be
    hint-forced."""
    plan = _optimized_plan(q63_local_supplier_volume(spark, sf_dir))
    assert plan.count("strategy=broadcast") == 2, plan


def test_contamination_join_not_force_broadcast(spark, sf_dir):
    """t12's benchmark side explodes to one row per word-shingle —
    ~tokens-per-doc larger than the eval set itself — so the join
    must not carry a forced broadcast hint; AQE sees the
    post-explode size at runtime and broadcasts only when it fits."""
    from parquet_pipeline_spark.operators.text import contamination_hits

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = contamination_hits(
        docs.filter(F.col("doc_id") >= 100),
        docs.filter(F.col("doc_id") < 20),
        ngram_words=3,
        min_hits=3,
    )
    plan = _optimized_plan(out)
    assert "strategy=broadcast" not in plan, plan


def test_q51_lateral_bound_reaches_inner_scan(spark, sf_dir):
    """Spark decorrelates LATERAL...LIMIT into a window over the
    whole inner table and leaves the filter it infers from the outer
    bound ABOVE the window — so q51 repeats the bound inside the
    subquery. Guard: the lineitem scan must carry the pushed
    l_orderkey bound (otherwise a 1000-order query sorts the whole
    fact table; the sf1 sweep measured 9.6 s vs ~1 s)."""
    from parquet_pipeline_spark.operators.relational import q51_lateral_topn

    df = q51_lateral_topn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "FileScan" in l and "lineitem" in l]
    assert scans, plan
    assert any("LessThan(l_orderkey,1000)" in s for s in scans), scans[0]


def test_funnel_and_cohorts_plan_shape(spark, sf_dir):
    """q77/q78 guard: chained per-user aggregations must keep
    map-side partial aggregation, use no window over the raw event
    stream, and carry no FORCED broadcast (the per-user aggregates
    grow with users — broadcast is AQE's runtime call, not a hint)."""
    from parquet_pipeline_spark.operators.relational import (
        q77_funnel,
        q78_retention_cohorts,
    )

    for build in (q77_funnel, q78_retention_cohorts):
        df = build(spark, sf_dir)
        assert "strategy=broadcast" not in _optimized_plan(df)
        phys = df._jdf.queryExecution().executedPlan().toString()
        assert "partial_" in phys, phys
        assert "WindowExec" not in phys, phys


def test_scd2_single_exchange_pushed_filter(spark, sf_dir):
    """q79 guard: the SCD-2 interval build must be ONE shuffle (a
    single Exchange on user_id feeding the lead() window — the same
    exchange a downstream temporal join would reuse) with the
    user_id bound pushed into the parquet scan, and no join at all
    (a self-join formulation would fan out)."""
    from parquet_pipeline_spark.operators.relational import q79_scd2_intervals

    df = q79_scd2_intervals(spark, sf_dir)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert phys.count("Exchange hashpartitioning(user_id") == 1, phys
    assert "Join" not in phys, phys
    assert "PushedFilters: [" in phys and "LessThan(user_id,50)" in phys, phys


def test_q80_min_cost_supplier_plan_shape(spark, sf_dir):
    """q80 guard: the decorrelated MIN must keep map-side partial
    aggregation, the part-key bound must reach the scan, only the
    fixed-size nation dim may carry a forced broadcast (supplier is
    AQE's call), and there must be no correlated re-scan (exactly 2
    lineitem scans: fact side + min side)."""
    from parquet_pipeline_spark.operators.advanced import q80_min_cost_supplier

    df = q80_min_cost_supplier(spark, sf_dir)
    opt = _optimized_plan(df)
    assert opt.count("strategy=broadcast") == 1, opt
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in phys, phys
    assert "LessThan(l_partkey,500)" in phys, phys
    assert phys.count("Location: InMemoryFileIndex") >= 2  # both lineitem sides scan

def test_q66_single_shuffle_codegen_aggregation(spark, sf_dir):
    """q66 guard (r17, VERDICT r16 item 1): the qualification
    aggregation must be the codegen two-level HashAggregate behind
    ONE l_orderkey repartition — never ObjectHashAggregate (whose
    128-key sort fallback bites at scale; the r16 collect_list form
    measured 0.60× on the driver box), and never a second agg
    exchange (HashPartitioning(l_orderkey) satisfies both levels)."""
    from parquet_pipeline_spark.operators.advanced import q66_waiting_supplier

    df = q66_waiting_supplier(spark, sf_dir)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "ObjectHashAggregate" not in phys, phys
    # data exchanges: the l_orderkey repartition + the s_name agg only
    n_data_ex = phys.count("Exchange hashpartitioning")
    assert n_data_ex == 2, phys


def test_tpch_extra_plan_shapes(spark, sf_dir):
    """q81-q91 guards: the EXISTS shapes decorrelate to semi joins
    (never a correlated re-scan), scan-level predicates (date
    windows, LIKE, brand/size) actually reach the parquet scans,
    forced broadcasts cover only fixed-size dims (the two nation
    aliases in q82, none of supplier/part/customer), and every
    aggregate keeps its map-side partial phase."""
    from parquet_pipeline_spark.operators import tpch_extra as tx

    def phys(df):
        return df._jdf.queryExecution().executedPlan().toString()

    # q81: EXISTS -> left-semi, orders date window pushed down
    p = phys(tx.q81_priority_late_exists(spark, sf_dir))
    assert "LeftSemi" in p, p
    assert "GreaterThanOrEqual(o_orderdate" in p, p

    # q82: both nation aliases broadcast-hinted, supplier left to AQE
    opt = _optimized_plan(tx.q82_nation_pair_volume(spark, sf_dir))
    assert opt.count("strategy=broadcast") == 2, opt

    # q83: LIKE filter reaches the part scan; partial aggregation
    p = phys(tx.q83_product_profit(spark, sf_dir))
    assert "StringContains(p_name,red)" in p, p
    assert "partial_" in p, p

    # q85: LEFT OUTER preserved (zero-order customers survive)
    p = phys(tx.q85_custdist(spark, sf_dir))
    assert "LeftOuter" in p, p

    # q89: decorrelated per-part average — exactly two lineitem
    # scans (fact slice + average side), brand filter on part scan
    df = tx.q89_small_quantity_revenue(spark, sf_dir)
    p = phys(df)
    assert p.count("lineitem.parquet") == 2, p
    assert "EqualTo(p_brand,Brand#3)" in p, p

    # q91: HAVING aggregate feeds a semi join; date window pushed
    p = phys(tx.q91_excess_volume_suppliers(spark, sf_dir))
    assert "LeftSemi" in p, p
    assert "GreaterThanOrEqual(l_shipdate" in p, p


@pytest.mark.slow
def test_no_unbounded_nested_loops_anywhere(spark, sf_dir):
    """Global guard over EVERY registry query: no CartesianProduct,
    and BroadcastNestedLoopJoin only where the broadcast side is
    bounded by construction — the documented allowlist below (one-row
    scalar aggregates, a bounded query/vocab set, or an id-bounded
    correctness baseline). A new query that introduces an unbounded
    nested loop fails here by default."""
    from parquet_pipeline_spark import registry

    registry.load_all()
    BNLJ_BOUNDED = {
        "a01_ann_lsh_topk",        # one query row broadcast (single-query ANN)
        "a06_ann_lsh_topk_oracle", # same shape, md5 twin
        "d02_ngram_jaccard_pairs", # id-bounded all-pairs baseline (documented)
        "d05_embedding_neardup",   # id-bounded all-pairs baseline (documented)
        "d06_word_shingle_jaccard",# id-bounded all-pairs baseline (documented)
        "q32_vs_global_avg",       # one-row scalar aggregate broadcast
        "q62_share_of_total",      # one-row scalar aggregate broadcast
        "q67_global_sales_opportunity",  # one-row scalar aggregate broadcast
        "q70_important_stock",     # one-row scalar aggregate broadcast
        "t10_vocab_coverage",      # bounded top-V vocab broadcast
        "v03_knn_join",            # bounded query-set broadcast
        "q95_skew_report",         # one-row scalar aggregate broadcast
        "t22_lm_score",            # one-row vocab-size scalar broadcast
    }
    offenders = {}
    for name, fn in registry.QUERIES.items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in BNLJ_BOUNDED:
            offenders[name] = "BroadcastNestedLoopJoin (not allowlisted)"
    assert not offenders, offenders
