from parquet_pipeline_spark.plans import (
    FakeClient,
    choose_strategy,
    decompose_query,
    generate_sql,
    identify_tables,
    route_intent,
)
from parquet_pipeline_spark.plans.planner import infer_join_key

CATALOG = {
    "orders": ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
    "customer": ["c_custkey", "c_name", "c_mktsegment"],
    "lineitem": ["l_orderkey", "l_quantity", "l_discount"],
}


def test_decompose_fallback_single():
    assert decompose_query("What is the max total price?") == [
        "What is the max total price?"
    ]


def test_decompose_fallback_multiquestion():
    out = decompose_query("What is the max o_totalprice? Who is customer 5?")
    assert len(out) == 2


def test_decompose_with_client():
    client = FakeClient([{"queries": ["q1", "q2"]}])
    assert decompose_query("q1 and q2", client) == ["q1", "q2"]


def test_identify_tables_fallback_keyword_match():
    tables, _ = identify_tables("total o_totalprice per o_custkey", CATALOG)
    assert tables == ["orders"]


def test_identify_tables_fallback_all_when_no_match():
    tables, key = identify_tables("show me everything", CATALOG)
    assert tables == ["*"] and key is None


def test_infer_join_key_common_column():
    cat = {"a": ["id", "x"], "b": ["id", "y"]}
    assert infer_join_key(["a", "b"], cat) == "id"
    assert infer_join_key(["a"], cat) is None


def test_choose_strategy_truth_table():
    # reference langgraph_pipeline.py:211-229
    assert choose_strategy(["*"], None) == "union"
    assert choose_strategy(["a"], None) == "single"
    assert choose_strategy(["a", "b"], "id") == "join"
    assert choose_strategy(["a", "b"], None) == "union"


def test_route_intent_rules():
    assert route_intent("total sales per month in 1998") == "SQL_QUERY"
    assert route_intent("who is Gregory Red") == "SEMANTIC_SEARCH"
    assert route_intent("hmm") == "SQL_QUERY"  # default


def test_generate_sql_fallback_patterns():
    sql = generate_sql("maximum o_totalprice from orders", CATALOG)
    assert sql == "SELECT MAX(o_totalprice) AS max_o_totalprice FROM orders"
    sql = generate_sql("how many orders", CATALOG)
    assert sql == "SELECT COUNT(*) AS n FROM orders"


def test_generate_sql_with_client_contract():
    client = FakeClient([{"sql_query": "SELECT 1 AS one", "explanation": "x"}])
    assert generate_sql("anything", CATALOG, client) == "SELECT 1 AS one"
    system, user = client.calls[0]
    assert "Spark SQL" in system and "anything" in user


def test_query_pipeline_keyless_end_to_end(spark, sf_dir):
    from parquet_pipeline_spark.catalog import register_tables
    from parquet_pipeline_spark.pipeline import run_query_pipeline

    views = register_tables(spark, sf_dir, ["orders", "customer"])
    res = run_query_pipeline(spark, "What is the maximum o_totalprice in orders?", views)
    [(sub, df)] = list(res.results.items())
    assert df.columns == ["max_o_totalprice"]
    assert df.first()[0] > 0
    assert "max_o_totalprice" in res.summary


def test_query_pipeline_error_as_data(spark, sf_dir):
    from parquet_pipeline_spark.catalog import register_tables
    from parquet_pipeline_spark.pipeline import run_query_pipeline
    from parquet_pipeline_spark.plans import FakeClient

    views = register_tables(spark, sf_dir, ["orders"])
    client = FakeClient(
        [
            {"queries": ["bad sql please"]},
            {"tables_required": ["orders"], "join_key": None},
            {"intent": "SQL_QUERY"},
            {"sql_query": "SELECT nonexistent_col FROM orders", "explanation": ""},
        ]
    )
    res = run_query_pipeline(spark, "bad sql please", views, client)
    [df] = list(res.results.values())
    assert df.columns == ["Error"]
    assert "No data found or error occurred" in res.summary
