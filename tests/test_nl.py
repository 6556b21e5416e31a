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


def test_semantic_search_narrows_tables(spark):
    """A49: retrieval-driven source refinement — a SEMANTIC_SEARCH
    question narrows the table set to tables whose embeddings score
    above threshold, using the keyless hash embedder end-to-end."""
    from pyspark.sql import functions as F

    from parquet_pipeline_spark.operators.embedding import embed_text
    from parquet_pipeline_spark.pipeline import run_query_pipeline, semantic_search

    alpha = spark.createDataFrame(
        [(0, "who is Gregory Red the loan applicant"), (1, "loan amounts and rates")],
        "vec_id long, text string",
    )
    beta = spark.createDataFrame(
        [(2, "supplier shipping manifests"), (3, "warehouse inventory levels")],
        "vec_id long, text string",
    )
    docs = alpha.unionByName(beta)
    emb = embed_text(docs, "text", "vec_id", dim=16).join(docs, "vec_id").withColumn(
        "source_table", F.when(F.col("vec_id") < 2, "alpha").otherwise("beta")
    )
    # the hash embedder maps the exact question text to the exact
    # same vector → doc 0 scores 1.0 for its own text, so a question
    # equal to doc 0's text must rank 'alpha' first
    q = "who is Gregory Red the loan applicant"
    tables, context, hits = semantic_search(q, emb, docs, threshold=0.5)
    assert tables == ["alpha"]
    assert "[Source: alpha]" in context
    assert hits.first()["vec_id"] == 0

    views = {
        "alpha": spark.createDataFrame([(1, "x")], "id long, v string"),
        "beta": spark.createDataFrame([(2, "y")], "id long, v string"),
    }
    res = run_query_pipeline(
        spark, q, views, embeddings=emb, documents=docs, semantic_threshold=0.5
    )
    assert res.intents[q] == "SEMANTIC_SEARCH"
    # fallback SQL runs against the narrowed table, not the union
    assert "alpha" in list(res.sql.values())[0]


def test_sanitize_collection_name():
    from parquet_pipeline_spark.operators.embedding import sanitize_collection_name

    assert sanitize_collection_name("data_source_loans") == "data_source_loans"
    assert sanitize_collection_name("__weird  name!!") == "weird__name"
    assert sanitize_collection_name("a") == "aco"  # padded to 3
    assert len(sanitize_collection_name("x" * 600)) == 512


def test_multi_intent_pipeline_keyless(spark, sf_dir):
    """Two questions in one prompt → two sub-queries, two results."""
    from parquet_pipeline_spark.catalog import register_tables
    from parquet_pipeline_spark.pipeline import run_query_pipeline

    views = register_tables(spark, sf_dir, ["orders", "customer"])
    res = run_query_pipeline(
        spark,
        "What is the maximum o_totalprice in orders? How many customer are there?",
        views,
    )
    assert len(res.sub_queries) == 2
    assert len(res.results) == 2
    vals = [df.first()[0] for df in res.results.values()]
    assert all(v is not None for v in vals)


def test_join_mode_pipeline_keyless(spark):
    """Two tables sharing a key + a question touching both → JOIN
    strategy pre-joins on the inferred key (reference JOIN mode)."""
    from parquet_pipeline_spark.pipeline import run_query_pipeline

    loans = spark.createDataFrame(
        [(1, 100.0), (2, 250.0)], "account_id long, loan_amount double"
    )
    owners = spark.createDataFrame(
        [(1, "alice"), (2, "bob")], "account_id long, owner_name string"
    )
    res = run_query_pipeline(
        spark,
        "maximum loan_amount with owner_name",
        {"loans": loans, "owners": owners},
    )
    sql = list(res.sql.values())[0]
    assert "joined_data" in sql
    df = list(res.results.values())[0]
    assert df.first()[0] == 250.0


def test_semantic_search_diversify_uses_mmr(spark):
    """diversify=True: the assembled context draws from more distinct
    source tables than plain top-k when one table floods the top
    scores with near-duplicates."""
    import random

    from pyspark.sql import functions as F

    from parquet_pipeline_spark.operators.embedding import hash_embedder
    from parquet_pipeline_spark.pipeline import semantic_search

    rng = random.Random(5)
    dim = 16
    embedder = hash_embedder(dim)
    q = "what is the revenue"
    qv = embedder([q])[0]
    rows = []
    # table A: 6 near-copies of the query vector; tables B, C: one
    # moderately-close vector each
    for i in range(6):
        rows.append((i, [x + rng.gauss(0, 0.01) for x in qv], "tab_a"))
    for j, t in enumerate(["tab_b", "tab_c"]):
        rows.append((10 + j, [0.7 * x + rng.gauss(0, 0.05) for x in qv], t))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, source_table string"
    )

    _, _, plain = semantic_search(q, emb, embedder=embedder, k=3, threshold=0.0)
    _, _, diverse = semantic_search(
        q, emb, embedder=embedder, k=3, threshold=0.0, diversify=True, mmr_lambda=0.3
    )
    plain_tables = {r["source_table"] for r in plain.collect()}
    diverse_tables = {r["source_table"] for r in diverse.collect()}
    assert len(diverse_tables) > len(plain_tables), (plain_tables, diverse_tables)


# --- r10: planner-contract gaps found by the eighth battery ---------------
# (tools/adversarial_planner_check.py) — each was a real hole before
# the r10 validation hardening.


def test_decompose_rejects_bare_string_payload():
    """{"queries": "one string"} iterated PER CHARACTER before r10 —
    a bare string is a list of 1-char strings to duck typing."""
    from parquet_pipeline_spark.plans.planner import decompose_query

    got = decompose_query(
        "total by region?", FakeClient(['{"queries": "total by region?"}'])
    )
    assert got == ["total by region?"]  # fallback, not 16 one-char queries


def test_identify_tables_validates_against_catalog():
    """Hallucinated tables are dropped; a join_key that is not a
    string column shared by every selected table is re-inferred
    (a dict join_key previously flowed into df.join() and raised
    mid-pipeline)."""
    from parquet_pipeline_spark.plans.planner import identify_tables

    catalog = {"orders": ["id", "amount"], "customers": ["id", "name"]}
    tables, jk = identify_tables(
        "q",
        catalog,
        FakeClient(
            [
                {
                    "tables_required": ["orders", "customers", "ghost_table"],
                    "join_key": {"not": "a string"},
                }
            ]
        ),
    )
    assert tables == ["orders", "customers"]
    assert jk == "id"  # re-inferred shared column


def test_identify_tables_bare_string_falls_back():
    from parquet_pipeline_spark.plans.planner import identify_tables

    catalog = {"orders": ["id", "amount"]}
    got = identify_tables("orders amount", catalog,
                          FakeClient(['{"tables_required": "orders"}']))
    want = identify_tables("orders amount", catalog, None)
    assert got == want


def test_run_sql_safe_refuses_ddl_dml(spark):
    """Generated SQL is untrusted model output: DDL/DML returns an
    error frame and the view survives; comment prefixes can't smuggle
    a DROP past the check."""
    from parquet_pipeline_spark.errors import is_error_frame, run_sql_safe

    import os
    import tempfile

    spark.createDataFrame([(1,)], "x long").createOrReplaceTempView("nl_guard")
    pwn_dir = os.path.join(tempfile.gettempdir(), "nl_guard_pwn_dir")
    for stmt in (
        "DROP VIEW nl_guard",
        "/* hi */ DROP VIEW nl_guard",
        "INSERT INTO nl_guard VALUES (2)",
        "CREATE TABLE boom AS SELECT 1",
        # multi-statement smuggle: passes the SELECT head check, but
        # spark.sql's single-statement parser rejects it -> error
        # frame, view intact (verified r10)
        "SELECT 1; DROP VIEW nl_guard",
        # CTE-prefixed DML (ADVICE r10): Spark's grammar allows
        # `ctes? dmlStatementNoWith`, so these start with WITH yet
        # mutate — the head check alone let them through and the
        # INSERT OVERWRITE DIRECTORY form wrote files to disk.
        f"WITH s AS (SELECT 42 AS x) INSERT OVERWRITE DIRECTORY "
        f"'{pwn_dir}' USING parquet SELECT * FROM s",
        "WITH s AS (SELECT 2 AS x) INSERT INTO nl_guard SELECT x FROM s",
        "WITH s AS (SELECT 1 AS x) DELETE FROM nl_guard WHERE true",
        "WITH s AS (SELECT 1 AS x) UPDATE nl_guard SET x = 9",
        "WITH s AS (SELECT 1 AS x) MERGE INTO nl_guard USING s "
        "ON false WHEN MATCHED THEN DELETE",
        # keyword hidden only by a comment must still refuse
        "WITH s AS (SELECT 1) SELECT * FROM s /* tail */ ; DROP VIEW nl_guard",
        # raw-string confusion (found r11): r'\' is a RAW string (the
        # backslash is literal, the string ends at the quote) — a
        # lexer that applies backslash escapes to it swallows the
        # INSERT into a fake string and accepts the statement
        r"WITH s AS (SELECT r'\' AS x) INSERT INTO nl_guard SELECT 9 FROM s",
        r'WITH s AS (SELECT r"\" AS x) INSERT INTO nl_guard SELECT 9 FROM s',
    ):
        assert is_error_frame(run_sql_safe(spark, stmt)), stmt
    assert spark.table("nl_guard").count() == 1
    assert not os.path.exists(pwn_dir), "refused INSERT OVERWRITE DIRECTORY wrote files"
    # reads stay reads: comments, CTEs, and mutation keywords inside
    # string literals or the REPLACE() builtin must NOT trip the scan
    for ok in (
        "-- c\nSELECT * FROM nl_guard",
        "WITH c AS (SELECT x FROM nl_guard) SELECT * FROM c",
        "SELECT 'please INSERT and DROP nothing' AS msg FROM nl_guard",
        "SELECT REPLACE('abc', 'b', 'd') AS s FROM nl_guard",
        "SELECT x FROM nl_guard GROUP BY GROUPING SETS ((x), ())",
        # legit raw strings (regex patterns are their main use) and
        # keywords INSIDE them must not trip the scan
        r"SELECT r'\d+ INSERT DROP' AS pat FROM nl_guard",
    ):
        assert not is_error_frame(run_sql_safe(spark, ok)), ok


def test_generate_sql_rejects_non_string_sql():
    from parquet_pipeline_spark.plans.planner import generate_sql

    sql = generate_sql(
        "count orders",
        {"orders": ["id"]},
        FakeClient(['{"sql_query": 123}']),
    )
    assert sql == "SELECT COUNT(*) AS n FROM orders"  # deterministic fallback
