"""Query planning: decompose → select tables → route → generate SQL.

Each step takes an optional ``LLMClient``; on any failure (or with
no client) it falls back to a deterministic rule, mirroring the
reference's fallback-on-every-LLM-call design (reference:
decomposition_util.py:79-84; multi_file_util.py:69-71;
langgraph_pipeline.py:346-349) but making the deterministic path a
first-class, tested mode rather than an emergency.

The LLM prompt contracts reproduce the reference's semantics:
- decomposition returns atomic sub-queries, minimal splitting
  (reference: decomposition_util.py:35-49);
- table selection is strictly selective — only tables containing the
  required columns — with "*" meaning all (reference:
  multi_file_util.py:43-46);
- routing classifies SEMANTIC_SEARCH vs SQL_QUERY, defaulting to
  SQL_QUERY (reference: langgraph_pipeline.py:305-316, 346-349);
- generated SQL targets *Spark SQL over registered temp views* —
  replacing the reference's read_parquet(uri)-path-injection prompt
  hack (reference: langgraph_pipeline.py:439-458) with plain table
  names, which is both simpler and engine-portable.
"""

from __future__ import annotations

import json
import re

from parquet_pipeline_spark.plans.client import LLMClient

# -- A37: multi-intent decomposition ---------------------------------------
_DECOMPOSE_SYSTEM = (
    "Split the user question into the minimal list of atomic sub-questions. "
    "Do NOT split questions that share a filter or can be answered by one "
    "query. Respond as JSON: {\"queries\": [\"...\"]}"
)


def decompose_query(question: str, client: LLMClient | None = None) -> list[str]:
    if client is not None:
        try:
            out = json.loads(client.complete(_DECOMPOSE_SYSTEM, question, json_mode=True))
            raw = out["queries"]
            # type-validate, don't just duck-type: a bare STRING here
            # iterates per character and would "succeed" as a list of
            # one-letter sub-queries (found by the planner battery,
            # tools/adversarial_planner_check.py)
            if isinstance(raw, list) and all(isinstance(q, str) for q in raw):
                qs = [q.strip() for q in raw if q and q.strip()]
                if qs:
                    return qs
        except Exception:
            pass
    # deterministic fallback: split only on explicit multi-question
    # punctuation; otherwise the question is already atomic
    parts = [p.strip() for p in re.split(r"\?\s+(?=\w)", question) if p.strip()]
    if len(parts) > 1:
        return [p if p.endswith("?") else p + "?" for p in parts]
    return [question]


# -- A38: table selection + join-key inference -----------------------------
_SELECT_SYSTEM = (
    "Given a catalog of logical tables and their columns, list the tables "
    "required to answer the question (STRICT SELECTIVITY: only tables that "
    "contain required columns; [\"*\"] if all are needed) and a join_key "
    "shared by the selected tables or null. Respond as JSON: "
    "{\"tables_required\": [...], \"join_key\": ...}"
)


def identify_tables(
    question: str,
    catalog: dict[str, list[str]],
    client: LLMClient | None = None,
) -> tuple[list[str], str | None]:
    """catalog: {table_name: [columns]} → (tables, join_key)."""
    if client is not None:
        try:
            ctx = "\n".join(f"{t}: {', '.join(cols)}" for t, cols in catalog.items())
            out = json.loads(
                client.complete(_SELECT_SYSTEM, f"Catalog:\n{ctx}\n\nQuestion: {question}",
                                json_mode=True)
            )
            raw = out.get("tables_required")
            # validate shape AND content against the catalog: a bare
            # string iterates per character; hallucinated table names
            # would make the engine fall back to all views while
            # REPORTING a selective plan; a non-string / non-shared
            # join_key flows into df.join(...) and raises mid-pipeline
            # (all three found by tools/adversarial_planner_check.py)
            if isinstance(raw, list) and all(isinstance(t, str) for t in raw):
                if raw == ["*"]:
                    return ["*"], None
                tables = [t for t in raw if t in catalog]
                if tables:
                    jk = out.get("join_key")
                    if len(tables) < 2:
                        jk = None
                    elif not (
                        isinstance(jk, str)
                        and all(jk in catalog.get(t, []) for t in tables)
                    ):
                        jk = infer_join_key(tables, catalog)
                    return tables, jk
        except Exception:
            pass
    # deterministic fallback: token-match table names and column names
    # against the question; no match → all tables (reference fallback
    # is all files, multi_file_util.py:69-71)
    qtokens = set(re.findall(r"[a-z0-9_]+", question.lower()))
    hits: list[str] = []
    for t, cols in catalog.items():
        if t.lower() in qtokens or any(c.lower() in qtokens for c in cols):
            hits.append(t)
    tables = hits or ["*"]
    join_key = infer_join_key(tables, catalog) if len(tables) > 1 else None
    return tables, join_key


def infer_join_key(tables: list[str], catalog: dict[str, list[str]]) -> str | None:
    """Join key = a column name shared by every selected table
    (the deterministic analog of the reference's LLM join-key
    inference, multi_file_util.py:21-25)."""
    if len(tables) < 2 or tables == ["*"]:
        return None
    common = None
    for t in tables:
        cols = set(catalog.get(t, []))
        common = cols if common is None else (common & cols)
    return sorted(common)[0] if common else None


# -- A39: UNION vs JOIN strategy (exact reference truth table,
#    langgraph_pipeline.py:211-229) ----------------------------------------
def choose_strategy(tables: list[str], join_key: str | None) -> str:
    """'single' | 'union' | 'join' — '*' or multiple tables without a
    join key → UNION by name; multiple with key → JOIN."""
    if tables == ["*"]:
        return "union"
    if len(tables) <= 1:
        return "single"
    return "join" if join_key else "union"


# -- A40: intent routing ----------------------------------------------------
_SQL_HINTS = re.compile(
    r"\b(sum|total|count|how many|average|avg|max|maximum|min|minimum|"
    r"group|per |by |top \d+|between|greater|less|more than|under|over|"
    r"before|after|during|month|year|date|rate|percent)\b",
    re.I,
)
_SEMANTIC_HINTS = re.compile(
    r"\b(who is|what is .* about|similar|like this|related to|about|"
    r"meaning|describe|tell me about)\b",
    re.I,
)


def route_intent(question: str, client: LLMClient | None = None) -> str:
    """SEMANTIC_SEARCH | SQL_QUERY (default SQL_QUERY, as the
    reference falls back, langgraph_pipeline.py:346-349)."""
    if client is not None:
        try:
            out = json.loads(
                client.complete(
                    "Classify the question as SEMANTIC_SEARCH (fuzzy entity/topic "
                    "lookup) or SQL_QUERY (aggregation, filtering, grouping, "
                    "date ranges, numeric comparison). Respond as JSON: "
                    "{\"intent\": \"...\"}",
                    question,
                    json_mode=True,
                )
            )
            if out.get("intent") in ("SEMANTIC_SEARCH", "SQL_QUERY"):
                return out["intent"]
        except Exception:
            pass
    if _SQL_HINTS.search(question):
        return "SQL_QUERY"
    if _SEMANTIC_HINTS.search(question):
        return "SEMANTIC_SEARCH"
    return "SQL_QUERY"


# -- A41: SQL generation -----------------------------------------------------
_SQL_SYSTEM = (
    "Generate a valid Spark SQL query over the given temp views. Rules: "
    "use exact case-sensitive string values from the sample; prefer WHERE/"
    "GROUP BY/ORDER BY; aggregates SUM/COUNT/AVG/MAX/MIN as needed; handle "
    "NULLs explicitly; reference tables by their registered names only. "
    "Respond as JSON: {\"sql_query\": \"...\", \"explanation\": \"...\"}"
)

_AGG_WORDS = {
    "max": "MAX", "maximum": "MAX", "highest": "MAX", "largest": "MAX",
    "min": "MIN", "minimum": "MIN", "lowest": "MIN", "smallest": "MIN",
    "avg": "AVG", "average": "AVG", "mean": "AVG",
    "sum": "SUM", "total": "SUM",
    "count": "COUNT", "how": "COUNT",
}


def generate_sql(
    question: str,
    tables: dict[str, list[str]],
    client: LLMClient | None = None,
    schema_context: str = "",
    sample_markdown: str = "",
) -> str:
    """NL → SQL. With a client: the reference's prompt contract
    against temp views. Keyless fallback: a small deterministic
    pattern grammar ("<agg> of <column> [from <table>]") that keeps
    the engine runnable and testable without any API."""
    if client is not None:
        try:
            user = (
                f"Schema:\n{schema_context}\n\nSample rows:\n{sample_markdown}\n\n"
                f"Question: {question}"
            )
            out = json.loads(client.complete(_SQL_SYSTEM, user, json_mode=True))
            sql = out.get("sql_query", "")
            if isinstance(sql, str) and sql.strip():
                return sql.strip()
        except Exception:
            pass
    return _fallback_sql(question, tables)


def _fallback_sql(question: str, tables: dict[str, list[str]]) -> str:
    q = question.lower()
    qtokens = re.findall(r"[a-z0-9_]+", q)
    table = next(
        (t for t in tables if t.lower() in qtokens), next(iter(tables), None)
    )
    if table is None:
        raise ValueError("no tables available for SQL generation")
    cols = tables[table]
    agg = next((sql_fn for w, sql_fn in _AGG_WORDS.items() if w in qtokens), None)
    col = next((c for c in cols if c.lower() in qtokens), None)
    if agg == "COUNT":
        return f"SELECT COUNT(*) AS n FROM {table}"
    if agg and col:
        return f"SELECT {agg}({col}) AS {agg.lower()}_{col} FROM {table}"
    if col:
        return f"SELECT * FROM {table} WHERE {col} IS NOT NULL LIMIT 10"
    return f"SELECT * FROM {table} LIMIT 10"
