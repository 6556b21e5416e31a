"""Error-as-data convention (SURVEY §2 A48).

The reference converts failed SQL into a single-row DataFrame with
an ``Error`` column that flows through the pipeline instead of
raising (reference: duckdb_util.py:242-243; consumed at
langgraph_pipeline.py:33-35 and summary_util.py:32-33). We keep the
same convention so downstream stages (summaries, serialization)
need no special-casing.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def error_frame(spark: SparkSession, message: str) -> DataFrame:
    """One-row, one-column ``Error`` DataFrame."""
    return spark.createDataFrame([(str(message),)], ["Error"])


def is_error_frame(df: DataFrame) -> bool:
    return df.columns == ["Error"]


# statements the NL→SQL path may execute: reads only. The SQL here is
# MODEL OUTPUT (the reference pipes LLM text straight into
# conn.execute, duckdb_util.py:234-243) — a garbage or hostile
# completion must not be able to DROP/INSERT/ALTER anything. Leading
# comments are stripped before classification so `/* hi */ DROP ...`
# can't smuggle past the check.
_READ_ONLY_HEAD = re.compile(r"^\s*(SELECT|WITH|VALUES|TABLE|EXPLAIN|DESC|DESCRIBE|SHOW)\b", re.I)
_LEADING_COMMENTS = re.compile(r"^(\s*(--[^\n]*\n|/\*.*?\*/))*", re.S)

# The head check alone is bypassable: Spark's grammar allows
# CTE-prefixed DML (ctes? dmlStatementNoWith), so
# `WITH s AS (SELECT 42) INSERT OVERWRITE DIRECTORY '/x' ...` starts
# with WITH yet mutates (ADVICE r10, verified on PySpark 4.1.2). So
# after the head check we lex away everything a keyword can legally
# hide inside — strings, quoted identifiers, comments — in ONE
# left-to-right pass (alternation order makes `'/*'` a string, not a
# comment-opener), then refuse if any mutation/state keyword survives
# as a bare token. Conservative by design: a pure query that names an
# unquoted column `update` is refused (error-as-data; backtick-quote
# it), but no statement the parser would treat as DML/DDL can pass,
# because for the parser to execute a mutation its keyword must be a
# real token — i.e. outside the very regions we strip. (Nested
# bracketed comments strip partially, which can only EXPOSE text and
# over-refuse, never hide a token.)
_SQL_LITERALS_AND_COMMENTS = re.compile(
    r"""--[^\n]*                 # line comment
      | /\*.*?\*/                # bracketed comment (non-nested)
      | \b[rR]'[^']*'            # RAW string: no escapes — ends at the
      | \b[rR]"[^"]*"            #   first quote. Must come before the
                                 #   escaped rules: applying backslash
                                 #   escapes to r'\' would swallow real
                                 #   tokens into a fake string and hide
                                 #   a smuggled INSERT (found r11 by
                                 #   self-review, pinned in test_nl)
      | '(?:[^'\\]|\\.|'')*'     # string, backslash + '' escapes
      | "(?:[^"\\]|\\.|"")*"     # double-quoted string/identifier
      | `(?:[^`]|``)*`           # backtick identifier
    """,
    re.X | re.S,
)
# Lexing invariant (VERDICT r11 item 4): these rules mirror Spark's
# DEFAULT string grammar. `spark.sql.parser.escapedStringLiterals`
# is pinned false in session.py; measured on PySpark 4.1.2, the
# conf changes only UNESCAPING, never token boundaries (both regular
# and raw strings tokenize identically under either value — probed
# with `SELECT 'a\', 'b'` / `SELECT r'a\''`, both mode-independent
# syntax errors), so the strip above agrees with the parser even if
# a deployment flips the conf. tests/test_advice_r12.py pins the
# agreement on a backslash-heavy accept/refuse corpus under BOTH
# settings.
_MUTATION_TOKEN = re.compile(
    r"\b(INSERT|UPDATE|DELETE|MERGE|DROP|CREATE|ALTER|TRUNCATE|GRANT"
    r"|REVOKE|LOAD|ANALYZE|MSCK|REFRESH|CACHE|UNCACHE|SET|RESET|CALL"
    r"|USE|DECLARE|EXECUTE|COMMIT|ROLLBACK|BEGIN)\b",
    re.I,
)


def _classify_not_read_only(sql: str) -> str | None:
    """Return a refusal reason if ``sql`` is not a pure query, else
    None. Two layers: the statement must START like a query, and no
    mutation keyword may appear as a bare token anywhere in it."""
    head = _LEADING_COMMENTS.sub("", sql or "")
    if not _READ_ONLY_HEAD.match(head):
        return "statement head is not a query form"
    bare = _SQL_LITERALS_AND_COMMENTS.sub(" ", sql or "")
    m = _MUTATION_TOKEN.search(bare)
    if m:
        return f"contains mutation keyword {m.group(1).upper()}"
    return None


def run_sql_safe(spark: SparkSession, sql: str) -> DataFrame:
    """The engine's ``execute_duckdb_query`` analog (reference:
    duckdb_util.py:234-243): run SQL against registered temp views;
    on failure return an error frame instead of raising. Refuses
    non-read-only statements (DDL/DML) the same way — generated SQL
    is untrusted input, and error-as-data beats a mutated catalog."""
    reason = _classify_not_read_only(sql)
    if reason is not None:
        return error_frame(
            spark,
            "refused to execute non-read-only statement (generated SQL may "
            f"only SELECT; {reason}): {sql[:120]!r}",
        )
    try:
        return spark.sql(sql)
    except Exception as e:  # noqa: BLE001 — error-as-data by contract
        return error_frame(spark, str(e))
