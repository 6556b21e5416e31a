"""Pins for the ADVICE r11 / VERDICT r11 items fixed in round 12.

1. The read-only SQL gate's string lexer and Spark's parser must
   agree on token boundaries regardless of
   ``spark.sql.parser.escapedStringLiterals`` (the gate hard-codes
   default escape semantics; the conf is pinned false in session.py,
   and — measured on PySpark 4.1.2 — flipping it changes only
   UNESCAPING, never where a string token ends, so the gate cannot
   be desynchronized from the parser by it).
2. The xlsx DTD guard refuses doctypes at the parser level
   (encoding-independent) — pinned in test_sources.py.
"""

from __future__ import annotations

import pytest

from parquet_pipeline_spark.errors import (
    _classify_not_read_only,
    is_error_frame,
    run_sql_safe,
)


def test_session_pins_escaped_string_literals(spark):
    """The invariant the gate's lexer assumes is now configured, not
    assumed (VERDICT r11 item 4)."""
    assert (
        spark.conf.get("spark.sql.parser.escapedStringLiterals") == "false"
    )


# Backslash-heavy corpus. For each entry: (sql, expect_gate_pass,
# mutation_marker) — when the gate passes, Spark must either return
# the INSERT text as DATA (it lives inside a string under BOTH
# lexings) or fail to parse; it must never execute a mutation. When
# the gate refuses, the statement contained a live mutation token
# under at least one plausible lexing.
_ACCEPT = [
    # escaped quote keeps the mutation text inside the literal
    r"SELECT 'it''s INSERT as text' AS c",
    r"SELECT '\' INSERT INTO x VALUES (1) --' AS c",
    # raw string: ends at the FIRST quote, no escapes — the text
    # after it is another pure-select fragment
    r"SELECT r'\' AS c, 'INSERT kept as data' AS d",
    r"SELECT '\\' AS c, 'b' AS d",
    r"SELECT 'a\nb' AS c",
    # comment-looking text inside a string
    r"SELECT '/* INSERT */' AS c",
]
_REFUSE = [
    # if an escape-unaware lexer ended the first string at the
    # backslash-quote, everything to the second quote would LOOK
    # like data — but under Spark's real grammar (both conf values)
    # the INSERT is a live token, so the gate must refuse
    "WITH s AS (SELECT '\\'' AS x) INSERT INTO t VALUES (1) -- '",
    "WITH s AS (SELECT 'a' AS x) INSERT OVERWRITE DIRECTORY '/x' SELECT * FROM s",
    # raw string must NOT be lexed with escapes: r'\' ends at the
    # first quote, leaving DELETE live
    "SELECT r'\\', x FROM t; DELETE FROM t",
    # conf flip attempt is itself a mutation (SET)
    "SET spark.sql.parser.escapedStringLiterals=true",
]


@pytest.mark.parametrize("sql", _ACCEPT)
def test_gate_accepts_backslash_heavy_pure_queries(sql):
    assert _classify_not_read_only(sql) is None


@pytest.mark.parametrize("sql", _REFUSE)
def test_gate_refuses_backslash_smuggles(sql):
    assert _classify_not_read_only(sql) is not None


@pytest.mark.parametrize("conf", ["false", "true"])
@pytest.mark.slow
def test_gate_and_parser_agree_under_both_conf_values(spark, conf):
    """Under BOTH values of escapedStringLiterals: every gate-passed
    statement that Spark can parse returns its mutation text as DATA
    (proving the gate's string boundaries match the parser's), and
    every refused statement never reaches the parser at all."""
    old = spark.conf.get("spark.sql.parser.escapedStringLiterals")
    spark.conf.set("spark.sql.parser.escapedStringLiterals", conf)
    try:
        for sql in _ACCEPT:
            assert _classify_not_read_only(sql) is None, sql
            df = run_sql_safe(spark, sql)
            # every accept-case is a valid pure SELECT under Spark's
            # real grammar — if the parser disagreed with the gate's
            # string boundaries it would raise a syntax error here
            assert not is_error_frame(df), (sql, df.collect())
            assert df.count() == 1, sql
        for sql in _REFUSE:
            df = run_sql_safe(spark, sql)
            assert is_error_frame(df), sql
            assert "refused to execute" in df.collect()[0][0], sql
    finally:
        spark.conf.set("spark.sql.parser.escapedStringLiterals", old)
