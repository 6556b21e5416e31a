"""Eighth adversarial battery: the NL PLANNING layer (VERDICT r9 #5).

Seven batteries dirty data and files; nothing fuzzed the planner
contract — and the reference's characteristic failure mode is
precisely LLM output garbage (its fallbacks at
decomposition_util.py:79-84 and multi_file_util.py:69-71 exist for a
reason). This battery drives decompose / identify_tables / route /
generate_sql / run_sql_safe / run_query_pipeline with a seeded
GarbageClient emitting the full taxonomy of model failure:

- invalid JSON (truncated, prose, empty, half-escaped);
- valid JSON of the wrong SHAPE (top-level list, string where a list
  belongs — the per-character-iteration trap, ints, nulls, nested
  junk, huge lists);
- valid-shaped but HOSTILE content: hallucinated table names,
  join_key not shared by the selected tables, SQL keywords and
  unicode as identifiers, DDL/DML/multi-statement sql_query.

Contracts asserted (each pinned in tests/test_nl.py when first
broken):
1. No planner entry point ever raises on client garbage.
2. Malformed output → result EQUALS the keyless (client=None) run:
   the fallback is deterministic, not merely "something".
3. identify_tables only ever returns catalog tables (or ["*"]) and a
   join_key that is a string column shared by every selected table.
4. decompose always returns a non-empty list of real strings.
5. route_intent returns only the two legal intents.
6. run_sql_safe refuses DDL/DML (error frame; views intact) and
   never raises on garbage SQL.
7. run_query_pipeline end-to-end under a hostile client never
   raises, and every sub-answer is a DataFrame.

    python tools/adversarial_planner_check.py [seed]
"""

from __future__ import annotations

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOSTILE_NAMES = [
    "select", "from", "group", "order_by", "união",
    "tbl with space", 'quo"te', "drop_table", "null",
]


class GarbageClient:
    """Seeded per-call garbage. ``mode='malformed'`` draws only
    outputs that MUST fail validation (so fallback equality with
    client=None is a hard assertion); ``mode='hostile'`` adds
    well-shaped but adversarial content (valid per the wire contract,
    checked against the semantic invariants instead)."""

    def __init__(self, rng: random.Random, mode: str = "malformed"):
        self.rng = rng
        self.mode = mode

    _MALFORMED = [
        '{"queries": "one big string"}',        # string where list
        '{"queries": [1, 2, 3]}',               # wrong element type
        '{"queries": []}',                      # empty
        '{"queries": ["", "  "]}',              # blank strings
        '{"tables_required": "orders"}',        # string where list
        '{"tables_required": [42], "join_key": 7}',
        '{"tables_required": [], "join_key": null}',
        '{"tables_required": ["no_such_table"], "join_key": "ghost"}',
        '{"intent": "DELETE_EVERYTHING"}',
        '{"intent": 42}',
        '{"sql_query": 123}',
        '{"sql_query": ""}',
        '{"sql_query": null}',
        "[1, 2, 3]",                            # top-level list
        "null",
        '"just a string"',
        "{'single': 'quotes'}",                 # not JSON
        '{"queries": ["unterminated...',        # truncated
        "The answer is probably orders.",       # prose
        "",                                     # empty body
    ]

    def complete(self, system: str, user: str, json_mode: bool = False) -> str:
        if self.mode == "raise" or self.rng.random() < 0.15:
            raise TimeoutError("simulated LLM timeout")
        return self.rng.choice(self._MALFORMED)


class HostileSQLClient:
    """Always returns a well-formed sql_query containing DDL/DML —
    the statement class run_sql_safe must refuse."""

    def __init__(self, stmt: str):
        self.stmt = stmt

    def complete(self, system: str, user: str, json_mode: bool = False) -> str:
        if "sql_query" in system:
            return json.dumps({"sql_query": self.stmt, "explanation": "evil"})
        raise RuntimeError("fallback for non-SQL calls")


def random_catalog(rng: random.Random) -> dict[str, list[str]]:
    n = rng.randrange(2, 6)
    catalog = {}
    shared = rng.choice(["id", "key", "select"])  # sometimes a keyword
    for i in range(n):
        name = rng.choice(HOSTILE_NAMES) + f"_{i}"
        cols = [shared] + [
            rng.choice(HOSTILE_NAMES) + f"_c{j}" for j in range(rng.randrange(1, 4))
        ]
        catalog[name] = cols
    return catalog


QUESTIONS = [
    "total amount per region?",
    "how many orders? what is the average price?",
    "tell me about the biggest customer",
    "select * from orders; drop table orders",
    "what is the sum of null?",
    "",
    "árvíztűrő tükörfúrógép 🙂",
]


def check_planner_fallback_equality(rng: random.Random) -> list[str]:
    from parquet_pipeline_spark.plans.planner import (
        choose_strategy,
        decompose_query,
        identify_tables,
        route_intent,
    )

    errs = []
    for trial in range(40):
        q = rng.choice(QUESTIONS)
        catalog = random_catalog(rng)
        bad = GarbageClient(random.Random(rng.randrange(1 << 30)))

        # 1/2/4: decompose — never raises, equals keyless on garbage
        got = decompose_query(q, bad)
        want = decompose_query(q, None)
        if got != want:
            errs.append(f"decompose diverged on garbage: {got!r} vs {want!r} (q={q!r})")
        ok_shape = isinstance(got, list) and got and all(isinstance(s, str) for s in got)
        # a blank question legitimately yields one blank sub-query
        # (caller's input contract); non-blank input must never
        # produce blank sub-queries
        if not ok_shape or (q.strip() and not all(s.strip() for s in got)):
            errs.append(f"decompose returned junk: {got!r}")

        # 1/2/3: identify_tables
        got_t = identify_tables(q, catalog, bad)
        want_t = identify_tables(q, catalog, None)
        if got_t != want_t:
            errs.append(f"identify diverged on garbage: {got_t!r} vs {want_t!r}")
        tables, jk = got_t
        if tables != ["*"] and not all(t in catalog for t in tables):
            errs.append(f"identify returned non-catalog tables: {tables!r}")
        if jk is not None:
            if not isinstance(jk, str):
                errs.append(f"join_key wrong type: {jk!r}")
            elif tables != ["*"] and not all(jk in catalog[t] for t in tables):
                errs.append(f"join_key {jk!r} not shared by {tables!r}")

        # 5: routing
        intent = route_intent(q, bad)
        if intent not in ("SQL_QUERY", "SEMANTIC_SEARCH"):
            errs.append(f"illegal intent {intent!r}")
        if intent != route_intent(q, None):
            errs.append(f"route diverged on garbage for {q!r}")

        # strategy legality over whatever identify returned
        strat = choose_strategy(tables, jk)
        if strat not in ("single", "union", "join"):
            errs.append(f"illegal strategy {strat!r}")
        if strat == "join" and not jk:
            errs.append("join strategy without a join key")
    return errs


def check_hostile_content(rng: random.Random) -> list[str]:
    """Well-shaped but adversarial planner output must still satisfy
    the semantic invariants (hallucinated tables dropped, bad
    join_key re-inferred)."""
    from parquet_pipeline_spark.plans.planner import identify_tables

    class ShapedHostile:
        def __init__(self, payload):
            self.payload = payload

        def complete(self, system, user, json_mode=False):
            return json.dumps(self.payload)

    errs = []
    for _ in range(20):
        catalog = random_catalog(rng)
        names = list(catalog)
        real = rng.sample(names, k=min(2, len(names)))
        payload = {
            "tables_required": real + ["hallucinated_" + str(rng.randrange(99))],
            "join_key": rng.choice(["ghost_key", 42, None, {}]),
        }
        tables, jk = identify_tables("q", catalog, ShapedHostile(payload))
        if not all(t in catalog for t in tables):
            errs.append(f"hallucinated table survived: {tables!r}")
        if set(real) - set(tables):
            errs.append(f"real tables dropped: {tables!r} vs {real!r}")
        if jk is not None and (
            not isinstance(jk, str) or not all(jk in catalog[t] for t in tables)
        ):
            errs.append(f"bad join_key survived: {jk!r} for {tables!r}")
    return errs


def check_sql_safety(spark) -> list[str]:
    from parquet_pipeline_spark.errors import is_error_frame, run_sql_safe

    errs = []
    spark.createDataFrame([(1, "a")], "id long, v string").createOrReplaceTempView(
        "guard_probe"
    )
    refusals = [
        "DROP TABLE guard_probe",
        "  drop view guard_probe",
        "/* sneaky */ DELETE FROM guard_probe",
        "-- c\nINSERT INTO guard_probe VALUES (2, 'b')",
        "CREATE TABLE pwned AS SELECT 1",
        "UPDATE guard_probe SET v = 'x'",
        "TRUNCATE TABLE guard_probe",
        "ALTER TABLE guard_probe ADD COLUMN z INT",
        "MERGE INTO guard_probe USING guard_probe ON false WHEN MATCHED THEN DELETE",
        "SET spark.sql.shuffle.partitions=1",
        "",
        # CTE-prefixed DML (ADVICE r10): starts with WITH, mutates
        "WITH s AS (SELECT 42 AS x) INSERT OVERWRITE DIRECTORY "
        "'/tmp/planner_battery_pwn' USING parquet SELECT * FROM s",
        "WITH s AS (SELECT 2 AS x, 'b' AS v) INSERT INTO guard_probe SELECT * FROM s",
        "WITH s AS (SELECT 1) DELETE FROM guard_probe WHERE true",
        "WITH s AS (SELECT 1) UPDATE guard_probe SET v = 'x'",
        "WITH s AS (SELECT 1 AS id, 'z' AS v) MERGE INTO guard_probe "
        "USING s ON false WHEN MATCHED THEN DELETE",
        # raw-string confusion (r11): r'\' ends AT the quote — an
        # escape-aware lexer would swallow the INSERT into the string
        r"WITH s AS (SELECT r'\' AS x) INSERT INTO guard_probe "
        r"SELECT 9, 'z' FROM s",
        # conf-flip attempt (r12): SET is a mutation token, so the
        # gate can never be re-lexed out from under itself
        "SET spark.sql.parser.escapedStringLiterals=true",
        # backslash-boundary smuggle (r12): if the gate's string rule
        # ever diverged from the parser's (escapedStringLiterals),
        # the escaped quote would hide the INSERT inside a literal
        "WITH s AS (SELECT '\\'' AS x) INSERT INTO guard_probe "
        "SELECT 8, 'y' FROM s -- '",
    ]
    for stmt in refusals:
        out = run_sql_safe(spark, stmt)
        if not is_error_frame(out):
            errs.append(f"non-read-only statement executed: {stmt!r}")
    # the same refusals must hold if a deployment flips the string-
    # unescaping conf (token boundaries are conf-independent on
    # PySpark 4.1.2 — probed r12; this pins it stays that way)
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    try:
        for stmt in refusals:
            if not is_error_frame(run_sql_safe(spark, stmt)):
                errs.append(
                    f"non-read-only statement executed under "
                    f"escapedStringLiterals=true: {stmt!r}"
                )
    finally:
        spark.conf.set("spark.sql.parser.escapedStringLiterals", "false")
    allowed = [
        "SELECT v FROM guard_probe",
        "WITH c AS (SELECT 1 AS x) SELECT * FROM c",
        "VALUES (1), (2)",
        "/* comment */ SELECT 1",
        "-- comment\nSELECT 1",
        "EXPLAIN SELECT 1",
        "SHOW TABLES",
        "DESCRIBE guard_probe",
        # the whole-statement token scan must not trip on keywords
        # inside string literals or on the REPLACE() builtin
        "SELECT 'DROP INSERT UPDATE' AS msg FROM guard_probe",
        "SELECT REPLACE(v, 'a', 'b') AS s FROM guard_probe",
    ]
    for stmt in allowed:
        out = run_sql_safe(spark, stmt)
        if is_error_frame(out):
            errs.append(f"read-only statement refused: {stmt!r} -> {out.first()}")
    # garbage SQL: error frame, never a raise
    if not is_error_frame(run_sql_safe(spark, "SELECT FROM WHERE GROUP")):
        errs.append("garbage SQL did not error-frame")
    if spark.table("guard_probe").count() != 1:
        errs.append("guard_probe mutated by a refused statement")
    if os.path.exists("/tmp/planner_battery_pwn"):
        errs.append("refused INSERT OVERWRITE DIRECTORY wrote files")
    return errs


def check_pipeline_end_to_end(spark, rng: random.Random) -> list[str]:
    from pyspark.sql import DataFrame

    from parquet_pipeline_spark.pipeline import run_query_pipeline

    views = {
        "orders": spark.createDataFrame(
            [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "A")],
            "order_id long, amount double, region string",
        ),
        "customers": spark.createDataFrame(
            [(1, "ann"), (2, "bob")], "order_id long, name string"
        ),
    }
    errs = []
    for q in QUESTIONS:
        if not q:
            continue  # empty question is the caller's contract, not the planner's
        for mode in ("malformed", "raise"):
            bad = GarbageClient(random.Random(rng.randrange(1 << 30)), mode=mode)
            try:
                res = run_query_pipeline(spark, q, views, client=bad)
            except Exception as exc:
                errs.append(f"pipeline raised under {mode} client (q={q!r}): {exc}")
                continue
            if not res.sub_queries:
                errs.append(f"no sub-queries for {q!r}")
            for sub, df in res.results.items():
                if not isinstance(df, DataFrame):
                    errs.append(f"non-DataFrame answer for {sub!r}")
        # hostile DDL through the FULL pipeline: refused, views intact
        res = run_query_pipeline(
            spark, q, views, client=HostileSQLClient("DROP TABLE orders")
        )
        if spark.table("orders").count() != 3:
            errs.append("orders view mutated through the pipeline")
    return errs


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    rng = random.Random(seed)

    from parquet_pipeline_spark.session import get_spark

    spark = get_spark(
        "adversarial-planner",
        shuffle_partitions=8,
        extra_conf={"spark.master": "local[8]"},
    )
    # the sql_safety check feeds garbage SQL on purpose; Spark's
    # SQLQueryContextLogger would spray full analysis stack traces
    spark.sparkContext.setLogLevel("OFF")
    failures = []
    for name, fn in (
        ("planner_fallback_equality", lambda: check_planner_fallback_equality(rng)),
        ("hostile_content", lambda: check_hostile_content(rng)),
        ("sql_safety", lambda: check_sql_safety(spark)),
        ("pipeline_end_to_end", lambda: check_pipeline_end_to_end(spark, rng)),
    ):
        errs = fn()
        status = "PASS" if not errs else "FAIL"
        print(f"{status}  {name} (seed {seed})")
        for e in errs[:8]:
            print(f"      {e}")
        failures.extend(errs)
    if failures:
        print(f"\n{len(failures)} contract violations")
        return 1
    print("\nall green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
