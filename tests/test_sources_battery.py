"""The dirty-source-files battery (tools/adversarial_sources_check)
as a pytest guard: one seeded pass per format so reader-contract
regressions fail the suite, not just release_check.sh. The tool form
stays for multi-seed sweeps."""

from __future__ import annotations

import random

import pytest

from tools.adversarial_sources_check import (
    check_csv,
    check_http,
    check_jsonl,
    check_mljson,
    check_orc,
    check_xlsx,
)


@pytest.mark.parametrize(
    "check", [check_csv, check_jsonl, check_xlsx, check_mljson, check_orc, check_http]
)
def test_dirty_sources_contract(spark, tmp_path, check):
    errs = check(spark, random.Random(7), str(tmp_path))
    assert not errs, errs


def test_planner_battery_pinned_seed(spark):
    """The eighth battery's pure-planner checks at a pinned seed
    inside pytest (the Spark-bound checks run in release_check.sh —
    sql_safety needs a log-silenced session)."""
    from tools.adversarial_planner_check import (
        check_hostile_content,
        check_planner_fallback_equality,
    )

    assert not check_planner_fallback_equality(random.Random(7))
    assert not check_hostile_content(random.Random(7))
