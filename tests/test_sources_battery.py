"""The dirty-source-files battery (tools/adversarial_sources_check)
as a pytest guard: one seeded pass per format so reader-contract
regressions fail the suite, not just release_check.sh. The tool form
stays for multi-seed sweeps."""

from __future__ import annotations

import random

import pytest

from tools.adversarial_sources_check import check_csv, check_jsonl, check_xlsx


@pytest.mark.parametrize("check", [check_csv, check_jsonl, check_xlsx])
def test_dirty_sources_contract(spark, tmp_path, check):
    errs = check(spark, random.Random(7), str(tmp_path))
    assert not errs, errs
