"""Contract tests for __spark_entry__._priority_order: the driver
verifies queries in iteration order with a fixed budget, so the
ordering IS the re-verification policy — never-verified first, then
stalest official green row first."""

from __future__ import annotations

import __spark_entry__ as entry
from parquet_pipeline_spark import registry

registry.load_all()


def test_priority_order_unverified_first_then_stalest():
    last = entry._last_green_round()
    names = list(entry.queries())
    assert set(names) == set(registry.QUERIES)  # nothing dropped
    k = len([n for n in names if n not in last])
    head, tail = names[:k], names[k:]
    assert all(n not in last for n in head)
    # r11/r12: queries whose code/oracle changed since their newest
    # green row jump the staleness queue — but ONLY while that green
    # row predates the round the change landed in; once the re-gate
    # row lands, the entry neutralizes itself (ADVICE r11)
    changed = [
        n
        for n in tail
        if last[n] < entry._CHANGED_SINCE_LAST_GREEN.get(n, 0)
    ]
    assert tail[: len(changed)] == changed
    rounds = [last[n] for n in tail[len(changed):]]
    assert rounds == sorted(rounds)  # staleness ascending


def test_changed_entries_self_neutralize():
    """A _CHANGED_SINCE_LAST_GREEN entry whose query has a green row
    from that round or later must NOT jump the queue (the r11 set is
    exactly this case: all 12 re-greened in CORRECTNESS_r11)."""
    last = entry._last_green_round()
    order = list(entry.queries())
    neutral = [
        n
        for n, rnd in entry._CHANGED_SINCE_LAST_GREEN.items()
        if n in last and last[n] >= rnd
    ]
    assert neutral, "expected at least the r11 re-greened set"
    k = len([n for n in order if n not in last])
    tail = order[k:]
    stale_rounds = [last[n] for n in tail]
    # if a neutralized entry still jumped, the tail would not be
    # staleness-ascending (its green round is the newest)
    n_jumpers = len(
        [n for n in tail if last[n] < entry._CHANGED_SINCE_LAST_GREEN.get(n, 0)]
    )
    assert stale_rounds[n_jumpers:] == sorted(stale_rounds[n_jumpers:])
    for n in neutral:
        assert tail.index(n) >= n_jumpers


def test_priority_order_applies_to_oracles_too():
    q = list(entry.queries())
    o = list(entry.oracle_sql())
    # oracles iterate in the same relative order as queries
    pos = {n: i for i, n in enumerate(q)}
    assert [pos[n] for n in o] == sorted(pos[n] for n in o)
    assert set(o) == set(registry.ORACLES)


def test_changed_log_fold_is_max_and_collision_proof():
    """_CHANGED_SINCE_LAST_GREEN is folded from the append-only
    _CHANGED_LOG with max() (VERDICT r13 item 3: the old dict literal
    silently last-wins on duplicate keys). The fold must equal the
    max-per-name of the log regardless of entry order, and every
    query the log names must exist in the registry."""
    expected: dict = {}
    for name, rnd in entry._CHANGED_LOG:
        expected[name] = max(expected.get(name, 0), rnd)
    assert entry._CHANGED_SINCE_LAST_GREEN == expected
    # order-independence: folding the reversed log gives the same map
    rev: dict = {}
    for name, rnd in reversed(entry._CHANGED_LOG):
        rev[name] = max(rev.get(name, 0), rnd)
    assert rev == expected
    # the historical duplicates are present in the log (append-only
    # history preserved) yet resolve to the newest round
    names = [n for n, _ in entry._CHANGED_LOG]
    assert names.count("a13_pq_recall_floor") >= 2
    assert expected["a13_pq_recall_floor"] == max(
        r for n, r in entry._CHANGED_LOG if n == "a13_pq_recall_floor"
    )
    assert set(expected) <= set(registry.QUERIES)


def test_rows_only_queries_count_as_officially_checked():
    """A deliberate rows-only query with an official ran-with-rows
    row must not pin the front of the queue forever."""
    last = entry._last_green_round()
    for name in ("a01_ann_lsh_topk", "d03_minhash_lsh_neardup"):
        assert name in last, name
