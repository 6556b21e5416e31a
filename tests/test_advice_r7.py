"""Regression tests for the round-6 ADVICE findings (round 7).

Pins: (1) streaming_incremental_dedup replay determinism when a
crash lands between the index append and the checkpoint commit,
(2) fleet-Excel boolean columns degrade to null instead of failing
an executor task, (3) fleet sample discovery on paths Python glob
can't list (scheme-prefixed / object-store) derives the sample from
the binaryFile scan.
"""

from __future__ import annotations

import json
import os
import time

import pytest

from tests.test_sources import _make_xlsx


@pytest.mark.slow
def test_streaming_incremental_dedup_replay_after_index_append(
    spark, sf_dir, tmp_path
):
    """Crash-window replay: run a batch WITH update_index=True, then
    replay the same files with a fresh checkpoint — simulating a
    crash after the index append but before the checkpoint commit.
    The replayed flags must be IDENTICAL: in particular a doc whose
    only near-dup is a same-batch doc must stay unflagged, even
    though the first run appended that doc's fingerprints to the
    index."""
    from parquet_pipeline_spark.operators.dedup import banded_minhash
    from parquet_pipeline_spark.streaming.events import (
        streaming_incremental_dedup,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter("doc_id % 3 != 0").select("doc_id", "text")
    idx = str(tmp_path / "idx")
    banded_minhash(corpus, num_hashes=16, bands=4).write.partitionBy(
        "band_id"
    ).parquet(idx)

    # synthetic texts absent from the corpus; 800001 duplicates
    # 800000 within the same micro-batch -> contract says neither is
    # flagged (in-batch matching is lsh_candidate_pairs's job)
    novel_a = "zq xv jk " + " ".join(f"wm{i}qzx" for i in range(40))
    novel_b = "pf gh rt " + " ".join(f"yb{i}kvn" for i in range(40))
    batch = [
        {"doc_id": 800000, "text": novel_a},
        {"doc_id": 800001, "text": novel_a},  # same-batch dup only
        {"doc_id": 800002, "text": novel_b},
    ]
    src = tmp_path / "stream"
    src.mkdir()
    (src / "b0.jsonl").write_text("\n".join(json.dumps(r) for r in batch))

    dest = str(tmp_path / "flags")

    def run(ck):
        stream = spark.readStream.schema("doc_id long, text string").json(str(src))
        q = streaming_incremental_dedup(
            stream, idx, dest, str(tmp_path / ck),
            num_hashes=16, bands=4, update_index=True,
        )
        q.awaitTermination(120)

    run("ck1")
    first = sorted(
        map(tuple, spark.read.parquet(dest).select("doc_id", "dup_of", "is_dup").collect())
    )
    # contract: no in-batch matching on the first run
    flags1 = {r[0]: r[2] for r in first}
    assert flags1[800000] == 0 and flags1[800001] == 0

    # index now ALREADY holds this batch's fingerprints (run 1
    # appended them) — exactly the state a crashed-but-appended
    # attempt leaves behind. Replay must reproduce run 1's flags.
    idx_ids = {
        r["doc_id"]
        for r in spark.read.parquet(idx).select("doc_id").distinct().collect()
    }
    assert {800000, 800001, 800002} <= idx_ids
    run("ck2")
    second = sorted(
        map(tuple, spark.read.parquet(dest).select("doc_id", "dup_of", "is_dup").collect())
    )
    assert second == first


def test_excel_fleet_boolean_degrades_to_null(spark, tmp_path):
    """A fleet workbook storing 'yes'/0/1/garbage in a column the
    sample types as boolean must coerce (truthy strings and 0/1 map,
    junk -> null) instead of raising inside an executor task."""
    from parquet_pipeline_spark.sources.readers import read_excel_fleet

    fleet = tmp_path / "fleet"
    fleet.mkdir()
    _make_xlsx(
        str(fleet / "good.xlsx"),
        {"Data": (["Name", "Active"], [["a1", True], ["a2", False]])},
    )
    _make_xlsx(
        str(fleet / "messy.xlsx"),
        {
            "Data": (
                ["Name", "Active"],
                [["b1", "yes"], ["b2", 0], ["b3", 1], ["b4", "maybe"], ["b5", "No"]],
            )
        },
    )
    out = read_excel_fleet(spark, str(fleet / "*.xlsx"))
    rows = {r["name"]: r["active"] for r in out["data"].collect()}
    assert rows["a1"] is True and rows["a2"] is False
    assert rows["b1"] is True and rows["b2"] is False and rows["b3"] is True
    assert rows["b4"] is None
    assert rows["b5"] is False


def test_excel_fleet_sample_from_binaryfile_listing(spark, tmp_path):
    """A scheme-prefixed glob Python glob.glob can't expand (the
    local stand-in for s3://...) still works: the sample layout is
    derived from the first binaryFile row instead of raising
    FileNotFoundError."""
    import glob as _glob

    from parquet_pipeline_spark.sources.readers import read_excel_fleet

    fleet = tmp_path / "fleet"
    fleet.mkdir()
    _make_xlsx(
        str(fleet / "m01.xlsx"),
        {"Data": (["Name", "Amount"], [["a1", 10], ["a2", 20]])},
    )
    _make_xlsx(
        str(fleet / "m02.xlsx"),
        {"Data": (["Name", "Amount"], [["b1", 30]])},
    )
    scheme_glob = "file:" + str(fleet / "*.xlsx")
    assert _glob.glob(scheme_glob) == []  # Python glob really can't see it
    out = read_excel_fleet(spark, scheme_glob)
    df = out["data"]
    rows = {r["name"]: r["amount"] for r in df.collect()}
    assert rows == {"a1": 10, "a2": 20, "b1": 30}
