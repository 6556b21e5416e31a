import os

from pyspark.sql import functions as F

import pytest

from parquet_pipeline_spark.sources import (
    append_parquet,
    detect_file_format,
    read_any,
    read_csv,
    read_json,
    read_tsv,
    write_parquet,
)


def test_detect_file_format():
    assert detect_file_format("a/b/data.CSV") == "csv"
    assert detect_file_format("x.tsv") == "tsv"
    assert detect_file_format("x.jsonl") == "json"
    assert detect_file_format("x.xlsx") == "excel"
    assert detect_file_format("https://host/p/f.parquet?sig=1") == "parquet"
    assert detect_file_format("mystery.bin") == "unknown"


def test_csv_roundtrip_with_dirty_headers(spark, tmp_path):
    src = tmp_path / "dirty.csv"
    src.write_text("Col A,Col.A, Relative humidity.\n1,2,55.5\n3,4,60.1\n")
    df = read_csv(spark, str(src))
    assert df.columns == ["col_a", "col_a_1", "relative_humidity"]
    assert df.count() == 2

    dest = str(tmp_path / "out.parquet")
    write_parquet(df, dest)
    back = spark.read.parquet(dest)
    assert back.count() == 2
    assert dict(back.dtypes)["relative_humidity"] == "double"


def test_tsv(spark, tmp_path):
    src = tmp_path / "t.tsv"
    src.write_text("a\tb\n1\tx\n2\ty\n")
    df = read_tsv(spark, str(src))
    assert df.columns == ["a", "b"] and df.count() == 2


def test_json_lines_and_document(spark, tmp_path):
    jl = tmp_path / "rows.jsonl"
    jl.write_text('{"A B": 1, "v": "x"}\n{"A B": 2, "v": "y"}\n')
    df = read_json(spark, str(jl))
    assert set(df.columns) == {"a_b", "v"} and df.count() == 2

    doc = tmp_path / "doc.json"
    doc.write_text('[{"k": 1}, {"k": 2}, {"k": 3}]')
    df2 = read_json(spark, str(doc))
    assert df2.count() == 3


def test_append_mode(spark, tmp_path):
    src = tmp_path / "a.csv"
    src.write_text("x\n1\n2\n")
    df = read_csv(spark, str(src))
    dest = str(tmp_path / "acc.parquet")
    write_parquet(df, dest)
    append_parquet(df, dest)
    assert spark.read.parquet(dest).count() == 4


def test_read_any_dispatch_and_excel_gate(spark, tmp_path):
    src = tmp_path / "d.csv"
    src.write_text("x\n1\n")
    out = read_any(spark, str(src))
    assert list(out) == ["d"] and out["d"].count() == 1

    with pytest.raises(ValueError):
        read_any(spark, str(tmp_path / "weird.bin"))

    xlsx = tmp_path / "wb.xlsx"
    xlsx.write_bytes(b"PK\x03\x04 not a real workbook")
    with pytest.raises(Exception):
        # a corrupt workbook must fail loudly, not silently skip
        read_any(spark, str(xlsx))


def test_zstd_compression_written(spark, tmp_path):
    src = tmp_path / "c.csv"
    src.write_text("x\n" + "\n".join(map(str, range(100))))
    df = read_csv(spark, str(src))
    dest = str(tmp_path / "z.parquet")
    write_parquet(df, dest)
    files = [f for f in os.listdir(dest) if f.endswith(".parquet")]
    assert files and all(".zstd." in f or f.endswith(".parquet") for f in files)
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(os.path.join(dest, files[0])).metadata
    assert meta.row_group(0).column(0).compression.lower() == "zstd"


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Two tables bucketed on the join key must sort-merge join with
    zero Exchange nodes — the co-located layout for repeated
    fact-fact joins."""
    from parquet_pipeline_spark.sources.writers import write_bucketed

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "b_orders", ["o_orderkey"], num_buckets=8)
    write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], num_buckets=8)

    # hint merge so the planner uses the bucketed SMJ path (on this
    # tiny data AQE would otherwise pick broadcast, which ignores
    # bucketing entirely)
    joined = spark.table("b_lineitem").hint("merge").join(
        spark.table("b_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Bucketed: true" in plan, plan
    assert joined.count() == lineitem.count()


def test_csv_like_testdata_roundtrip(spark, tmp_path):
    """FIXTURES.md §3 'chunked CSV': a large CSV ingests to parquet
    with full fidelity — Spark splits natively, no manual chunking."""
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    csv_dir = str(tmp_path / "lineitem_csv")
    li.write.option("header", "true").mode("overwrite").csv(csv_dir)

    back = read_csv(spark, csv_dir)
    assert back.count() == li.count() == 60000
    assert set(back.columns) == set(li.columns)
    # inferSchema must recover numerics
    dt = dict(back.dtypes)
    assert dt["l_quantity"] == "double" and dt["l_orderkey"] in ("bigint", "int")

    dest = str(tmp_path / "roundtrip.parquet")
    write_parquet(back, dest)
    assert spark.read.parquet(dest).count() == 60000


def test_write_sorted_rowgroup_stats_selective(spark, sf_dir, tmp_path):
    """Sorted layout → narrow per-file min/max ranges on the sort key
    (row-group skipping works); unsorted layout → every file spans
    ~the whole key range."""
    import pyarrow.parquet as pq

    from parquet_pipeline_spark.sources.writers import write_parquet, write_sorted

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    full_span = hi - lo

    dest = str(tmp_path / "sorted.parquet")
    write_sorted(orders, dest, ["o_orderkey"], num_files=8)

    spans = []
    for f in os.listdir(dest):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(dest, f)).metadata
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert md.schema.column(0).name == "o_orderkey"
            spans.append(col.statistics.max - col.statistics.min)
    assert spans and max(spans) < full_span * 0.6, spans

    assert spark.read.parquet(dest).count() == orders.count()


def test_compact_salt_survives_minvalue_hash_under_ansi(spark):
    """ADVICE r13 (medium): the split_per_partition salt must not
    route hash() through abs() — under Spark 4's default ANSI mode
    abs(Int.MinValue) throws ARITHMETIC_OVERFLOW, and hash() lands on
    -2147483648 for ~1 in 4.3B rows, a real abort probability at the
    10^9-row scale the salt exists for. pmod alone already maps
    negative dividends into [0, N). Pin both halves: pmod handles the
    sentinel, and the abs form really does throw here (if ANSI is
    ever off, the second half degrades to a no-op skip)."""
    import pytest
    from pyspark.sql import functions as F

    row = (
        spark.range(1)
        .select(
            F.pmod(F.lit(-2147483648), F.lit(8)).alias("salt"),
        )
        .first()
    )
    assert row["salt"] == 0  # non-negative, in [0, 8)
    if spark.conf.get("spark.sql.ansi.enabled", "true") == "true":
        with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW"):
            spark.range(1).select(F.abs(F.lit(-2147483648))).first()


def test_compaction_reduces_files_preserves_data(spark, sf_dir, tmp_path):
    from parquet_pipeline_spark.sources.writers import compact

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dest = str(tmp_path / "fragmented.parquet")
    orders.repartition(40).write.parquet(dest)  # simulate micro-batch litter
    before = sum(1 for f in os.listdir(dest) if f.endswith(".parquet"))
    assert before >= 40

    checksum_before = orders.agg(F.sum("o_orderkey"), F.count(F.lit(1))).first()
    n_after = compact(spark, dest, target_file_bytes=10 * 1024 * 1024)
    assert n_after < before
    back = spark.read.parquet(dest)
    assert back.agg(F.sum("o_orderkey"), F.count(F.lit(1))).first() == checksum_before


def test_upsert_parquet(spark, tmp_path):
    from parquet_pipeline_spark.sources.writers import upsert_parquet, write_parquet

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, v string, x double"
    )
    dest = str(tmp_path / "t.parquet")
    write_parquet(base, dest)

    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "id long, v string, x double"
    )
    upsert_parquet(spark, dest, updates, ["id"])
    out = {r["id"]: (r["v"], r["x"]) for r in spark.read.parquet(dest).collect()}
    assert out == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def _make_xlsx(path, sheets):
    """Hand-build a minimal .xlsx: {sheet_name: (header, rows)} —
    delegates to the package writer (sources/xlsx.py:write_xlsx) so
    the reader is tested against the same flat-tabular layout the
    i01 ingestion round-trip fabricates."""
    from parquet_pipeline_spark.sources.xlsx import write_xlsx

    write_xlsx(path, sheets)


def test_native_xlsx_reader_multisheet(spark, tmp_path):
    """A4 without openpyxl: the stdlib xlsx parser reads multi-sheet
    workbooks with strings/numbers/booleans and per-sheet fan-out."""
    from parquet_pipeline_spark.sources.readers import read_excel_sheets

    path = str(tmp_path / "Loan Data.xlsx")
    _make_xlsx(
        path,
        {
            "Data": (
                ["Applicant Name", "Loan Amount $", "Is Employed"],
                [["alice", 1000.5, True], ["bob", 2000, False]],
            ),
            "Notes": (["note id", "text"], [[1, "hello"], [2, "world"]]),
            "Empty": (["x"], []),
        },
    )
    out = read_excel_sheets(spark, path)
    assert set(out) == {"loan_data_data", "loan_data_notes"}  # empty sheet skipped
    data = out["loan_data_data"]
    assert data.columns == ["applicant_name", "loan_amount", "is_employed"]
    rows = {r["applicant_name"]: r for r in data.collect()}
    assert rows["alice"]["loan_amount"] == 1000.5
    assert rows["alice"]["is_employed"] is True
    assert rows["bob"]["is_employed"] is False
    assert out["loan_data_notes"].count() == 2

    # and through the dispatcher
    out2 = read_any(spark, path)
    assert set(out2) == {"loan_data_data", "loan_data_notes"}


def test_compact_recovers_from_crashed_swap(spark, tmp_path):
    """A run that died between the two swap renames leaves the table
    at '._old' and possibly a stale tmp dir; the next compact must
    restore the data, clear the debris, and succeed."""
    import os
    import shutil

    from parquet_pipeline_spark.sources.writers import compact, write_parquet

    dest = str(tmp_path / "tbl")
    df = spark.range(1000).withColumnRenamed("id", "k")
    write_parquet(df.repartition(8), dest)

    # simulate the crash window: table moved aside, half-written tmp left
    os.rename(dest, dest + "._old")
    shutil.copytree(dest + "._old", dest + "._compacting")

    n_files = compact(spark, dest, target_file_bytes=1024 * 1024 * 1024)
    assert n_files == 1
    assert not os.path.exists(dest + "._old")
    assert not os.path.exists(dest + "._compacting")
    assert spark.read.parquet(dest).count() == 1000


def test_orc_roundtrip_and_dispatch(spark, sf_dir, tmp_path):
    """ORC source: write nation as ORC, read it back through the
    format dispatcher, and confirm a filter reaches the ORC scan as
    a pushed filter (same scan-level guarantees as parquet)."""
    from pyspark.sql import functions as F

    from parquet_pipeline_spark.sources.readers import detect_file_format, read_any

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    dest = str(tmp_path / "nation.orc")
    nation.write.orc(dest)

    assert detect_file_format(dest) == "orc"
    got = read_any(spark, dest)
    assert list(got) == ["nation"]
    df = got["nation"]
    assert df.count() == nation.count()
    assert set(df.columns) == set(nation.columns)

    phys = (
        df.filter(F.col("n_regionkey") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in phys and "n_regionkey" in phys, phys


def test_avro_dispatch_and_roundtrip_if_available(spark, sf_dir, tmp_path):
    """Avro dispatch: the extension is recognized; the read itself
    needs the external spark-avro module — roundtrip when deployed,
    skip (not fail) when it isn't."""
    import pytest as _pytest

    from parquet_pipeline_spark.sources.readers import detect_file_format, read_any

    assert detect_file_format("/x/y.avro") == "avro"
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    dest = str(tmp_path / "nation.avro")
    try:
        nation.write.format("avro").save(dest)
    except Exception as ex:
        if "Failed to find data source: avro" in str(ex):
            _pytest.skip("spark-avro module not deployed in this container")
        raise
    got = read_any(spark, dest)["nation"]
    assert got.count() == nation.count()


def test_read_parquet_evolved_merges_schemas(spark, tmp_path):
    """Old file lacks 'lang', new file lacks 'legacy'; the merged
    read exposes the union with NULLs where a file lacked the
    column, and filters on new columns still prune to the scan."""
    from parquet_pipeline_spark.sources.readers import read_parquet_evolved

    old = str(tmp_path / "v1.parquet")
    new = str(tmp_path / "v2.parquet")
    spark.createDataFrame(
        [(1, "a", "x")], "doc_id long, text string, legacy string"
    ).write.parquet(old)
    spark.createDataFrame(
        [(2, "b", "en")], "doc_id long, text string, lang string"
    ).write.parquet(new)

    df = read_parquet_evolved(spark, [old, new])
    assert set(df.columns) == {"doc_id", "text", "legacy", "lang"}
    rows = {r["doc_id"]: (r["legacy"], r["lang"]) for r in df.collect()}
    assert rows == {1: ("x", None), 2: (None, "en")}
    # predicate on the evolved column still reaches the scan
    plan = df.filter(df.lang == "en")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "EqualTo(lang,en)" in plan, plan


def test_read_parquet_resilient_skips_corrupt_member(spark, tmp_path):
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    from parquet_pipeline_spark.sources.readers import read_parquet_resilient

    d = tmp_path / "lake"
    d.mkdir()
    spark.createDataFrame([(1, "ok")], "id long, v string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "good"))
    # move the good part-file up into the lake dir, then plant junk
    import glob, shutil

    part = glob.glob(str(d / "good" / "part-*.parquet"))[0]
    shutil.move(part, str(d / "part-good.parquet"))
    shutil.rmtree(str(d / "good"))
    (d / "part-corrupt.parquet").write_bytes(b"PAR1 this is not a real footer")

    rows = read_parquet_resilient(spark, str(d), schema="id long, v string").collect()
    assert [(r["id"], r["v"]) for r in rows] == [(1, "ok")]

    # without the option the same scan must fail
    import pytest

    with pytest.raises(Exception):
        spark.read.parquet(str(d)).collect()


def test_write_zordered_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order layout on (o_custkey, o_totalprice): per-row-group
    min/max spans shrink on BOTH columns, where single-column
    sorting leaves the second column's spans at ~the full range."""
    import pyarrow.parquet as pq

    from parquet_pipeline_spark.sources.writers import write_sorted, write_zordered

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    spans_full = {}
    for c in ("o_custkey", "o_totalprice"):
        lo, hi = orders.agg(F.min(c), F.max(c)).first()
        spans_full[c] = float(hi) - float(lo)

    def mean_span_frac(dest, col_name):
        # MEAN, not max: a Morton curve legitimately leaves a few
        # boundary row groups spanning wide where a high-order bit
        # of the other dimension flips; skipping effectiveness is
        # about the typical row group
        fracs = []
        for f in os.listdir(dest):
            if not f.endswith(".parquet"):
                continue
            pf = pq.ParquetFile(os.path.join(dest, f))
            idx = pf.schema_arrow.get_field_index(col_name)
            for rg in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(rg).column(idx).statistics
                fracs.append((float(st.max) - float(st.min)) / spans_full[col_name])
        return sum(fracs) / len(fracs)

    zdest = str(tmp_path / "zorder.parquet")
    write_zordered(orders, zdest, ["o_custkey", "o_totalprice"], num_files=16)
    sdest = str(tmp_path / "sorted1d.parquet")
    write_sorted(orders, sdest, ["o_custkey"], num_files=16)

    # 1-D sort: second dimension unclustered (spans ~ full range)
    assert mean_span_frac(sdest, "o_totalprice") > 0.85
    # Z-order: BOTH dimensions clustered in the typical row group
    assert mean_span_frac(zdest, "o_custkey") < 0.5
    assert mean_span_frac(zdest, "o_totalprice") < 0.5
    assert spark.read.parquet(zdest).count() == orders.count()


def test_overwrite_partitions_touches_only_written_ones(spark, tmp_path):
    from parquet_pipeline_spark.sources.writers import overwrite_partitions

    dest = str(tmp_path / "daily.parquet")
    base = spark.createDataFrame(
        [("2024-01-01", 1, 10.0), ("2024-01-01", 2, 20.0),
         ("2024-01-02", 3, 30.0), ("2024-01-03", 4, 40.0)],
        "day string, id long, v double",
    )
    overwrite_partitions(base, dest, ["day"])

    # re-process ONLY day 2 with corrected values
    fix = spark.createDataFrame(
        [("2024-01-02", 3, 33.0), ("2024-01-02", 5, 50.0)],
        "day string, id long, v double",
    )
    overwrite_partitions(fix, dest, ["day"])

    # str() the partition key: hive partition values come back
    # type-inferred (date), which is fine for readers
    out = {(str(r["day"]), r["id"]): r["v"] for r in spark.read.parquet(dest).collect()}
    assert out == {
        ("2024-01-01", 1): 10.0, ("2024-01-01", 2): 20.0,   # untouched
        ("2024-01-02", 3): 33.0, ("2024-01-02", 5): 50.0,   # replaced
        ("2024-01-03", 4): 40.0,                            # untouched
    }


def test_excel_fleet_distributed_multifile(spark, tmp_path):
    """A4 at scale: many same-layout workbooks parsed on executors
    via binaryFile+mapInPandas; per-file sheets align to the sample
    header by NAME (reorder-proof, missing -> null)."""
    from parquet_pipeline_spark.sources.readers import read_excel_fleet

    fleet = tmp_path / "fleet"
    fleet.mkdir()
    _make_xlsx(
        str(fleet / "m01.xlsx"),
        {"Data": (["Name", "Amount", "Active"], [["a1", 10, True], ["a2", 20.5, False]])},
    )
    # reordered columns + an extra one: must realign by name
    _make_xlsx(
        str(fleet / "m02.xlsx"),
        {"Data": (["Active", "Name", "Extra", "Amount"], [[True, "b1", "x", 30]])},
    )
    # missing the Amount column: nulls
    _make_xlsx(
        str(fleet / "m03.xlsx"),
        {"Data": (["Name", "Active"], [["c1", False]])},
    )

    out = read_excel_fleet(spark, str(fleet / "*.xlsx"))
    assert set(out) == {"data"}
    df = out["data"]
    # clean_columns normalizes `_src_file` -> `src_file`
    assert df.columns == ["src_file", "name", "amount", "active"]
    rows = {r["name"]: r for r in df.collect()}
    assert len(rows) == 4
    assert rows["a2"]["amount"] == 20.5 and rows["a2"]["active"] is False
    assert rows["b1"]["amount"] == 30.0 and rows["b1"]["active"] is True
    assert rows["c1"]["amount"] is None
    assert rows["a1"]["src_file"].endswith("m01.xlsx")
    assert rows["b1"]["src_file"].endswith("m02.xlsx")
    # the parse runs in executor tasks over a binaryFile scan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan


def test_compact_partitioned_preserves_layout(spark, sf_dir, tmp_path):
    """Index-maintenance pass: repeated appends litter a partitioned
    index with small files; compact_partitioned rewrites to one file
    per partition dir WITHOUT flattening the layout (pruning keeps
    working), and plain compact() refuses the partitioned dir."""
    import os

    from parquet_pipeline_spark.operators.dedup import banded_minhash
    from parquet_pipeline_spark.sources.writers import compact, compact_partitioned

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    idx = str(tmp_path / "idx")
    # snapshot + 3 appended "batches" -> many small files per band dir
    banded_minhash(docs.filter("doc_id % 4 = 1"), num_hashes=16, bands=4).write.partitionBy("band_id").parquet(idx)
    for m in (2, 3, 0):
        banded_minhash(
            docs.filter(f"doc_id % 4 = {m}"), num_hashes=16, bands=4
        ).write.mode("append").partitionBy("band_id").parquet(idx)

    def files_per_dir():
        return {
            d: sum(1 for f in os.listdir(os.path.join(idx, d)) if f.endswith(".parquet"))
            for d in os.listdir(idx)
            if d.startswith("band_id=")
        }

    before = files_per_dir()
    assert all(n >= 4 for n in before.values()), before
    checksum = spark.read.parquet(idx).groupBy().agg(
        F.count(F.lit(1)), F.sum("doc_id"), F.expr("bit_xor(band_hash)")
    ).first()

    with pytest.raises(ValueError, match="compact_partitioned"):
        compact(spark, idx)

    n_after = compact_partitioned(spark, idx, ["band_id"], sort_cols=["band_hash"])
    after = files_per_dir()
    assert set(after) == set(before) and all(n == 1 for n in after.values()), after
    assert n_after == len(after)
    back = spark.read.parquet(idx)
    assert back.groupBy().agg(
        F.count(F.lit(1)), F.sum("doc_id"), F.expr("bit_xor(band_hash)")
    ).first() == checksum
    # pruning still works on the compacted layout
    plan = back.filter("band_id = 2")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "band_id" in plan.split("PartitionFilters")[1][:120], plan


def test_write_xlsx_escapes_xml_specials(tmp_path):
    """write_xlsx must XML-escape cell strings and sheet names —
    ingestion round-trips carry arbitrary document text."""
    from parquet_pipeline_spark.sources.xlsx import read_xlsx, write_xlsx

    path = str(tmp_path / "esc.xlsx")
    rows = [["a < b & c > d", 1], ["<tag attr=\"x\">&amp;</tag>", 2]]
    write_xlsx(path, {"S&P": (["Txt", "N"], rows)})
    (header, got) = read_xlsx(path)["S&P"]
    assert header == ["Txt", "N"]
    assert got == rows


def test_write_xlsx_valid_ooxml_package(tmp_path):
    """ADVICE r9 (medium): the emitted zip must be a real OOXML
    package — [Content_Types].xml + root _rels/.rels present and all
    XML parts well-formed — so environments WITH openpyxl (where
    read_excel_sheets prefers pandas) can open i01's fabricated
    workbooks instead of crashing with KeyError. When openpyxl is
    installed, prove it by actually opening the file with it."""
    import zipfile
    from xml.etree import ElementTree as ET

    from parquet_pipeline_spark.sources.xlsx import write_xlsx

    path = str(tmp_path / "pkg.xlsx")
    write_xlsx(
        path,
        {
            "Data": (["a", "b"], [["x", 1], ["y", 2.5]]),
            "Other": (["c"], [[True]]),
        },
    )
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert "[Content_Types].xml" in names
        assert "_rels/.rels" in names
        for part in names:
            ET.fromstring(z.read(part))  # every part parses
        ct = z.read("[Content_Types].xml").decode()
        assert "/xl/workbook.xml" in ct and "/xl/worksheets/sheet1.xml" in ct
        rels = z.read("_rels/.rels").decode()
        assert "officeDocument" in rels and "xl/workbook.xml" in rels
    try:
        import openpyxl
    except ImportError:
        return
    wb = openpyxl.load_workbook(path)
    assert wb.sheetnames == ["Data", "Other"]
    got = [[c.value for c in row] for row in wb["Data"].iter_rows()]
    assert got == [["a", "b"], ["x", 1], ["y", 2.5]]


def test_write_xlsx_quote_sheet_name_and_control_chars(tmp_path):
    """ADVICE r9 (low): a double quote in a sheet name must not
    produce malformed workbook.xml, and XML-1.0-invalid control
    characters in cell text must not make the package unparseable
    (they are stripped — XML cannot carry them even escaped)."""
    from parquet_pipeline_spark.sources.xlsx import read_xlsx, write_xlsx

    path = str(tmp_path / "dirty.xlsx")
    write_xlsx(
        path,
        {
            'He said "hi"': (
                ["Txt"],
                [
                    ["a\x00b\x1fc", 1],
                    ["tab\tok\nnl", 2],
                    # lone surrogate + noncharacters (ADVICE r10): an
                    # unpaired surrogate is unencodable — without the
                    # strip, zipfile.writestr raises UnicodeEncodeError
                    ["sur\ud800ro\udfffgate", 3],
                    ["non﷐char￾s", 4],
                ],
            )
        },
    )
    sheets = read_xlsx(path)
    assert list(sheets) == ['He said "hi"']
    (header, rows) = sheets['He said "hi"']
    assert rows[0][0] == "abc"  # invalid control chars stripped
    assert rows[1][0] == "tab\tok\nnl"  # tab/newline are XML-legal, kept
    assert rows[2][0] == "surrogate"  # lone surrogates stripped
    assert rows[3][0] == "nonchars"  # U+FDD0–U+FDEF, U+FFFE/F stripped


def test_read_xlsx_hostile_container_contracts(tmp_path):
    """Ninth battery's found-and-fixed holes (r11), pinned: cell-level
    dirt must stay cell-level and DTDs must be refused before expat
    expands entities (tools/adversarial_zip_check.py fuzzes the full
    class; these are the deterministic regressions)."""
    import zipfile

    from parquet_pipeline_spark.sources.xlsx import read_xlsx, write_xlsx

    def repack(path, mutate):
        buf = {}
        with zipfile.ZipFile(path) as z:
            for n in z.namelist():
                buf[n] = z.read(n)
        mutate(buf)
        with zipfile.ZipFile(path, "w") as z:
            for n, b in buf.items():
                z.writestr(n, b)

    def add_row(buf, row_xml):
        buf["xl/worksheets/sheet1.xml"] = buf["xl/worksheets/sheet1.xml"].replace(
            b"</sheetData>", row_xml + b"</sheetData>"
        )

    # out-of-range / negative / non-int shared-string index -> None,
    # never IndexError and never Python's -1 aliasing the LAST string
    p = str(tmp_path / "oob.xlsx")
    write_xlsx(p, {"S": (["a", "b", "c"], [["x", "y", 1]])})
    repack(
        p,
        lambda buf: add_row(
            buf,
            b'<row r="3"><c r="A3" t="s"><v>999</v></c>'
            b'<c r="B3" t="s"><v>-1</v></c>'
            b'<c r="C3" t="s"><v>zz</v></c></row>',
        ),
    )
    assert read_xlsx(p)["S"][1] == [["x", "y", 1]]  # all-None row dropped

    # garbled/missing refs place sequentially (OOXML omitted-r rule)
    p2 = str(tmp_path / "seq.xlsx")
    write_xlsx(p2, {"S": (["a", "b", "c"], [["x", "y", 1]])})
    repack(
        p2,
        lambda buf: add_row(
            buf,
            b'<row r="3"><c r="@!"><v>7</v></c><c><v>8</v></c>'
            b'<c r="C3"><v>9</v></c></row>',
        ),
    )
    assert read_xlsx(p2)["S"][1][-1] == [7, 8, 9]

    # a DTD anywhere is refused outright (billion-laughs vector)
    p3 = str(tmp_path / "dtd.xlsx")
    write_xlsx(p3, {"S": (["a"], [["x"]])})
    repack(
        p3,
        lambda buf: buf.__setitem__(
            "xl/sharedStrings.xml",
            b'<?xml version="1.0"?><!DOCTYPE r [<!ENTITY a "x">]><r>&a;</r>',
        ),
    )
    import pytest

    with pytest.raises(ValueError, match="DTD"):
        read_xlsx(p3)

    # the SAME document re-encoded as UTF-16 must also be refused:
    # expat auto-detects the encoding from the BOM, so a byte scan
    # for b'<!DOCTYPE' sails past while the entities still expand
    # (ADVICE r11 — the guard now refuses at the parser level)
    p4 = str(tmp_path / "dtd16.xlsx")
    write_xlsx(p4, {"S": (["a"], [["x"]])})
    evil16 = (
        '<?xml version="1.0" encoding="utf-16"?>'
        '<!DOCTYPE r [<!ENTITY a "x">]><r>&a;</r>'
    ).encode("utf-16")
    assert b"<!DOCTYPE" not in evil16  # the bypass the fix closes
    repack(
        p4,
        lambda buf: buf.__setitem__("xl/sharedStrings.xml", evil16),
    )
    with pytest.raises(ValueError, match="DTD"):
        read_xlsx(p4)

    # ...and a clean UTF-16 part still parses (refusal is doctype-
    # triggered, not encoding-triggered)
    p5 = str(tmp_path / "clean16.xlsx")
    write_xlsx(p5, {"S": (["a"], [["x"]])})
    clean16 = (
        '<?xml version="1.0" encoding="utf-16"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<si><t>u16</t></si></sst>"
    ).encode("utf-16")
    repack(
        p5,
        lambda buf: (
            buf.__setitem__("xl/sharedStrings.xml", clean16),
            buf.__setitem__(
                "xl/worksheets/sheet1.xml",
                buf["xl/worksheets/sheet1.xml"].replace(
                    b"</sheetData>",
                    b'<row r="3"><c r="A3" t="s"><v>0</v></c></row></sheetData>',
                ),
            ),
        ),
    )
    assert read_xlsx(p5)["S"][1][-1] == ["u16"]


def test_read_csv_rfc4180_doubled_quotes(spark, tmp_path):
    """RFC 4180 doubled quotes inside quoted fields — what Excel,
    csv.writer, and pandas (the reference's reader) all emit — must
    unescape. Spark's default backslash escape mangled `"g""h"`
    (found by tools/adversarial_sources_check.py)."""
    import csv

    from parquet_pipeline_spark.sources.readers import read_csv

    path = str(tmp_path / "q.csv")
    rows = [['say "hi"', 'a,b'], ['""', 'plain']]
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["Quoted", "Comma"])
        w.writerows(rows)
    got = sorted(tuple(r) for r in read_csv(spark, path).collect())
    assert got == sorted(tuple(r) for r in rows)


def test_read_csv_multiline_embedded_newlines(spark, tmp_path):
    """RFC 4180 quoted fields may embed newlines; multiline=True
    parses them (at the documented splittability cost). The i02
    round-trip relies on this for dirty document texts."""
    import csv

    from parquet_pipeline_spark.sources.readers import read_csv

    path = str(tmp_path / "nl.csv")
    rows = [["one\ntwo\nthree", 1], ["plain", 2]]
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["Txt", "N"])
        w.writerows(rows)
    got = sorted(tuple(r) for r in read_csv(spark, path, multiline=True).collect())
    assert got == sorted(tuple(r) for r in rows)


class TestDownloadContract:
    """A9 failure contracts for download_to_temp (VERDICT r9 item 2):
    redirects followed, stalls time out, truncated bodies raise —
    never a silently short file handed to a reader."""

    @staticmethod
    def _serve(handler_cls):
        import http.server
        import threading

        srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler_cls)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv, f"http://127.0.0.1:{srv.server_address[1]}"

    def test_redirect_followed(self):
        import http.server

        from parquet_pipeline_spark.sources.readers import download_to_temp

        body = b"doc_id,text\n1,hello\n"

        class H(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                if self.path == "/old.csv":
                    self.send_response(302)
                    self.send_header("Location", "/new.csv")
                    self.end_headers()
                else:
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)

            def log_message(self, *a):
                pass

        srv, base = self._serve(H)
        try:
            local = download_to_temp(f"{base}/old.csv", timeout=10)
            with open(local, "rb") as fh:
                assert fh.read() == body
            os.unlink(local)
        finally:
            srv.shutdown()
            srv.server_close()

    def test_timeout_on_stalled_server(self):
        import http.server
        import time as _time
        from urllib.error import URLError

        from parquet_pipeline_spark.sources.readers import download_to_temp

        class H(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                self.send_response(200)
                self.send_header("Content-Length", "100")
                self.end_headers()
                self.wfile.write(b"ten bytes.")
                _time.sleep(30)  # stall mid-body, far past the timeout

            def log_message(self, *a):
                pass

        srv, base = self._serve(H)
        try:
            with pytest.raises((TimeoutError, URLError, OSError)):
                download_to_temp(f"{base}/slow.csv", timeout=1)
        finally:
            srv.shutdown()
            srv.server_close()

    def test_truncated_body_raises(self):
        import http.server

        from parquet_pipeline_spark.sources.readers import download_to_temp

        class H(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                self.send_response(200)
                self.send_header("Content-Length", "1000")
                self.end_headers()
                self.wfile.write(b"short body")
                self.close_connection = True

            def log_message(self, *a):
                pass

        srv, base = self._serve(H)
        try:
            with pytest.raises((IOError, Exception)):
                download_to_temp(f"{base}/cut.csv", timeout=10)
        finally:
            srv.shutdown()
            srv.server_close()


def test_strict_reader_raises_on_corrupt_member(spark, sf_dir, tmp_path):
    """The i10 contract's other half: the DEFAULT reader fails loudly
    on a directory holding a truncated member — resilience is an
    explicit opt-in (read_parquet_resilient), never silent."""
    from parquet_pipeline_spark.sources.readers import read_parquet_resilient

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    dest = str(tmp_path / "lake.parquet")
    docs.filter("doc_id < 50").coalesce(1).write.parquet(dest)
    part = next(f for f in os.listdir(dest) if f.endswith(".parquet"))
    with open(os.path.join(dest, part), "rb") as fh:
        blob = fh.read()
    with open(os.path.join(dest, "part-corrupt.parquet"), "wb") as fh:
        fh.write(blob[: len(blob) // 3])

    with pytest.raises(Exception):
        spark.read.parquet(dest).count()  # strict default: loud failure
    got = read_parquet_resilient(spark, dest, schema=docs.schema).count()
    assert got == 50
