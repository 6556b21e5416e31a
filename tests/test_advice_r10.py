"""Regression tests for the round-9 ADVICE findings (round 10).

Pins: (1) write_xlsx emits a VALID OOXML package — [Content_Types].xml
and root _rels/.rels present, every part well-formed XML — so the
pandas+openpyxl branch of read_excel_sheets (the one this sandbox
can't reach) opens i01's fabricated workbooks instead of crashing
(the structural checks live in tests/test_sources.py::
test_write_xlsx_valid_ooxml_package; here we pin the read_excel_sheets
contract end-to-end through read_any), (2) double quotes in sheet
names and XML-1.0-invalid control characters in cell text never
produce an unparseable workbook, (3) the i02/i04 oracles apply
NULLIF(col,'') to EVERY string column (text, lang, source) — CSV's
one-empty-token blindness is column-uniform, not text-specific,
(4) q70's threshold decimal math is integer-scaled on both engines
(ROUND(SUM*6,-2)/10000), immune to Spark's allowPrecisionLoss
scale-6 truncation that DuckDB's exact scale-8 product diverged from
at .xx5 half-cent boundaries.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def test_xlsx_roundtrip_through_read_any_with_dirty_text(spark, tmp_path):
    """(1)+(2) end-to-end: a workbook fabricated with quote-bearing
    sheet name and control-char text flows through read_excel_sheets
    and comes back parseable and clean."""
    from parquet_pipeline_spark.sources.readers import read_excel_sheets
    from parquet_pipeline_spark.sources.xlsx import write_xlsx

    path = str(tmp_path / "adv.xlsx")
    write_xlsx(
        path,
        {
            'Q3 "final"': (
                [" Doc ID ", "Text."],
                [[1, "plain"], [2, 'quo"te & <esc>'], [3, "bad\x00ctrl\x07here"]],
            )
        },
    )
    (df,) = read_excel_sheets(spark, path).values()
    assert df.columns == ["doc_id", "text"]
    got = {r["doc_id"]: r["text"] for r in df.collect()}
    assert got[2] == 'quo"te & <esc>'
    assert got[3] == "badctrlhere"  # XML-invalid control chars stripped


def test_write_xlsx_package_has_root_parts(tmp_path):
    """(1): the two package-level parts ADVICE r9 found missing."""
    import zipfile

    from parquet_pipeline_spark.sources.xlsx import write_xlsx

    path = str(tmp_path / "parts.xlsx")
    write_xlsx(path, {"S": (["a"], [[1]])})
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
    assert "[Content_Types].xml" in names and "_rels/.rels" in names


def test_ingestion_oracles_nullif_all_string_columns():
    """(3): the i02/i04 oracle SQL NULLIFs lang and source, not just
    text — the CSV round-trip contract is uniform across string
    columns."""
    from parquet_pipeline_spark.registry import ORACLES, load_all

    load_all()
    for name in ("i02_csv_roundtrip", "i04_tsv_roundtrip"):
        sql = ORACLES[name]
        for col in ("text", "lang", "source"):
            assert re.search(
                rf"NULLIF\({col},\s*''\)", sql
            ), f"{name} oracle missing NULLIF on {col}"


def test_q70_threshold_integer_scaled_decimal(spark, sf_dir):
    """(4): the Spark threshold is an exact integer-scaled decimal
    (SUM*6 rounded to a multiple of 100, then /10000 in double) and
    matches recomputing the same quantity via Python's exact Decimal
    on the raw rows — no precision-loss scale-6 product anywhere."""
    import os
    from decimal import ROUND_HALF_UP, Decimal

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_extendedprice", "l_quantity"
    )
    rows = li.collect()
    total = sum(
        (Decimal(str(r["l_extendedprice"])) * Decimal(str(r["l_quantity"])))
        for r in rows
    )
    expected = float(
        (total * 6).quantize(Decimal("1E+2"), rounding=ROUND_HALF_UP)
    ) / 10000.0

    vd = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_quantity"
    ).cast("decimal(18,2)")
    got = li.agg(
        (F.round(F.sum(vd) * F.lit(6), -2).cast("double") / F.lit(10000.0)).alias(
            "thr"
        )
    ).first()["thr"]
    assert got == expected
