"""Multi-format readers + format dispatch (SURVEY §2 A4-A10).

Reference behavior being re-expressed:
- format routing by extension (reference:
  ingestion_pipeline_langgraph.py:158-172, 405-425);
- CSV/TSV read in 100k-row pandas chunks with header cleaning forced
  onto later chunks (reference: ingestion_pipeline_langgraph.py:175-289)
  — obsolete under Spark: ``spark.read.csv`` splits natively and the
  rename is a Project over the whole relation;
- JSON via ``pd.read_json`` (reference:
  ingestion_pipeline_langgraph.py:291-329) → ``spark.read.json``
  (JSON-lines) with a multiLine fallback for document-style files;
- Excel sheets each become their own logical table named
  ``{base}_{sheet}`` (reference: duckdb_util.py:302-306,
  ingestion_pipeline_langgraph.py:374-375). Excel parsing needs
  openpyxl, which is optional here — the reader is import-gated and
  raises a clear error when unavailable. Sheets are read with pandas
  on the driver (an .xlsx is not splittable; this matches the
  reference) and handed to Spark via Arrow;
- HTTP(S) inputs are downloaded to a temp file first (reference:
  ingestion_pipeline_langgraph.py:138-155, streamed 8KB chunks).
"""

from __future__ import annotations

import os
import tempfile
from urllib.parse import urlparse
from urllib.request import urlopen

from pyspark.sql import DataFrame, SparkSession

from parquet_pipeline_spark.sources.cleaning import clean_columns

FORMAT_EXTENSIONS = {
    ".xlsx": "excel",
    ".xls": "excel",
    ".csv": "csv",
    ".tsv": "tsv",
    ".json": "json",
    ".jsonl": "json",
    ".parquet": "parquet",
    ".orc": "orc",
    ".avro": "avro",
}


def _coerce_bool(v):
    """Truthy coercion for fleet-Excel boolean columns: bool-like
    cell values map to True/False, anything else to None (mirrors
    the numeric ``errors='coerce'`` degrade-to-null contract)."""
    if v is None or isinstance(v, bool):
        return v
    if isinstance(v, (int, float)) and v in (0, 1):
        return bool(v)
    if isinstance(v, str):
        s = v.strip().lower()
        if s in ("true", "yes", "y", "t", "1"):
            return True
        if s in ("false", "no", "n", "f", "0"):
            return False
    return None


def detect_file_format(path: str) -> str:
    """Extension-based dispatch (reference:
    ingestion_pipeline_langgraph.py:158-172). Unknown → 'unknown'."""
    ext = os.path.splitext(urlparse(path).path if "://" in path else path)[1].lower()
    return FORMAT_EXTENSIONS.get(ext, "unknown")


def download_to_temp(url: str, timeout: float = 300, chunk_size: int = 8192) -> str:
    """Stream a remote file to a local temp path (reference:
    ingestion_pipeline_langgraph.py:138-155). Driver-side by design —
    ingestion inputs are single files, not datasets.

    Contract (pinned by tests/test_sources.py::TestDownloadContract
    and driver-gated end to end by i06):
    - redirects are followed (urllib default — the reference's
      requests.get does the same);
    - a stalled server raises within ``timeout`` seconds (socket-level
      timeout on every read, not just connect);
    - a TRUNCATED body — connection closed before the advertised
      Content-Length — raises instead of returning a silently short
      file that would parse as a half-ingested table. http.client
      raises IncompleteRead for chunked short reads; the explicit
      byte-count check below covers servers that close cleanly."""
    suffix = os.path.splitext(urlparse(url).path)[1] or ".bin"
    fd, local = tempfile.mkstemp(suffix=suffix)
    try:
        with os.fdopen(fd, "wb") as out, urlopen(url, timeout=timeout) as resp:
            declared = resp.headers.get("Content-Length")
            received = 0
            while True:
                chunk = resp.read(chunk_size)
                if not chunk:
                    break
                received += len(chunk)
                out.write(chunk)
        if declared is not None and received != int(declared):
            raise IOError(
                f"truncated download from {url!r}: got {received} bytes, "
                f"Content-Length declared {declared}"
            )
    except BaseException:
        try:
            os.unlink(local)
        except OSError:
            pass
        raise
    return local


def read_csv(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    clean: bool = True,
    multiline: bool = False,
) -> DataFrame:
    # escape = '"' pins the RFC 4180 dialect (doubled quotes inside a
    # quoted field), which is what Excel, csv.writer, and pandas —
    # i.e. the reference's own reader (ingestion_pipeline_langgraph.py
    # :175-289) — all emit. Spark's default escape is backslash, which
    # silently mangles `"g""h"` into `"g""h"` raw (found by the
    # dirty-sources battery, tools/adversarial_sources_check.py).
    #
    # multiline = True parses RFC 4180 quoted fields that EMBED
    # newlines. Off by default on purpose: multiLine makes the scan
    # non-splittable (one task per file), the wrong trade for big
    # machine-written CSV; flip it for human/Excel exports where
    # embedded newlines are common. NULL-vs-empty-string is NOT
    # representable either way — CSV's data model has one empty
    # token, so both arrive as NULL (pandas has the same blindness:
    # both become NaN).
    df = (
        spark.read.option("header", "true")
        .option("inferSchema", "true")
        .option("sep", sep)
        .option("escape", '"')
        .option("multiLine", str(multiline).lower())
        .csv(path)
    )
    return clean_columns(df) if clean else df


def read_tsv(spark: SparkSession, path: str, clean: bool = True) -> DataFrame:
    return read_csv(spark, path, sep="\t", clean=clean)


def read_json(spark: SparkSession, path: str, clean: bool = True) -> DataFrame:
    """JSON-lines first (splittable, the scalable layout); fall back
    to multiLine for whole-document arrays like pd.read_json reads."""
    df = spark.read.json(path)
    if df.columns == ["_corrupt_record"]:
        df = spark.read.option("multiLine", "true").json(path)
    return clean_columns(df) if clean else df


def read_excel_sheets(
    spark: SparkSession, path: str, clean: bool = True
) -> dict[str, DataFrame]:
    """Every sheet of a workbook → its own DataFrame, keyed by
    ``{base}_{sheet}`` (reference naming, duckdb_util.py:302-306).

    An .xlsx is a zip — not splittable — so it's parsed driver-side
    exactly like the reference, then shipped to executors via Arrow.
    Fine for ingestion-sized workbooks; giant tabular data should
    never arrive as Excel anyway. Uses pandas+openpyxl when present;
    otherwise falls back to the stdlib-only parser in
    ``sources/xlsx.py`` (flat tabular sheets — the reference's whole
    input space).
    """
    from parquet_pipeline_spark.catalog import logical_name

    base = logical_name(path)
    out: dict[str, DataFrame] = {}
    try:
        import openpyxl  # noqa: F401
        import pandas as pd

        sheets = pd.read_excel(path, sheet_name=None, engine="openpyxl")
        for sheet_name, pdf in sheets.items():
            if pdf.empty or not len(pdf.columns):
                continue  # skip empty sheets (reference: ingestion_pipeline_langgraph.py:369-371)
            df = spark.createDataFrame(pdf)
            out[logical_name(f"{base}_{sheet_name}")] = clean_columns(df) if clean else df
        return out
    except ImportError:
        pass

    from parquet_pipeline_spark.sources.xlsx import read_xlsx

    for sheet_name, (header, rows) in read_xlsx(path).items():
        if not rows:
            continue
        # column-wise numeric normalization (pandas-like inference):
        # a column mixing exact ints and floats becomes float —
        # Spark's row-based inference refuses to merge Long and Double
        for ci in range(len(header)):
            vals = [r[ci] for r in rows]
            has_float = any(isinstance(v, float) for v in vals)
            has_int = any(
                isinstance(v, int) and not isinstance(v, bool) for v in vals
            )
            if has_float and has_int:
                for r in rows:
                    if isinstance(r[ci], int) and not isinstance(r[ci], bool):
                        r[ci] = float(r[ci])
        df = spark.createDataFrame(
            [tuple(r) for r in rows], schema=[str(h) for h in header]
        )
        out[logical_name(f"{base}_{sheet_name}")] = clean_columns(df) if clean else df
    return out


def read_excel_fleet(
    spark: SparkSession, glob_path: str, clean: bool = True, sample_path: str | None = None
) -> dict[str, DataFrame]:
    """Distributed multi-FILE Excel ingestion: a fleet of same-layout
    workbooks (per-month exports, per-region uploads) parsed on
    EXECUTORS instead of a driver loop.

    One .xlsx is a zip (not splittable), but a *fleet* of them
    parallelizes per file: ``binaryFile`` scans the workbook bytes
    across tasks and ``mapInPandas`` runs the stdlib zip+XML parser
    (sources/xlsx.py) next to the data — at 10k workbooks the driver
    touches ONE sample file for schema and never sees the rest
    (reference analog: the driver-side sheet loop,
    duckdb_util.py:263; ``read_excel_sheets`` keeps that shape for
    single ingestion-sized workbooks).

    Returns {sheet_logical_name: DataFrame}, each with a
    ``_src_file`` column; per-file sheets are aligned to the sample
    header by NAME (missing columns → null, extra columns dropped),
    so a straggler workbook with reordered columns can't silently
    shift values. Numeric types come from the SAMPLE file; a fleet
    file whose column doesn't parse under that type yields null for
    those cells (``errors='coerce'``) rather than failing the whole
    scan; boolean columns coerce the same way (non-bool-like cells →
    null, never a task failure) — pair with a quality rule on null
    counts when that matters.

    Sample discovery: local paths are globbed driver-side; for
    non-local storage (s3://, hdfs://, ...) Python ``glob`` can't
    list, so the sample is taken from the first row of the
    ``binaryFile`` scan itself (Hadoop glob — one file's bytes pulled
    to the driver). Pass ``sample_path`` explicitly to pin the
    schema to a known-good workbook either way.
    """
    import glob as _glob

    import pandas as pd

    from parquet_pipeline_spark.catalog import logical_name
    from parquet_pipeline_spark.sources.xlsx import read_xlsx

    def scan():
        return (
            spark.read.format("binaryFile").load(glob_path).select("path", "content")
        )

    if sample_path is not None:
        layout = read_xlsx(sample_path)
        bf = scan()
    else:
        matches = sorted(_glob.glob(glob_path))
        if matches:
            layout = read_xlsx(matches[0])
            bf = scan()
        elif "://" in glob_path or glob_path.startswith("file:"):
            # scheme-prefixed path (s3/hdfs/file:/...): Python glob
            # can't list it; derive the sample from the binaryFile
            # listing instead (one workbook's bytes to the driver)
            bf = scan()
            sample_row = bf.orderBy("path").limit(1).collect()
            if not sample_row:
                raise FileNotFoundError(f"no workbooks match {glob_path!r}")
            layout = read_xlsx(bytes(sample_row[0]["content"]))
        else:
            # plain local path with zero matches: fail cleanly before
            # touching Spark (load() would raise PATH_NOT_FOUND)
            raise FileNotFoundError(f"no workbooks match {glob_path!r}")

    def _spark_type(vals) -> str:
        vals = [v for v in vals if v is not None]
        if vals and all(isinstance(v, bool) for v in vals):
            return "boolean"
        if vals and all(
            isinstance(v, int) and not isinstance(v, bool) for v in vals
        ):
            return "bigint"
        if vals and all(
            isinstance(v, (int, float)) and not isinstance(v, bool) for v in vals
        ):
            return "double"
        return "string"

    out: dict[str, DataFrame] = {}
    for sheet_name, (header, rows) in layout.items():
        if not rows:
            continue
        types = [_spark_type([r[i] for r in rows]) for i in range(len(header))]
        schema = ", ".join(
            ["`_src_file` string"]
            + [f"`{h}` {t}" for h, t in zip(header, types)]
        )

        def parse(batches, sheet=sheet_name, header=tuple(header), types=tuple(types)):
            caster = {
                "bigint": "Int64",
                "double": "float64",
                "boolean": "boolean",
                "string": "object",
            }
            for pdf in batches:
                for path, content in zip(pdf["path"], pdf["content"]):
                    parsed = read_xlsx(bytes(content)).get(sheet)
                    if not parsed or not parsed[1]:
                        continue
                    f_header, f_rows = parsed
                    local = pd.DataFrame(f_rows, columns=[str(h) for h in f_header])
                    # align by NAME to the sample layout
                    local = local.reindex(columns=list(header))
                    for h, t in zip(header, types):
                        if t in ("bigint", "double"):
                            local[h] = pd.to_numeric(local[h], errors="coerce").astype(
                                caster[t]
                            )
                        elif t == "boolean":
                            # degrade-to-null like the numeric path: a
                            # fleet file storing 'yes'/0/1 must not fail
                            # the whole distributed scan
                            local[h] = local[h].map(_coerce_bool).astype(
                                caster[t]
                            )
                        else:
                            local[h] = local[h].map(
                                lambda v: None if v is None else str(v)
                            )
                    local.insert(0, "_src_file", path)
                    yield local

        df = bf.mapInPandas(parse, schema)
        out[logical_name(sheet_name)] = clean_columns(df) if clean else df
    return out


def read_any(
    spark: SparkSession, path: str, clean: bool = True, multiline: bool = False
) -> dict[str, DataFrame]:
    """Format-dispatched read: returns {logical_name: DataFrame}
    (a dict because Excel fans out to one table per sheet).
    ``multiline`` applies to the delimited formats (embedded-newline
    quoted fields; see read_csv for the splittability trade)."""
    if path.startswith(("http://", "https://")):
        path = download_to_temp(path)
    fmt = detect_file_format(path)
    from parquet_pipeline_spark.catalog import logical_name

    base = logical_name(path)
    if fmt == "excel":
        return read_excel_sheets(spark, path, clean=clean)
    if fmt == "csv":
        return {base: read_csv(spark, path, clean=clean, multiline=multiline)}
    if fmt == "tsv":
        return {base: read_csv(spark, path, sep="\t", clean=clean, multiline=multiline)}
    if fmt == "json":
        return {base: read_json(spark, path, clean=clean)}
    if fmt == "parquet":
        # passthrough (reference: ingestion_pipeline_langgraph.py:332-339)
        return {base: spark.read.parquet(path)}
    if fmt == "orc":
        # beyond-reference: ORC is Spark-native, columnar, and
        # predicate-pushdown-capable like parquet — same passthrough
        return {base: spark.read.orc(path)}
    if fmt == "avro":
        # spark-avro is an external module; if it isn't deployed,
        # Spark raises a descriptive deployment error — surface it
        # rather than pretending the format is unsupported
        return {base: spark.read.format("avro").load(path)}
    raise ValueError(f"unsupported format for {path!r} (detected {fmt!r})")


def read_parquet_evolved(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Read a parquet lineage whose schema evolved across files
    (columns added/dropped over time): ``mergeSchema`` unions the
    per-file schemas; rows from files missing a column surface it as
    NULL. This is the read side of a long-lived 100 TB table where
    new pipeline versions added fields — no rewrite of old files
    needed. Schema merge cost is footer-only (one task per file
    footer), not a data scan."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def read_parquet_resilient(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Read a parquet directory tolerating corrupt members
    (truncated uploads, partial writes left by a dead executor —
    a when-not-if event in a 100 TB lake). Spark skips files whose
    pages fail to parse instead of failing the whole scan; the trade
    (silently fewer rows) is why this is a separate entry point
    rather than the default.

    ``ignoreCorruptFiles`` protects the SCAN only — schema inference
    still reads footers and dies on a corrupt one, so pass the
    table's known ``schema`` (which a 100 TB lake has in its catalog
    anyway; catalog.py records it per table) to skip inference."""
    reader = spark.read.option("ignoreCorruptFiles", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)
