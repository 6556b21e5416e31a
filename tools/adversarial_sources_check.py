"""Seventh adversarial battery: DIRTY SOURCE FILES (VERDICT r8 #5).

The six prior batteries dirty parquet TABLES; the reference's
real-world failure class is malformed *input files* — the things the
file→parquet ETL loop actually meets (reference:
ingestion_pipeline_langgraph.py:175-425): ragged CSV rows, duplicate
and unicode headers, a UTF-8 BOM, mixed-type columns, embedded
quotes/separators, corrupt JSONL lines, blank lines, heterogeneous
keys, empty Excel sheets, ragged sheet rows, and truncated
workbooks. This battery fuzzes the READERS the way fuzz_oracle
fuzzes SQL: a seeded generator builds a ground-truth table, injects
dirt while writing each format, pushes the file through the real
readers (read_any / read_excel_sheets), and compares against the
expected recovery computed independently in pure Python from the
PINNED contracts:

- CSV (PERMISSIVE): short row → right-pad NULL; long row → extra
  tokens dropped; empty cell → NULL; a column whose non-null cells
  don't all parse as one numeric type stays raw strings; headers are
  cleaned to unique snake_case (BOM chars die in cleaning).
- JSONL: blank lines skipped; a corrupt line lands in the
  ``corrupt_record`` column (error-as-data — exactly the planted
  count, never a crash); columns = union of keys; an int-vs-string
  conflicted column degrades to the raw JSON tokens.
- XLSX: empty sheets skipped; ragged rows padded/truncated to the
  header width; all-None rows dropped; a mixed int/float column is
  normalized to float; XML specials round-trip escaped; a TRUNCATED
  workbook raises (loud error, never a silent empty table).

    python tools/adversarial_sources_check.py [seed]
"""

from __future__ import annotations

import csv
import json
import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = ["Ann", "Björn", "李雷", "e,f", 'g"h', "mü'ller", "<tag>&co", "plain"]


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


def _norm_rows(rows):
    return sorted(tuple(_norm_cell(v) for v in r) for r in rows)


def _expected_columns(raw_cols: list[list[str | None]]):
    """The pinned CSV type contract: a column is int if every
    non-null cell parses as int, else float if every non-null cell
    parses as float, else raw strings."""
    out = []
    for col in raw_cols:
        vals = [v for v in col if v is not None]

        def all_parse(cast):
            try:
                for v in vals:
                    cast(v)
                return bool(vals)
            except ValueError:
                return False

        if all_parse(int):
            out.append([None if v is None else int(v) for v in col])
        elif all_parse(float):
            out.append([None if v is None else float(v) for v in col])
        else:
            out.append(col)
    return out


def make_truth(rng: random.Random, n: int):
    """Ground truth rows: (id int, name unicode/specials, amount
    mixed int+float strings, note nullable)."""
    rows = []
    for i in range(n):
        amount = (
            str(rng.randrange(1000))
            if rng.random() < 0.5
            else str(rng.randrange(1000) + 0.5)
        )
        note = None if rng.random() < 0.2 else f"n{rng.randrange(50)}"
        rows.append([str(i), rng.choice(NAMES), amount, note])
    return rows


def check_csv(spark, rng: random.Random, tmp: str) -> list[str]:
    from parquet_pipeline_spark.sources.readers import read_any

    truth = make_truth(rng, 120)
    path = os.path.join(tmp, "dirty.csv")
    header = [" Id ", "Name", "Amount!", "Amount"]  # dirty + duplicate
    expected_raw = []
    with open(path, "w", newline="", encoding="utf-8-sig") as fh:  # BOM
        w = csv.writer(fh)
        w.writerow(header)
        for r in truth:
            roll = rng.random()
            if roll < 0.05:
                w.writerow(r[:2])  # ragged short → pad NULL
                expected_raw.append([r[0], r[1], None, None])
            elif roll < 0.10:
                w.writerow(r + ["EXTRA"])  # ragged long → token dropped
                expected_raw.append(list(r))
            else:
                w.writerow(r)
                expected_raw.append(list(r))
    # empty csv cell ↔ NULL: csv.writer writes None as "", Spark
    # reads "" back as NULL — same contract both ways
    ((_, df),) = read_any(spark, path).items()
    errs = []
    if df.columns != ["id", "name", "amount", "amount_1"]:
        errs.append(f"csv headers: {df.columns}")
    cols = list(zip(*expected_raw)) or [[]] * 4
    expected = list(zip(*_expected_columns([list(c) for c in cols])))
    got = _norm_rows([tuple(r) for r in df.collect()])
    want = _norm_rows(expected)
    if got != want:
        diff = [(g, w) for g, w in zip(got, want) if g != w][:3]
        errs.append(f"csv values: {len(got)} vs {len(want)} rows; first diffs {diff}")
    return errs


def check_jsonl(spark, rng: random.Random, tmp: str) -> list[str]:
    from parquet_pipeline_spark.sources.readers import read_any

    truth = make_truth(rng, 120)
    path = os.path.join(tmp, "dirty.jsonl")
    expected = []
    n_corrupt = 0
    lines = []
    for r in truth:
        roll = rng.random()
        if roll < 0.05:
            lines.append('{"id": ' + r[0] + ", BROKEN")  # corrupt
            n_corrupt += 1
            continue
        if roll < 0.10:
            lines.append("")  # blank → skipped
            continue
        obj: dict = {"id": int(r[0]), "name": r[1]}
        # type conflict: amount is an int on some lines, a plain
        # string on others → column degrades to raw JSON tokens
        amt = r[2]
        obj["amount"] = int(amt) if "." not in amt else amt
        if r[3] is not None:  # heterogeneous keys
            obj["note"] = r[3]
        lines.append(json.dumps(obj, ensure_ascii=False))
        expected.append((amt, int(r[0]), r[1], r[3]))
    with open(path, "w") as fh:
        fh.write("\n".join(lines))

    ((_, df),) = read_any(spark, path).items()
    errs = []
    if sorted(df.columns) != ["amount", "corrupt_record", "id", "name", "note"]:
        errs.append(f"jsonl columns: {sorted(df.columns)}")
        return errs
    rows = df.collect()
    bad = [r for r in rows if r["corrupt_record"] is not None]
    good = [r for r in rows if r["corrupt_record"] is None]
    if len(bad) != n_corrupt:
        errs.append(f"jsonl corrupt rows: {len(bad)} vs planted {n_corrupt}")
    got = _norm_rows([(r["amount"], r["id"], r["name"],
                       r["note"] if "note" in df.columns else None) for r in good])
    want = _norm_rows(expected)
    if got != want:
        diff = [(g, w) for g, w in zip(got, want) if g != w][:3]
        errs.append(f"jsonl values: {len(got)} vs {len(want)} rows; first diffs {diff}")
    return errs


def check_xlsx(spark, rng: random.Random, tmp: str) -> list[str]:
    from parquet_pipeline_spark.sources.readers import read_excel_sheets
    from parquet_pipeline_spark.sources.xlsx import write_xlsx

    truth = make_truth(rng, 80)
    path = os.path.join(tmp, "dirty.xlsx")
    header = ["Id#", "Name", "Amount", "Is Ok"]
    rows = []
    expected = []
    for r in truth:
        # mixed int/float amount column → normalized to float;
        # bool cells; random None holes; occasional all-None row
        # (dropped by the reader)
        if rng.random() < 0.05:
            rows.append([None, None, None, None])
            continue
        amount = int(r[2]) if "." not in r[2] else float(r[2])
        ok = rng.random() < 0.5
        name = None if rng.random() < 0.1 else r[1]
        row = [int(r[0]), name, amount, ok]
        if rng.random() < 0.05:
            rows.append(row[:2])  # ragged → reader pads
            expected.append((int(r[0]), name, None, None))
        else:
            rows.append(row)
            expected.append((int(r[0]), name, float(amount), ok))
    write_xlsx(
        path,
        {"Data Sheet": (header, rows), "Empty": (["A"], []), "S2": (["x"], [[1]])},
    )

    tables = read_excel_sheets(spark, path)
    errs = []
    expected_keys = {"dirty_data_sheet", "dirty_s2"}
    if set(tables) != expected_keys:
        errs.append(f"xlsx sheets: {sorted(tables)} vs {sorted(expected_keys)}")
        return errs
    df = tables["dirty_data_sheet"]
    if df.columns != ["id", "name", "amount", "is_ok"]:
        errs.append(f"xlsx headers: {df.columns}")
    got = _norm_rows([tuple(r) for r in df.collect()])
    want = _norm_rows(expected)
    if got != want:
        diff = [(g, w) for g, w in zip(got, want) if g != w][:3]
        errs.append(f"xlsx values: {len(got)} vs {len(want)} rows; first diffs {diff}")

    # truncated workbook must raise, never a silent empty dict
    trunc = os.path.join(tmp, "trunc.xlsx")
    with open(path, "rb") as fh:
        blob = fh.read()
    with open(trunc, "wb") as fh:
        fh.write(blob[: max(20, len(blob) // 3)])
    try:
        read_excel_sheets(spark, trunc)
        errs.append("xlsx truncated workbook did NOT raise")
    except Exception:
        pass
    return errs


def check_mljson(spark, rng: random.Random, tmp: str) -> list[str]:
    """multiLine JSON (one pretty-printed array document — i08's
    format): heterogeneous keys, int-vs-string type conflict
    (degrades to raw tokens, same contract as JSONL), unicode; a
    syntactically broken document lands in corrupt_record
    (error-as-data), never a crash."""
    from parquet_pipeline_spark.sources.readers import read_any

    truth = make_truth(rng, 100)
    path = os.path.join(tmp, "dirty_array.json")
    objs = []
    expected = []
    for r in truth:
        obj: dict = {"id": int(r[0]), "name": r[1]}
        amt = r[2]
        obj["amount"] = int(amt) if "." not in amt else amt
        if r[3] is not None:
            obj["note"] = r[3]
        objs.append(obj)
        expected.append((amt, int(r[0]), r[1], r[3]))
    with open(path, "w") as fh:
        json.dump(objs, fh, indent=2, ensure_ascii=False)

    ((_, df),) = read_any(spark, path).items()
    errs = []
    if sorted(df.columns) != ["amount", "id", "name", "note"]:
        errs.append(f"mljson columns: {sorted(df.columns)}")
        return errs
    got = _norm_rows(
        [(r["amount"], r["id"], r["name"], r["note"]) for r in df.collect()]
    )
    want = _norm_rows(expected)
    if got != want:
        diff = [(g, w) for g, w in zip(got, want) if g != w][:3]
        errs.append(f"mljson values: {len(got)} vs {len(want)} rows; first diffs {diff}")

    # a broken document: JSONL attempt fails, multiLine retry parses
    # what it can into corrupt_record — error-as-data, not a crash
    broken = os.path.join(tmp, "broken_array.json")
    with open(broken, "w") as fh:
        fh.write('[{"id": 1, "name": "a"}, {"id": 2, BROKEN')
    try:
        ((_, bdf),) = read_any(spark, broken).items()
        cols = set(bdf.columns)
        if "corrupt_record" not in cols:
            errs.append(f"mljson broken doc: no corrupt_record column ({sorted(cols)})")
    except Exception as exc:  # pragma: no cover - contract violation path
        errs.append(f"mljson broken doc crashed: {exc}")
    return errs


def check_orc(spark, rng: random.Random, tmp: str) -> list[str]:
    """ORC passthrough (i07's format): nulls, unicode, XML/CSV
    specials, and mixed numerics survive byte-exact (columnar formats
    carry their own schema — no inference ambiguity to fuzz); a
    TRUNCATED part file raises loudly, never a silent short table."""
    from parquet_pipeline_spark.sources.readers import read_any

    truth = make_truth(rng, 100)
    rows = [
        (int(r[0]), r[1], float(r[2]), r[3] if r[3] is not None else None)
        for r in truth
    ]
    src = os.path.join(tmp, "dirty.orc")
    spark.createDataFrame(
        rows, "id bigint, name string, amount double, note string"
    ).coalesce(1).write.mode("overwrite").orc(src)

    ((_, df),) = read_any(spark, src).items()
    errs = []
    if df.columns != ["id", "name", "amount", "note"]:
        errs.append(f"orc columns: {df.columns}")
    got = _norm_rows([tuple(r) for r in df.collect()])
    want = _norm_rows(rows)
    if got != want:
        diff = [(g, w) for g, w in zip(got, want) if g != w][:3]
        errs.append(f"orc values: {len(got)} vs {len(want)} rows; first diffs {diff}")

    part = next(
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".orc")
    )
    with open(part, "rb") as fh:
        blob = fh.read()
    trunc_dir = os.path.join(tmp, "trunc.orc")
    os.makedirs(trunc_dir, exist_ok=True)
    with open(os.path.join(trunc_dir, "part-0.orc"), "wb") as fh:
        fh.write(blob[: max(20, len(blob) // 3)])
    try:
        ((_, tdf),) = read_any(spark, trunc_dir).items()
        tdf.collect()
        errs.append("orc truncated file did NOT raise")
    except Exception:
        pass
    return errs


def check_http(spark, rng: random.Random, tmp: str) -> list[str]:
    """A9 over dirty content: the same dirty CSV served via loopback
    HTTP must land identically to the local read — the download leg
    adds no lossage — and a mid-body truncation (Content-Length lie)
    raises instead of handing the reader a short file."""
    import http.server
    import threading

    from parquet_pipeline_spark.sources.readers import download_to_temp, read_any

    truth = make_truth(rng, 60)
    path = os.path.join(tmp, "http_dirty.csv")
    with open(path, "w", newline="", encoding="utf-8") as fh:
        w = csv.writer(fh)
        w.writerow(["Id", "Name", "Amount"])
        w.writerows([r[:3] for r in truth])

    class _Quiet(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=tmp, **kw)

        def log_message(self, *a):
            pass

    class _Truncating(_Quiet):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Length", "100000")
            self.end_headers()
            self.wfile.write(b"Id,Name\n1,short\n")

    errs = []
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Quiet)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/http_dirty.csv"
        ((_, remote),) = read_any(spark, url).items()
        ((_, local),) = read_any(spark, path).items()
        if remote.columns != local.columns:
            errs.append(f"http columns: {remote.columns} vs {local.columns}")
        got = _norm_rows([tuple(r) for r in remote.collect()])
        want = _norm_rows([tuple(r) for r in local.collect()])
        if got != want:
            errs.append(f"http values: {len(got)} vs {len(want)} rows")
    finally:
        srv.shutdown()
        srv.server_close()

    srv2 = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Truncating)
    threading.Thread(target=srv2.serve_forever, daemon=True).start()
    try:
        download_to_temp(
            f"http://127.0.0.1:{srv2.server_address[1]}/anything.csv", timeout=10
        )
        errs.append("http truncated download did NOT raise")
    except Exception:
        pass
    finally:
        srv2.shutdown()
        srv2.server_close()
    return errs


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    rng = random.Random(seed)
    tmp = tempfile.mkdtemp(prefix="adversarial_src_")

    from parquet_pipeline_spark.session import get_spark

    spark = get_spark(
        "adversarial-sources",
        shuffle_partitions=8,
        extra_conf={"spark.master": "local[8]"},
    )
    failures = []
    for check in (check_csv, check_jsonl, check_xlsx, check_mljson, check_orc, check_http):
        errs = check(spark, rng, tmp)
        status = "PASS" if not errs else "FAIL"
        print(f"{status}  {check.__name__} (seed {seed})")
        for e in errs:
            print(f"      {e}")
        failures.extend(errs)
    if failures:
        print(f"\n{len(failures)} contract violations")
        return 1
    print("\nall green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
