"""Ninth adversarial battery: HOSTILE OOXML/ZIP INPUTS (VERDICT r10
item 6).

The dirty-sources battery (seventh) fabricates well-formed workbooks
with dirty DATA; this one attacks the CONTAINER — the zip+XML
fallback parser in sources/xlsx.py now parses archives the engine
itself didn't write (read_any over downloaded files, read_excel_fleet
over executor-scanned bytes), so it must survive archives built by an
adversary, not a spreadsheet program.

Pinned contracts (found-and-fixed r11 unless noted):
- STRUCTURAL breaks are LOUD: truncated central directory →
  zipfile.BadZipFile; missing workbook.xml → KeyError; a DTD in any
  XML part → ValueError (expat expands internal entities, so a
  billion-laughs sharedStrings.xml would otherwise inflate to GiBs —
  refused outright; OOXML parts never carry a DOCTYPE).
- CELL-level dirt stays cell-level: out-of-range / negative /
  non-integer shared-string indexes yield None (r11: previously
  IndexError / silent aliasing via Python's -1 / ValueError);
  missing or garbled ``r`` refs place sequentially (OOXML's own
  semantics for omitted refs; previously AttributeError).
- zip-slip member names (../../evil) are INERT: the reader only
  reads named members, never extracts — nothing is written anywhere.
- [Content_Types].xml is advisory for this flat-tabular subset:
  mismatched or missing types don't block the read (parts are
  located via workbook.xml.rels, like the reference's pandas
  engine).
- Huge-but-legal shared-string tables parse in bounded time.
- Mixed inlineStr / sharedStr / str / b / numeric cells in one row
  all land with their typed values.

    python tools/adversarial_zip_check.py [seed]
"""

from __future__ import annotations

import os
import random
import sys
import tempfile
import time
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_pipeline_spark.sources.xlsx import read_xlsx, write_xlsx


def _repack(path, mutate=None, extra=None, drop=()):
    buf = {}
    with zipfile.ZipFile(path) as z:
        for n in z.namelist():
            buf[n] = z.read(n)
    if mutate:
        mutate(buf)
    for n in drop:
        buf.pop(n, None)
    with zipfile.ZipFile(path, "w") as z:
        for n, b in buf.items():
            z.writestr(n, b)
        for n, b in (extra or {}).items():
            z.writestr(n, b)


def _base(path, rng):
    header = ["id", "name", "val"]
    rows = [[i, f"n{rng.randrange(1000)}", rng.random()] for i in range(5)]
    write_xlsx(path, {"Data": (header, rows)})
    return header, rows


def check_structural_loud(tmp, rng) -> list[str]:
    errs = []
    # truncated central directory
    p = os.path.join(tmp, "trunc.xlsx")
    _base(p, rng)
    raw = open(p, "rb").read()
    open(p, "wb").write(raw[: len(raw) - rng.randrange(20, 60)])
    try:
        read_xlsx(p)
        errs.append("truncated zip parsed silently")
    except zipfile.BadZipFile:
        pass
    except Exception as e:  # noqa: BLE001
        errs.append(f"truncated zip raised {type(e).__name__}, want BadZipFile")
    # missing workbook.xml
    p = os.path.join(tmp, "nowb.xlsx")
    _base(p, rng)
    _repack(p, drop=("xl/workbook.xml",))
    try:
        read_xlsx(p)
        errs.append("workbook-less archive parsed silently")
    except KeyError:
        pass
    except Exception as e:  # noqa: BLE001
        errs.append(f"missing workbook raised {type(e).__name__}, want KeyError")
    # DTD (billion-laughs vector) in each XML part — in UTF-8 AND in
    # UTF-16, which expat auto-detects from the BOM so a byte scan
    # for b'<!DOCTYPE' never sees it (ADVICE r11; refusal is now at
    # the parser level and encoding-independent)
    bomb8 = (
        b'<?xml version="1.0"?><!DOCTYPE r [<!ENTITY a "xxxxxxxxxx">'
        b'<!ENTITY b "&a;&a;&a;&a;&a;&a;&a;&a;&a;&a;">]>' + b"<r>&b;</r>"
    )
    bomb16 = (
        '<?xml version="1.0" encoding="utf-16"?>'
        '<!DOCTYPE r [<!ENTITY a "xxxxxxxxxx">'
        '<!ENTITY b "&a;&a;&a;&a;&a;&a;&a;&a;&a;&a;">]><r>&b;</r>'
    ).encode("utf-16")
    assert b"<!DOCTYPE" not in bomb16
    for enc, bomb in (("utf-8", bomb8), ("utf-16", bomb16)):
        for part in (
            "xl/sharedStrings.xml",
            "xl/workbook.xml",
            "xl/worksheets/sheet1.xml",
        ):
            p = os.path.join(tmp, "dtd.xlsx")
            _base(p, rng)
            _repack(p, mutate=lambda buf, part=part, bomb=bomb: buf.__setitem__(part, bomb))
            try:
                read_xlsx(p)
                errs.append(f"{enc} DTD in {part} parsed silently")
            except ValueError:
                pass
            except Exception as e:  # noqa: BLE001
                errs.append(
                    f"{enc} DTD in {part} raised {type(e).__name__}, want ValueError"
                )
    return errs


def check_cell_dirt(tmp, rng) -> list[str]:
    errs = []
    p = os.path.join(tmp, "dirt.xlsx")
    _base(p, rng)
    bad_idx = rng.choice([b"999", b"-1", b"abc", b"1e3"])
    dirty_row = (
        b'<row r="9"><c r="A9" t="s"><v>' + bad_idx + b"</v></c>"
        b'<c r="B9"><v>42</v></c></row>'
    )
    _repack(
        p,
        mutate=lambda buf: buf.__setitem__(
            "xl/worksheets/sheet1.xml",
            buf["xl/worksheets/sheet1.xml"].replace(
                b"</sheetData>", dirty_row + b"</sheetData>"
            ),
        ),
    )
    sheets = read_xlsx(p)
    rows = sheets["Data"][1]
    tail = rows[-1]
    if tail[:2] != [None, 42]:
        errs.append(f"bad shared index {bad_idx!r}: want [None, 42], got {tail[:2]}")
    if len(rows) != 6:
        errs.append(f"clean rows lost around dirty cell: {len(rows)}")
    # garbled / missing refs place sequentially
    p2 = os.path.join(tmp, "ref.xlsx")
    _base(p2, rng)
    seq_row = b'<row r="9"><c r="@#!"><v>7</v></c><c><v>8</v></c><c r="C9"><v>9</v></c></row>'
    _repack(
        p2,
        mutate=lambda buf: buf.__setitem__(
            "xl/worksheets/sheet1.xml",
            buf["xl/worksheets/sheet1.xml"].replace(
                b"</sheetData>", seq_row + b"</sheetData>"
            ),
        ),
    )
    tail2 = read_xlsx(p2)["Data"][1][-1]
    if tail2 != [7, 8, 9]:
        errs.append(f"sequential ref fallback: want [7, 8, 9], got {tail2}")
    return errs


def check_container_games(tmp, rng) -> list[str]:
    errs = []
    # zip-slip names must be inert (read-only parser, no extraction)
    p = os.path.join(tmp, "slip.xlsx")
    header, rows = _base(p, rng)
    canary = os.path.join(tmp, "canary.txt")
    _repack(
        p,
        extra={
            "../canary.txt": b"pwn",
            "xl/../../canary.txt": b"pwn",
            "/abs/canary.txt": b"pwn",
        },
    )
    got = read_xlsx(p)["Data"][1]
    if len(got) != len(rows):
        errs.append(f"zip-slip archive lost rows: {len(got)}")
    if os.path.exists(canary) or os.path.exists(os.path.join(tmp, "..", "canary.txt")):
        errs.append("zip-slip member escaped to disk")
    # mismatched / missing [Content_Types].xml is advisory
    for drop in (True, False):
        p2 = os.path.join(tmp, "ct.xlsx")
        _base(p2, rng)
        if drop:
            _repack(p2, drop=("[Content_Types].xml",))
        else:
            _repack(
                p2,
                mutate=lambda buf: buf.__setitem__(
                    "[Content_Types].xml",
                    b'<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="image/png"/></Types>',
                ),
            )
        if len(read_xlsx(p2)["Data"][1]) != len(rows):
            errs.append(f"content-types {'drop' if drop else 'lie'} blocked the read")
    return errs


def check_shared_strings_scale(tmp, rng) -> list[str]:
    errs = []
    p = os.path.join(tmp, "huge.xlsx")
    _base(p, rng)
    n = 100_000
    sis = "".join(f"<si><t>s{i}</t></si>" for i in range(n))
    sst = (
        '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/'
        f'spreadsheetml/2006/main" count="{n}" uniqueCount="{n}">{sis}</sst>'
    ).encode()
    probe = b'<row r="9"><c r="A9" t="s"><v>99999</v></c></row>'
    _repack(
        p,
        mutate=lambda buf: (
            buf.__setitem__("xl/sharedStrings.xml", sst),
            buf.__setitem__(
                "xl/worksheets/sheet1.xml",
                buf["xl/worksheets/sheet1.xml"].replace(
                    b"</sheetData>", probe + b"</sheetData>"
                ),
            ),
        ),
    )
    t0 = time.time()
    got = read_xlsx(p)["Data"][1]
    dt = time.time() - t0
    if got[-1][0] != "s99999":
        errs.append(f"huge shared-string table misread: {got[-1][0]!r}")
    if dt > 30:
        errs.append(f"huge shared-string table took {dt:.1f}s")
    return errs


def check_mixed_cells(tmp, rng) -> list[str]:
    errs = []
    p = os.path.join(tmp, "mixed.xlsx")
    # 5-wide header: data rows are padded/truncated to header width
    # (documented contract), so the probe row needs 5 named columns
    write_xlsx(
        p, {"Data": (["c1", "c2", "c3", "c4", "c5"], [[1, 2, 3, 4, 5]])}
    )
    row = (
        b'<row r="9">'
        b'<c r="A9" t="inlineStr"><is><t>inline</t></is></c>'
        b'<c r="B9" t="s"><v>0</v></c>'
        b'<c r="C9" t="str"><v>formula</v></c>'
        b'<c r="D9" t="b"><v>1</v></c>'
        b'<c r="E9"><v>2.5</v></c>'
        b"</row>"
    )
    _repack(
        p,
        mutate=lambda buf: buf.__setitem__(
            "xl/worksheets/sheet1.xml",
            buf["xl/worksheets/sheet1.xml"].replace(
                b"</sheetData>", row + b"</sheetData>"
            ),
        ),
    )
    shared0 = read_xlsx(p)["Data"][0][0]  # header cell A1's string = "c1"
    tail = read_xlsx(p)["Data"][1][-1]
    want = ["inline", shared0, "formula", True, 2.5]
    if tail != want:
        errs.append(f"mixed-cell row: want {want}, got {tail}")
    return errs


def main() -> int:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    rng = random.Random(seed)
    tmp = tempfile.mkdtemp(prefix="zipfuzz_")
    failures = []
    for name, fn in (
        ("structural_loud", check_structural_loud),
        ("cell_dirt", check_cell_dirt),
        ("container_games", check_container_games),
        ("shared_strings_scale", check_shared_strings_scale),
        ("mixed_cells", check_mixed_cells),
    ):
        errs = fn(tmp, rng)
        status = "PASS" if not errs else "FAIL"
        print(f"{status}  {name} (seed {seed})")
        for e in errs:
            print(f"      {e}")
        failures.extend(errs)
    print("all green" if not failures else f"{len(failures)} failure(s)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
