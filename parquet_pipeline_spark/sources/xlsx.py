"""Minimal stdlib-only .xlsx reader (SURVEY §2 A4 without optional deps).

An .xlsx file is a zip of XML parts; for the flat tabular sheets the
reference ingests (loan.xlsx and friends — 1 header row + data rows,
no merged cells/formulas-as-values needed), parsing with
zipfile+ElementTree covers the capability with zero dependencies:

- ``xl/workbook.xml``      sheet names + ids
- ``xl/_rels/...rels``     sheet id → part path
- ``xl/sharedStrings.xml`` the string table (cell type ``s``)
- ``xl/worksheets/*.xml``  rows of cells: ``t="s"`` shared string,
                           ``t="b"`` boolean, ``t="inlineStr"``,
                           ``t="str"`` formula-string, default numeric

Not supported (documented limitation, not silent corruption): dates
as styled numerics come through as their raw serial numbers (the
reference has the same blindness — its date cells arrive as strings
only because the producers wrote them as text); merged cells;
formulas (cached values are read).

Used by ``readers.read_excel_sheets`` as the fallback engine when
openpyxl is unavailable.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


def _col_index(cell_ref: str) -> int:
    """'A1' → 0, 'AB7' → 27."""
    letters = re.match(r"([A-Z]+)", cell_ref).group(1)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _cell_value(cell, shared: list[str]):
    t = cell.get("t", "n")
    v = cell.find("m:v", _NS)
    if t == "inlineStr":
        is_node = cell.find("m:is", _NS)
        return "".join(n.text or "" for n in is_node.iter() if n.tag.endswith("}t")) if is_node is not None else None
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text == "1"
    if t == "str":
        return v.text
    # numeric: int when exact, else float
    txt = v.text
    try:
        f = float(txt)
        return int(f) if f.is_integer() and "e" not in txt.lower() and "." not in txt else f
    except ValueError:
        return txt


def read_xlsx(path) -> dict[str, tuple[list[str], list[list]]]:
    """Parse every sheet → {sheet_name: (header_row, data_rows)}.
    Rows are padded/truncated to the header width; empty sheets are
    dropped (reference behavior: skip empty sheets).

    ``path`` may be a filesystem path OR raw workbook bytes — the
    bytes form is what the distributed reader feeds from a
    ``binaryFile`` scan on executors."""
    if isinstance(path, (bytes, bytearray)):
        import io

        path = io.BytesIO(bytes(path))
    out: dict[str, tuple[list[str], list[list]]] = {}
    with zipfile.ZipFile(path) as z:
        # shared strings (may be absent)
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", _NS):
                shared.append(
                    "".join(t.text or "" for t in si.iter() if t.tag.endswith("}t"))
                )
        # sheet name → target part
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_map = {
            r.get("Id"): r.get("Target").lstrip("/")
            for r in rels.iter()
            if r.tag.endswith("}Relationship")
        }
        for sheet in wb.iter():
            if not sheet.tag.endswith("}sheet"):
                continue
            name = sheet.get("name")
            rid = sheet.get(
                "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
            )
            target = rel_map.get(rid, "")
            part = target if target.startswith("xl/") else f"xl/{target}"
            if part not in z.namelist():
                continue
            ws = ET.fromstring(z.read(part))
            rows: list[list] = []
            for row in ws.iter():
                if not row.tag.endswith("}row"):
                    continue
                cells: dict[int, object] = {}
                for cell in row.findall("m:c", _NS):
                    ref = cell.get("r", "A1")
                    cells[_col_index(ref)] = _cell_value(cell, shared)
                width = max(cells) + 1 if cells else 0
                rows.append([cells.get(i) for i in range(width)])
            if not rows or not rows[0]:
                continue
            header = [str(h) if h is not None else f"col_{i}" for i, h in enumerate(rows[0])]
            width = len(header)
            data = [
                (r + [None] * width)[:width] for r in rows[1:] if any(v is not None for v in r)
            ]
            out[name] = (header, data)
    return out
