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

# Code points XML 1.0 cannot carry even as entity references, plus
# ones Python cannot UTF-8-encode at all; any of these in emitted
# text would make the part unparseable or crash zipfile.writestr.
# (C0 controls minus tab/newline/CR; lone surrogates U+D800–U+DFFF —
# unpaired ones raise UnicodeEncodeError, ADVICE r10; the
# noncharacters U+FDD0–U+FDEF and U+FFFE/U+FFFF.)
_XML_INVALID_RE = re.compile(
    "[\x00-\x08\x0b\x0c\x0e-\x1f\ud800-\udfff﷐-﷯￾￿]"
)


def _col_index(cell_ref: str) -> int | None:
    """'A1' → 0, 'AB7' → 27; None for a ref that doesn't parse (the
    caller falls back to sequential placement, which is also the
    OOXML-specified meaning of an omitted ``r`` attribute)."""
    m = re.match(r"([A-Z]+)", cell_ref or "")
    if m is None:
        return None
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _parse_xml(data: bytes) -> "ET.Element":
    """ET.fromstring with DTDs refused. OOXML parts never carry a
    DOCTYPE, and expat happily expands internal entities — a hostile
    sharedStrings.xml with nested entity definitions (billion laughs)
    turns a few-hundred-byte member into gigabytes of driver memory.

    The refusal happens at the PARSER level, not by byte-scanning
    (ADVICE r11): a scan for ``b'<!DOCTYPE'`` misses the same document
    re-encoded as UTF-16, which expat auto-detects from the BOM and
    expands anyway. A validation pass with a raw expat parser sees
    the doctype in whatever encoding expat itself would use, and the
    ``StartDoctypeDeclHandler`` fires BEFORE any entity is defined or
    expanded, so the bomb never detonates in the check either. A
    malformed doc passes the check (expat error swallowed) and gets
    ElementTree's own, better error on the real parse."""
    from xml.parsers import expat

    def _refuse(*_a):
        raise ValueError(
            "refusing XML with a DTD (OOXML parts never carry one)"
        )

    probe = expat.ParserCreate()
    probe.StartDoctypeDeclHandler = _refuse
    try:
        probe.Parse(data, True)
    except expat.ExpatError:
        pass
    return ET.fromstring(data)


def _cell_value(cell, shared: list[str]):
    t = cell.get("t", "n")
    v = cell.find("m:v", _NS)
    if t == "inlineStr":
        is_node = cell.find("m:is", _NS)
        return "".join(n.text or "" for n in is_node.iter() if n.tag.endswith("}t")) if is_node is not None else None
    if v is None or v.text is None:
        return None
    if t == "s":
        # cell-level dirt must stay cell-level: an out-of-range,
        # negative, or non-integer shared-string index yields None
        # instead of killing the whole ingest (IndexError) or —
        # worse — silently aliasing another string (Python's -1)
        try:
            i = int(v.text)
        except ValueError:
            return None
        return shared[i] if 0 <= i < len(shared) else None
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
            root = _parse_xml(z.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", _NS):
                shared.append(
                    "".join(t.text or "" for t in si.iter() if t.tag.endswith("}t"))
                )
        # sheet name → target part
        wb = _parse_xml(z.read("xl/workbook.xml"))
        rels = _parse_xml(z.read("xl/_rels/workbook.xml.rels"))
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
            ws = _parse_xml(z.read(part))
            rows: list[list] = []
            for row in ws.iter():
                if not row.tag.endswith("}row"):
                    continue
                cells: dict[int, object] = {}
                next_i = 0  # sequential fallback for missing/garbled refs
                for cell in row.findall("m:c", _NS):
                    i = _col_index(cell.get("r", ""))
                    if i is None:
                        i = next_i
                    cells[i] = _cell_value(cell, shared)
                    next_i = i + 1
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


def write_xlsx(path, sheets: dict[str, tuple[list[str], list[list]]]) -> None:
    """Build a minimal flat-tabular .xlsx — the inverse of
    ``read_xlsx`` and the same layout the reference ingests (1 header
    row + data rows; reference: duckdb_util.py:263 reads exactly this
    shape). Strings go through the shared-string table, ints/floats
    as numeric cells, bools as ``t="b"``, None as an omitted cell.
    Driver-side by design: a workbook is a single unsplittable zip,
    and this writer exists so ingestion round-trips (i01) and tests
    can fabricate inputs without openpyxl.

    The emitted zip is a *valid OOXML package* — it carries
    ``[Content_Types].xml`` and the root ``_rels/.rels`` so openpyxl
    (and Excel itself) can open it, not just our stdlib reader
    (ADVICE r9: without those parts, environments WITH openpyxl
    crashed on read-back). Attribute values escape double quotes and
    cell strings are stripped of XML-1.0-invalid/unencodable code
    points (C0 controls minus tab/newline/CR, lone surrogates,
    noncharacters — see _XML_INVALID_RE) — arbitrary document text
    must never yield an unparseable workbook or an encode crash."""
    import zipfile
    from xml.sax.saxutils import escape, quoteattr

    def xml_safe(s: str) -> str:
        # XML 1.0 cannot represent these code points at all (even
        # escaped) — drop them rather than emit a broken part.
        return _XML_INVALID_RE.sub("", s)

    def col_letter(i: int) -> str:
        s = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            s = chr(ord("A") + r) + s
        return s

    strings: dict[str, int] = {}

    def cell(r: int, c: int, v) -> str:
        ref = f"{col_letter(c)}{r}"
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        s = xml_safe(str(v))
        if s not in strings:
            strings[s] = len(strings)
        return f'<c r="{ref}" t="s"><v>{strings[s]}</v></c>'

    sheet_xmls = []
    for header, rows in sheets.values():
        body = []
        for ri, row in enumerate([list(header)] + [list(r) for r in rows], start=1):
            cells = "".join(cell(ri, ci, v) for ci, v in enumerate(row))
            body.append(f'<row r="{ri}">{cells}</row>')
        sheet_xmls.append(
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f"<sheetData>{''.join(body)}</sheetData></worksheet>"
        )

    names = list(sheets)
    wb = (
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>'
        + "".join(
            f"<sheet name={quoteattr(xml_safe(n))} sheetId=\"{i + 1}\" r:id=\"rId{i + 1}\"/>"
            for i, n in enumerate(names)
        )
        + "</sheets></workbook>"
    )
    rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + "</Relationships>"
    )
    sst = (
        f'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        f'count="{len(strings)}" uniqueCount="{len(strings)}">'
        + "".join(f'<si><t xml:space="preserve">{escape(t)}</t></si>' for t in strings)
        + "</sst>"
    )
    content_types = (
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-'
        'officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-'
        'officedocument.spreadsheetml.sharedStrings+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" ContentType="application/'
            'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        + "</Types>"
    )
    root_rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>'
    )
    xml_decl = '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", xml_decl + content_types)
        z.writestr("_rels/.rels", xml_decl + root_rels)
        z.writestr("xl/workbook.xml", xml_decl + wb)
        z.writestr("xl/_rels/workbook.xml.rels", xml_decl + rels)
        z.writestr("xl/sharedStrings.xml", xml_decl + sst)
        for i, x in enumerate(sheet_xmls):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", xml_decl + x)
