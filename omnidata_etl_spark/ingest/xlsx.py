"""Dependency-free minimal XLSX reader (reference R3: Excel scan).

The reference reads the first sheet of an uploaded workbook with blank cells
defaulting to "" (/root/reference backend/index.js:93-96, :200-205 —
`sheet_to_json(..., {defval: ""})`). This container has no openpyxl, but
XLSX is just a zip of XML parts — a minimal reader for inline/shared
strings and numeric cells covers the reference's ingestion semantics
(header row + text-by-default cells). Formulas, styles, and dates-as-serials
are out of scope and documented as such; swap in a full reader when the
environment provides one.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


def _col_index(cell_ref: str) -> int:
    """'C7' → 2 (0-based column)."""
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def read_xlsx_rows(path: str, sheet: int = 0) -> list[list[str | None]]:
    """First-sheet rows as lists of cell strings (None for blanks)."""
    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", _NS):
                shared.append("".join(t.text or "" for t in si.iter(
                    "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t"
                )))
        sheet_names = sorted(
            n for n in zf.namelist()
            if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        if not sheet_names:
            return []
        root = ET.fromstring(zf.read(sheet_names[sheet]))
        rows: list[list[str | None]] = []
        width = 0
        for row in root.iter(
            "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}row"
        ):
            cells: dict[int, str | None] = {}
            for c in row:
                ref = c.get("r") or ""
                idx = _col_index(ref) if ref else len(cells)
                ctype = c.get("t", "n")
                v = c.find("m:v", _NS)
                is_node = c.find("m:is", _NS)
                if ctype == "s" and v is not None:
                    cells[idx] = shared[int(v.text)]
                elif ctype == "inlineStr" and is_node is not None:
                    cells[idx] = "".join(
                        t.text or "" for t in is_node.iter(
                            "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t"
                        )
                    )
                elif v is not None:
                    cells[idx] = v.text
                else:
                    cells[idx] = None
            if cells:
                width = max(width, max(cells) + 1)
                rows.append([cells.get(i) for i in range(max(cells) + 1)])
        return [r + [None] * (width - len(r)) for r in rows]


def write_xlsx(path: str, headers: list[str], rows: list[tuple]) -> None:
    """Write a minimal single-sheet workbook (inline strings) — used only to
    build test fixtures without an xlsx library."""

    def esc(s: str) -> str:
        return (
            str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )

    def row_xml(r_idx: int, values) -> str:
        cells = []
        for i, v in enumerate(values):
            if v is None or v == "":
                continue
            col = ""
            n = i + 1
            while n:
                n, rem = divmod(n - 1, 26)
                col = chr(ord("A") + rem) + col
            cells.append(
                f'<c r="{col}{r_idx}" t="inlineStr"><is><t>{esc(v)}</t></is></c>'
            )
        return f'<row r="{r_idx}">{"".join(cells)}</row>'

    all_rows = [row_xml(1, headers)] + [
        row_xml(i + 2, r) for i, r in enumerate(rows)
    ]
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<sheetData>{"".join(all_rows)}</sheetData></worksheet>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
