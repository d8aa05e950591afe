"""S8 — Excel multi-sheet source (reference: excel_lob_consolidator.py:132-144,
pagewise_llm_runner.py:38-52 read every sheet of a workbook with pandas/
openpyxl and consolidate).

This engine reads .xlsx natively with the stdlib: an xlsx file is a zip of
XML parts (ECMA-376 SpreadsheetML), so a scale-safe Spark source needs no
jar and no openpyxl — workbooks arrive as a ``binary`` payload column and a
mapInPandas kernel unzips + parses each one where it lives (map-only, no
shuffle; the same multimodal-binary plumbing as operators/multimodal.py).

Supported subset (what the reference's own workbooks use): shared strings,
inline strings, number/boolean cells, sparse cells via A1 references, any
number of sheets in workbook order. Formulas yield their cached value.
``write_minimal_xlsx`` writes the same subset for fixtures/tests.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_COL_RE = re.compile(r"([A-Z]+)([0-9]+)")


def _col_index(ref: str) -> int:
    """'A'→0, 'Z'→25, 'AA'→26 …"""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def read_xlsx_bytes(payload: bytes) -> list[tuple[str, list[list[str]]]]:
    """[(sheet_name, rows)] in workbook order; every cell as a string,
    sparse cells padded with ''. Pure stdlib (zipfile + ElementTree)."""
    zf = zipfile.ZipFile(io.BytesIO(payload))
    # sheet name → target part, in workbook order
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rel_target = {
        r.get("Id"): r.get("Target")
        for r in rels
        if r.get("Type", "").endswith("/worksheet")
    }
    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in sst.findall(f"{_NS}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))

    out: list[tuple[str, list[list[str]]]] = []
    for sh in wb.find(f"{_NS}sheets"):
        name = sh.get("name")
        target = rel_target.get(sh.get(f"{_NS_REL}id"))
        if target is None:
            continue
        part = "xl/" + target.lstrip("/") if not target.startswith("xl/") else target
        sheet = ET.fromstring(zf.read(part))
        rows: list[list[str]] = []
        for row in sheet.iter(f"{_NS}row"):
            cells: list[str] = []
            for c in row.findall(f"{_NS}c"):
                ref = c.get("r")
                if ref:
                    m = _COL_RE.fullmatch(ref)
                    idx = _col_index(m.group(1)) if m else len(cells)
                else:
                    idx = len(cells)
                while len(cells) <= idx:
                    cells.append("")
                ctype = c.get("t", "n")
                if ctype == "inlineStr":
                    is_el = c.find(f"{_NS}is")
                    val = (
                        "".join(t.text or "" for t in is_el.iter(f"{_NS}t"))
                        if is_el is not None
                        else ""
                    )
                else:
                    v = c.find(f"{_NS}v")
                    raw = v.text if v is not None and v.text is not None else ""
                    val = shared[int(raw)] if ctype == "s" and raw != "" else raw
                cells[idx] = val
            rows.append(cells)
        out.append((name, rows))
    return out


def sanitize_sheet_name(name: str) -> str:
    """U11 — Excel sheet-name rules the reference relies on openpyxl/pandas
    to enforce (adaptive_table_extractor.py:314 caps at 31 chars; openpyxl
    additionally rejects []:*?/\\): invalid chars → '_', 31-char cap,
    non-empty fallback."""
    cleaned = re.sub(r"[\[\]:*?/\\]", "_", name or "")[:31]
    return cleaned or "Sheet1"


def format_elapsed(seconds: float) -> str:
    """U12 — human elapsed string (streamlit_agent_reference_app.py:505-517,
    the reference's run-report formatter; same tier breaks and precision)."""
    if seconds < 60:
        return f"{seconds:.2f} seconds"
    if seconds < 3600:
        return f"{int(seconds // 60)} minutes {seconds % 60:.1f} seconds"
    return (
        f"{int(seconds // 3600)} hours {int((seconds % 3600) // 60)} minutes "
        f"{seconds % 60:.1f} seconds"
    )


def write_minimal_xlsx(sheets: list[tuple[str, list[list[str]]]]) -> bytes:
    """Spec-compliant minimal .xlsx (inline strings only) — fixture writer
    for tests/oracles; openpyxl-readable."""

    def esc(s: str) -> str:
        # quotes must be escaped because sheet names land inside a
        # double-quoted XML attribute; XML 1.0 forbids control chars other
        # than \t \n \r entirely, so strip them rather than emit a
        # malformed workbook
        s = re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "", s)
        return (
            s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
            .replace('"', "&quot;").replace("'", "&apos;")
        )

    def col_ref(idx: int) -> str:
        ref = ""
        idx += 1
        while idx:
            idx, r = divmod(idx - 1, 26)
            ref = chr(65 + r) + ref
        return ref

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        n = len(sheets)
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            + "".join(
                f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
                'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
                for i in range(n)
            )
            + "</Types>",
        )
        zf.writestr(
            "_rels/.rels",
            '<?xml version="1.0"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
            'Target="xl/workbook.xml"/></Relationships>',
        )
        zf.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            "<sheets>"
            + "".join(
                f'<sheet name="{esc(sanitize_sheet_name(name))}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
                for i, (name, _) in enumerate(sheets)
            )
            + "</sheets></workbook>",
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            + "".join(
                f'<Relationship Id="rId{i + 1}" '
                'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
                f'Target="worksheets/sheet{i + 1}.xml"/>'
                for i in range(n)
            )
            + "</Relationships>",
        )
        for i, (_name, rows) in enumerate(sheets):
            body = []
            for ri, cells in enumerate(rows, start=1):
                cs = "".join(
                    f'<c r="{col_ref(ci)}{ri}" t="inlineStr"><is><t>{esc(v)}</t></is></c>'
                    for ci, v in enumerate(cells)
                )
                body.append(f'<row r="{ri}">{cs}</row>')
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                f"<sheetData>{''.join(body)}</sheetData></worksheet>",
            )
    return buf.getvalue()


def excel_sheet_rows(workbooks, name_col: str = "file_name", payload_col: str = "content"):
    """Spark source: (file_name, content: binary) → one row per sheet row:
    (file_name, sheet_pos, sheet_name, row_pos, cells: array<string>, error).

    mapInPandas kernel — each workbook is unzipped and parsed where its
    bytes live (map-only). The output feeds the grid model (operators/
    grid.py: X7 reconstruction, S9 pipe-text rendering) exactly like the
    Textract path, closing S8 without a spark-excel jar.

    Error channel: a corrupt/truncated workbook yields ONE error row for
    that file (null sheet/cells) instead of failing the task — one poisoned
    upload in a billion must not kill the job (same contract as the
    extraction UDF).
    """
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            rows = []
            for fname, payload in zip(pdf[name_col], pdf[payload_col]):
                try:
                    sheets = read_xlsx_bytes(bytes(payload))
                except Exception as e:  # poisoned workbook → error channel
                    rows.append((fname, None, None, None, None,
                                 f"{type(e).__name__}: {e}"[:500]))
                    continue
                for si, (sheet, srows) in enumerate(sheets):
                    for ri, cells in enumerate(srows):
                        rows.append((fname, si, sheet, ri, list(cells), None))
            yield pd.DataFrame(
                rows,
                columns=[name_col, "sheet_pos", "sheet_name", "row_pos", "cells", "error"],
            )

    return workbooks.mapInPandas(
        kernel,
        schema=f"{name_col} string, sheet_pos int, sheet_name string, "
        "row_pos int, cells array<string>, error string",
    )
