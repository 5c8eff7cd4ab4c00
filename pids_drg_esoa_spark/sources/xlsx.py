"""Pure-stdlib xlsx codec (S3 scan / S7 sink, no external deps).

The reference reads diagnostics workbooks with ``pd.read_excel(...,
dtype=str)`` (match_labs.py:55) and writes its report with xlsxwriter —
one sheet, header frozen, autofilter over the data range
(match_labs.py:116-123). Neither openpyxl nor xlsxwriter ships in this
container, but .xlsx is just a zip of OOXML parts, so this module
implements the minimal subset with ``zipfile`` + ``xml.etree``:

- :func:`write_xlsx` emits a single-sheet workbook using inline strings
  (``t="inlineStr"``) for text and plain ``<v>`` for numbers, plus the
  reference's freeze-pane (`ySplit=1`) and autoFilter records.
- :func:`read_xlsx` parses the first worksheet, resolving shared
  strings (``t="s"``), inline strings, formula-cached strings
  (``t="str"``), booleans and numbers. All values come back as
  *strings* (or None for blanks) — the reference's ``dtype=str``.

Driver-side by design: the reference's Excel surface is a presentation
step over SMALL collected results (reports, diagnostics dims), never a
data-scale scan — the 100 TB path is parquet. Spark integration lives
in readers.read_excel_df / writers.write_excel_report.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def col_letter(idx: int) -> str:
    """0-based column index -> A, B, ..., Z, AA, ..."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


_CELL_REF_RE = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """Cell ref 'BC12' -> 0-based column index 54."""
    m = _CELL_REF_RE.match(ref)
    letters = m.group(1) if m else "A"
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _cell_xml(ref: str, value: object) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    # str values ALWAYS stay text — '001'-style code columns must
    # survive a dtype=str round-trip with leading zeros intact
    s = str(value)
    body = escape(s)
    # literal leading/trailing whitespace must be declared preserved
    space = ' xml:space="preserve"' if s != s.strip() else ""
    return f'<c r="{ref}" t="inlineStr"><is><t{space}>{body}</t></is></c>'


def write_xlsx(
    path: str,
    columns: list[str],
    rows: list[tuple] | list[list],
    sheet: str = "Sheet1",
    freeze_header: bool = True,
    autofilter: bool = True,
) -> None:
    """Write one worksheet: header row + data rows, frozen header pane
    and an autofilter over the full range (the reference report shape,
    match_labs.py:116-123)."""
    ncols = len(columns)
    nrows = len(rows)
    parts: list[str] = []
    parts.append('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>')
    parts.append('<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">')
    if freeze_header:
        parts.append(
            '<sheetViews><sheetView workbookViewId="0">'
            '<pane ySplit="1" topLeftCell="A2" activePane="bottomLeft" state="frozen"/>'
            "</sheetView></sheetViews>"
        )
    parts.append("<sheetData>")
    header_cells = "".join(_cell_xml(f"{col_letter(c)}1", str(columns[c])) for c in range(ncols))
    parts.append(f'<row r="1">{header_cells}</row>')
    for r, row in enumerate(rows, start=2):
        cells = "".join(_cell_xml(f"{col_letter(c)}{r}", row[c]) for c in range(min(ncols, len(row))))
        parts.append(f'<row r="{r}">{cells}</row>')
    parts.append("</sheetData>")
    if autofilter and ncols:
        parts.append(f'<autoFilter ref="A1:{col_letter(ncols - 1)}{nrows + 1}"/>')
    parts.append("</worksheet>")
    sheet_xml = "".join(parts)

    workbook_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape(sheet)}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook_xml)
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out: list[str] = []
    for si in root.findall(f"{_NS}si"):
        # plain <t> or rich-text runs <r><t>
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _first_sheet_name(zf: zipfile.ZipFile) -> str:
    names = zf.namelist()
    for cand in ("xl/worksheets/sheet1.xml",):
        if cand in names:
            return cand
    sheets = sorted(n for n in names if re.match(r"xl/worksheets/sheet\d+\.xml$", n))
    if not sheets:
        raise ValueError("no worksheet part in workbook")
    return sheets[0]


def _cell_value(c: ET.Element, shared: list[str]) -> str | None:
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        if is_el is None:
            return None
        return "".join(x.text or "" for x in is_el.iter(f"{_NS}t"))
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return "True" if v.text.strip() == "1" else "False"
    if t in ("str", "e"):
        return v.text
    # numeric: render integers without a trailing .0 (pandas dtype=str shape)
    txt = v.text
    try:
        f = float(txt)
        if f.is_integer() and "e" not in txt.lower():
            return str(int(f))
    except ValueError:
        pass
    return txt


def read_xlsx(path: str) -> tuple[list[str], list[list[str | None]]]:
    """Read the first worksheet; row 1 is the header. All values come
    back as str (or None for blank cells) — the reference's
    ``pd.read_excel(dtype=str)`` contract (match_labs.py:55)."""
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        root = ET.fromstring(zf.read(_first_sheet_name(zf)))
    rows_el = root.find(f"{_NS}sheetData")
    grid: list[list[str | None]] = []
    width = 0
    if rows_el is not None:
        for row in rows_el.findall(f"{_NS}row"):
            # the r attributes are OPTIONAL in the OOXML spec: a row
            # without one is the next row, and skipped r values are
            # empty rows (a sparse sheet must not shift data up
            # against the header)
            r_attr = row.get("r")
            if r_attr and r_attr.isdigit():
                while len(grid) < int(r_attr) - 1:
                    grid.append([])
            cells: list[str | None] = []
            for c in row.findall(f"{_NS}c"):
                ref = c.get("r")
                if ref and _CELL_REF_RE.match(ref):
                    ci = _col_index(ref)
                else:
                    # missing cell ref ⇒ position is implied: the
                    # column after the previous cell in this row
                    ci = len(cells)
                while len(cells) < ci:
                    cells.append(None)
                val = _cell_value(c, shared)
                if len(cells) == ci:
                    cells.append(val)
                else:
                    cells[ci] = val
            width = max(width, len(cells))
            grid.append(cells)
    if not grid:
        return [], []
    for cells in grid:
        cells.extend([None] * (width - len(cells)))
    header = [h if h is not None else f"col{i}" for i, h in enumerate(grid[0])]
    return header, grid[1:]
