"""S3/S7 Excel codec tests: pure-stdlib OOXML round-trips, the
reference's dtype=str contract (match_labs.py:55), and the report
sheet shape (freeze panes + autofilter, match_labs.py:116-123)."""

from __future__ import annotations

import zipfile

from pids_drg_esoa_spark.sources.readers import read_excel_df
from pids_drg_esoa_spark.sources.writers import write_excel_report
from pids_drg_esoa_spark.sources.xlsx import col_letter, read_xlsx, write_xlsx


def test_col_letter():
    assert [col_letter(i) for i in (0, 1, 25, 26, 27, 51, 52, 701, 702)] == [
        "A", "B", "Z", "AA", "AB", "AZ", "BA", "ZZ", "AAA",
    ]


def test_roundtrip_dtype_str(tmp_path):
    p = str(tmp_path / "t.xlsx")
    cols = ["ITEM_NUMBER", "DESC", "QTY", "FLAG", "NOTE"]
    rows = [
        ("001", "PARACETAMOL 500 MG", 12, True, None),
        ("002", 'NaCl 0.9% <IV> & "free"', 3.5, False, " leading space"),
        ("003", "CO-AMOXICLAV 228.5MG/5ML", "275", True, "ok"),
    ]
    write_xlsx(p, cols, rows)
    h, r = read_xlsx(p)
    assert h == cols
    # dtype=str: everything strings, leading zeros and whitespace kept
    assert r[0] == ["001", "PARACETAMOL 500 MG", "12", "True", None]
    assert r[1] == ["002", 'NaCl 0.9% <IV> & "free"', "3.5", "False", " leading space"]
    assert r[2][2] == "275"


def test_roundtrip_sparse_unicode_empty(tmp_path):
    p = str(tmp_path / "u.xlsx")
    write_xlsx(p, ["a", "b", "c"], [(None, "é", None), ("x", None, "z")])
    h, r = read_xlsx(p)
    assert r == [[None, "é", None], ["x", None, "z"]]
    e = str(tmp_path / "e.xlsx")
    write_xlsx(e, [], [])
    assert read_xlsx(e) == ([], [])


def test_sheet_has_freeze_and_autofilter(tmp_path):
    p = str(tmp_path / "t.xlsx")
    write_xlsx(p, ["a", "b"], [("1", "2"), ("3", "4")])
    xml = zipfile.ZipFile(p).read("xl/worksheets/sheet1.xml").decode()
    assert 'state="frozen"' in xml and 'ySplit="1"' in xml
    assert '<autoFilter ref="A1:B3"/>' in xml


def test_shared_strings_variant(tmp_path):
    """Reader must handle workbooks written by OTHER tools that use the
    sharedStrings table (t=\"s\") rather than inline strings."""
    p = str(tmp_path / "s.xlsx")
    ct = (
        '<?xml version="1.0"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
        "</Types>"
    )
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    sst = f'<sst {ns} count="3" uniqueCount="3"><si><t>name</t></si><si><t>abc</t></si><si><r><t>ri</t></r><r><t>ch</t></r></si></sst>'
    sheet = (
        f"<worksheet {ns}><sheetData>"
        '<row r="1"><c r="A1" t="s"><v>0</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>1</v></c></row>'
        '<row r="3"><c r="A3" t="s"><v>2</v></c></row>'
        '<row r="4"><c r="A4"><v>42</v></c></row>'
        '<row r="5"><c r="A5"><v>2.5</v></c></row>'
        "</sheetData></worksheet>"
    )
    wb = (
        f'<workbook {ns} xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="x" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    root_rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("[Content_Types].xml", ct)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    h, r = read_xlsx(p)
    assert h == ["name"]
    # rich-text si concatenates runs; ints render without trailing .0
    assert r == [["abc"], ["rich"], ["42"], ["2.5"]]


def test_read_excel_df_spark(spark, tmp_path):
    p = str(tmp_path / "diag.xlsx")
    write_xlsx(p, ["code", "desc"], [("001", "CBC"), ("002", None)])
    df = read_excel_df(spark, p)
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string", "string"]
    got = {tuple(r) for r in df.collect()}
    assert got == {("001", "CBC"), ("002", None)}


def test_write_excel_report_spark(spark, tmp_path):
    p = str(tmp_path / "report.xlsx")
    df = spark.createDataFrame([("001", 5), ("002", 7)], ["item", "n"])
    assert write_excel_report(df, p, sheet="matched") is True
    h, r = read_xlsx(p)
    assert h == ["item", "n"]
    assert sorted(r) == [["001", "5"], ["002", "7"]]


def test_read_xlsx_optional_refs_and_sparse_rows(tmp_path):
    """OOXML r attributes are optional: unref'd cells take the next
    implied column, and a skipped row r leaves an empty row instead of
    shifting data up against the header."""
    import zipfile

    from pids_drg_esoa_spark.sources.xlsx import read_xlsx, write_xlsx

    path = str(tmp_path / "sparse.xlsx")
    write_xlsx(path, ["a", "b"], [("x", "y"), ("p", "q")])
    # rewrite sheet1: strip cell refs from row 2, jump row 3 -> r=4
    with zipfile.ZipFile(path) as zf:
        names = {n: zf.read(n) for n in zf.namelist()}
    sheet = names["xl/worksheets/sheet1.xml"].decode()
    sheet = sheet.replace('<c r="A2" t="inlineStr">', '<c t="inlineStr">')
    sheet = sheet.replace('<c r="B2" t="inlineStr">', '<c t="inlineStr">')
    sheet = sheet.replace('<row r="3">', '<row r="4">')
    names["xl/worksheets/sheet1.xml"] = sheet.encode()
    with zipfile.ZipFile(path, "w") as zf:
        for n, data in names.items():
            zf.writestr(n, data)

    header, rows = read_xlsx(path)
    assert header == ["a", "b"]
    assert rows == [["x", "y"], [None, None], ["p", "q"]]
