"""Result export — csv / jsonl / xlsx / parquet sinks.

Capability parity with the reference's ``\\s`` export
(reference: localsql/localsql.py:171-193, writers at :179-184: csv, jsonl
with ``orient='records', lines=True``, xlsx).

Scale note: csv/json/parquet go through ``df.write`` (distributed, one file
per partition; pass ``single_file=True`` to coalesce for the reference's
one-file ergonomics on small results).  xlsx is driver-side pandas by nature —
guarded by a row-count cap so a 100 TB result can't be collected by accident.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame

XLSX_MAX_ROWS = 1_000_000  # hard Excel sheet limit is 1,048,576


def export_result(df: DataFrame, path: str | Path, *,
                  single_file: bool = True) -> str:
    """Write ``df`` to ``path``; format from the extension (csv / json /
    jsonl / xlsx / parquet), mirroring the reference's format dispatch
    (localsql/localsql.py:174-184)."""
    path = str(path)
    ext = Path(path).suffix.lstrip(".").lower()
    if ext == "csv":
        if single_file:
            _write_single_file(df, path, "csv",
                               writer_opts={"header": True})
        else:
            df.write.mode("overwrite").option("header", True).csv(path)
    elif ext in ("json", "jsonl", "ndjson"):
        if single_file:
            _write_single_file(df, path, "json")
        else:
            df.write.mode("overwrite").json(path)
    elif ext == "xlsx":
        n = df.limit(XLSX_MAX_ROWS + 1).count()
        if n > XLSX_MAX_ROWS:
            raise ValueError(f"result exceeds xlsx row limit ({XLSX_MAX_ROWS})")
        pdf = df.toPandas()
        try:
            pdf.to_excel(path, index=False)  # pandas needs openpyxl for this
        except ImportError:
            _write_xlsx_stdlib(pdf, path)
    elif ext == "parquet":
        df.write.mode("overwrite").parquet(path)
    elif ext == "orc":
        df.write.mode("overwrite").orc(path)
    elif ext == "xml":
        # Spark 4 native xml sink (one <row> element per record)
        (df.write.mode("overwrite").format("xml")
         .option("rootTag", "rows").option("rowTag", "row").save(path))
    else:
        raise ValueError(f"unsupported export format {ext!r}")
    return path


def _write_single_file(df: DataFrame, path: str, fmt: str,
                       writer_opts: dict | None = None) -> None:
    """Write ONE plain file at ``path`` (reference \\s semantics): Spark
    writes a 1-partition directory to a temp location, then the single part
    file moves to the target. Guarded by coalesce(1) — only for results that
    fit one writer; use single_file=False for big distributed exports."""
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="export_")
    out_dir = f"{tmp}/out"
    writer = df.coalesce(1).write.mode("overwrite")
    for k, v in (writer_opts or {}).items():
        writer = writer.option(k, v)
    getattr(writer, fmt)(out_dir)
    part = next(p for p in Path(out_dir).iterdir()
                if p.name.startswith("part-"))
    shutil.move(str(part), path)
    shutil.rmtree(tmp, ignore_errors=True)


def _write_xlsx_stdlib(pdf, path: str) -> None:
    """Minimal single-sheet xlsx writer (zipfile + SpreadsheetML) used when
    openpyxl is absent — mirror of the stdlib reader in sources/readers.py.
    Strings as inline strings, numbers as numbers, None as empty."""
    import zipfile
    from xml.sax.saxutils import escape

    def col_ref(i: int) -> str:
        out = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            out = chr(65 + r) + out
        return out

    def cell(ri: int, ci: int, v) -> str:
        ref = f"{col_ref(ci)}{ri}"
        if hasattr(v, "item"):  # numpy scalar -> python scalar
            v = v.item()
        if v is None or (isinstance(v, float) and v != v):
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        return (f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(v))}</t>'
                '</is></c>')

    rows_xml = []
    header = f'<row r="1">{"".join(cell(1, i, c) for i, c in enumerate(pdf.columns))}</row>'
    rows_xml.append(header)
    for r, tup in enumerate(pdf.itertuples(index=False, name=None), start=2):
        rows_xml.append(
            f'<row r="{r}">{"".join(cell(r, i, v) for i, v in enumerate(tup))}</row>')
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (f'<?xml version="1.0"?><worksheet xmlns="{ns}">'
             f'<sheetData>{"".join(rows_xml)}</sheetData></worksheet>')
    ct = ('<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats'
          '.org/package/2006/content-types">'
          '<Default Extension="xml" ContentType="application/xml"/>'
          '<Default Extension="rels" ContentType="application/vnd.openxml'
          'formats-package.relationships+xml"/>'
          '<Override PartName="/xl/workbook.xml" ContentType="application/'
          'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
          '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="appl'
          'ication/vnd.openxmlformats-officedocument.spreadsheetml.workshee'
          't+xml"/></Types>')
    wb = (f'<?xml version="1.0"?><workbook xmlns="{ns}" xmlns:r="http://sch'
          'emas.openxmlformats.org/officeDocument/2006/relationships">'
          '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>'
          '</workbook>')
    rels = ('<?xml version="1.0"?><Relationships xmlns="http://schemas.open'
            'xmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId0" Type="http://schemas.openxmlformats.or'
            'g/officeDocument/2006/relationships/officeDocument" Target="xl'
            '/workbook.xml"/></Relationships>')
    wbrels = ('<?xml version="1.0"?><Relationships xmlns="http://schemas.op'
              'enxmlformats.org/package/2006/relationships">'
              '<Relationship Id="rId1" Type="http://schemas.openxmlformats.'
              'org/officeDocument/2006/relationships/worksheet" Target="wor'
              'ksheets/sheet1.xml"/></Relationships>')
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", rels)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", wbrels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
