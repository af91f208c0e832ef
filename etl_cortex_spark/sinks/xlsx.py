"""Multi-sheet XLSX sink (SURVEY §2 rows A18/A20-A22).

Reference: ``df_to_xlsx_bytes`` (``/root/reference/app.py:35-134``) —
one sheet per dict entry, frozen header row, ``#,##0.00`` float /
``#,##0`` int number formats, column widths estimated from a ≤1000-row
sample, 31-char sheet names, empty summary sheets suppressed
(app.py:272-278).

xlsxwriter/openpyxl are not installed here, so the writer emits the
OOXML parts directly (zipfile + hand-built XML) — ~the same work those
libraries do, minus their API surface. Inline strings are used instead
of a shared-string table: simpler, and for write-once export files the
size difference is noise.

Excel is not a distributed format (SURVEY A20): the sink materializes
each sheet on the driver via Arrow ``toPandas``. Gold outputs are
small summaries by construction; ``max_rows`` guards against someone
pointing this at a fact table. The one distributable part — the
column-width estimate — stays on the already-collected sample, same
bound as the reference (app.py:44,79-80).
"""

from __future__ import annotations

import io
import re
import zipfile
from datetime import date, datetime
from typing import Mapping
from xml.sax.saxutils import escape

import numpy as np
import pandas as pd

_EXCEL_EPOCH = datetime(1899, 12, 30)
_INVALID_SHEET = re.compile(r"[\[\]:*?/\\]")
#: XML-1.0-illegal control characters — Excel rejects them verbatim;
#: strip like openpyxl does.
_ILLEGAL_XML = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")


def _xml_text(value) -> str:
    """Escape a value for XML text content, stripping illegal chars."""
    return escape(_ILLEGAL_XML.sub("", str(value)))


def _xml_attr(value: str) -> str:
    """Escape a value for an XML attribute (quotes included)."""
    return escape(_ILLEGAL_XML.sub("", str(value)), {'"': "&quot;"})

# cellXfs style indices (written in _STYLES below)
_XF_DEFAULT, _XF_FLOAT, _XF_INT, _XF_DATETIME, _XF_HEADER = 0, 1, 2, 3, 4

_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<numFmts count="1"><numFmt numFmtId="164" formatCode="yyyy\\-mm\\-dd\\ hh:mm:ss"/></numFmts>
<fonts count="2"><font><sz val="11"/><name val="Calibri"/></font>
<font><b/><sz val="11"/><name val="Calibri"/></font></fonts>
<fills count="2"><fill><patternFill patternType="none"/></fill>
<fill><patternFill patternType="gray125"/></fill></fills>
<borders count="1"><border/></borders>
<cellStyleXfs count="1"><xf/></cellStyleXfs>
<cellXfs count="5">
<xf numFmtId="0" fontId="0" applyNumberFormat="0"/>
<xf numFmtId="4" fontId="0" applyNumberFormat="1"/>
<xf numFmtId="3" fontId="0" applyNumberFormat="1"/>
<xf numFmtId="164" fontId="0" applyNumberFormat="1"/>
<xf numFmtId="0" fontId="1" applyFont="1"/>
</cellXfs></styleSheet>"""


def _sheet_name(name: str, used: set[str]) -> str:
    """Sanitize + truncate to Excel's 31-char limit, dedup collisions."""
    clean = _INVALID_SHEET.sub("_", str(name))[:31] or "Sheet"
    base, i = clean, 1
    while clean in used:
        suffix = f"_{i}"
        clean, i = base[: 31 - len(suffix)] + suffix, i + 1
    used.add(clean)
    return clean


def _col_ref(idx: int) -> str:
    """0 → 'A', 27 → 'AB'."""
    ref = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        ref = chr(ord("A") + rem) + ref
    return ref


def _flatten_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    """MultiIndex columns → 'a - b' strings; named index → column
    (app.py:59-64). Spark frames never hit these, pandas ones can."""
    if isinstance(pdf.columns, pd.MultiIndex):
        pdf = pdf.copy()
        pdf.columns = [
            " - ".join(str(p) for p in tup if str(p) != "") for tup in pdf.columns
        ]
    if pdf.index.name is not None or isinstance(pdf.index, pd.MultiIndex):
        pdf = pdf.reset_index()
    return pdf


def _cell_xml(ref: str, value) -> str:
    if isinstance(value, np.generic):  # itertuples yields numpy scalars
        value = value.item()
    # scalar missing markers: None, float NaN, pd.NaT, pd.NA (nullable
    # dtypes) — containers are never "na", route them to the str branch
    if value is None or (
        not isinstance(value, (list, tuple, dict, set, np.ndarray, bytes))
        and pd.isna(value)
    ):
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (datetime, pd.Timestamp)):
        serial = (value.to_pydatetime() if isinstance(value, pd.Timestamp) else value)
        serial = serial.replace(tzinfo=None)
        days = (serial - _EXCEL_EPOCH).total_seconds() / 86400.0
        return f'<c r="{ref}" s="{_XF_DATETIME}"><v>{days!r}</v></c>'
    if isinstance(value, date):
        days = (datetime(value.year, value.month, value.day) - _EXCEL_EPOCH).days
        return f'<c r="{ref}" s="{_XF_DATETIME}"><v>{days}</v></c>'
    if isinstance(value, int):
        return f'<c r="{ref}" s="{_XF_INT}"><v>{value}</v></c>'
    if isinstance(value, float):
        if value != value or value in (float("inf"), float("-inf")):
            return ""  # xlsx numerics have no NaN/inf representation
        return f'<c r="{ref}" s="{_XF_FLOAT}"><v>{value!r}</v></c>'
    text = _xml_text(value)
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{text}</t></is></c>'


def _col_widths(pdf: pd.DataFrame, sample_rows: int) -> list[float]:
    """Max rendered length over header + ≤sample rows, padded, capped —
    the reference's estimate (app.py:79-98) without a full scan.
    Positional iloc access: duplicate column names (possible after a
    MultiIndex flatten) must not fan out to multi-column selections."""
    sample = pdf.head(sample_rows)
    widths = []
    for i, c in enumerate(pdf.columns):
        longest = len(str(c))
        if len(sample):
            longest = max(longest, int(sample.iloc[:, i].astype(str).str.len().max()))
        widths.append(min(longest + 2, 60))
    return widths


def _sheet_xml(pdf: pd.DataFrame, sample_rows: int) -> str:
    cols = "".join(
        f'<col min="{i + 1}" max="{i + 1}" width="{w}" customWidth="1"/>'
        for i, w in enumerate(_col_widths(pdf, sample_rows))
    )
    header_cells = "".join(
        f'<c r="{_col_ref(j)}1" t="inlineStr" s="{_XF_HEADER}">'
        f'<is><t xml:space="preserve">{_xml_text(c)}</t></is></c>'
        for j, c in enumerate(pdf.columns)
    )
    body = [f'<row r="1">{header_cells}</row>']
    values = pdf.itertuples(index=False, name=None)
    for i, row in enumerate(values, start=2):
        cells = "".join(
            _cell_xml(f"{_col_ref(j)}{i}", v) for j, v in enumerate(row)
        )
        body.append(f'<row r="{i}">{cells}</row>')
    cols_xml = f"<cols>{cols}</cols>" if cols else ""
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<sheetViews><sheetView workbookViewId="0">'
        '<pane ySplit="1" topLeftCell="A2" activePane="bottomLeft" state="frozen"/>'
        "</sheetView></sheetViews>"
        f"{cols_xml}<sheetData>{''.join(body)}</sheetData></worksheet>"
    )


def df_to_xlsx_bytes(
    sheets: Mapping[str, object],
    sample_for_width: int = 1000,
    max_rows: int = 1_048_575,
    drop_empty_after_first: bool = True,
) -> bytes:
    """Render a dict of DataFrames (Spark or pandas) to xlsx bytes.

    A18 (app.py:272-278): summary sheets after the first are dropped
    when empty; the first (base) sheet is always written.
    """
    pdfs: dict[str, pd.DataFrame] = {}
    for i, (name, df) in enumerate(sheets.items()):
        pdf = df if isinstance(df, pd.DataFrame) else df.limit(max_rows).toPandas()
        pdf = _flatten_frame(pdf).iloc[:max_rows]  # cap pandas inputs too
        if drop_empty_after_first and i > 0 and len(pdf) == 0:
            continue
        pdfs[name] = pdf
    if not pdfs:
        raise ValueError("no non-empty sheets to write")

    used: set[str] = set()
    names = {raw: _sheet_name(raw, used) for raw in pdfs}

    sheet_entries = "".join(
        f'<sheet name="{_xml_attr(names[raw])}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, raw in enumerate(pdfs)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{sheet_entries}</sheets></workbook>"
    )
    n = len(pdfs)
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(n)
        )
        + f'<Relationship Id="rId{n + 1}" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/styles" Target="styles.xml"/>'
        "</Relationships>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/styles.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(n)
        )
        + "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/styles.xml", _STYLES)
        for i, pdf in enumerate(pdfs.values()):
            z.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                _sheet_xml(pdf, sample_for_width),
            )
    return buf.getvalue()
