"""S5/S6 — real .xlsx read/write with the standard library only.

Reference surface: ``pandas.read_excel(header=1)`` + drop ``Unnamed``
columns + date parse (Narrative_Miners/src/tool.py:10-26) and the
multi-sheet ``ExcelManager`` writer (ThematicScreener.ipynb cell 34).
The pinned environment has no openpyxl/xlsxwriter, so this module
implements the minimal OOXML (SpreadsheetML) subset those call sites
need: zipfile + xml.etree over ``xl/workbook.xml``, ``sharedStrings``,
styles (for date detection) and per-sheet cell grids; the writer emits
inline-string cells plus a tiny styles part for date formats.

Scale position: spreadsheets are a DRIVER-EDGE format by nature (MBs,
human-authored). Reads land in ``spark.createDataFrame`` and writes pass
through the bounded-sink guardrail — the same shape the reference uses
pandas for. Fact-scale data never flows through here.
"""

from __future__ import annotations

import datetime as _dt
import re
import zipfile
from collections.abc import Mapping, Sequence
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_DOC_REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"

# built-in numFmtIds that render as dates/times (ECMA-376 §18.8.30)
_DATE_NUMFMT_IDS = set(range(14, 23)) | set(range(45, 48))
_EPOCH = _dt.datetime(1899, 12, 30)  # 1900 system incl. the Lotus leap quirk


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'AB7' -> 27."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - 64)
    return idx - 1


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def _serial_to_datetime(serial: float) -> _dt.datetime:
    return _EPOCH + _dt.timedelta(days=serial)


def _datetime_to_serial(value: _dt.datetime | _dt.date) -> float:
    if isinstance(value, _dt.datetime):
        return (value - _EPOCH).total_seconds() / 86400.0
    return float((_dt.datetime(value.year, value.month, value.day) - _EPOCH).days)


def _parse_shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ET.fromstring(data).iter(f"{_NS}si"):
        # plain <t> or rich-text runs <r><t>..</t></r>
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _parse_date_styles(zf: zipfile.ZipFile) -> set[int]:
    """Style indexes (cell s= attribute) whose number format is a date."""
    try:
        data = zf.read("xl/styles.xml")
    except KeyError:
        return set()
    root = ET.fromstring(data)
    custom_date_ids = set()
    for fmt in root.iter(f"{_NS}numFmt"):
        code = re.sub(r'"[^"]*"|\[[^]]*\]', "", fmt.get("formatCode", ""))
        if re.search(r"[ymdhs]", code, re.IGNORECASE):
            custom_date_ids.add(int(fmt.get("numFmtId")))
    date_styles = set()
    xfs = root.find(f"{_NS}cellXfs")
    if xfs is not None:
        for i, xf in enumerate(xfs.findall(f"{_NS}xf")):
            fmt_id = int(xf.get("numFmtId", "0"))
            if fmt_id in _DATE_NUMFMT_IDS or fmt_id in custom_date_ids:
                date_styles.add(i)
    return date_styles


def _sheet_targets(zf: zipfile.ZipFile) -> dict[str, str]:
    """{sheet name: zip member path} in workbook order."""
    rels = {
        rel.get("Id"): rel.get("Target")
        for rel in ET.fromstring(zf.read("xl/_rels/workbook.xml.rels")).iter(
            f"{_REL_NS}Relationship"
        )
    }
    out: dict[str, str] = {}
    for sheet in ET.fromstring(zf.read("xl/workbook.xml")).iter(f"{_NS}sheet"):
        target = rels[sheet.get(f"{_DOC_REL}id")].lstrip("/")
        if not target.startswith("xl/"):
            target = f"xl/{target}"
        out[sheet.get("name")] = target
    return out


def _cell_value(cell, shared: list[str], date_styles: set[int]):
    t = cell.get("t", "n")
    if t == "inlineStr":
        is_el = cell.find(f"{_NS}is")
        return "".join(tt.text or "" for tt in is_el.iter(f"{_NS}t")) if is_el is not None else None
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    raw = v.text
    if t == "s":
        return shared[int(raw)]
    if t == "str":
        return raw
    if t == "b":
        return raw == "1"
    if t == "e":
        return None
    num = float(raw)
    if int(cell.get("s", "-1")) in date_styles:
        return _serial_to_datetime(num)
    return int(num) if num.is_integer() else num


def read_xlsx_rows(path: str, sheet: str | int | None = None) -> list[list]:
    """One sheet of an .xlsx as a dense list-of-rows grid (None-padded).

    ``sheet``: name, 0-based index, or None for the first sheet.
    """
    with zipfile.ZipFile(path) as zf:
        targets = _sheet_targets(zf)
        if sheet is None:
            sheet = 0
        if isinstance(sheet, int):
            name = list(targets)[sheet]
        else:
            name = sheet
            if name not in targets:
                raise KeyError(f"sheet {name!r} not in {list(targets)}")
        shared = _parse_shared_strings(zf)
        date_styles = _parse_date_styles(zf)
        rows: list[list] = []
        width = 0
        for row in ET.fromstring(zf.read(targets[name])).iter(f"{_NS}row"):
            r: list = []
            for cell in row.findall(f"{_NS}c"):
                ref = cell.get("r")
                ci = _col_index(ref) if ref else len(r)
                while len(r) < ci:
                    r.append(None)
                r.append(_cell_value(cell, shared, date_styles))
            width = max(width, len(r))
            rows.append(r)
        for r in rows:
            r.extend([None] * (width - len(r)))
        return rows


def sheet_names(path: str) -> list[str]:
    with zipfile.ZipFile(path) as zf:
        return list(_sheet_targets(zf))


def read_excel_sheet(
    spark: SparkSession,
    path: str,
    source_name: str,
    sheet: str | int | None = None,
    header_offset: int = 0,
    date_col: str | None = None,
) -> DataFrame:
    """S5 with reference semantics (tool.py:10-26 read_excel(header=1)):
    row ``header_offset`` is the header, earlier rows are junk prologue;
    unnamed/blank columns are dropped; ``date_col`` is cast to date; a
    ``source`` tag column is added. Driver-edge parse, distributed frame
    out."""
    grid = read_xlsx_rows(path, sheet)
    if len(grid) <= header_offset:
        raise ValueError(f"{path}: no header row at offset {header_offset}")
    header = ["" if h is None else str(h) for h in grid[header_offset]]
    body = grid[header_offset + 1 :]
    keep = [
        i
        for i, h in enumerate(header)
        if h and not h.lower().startswith("unnamed")
    ]
    names = [header[i] for i in keep]
    data = [[("" if row[i] is None else str(row[i])) or None for i in keep] for row in body]
    df = spark.createDataFrame(data, schema=", ".join(f"`{n}` string" for n in names))
    if date_col is not None and date_col in names:
        df = df.withColumn(date_col, F.to_date(F.col(date_col).substr(1, 10)))
    return df.withColumn("source", F.lit(source_name))


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
{sheet_overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

# styles: xf 0 = general, xf 1 = date (numFmtId 14 m/d/yy), xf 2 = datetime (22)
_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<fonts count="1"><font/></fonts><fills count="1"><fill/></fills>
<borders count="1"><border/></borders>
<cellStyleXfs count="1"><xf/></cellStyleXfs>
<cellXfs count="3"><xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/><xf numFmtId="22" applyNumberFormat="1"/></cellXfs>
</styleSheet>"""


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, _dt.datetime):
        return f'<c r="{ref}" s="2"><v>{_datetime_to_serial(value)!r}</v></c>'
    if isinstance(value, _dt.date):
        return f'<c r="{ref}" s="1"><v>{_datetime_to_serial(value)!r}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    text = escape(str(value))
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{text}</t></is></c>'


def write_xlsx(sheets: Mapping[str, tuple[Sequence[str], Sequence[Sequence]]], path: str) -> None:
    """Write {sheet_name: (column_names, rows)} as one .xlsx file.

    Byte-reproducible: identical sheets yield an identical file. A bare
    ``writestr(name, ...)`` stamps wall-clock time into each zip entry's
    header, so two runs of the same pipeline would differ — every entry
    is written through a ZipInfo pinned to the DOS epoch instead (the
    same trick reproducible-build tooling uses for jars/wheels).
    """
    if not sheets:
        raise ValueError("write_xlsx requires at least one sheet")
    names = list(sheets)

    def _entry(name: str) -> zipfile.ZipInfo:
        zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
        zi.compress_type = zipfile.ZIP_DEFLATED
        zi.external_attr = 0o644 << 16
        return zi

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        overrides = "\n".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        zf.writestr(_entry("[Content_Types].xml"), _CONTENT_TYPES.format(sheet_overrides=overrides))
        zf.writestr(_entry("_rels/.rels"), _ROOT_RELS)
        sheet_tags = "".join(
            # attribute context: escape() alone leaves double quotes,
            # which would terminate the name="..." attribute early
            f'<sheet name="{escape(n, {chr(34): "&quot;"})}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names)
        )
        zf.writestr(
            _entry("xl/workbook.xml"),
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{sheet_tags}</sheets></workbook>",
        )
        rels = "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        ) + (
            f'<Relationship Id="rId{len(names) + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" '
            'Target="styles.xml"/>'
        )
        zf.writestr(
            _entry("xl/_rels/workbook.xml.rels"),
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            f"{rels}</Relationships>",
        )
        zf.writestr(_entry("xl/styles.xml"), _STYLES)
        for i, n in enumerate(names):
            cols, rows = sheets[n]
            parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>']
            parts.append(
                '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            )
            parts.append("<sheetData>")
            header_cells = "".join(
                _cell_xml(f"{_col_letter(ci)}1", c) for ci, c in enumerate(cols)
            )
            parts.append(f'<row r="1">{header_cells}</row>')
            for ri, row in enumerate(rows, start=2):
                cells = "".join(
                    _cell_xml(f"{_col_letter(ci)}{ri}", v) for ci, v in enumerate(row)
                )
                parts.append(f'<row r="{ri}">{cells}</row>')
            parts.append("</sheetData></worksheet>")
            zf.writestr(_entry(f"xl/worksheets/sheet{i + 1}.xml"), "".join(parts))
