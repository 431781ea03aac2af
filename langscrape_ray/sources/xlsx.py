"""Native xlsx read/write via stdlib zipfile + XML — no openpyxl.

S11's flat side (reference: /root/reference/notebooks/json_to_xlsx.ipynb,
xlsx_to_jsonl.ipynb) is a spreadsheet.  xlsx is OOXML: a zip archive of
XML parts, so the stdlib covers the REAL binary format:

- ``xlsx_bytes(table)`` writes a minimal single-sheet workbook
  ([Content_Types].xml, _rels, workbook, sheet1) with a header row;
  strings are inline (``t="inlineStr"`` — no sharedStrings part needed),
  ints/floats are native number cells.  Zip entries carry a FIXED
  timestamp so the bytes are deterministic (oracle- and cache-friendly).
- ``read_xlsx_bytes(data)`` parses sheet1.xml back to a pyarrow Table;
  the header row names the columns.  Number cells parse as int64 when
  the stored lexical form has no '.'/exponent, else float64 — xlsx
  itself is untyped-numeric, so this is the documented round-trip rule.

Both run inside ``map_batches`` workers (bytes in block memory, nothing
driver-side); ``write_xlsx``/``read_xlsx`` are thin file wrappers for the
sink use.  Interop sanity: the part layout matches ECMA-376 minimal
conformance, so external tools open these files.
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import Dict, List
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import pyarrow as pa

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
# fixed timestamp => byte-deterministic archives (zip stores local mtime)
_ZIP_DATE = (2020, 1, 1, 0, 0, 0)

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="{_NS}" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""

_INT_RE = re.compile(r"^-?\d+$")


def col_letter(idx: int) -> str:
    """0-based column index -> A1-notation letters (0->A, 25->Z, 26->AA)."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _letters_to_idx(ref: str) -> int:
    """Leading letters of a cell ref -> 0-based column index."""
    n = 0
    for ch in ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return f'<c r="{ref}"/>'
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{escape(str(value))}</t></is></c>'


def xlsx_bytes(table: pa.Table) -> bytes:
    """Serialize a pyarrow Table to deterministic xlsx bytes (header row +
    one row per record, single sheet)."""
    names = table.column_names
    rows_xml: List[str] = []
    header = "".join(
        _cell_xml(f"{col_letter(c)}1", n) for c, n in enumerate(names)
    )
    rows_xml.append(f'<row r="1">{header}</row>')
    cols = [table[n].to_pylist() for n in names]
    for r in range(table.num_rows):
        cells = "".join(
            _cell_xml(f"{col_letter(c)}{r + 2}", cols[c][r])
            for c in range(len(names))
        )
        rows_xml.append(f'<row r="{r + 2}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS}"><sheetData>{"".join(rows_xml)}</sheetData></worksheet>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, data in (
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("_rels/.rels", _ROOT_RELS),
            ("xl/workbook.xml", _WORKBOOK),
            ("xl/_rels/workbook.xml.rels", _WB_RELS),
            ("xl/worksheets/sheet1.xml", sheet),
        ):
            info = zipfile.ZipInfo(name, date_time=_ZIP_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o600 << 16
            z.writestr(info, data)
    return buf.getvalue()


def read_xlsx_bytes(data: bytes) -> pa.Table:
    """Parse xlsx bytes back to a pyarrow Table (first sheet, row 1 =
    header).  Number cells with integer lexical form -> int64, else
    float64; inline/shared strings -> string; boolean -> bool; a column
    mixing ints and floats lands float64."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        sheet_xml = z.read("xl/worksheets/sheet1.xml")
        shared: List[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sroot = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sroot.findall(f"{{{_NS}}}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{{{_NS}}}t")))
    root = ET.fromstring(sheet_xml)
    raw_rows: List[Dict[int, object]] = []
    n_cols = 0
    for row in root.iter(f"{{{_NS}}}row"):
        cells: Dict[int, object] = {}
        for ci, cell in enumerate(row.findall(f"{{{_NS}}}c")):
            ref = cell.get("r")
            idx = _letters_to_idx(ref) if ref else ci
            t = cell.get("t", "n")
            if t == "inlineStr":
                is_el = cell.find(f"{{{_NS}}}is")
                val = (
                    "".join(x.text or "" for x in is_el.iter(f"{{{_NS}}}t"))
                    if is_el is not None
                    else None
                )
            else:
                v_el = cell.find(f"{{{_NS}}}v")
                if v_el is None or v_el.text is None:
                    val = None
                elif t == "s":
                    val = shared[int(v_el.text)]
                elif t == "b":
                    val = v_el.text == "1"
                elif t == "str":
                    val = v_el.text
                else:  # numeric
                    txt = v_el.text
                    val = int(txt) if _INT_RE.match(txt) else float(txt)
            cells[idx] = val
            n_cols = max(n_cols, idx + 1)
        raw_rows.append(cells)
    if not raw_rows:
        return pa.table({})
    header = [str(raw_rows[0].get(c, f"col{c}")) for c in range(n_cols)]
    body = raw_rows[1:]
    arrays = {}
    for c, name in enumerate(header):
        vals = [r.get(c) for r in body]
        present = [v for v in vals if v is not None]
        if present and all(isinstance(v, bool) for v in present):
            typ = pa.bool_()
        elif present and all(isinstance(v, int) and not isinstance(v, bool) for v in present):
            typ = pa.int64()
        elif present and all(
            isinstance(v, (int, float)) and not isinstance(v, bool) for v in present
        ):
            typ = pa.float64()
            vals = [float(v) if v is not None else None for v in vals]
        else:
            typ = pa.string()
            vals = [str(v) if v is not None else None for v in vals]
        arrays[name] = pa.array(vals, typ)
    return pa.table(arrays)


def write_xlsx(table: pa.Table, path: str) -> None:
    with open(path, "wb") as f:
        f.write(xlsx_bytes(table))


def read_xlsx(path: str) -> pa.Table:
    with open(path, "rb") as f:
        return read_xlsx_bytes(f.read())
