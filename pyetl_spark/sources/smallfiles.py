"""Excel (xlsx) and dBASE (dbf) ingest/egress — the reference's
``formats/fichiers/format_excel.py`` / ``format_dbf.py`` surfaces.

Both are driver-side small-file formats (a spreadsheet has no 100 TB story):
parse on the driver → ``spark.createDataFrame`` for reads; ``collect()`` →
serialize for writes. Distribution-scale ingest stays with the columnar /
text formats in :mod:`pyetl_spark.sources.io`; these exist because real
pyetl users ingest xlsx/dbf constantly (reference format_excel.py uses
openpyxl, format_dbf.py parses the dBASE header by hand — same approach
here, self-contained because the sandbox ships neither openpyxl nor
dbfread).

- xlsx: minimal ECMA-376 / OOXML — a zip holding sheet XML. The reader
  handles shared strings (``t="s"``), inline strings (``t="inlineStr"``),
  formula-cached strings (``t="str"``), booleans and numbers; the writer
  emits inline strings only (no sharedStrings part needed).
- dbf: dBASE III header + fixed-width records (version byte 0x03, 32-byte
  field descriptors, 0x0D terminator, deletion-flag records, 0x1A EOF).

Per pyetl's type model ("tous les attributs sont stockes en texte",
objet.py:523) every value surfaces as a string column; the schema layer
(:mod:`pyetl_spark.schema`) re-infers and casts.
"""

from __future__ import annotations

import os
import re
import struct
import zipfile
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


# ------------------------------------------------------------------ xlsx read


def _col_index(cell_ref: str) -> int:
    """'BC12' → 0-based column index (54)."""
    n = 0
    for ch in cell_ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _cell_value(c: ET.Element, shared: list[str]) -> str | None:
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        return "".join(x.text or "" for x in is_el.iter(f"{_NS}t")) if is_el is not None else None
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return "true" if v.text == "1" else "false"
    return v.text  # n / str: numeric or formula-cached text, kept as text


def _read_xlsx_rows(path: str, sheet: str | None) -> list[list[str | None]]:
    with zipfile.ZipFile(path) as z:
        names = z.namelist()
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = [
                "".join(t.text or "" for t in si.iter(f"{_NS}t"))
                for si in root.iter(f"{_NS}si")
            ]
        sheet_paths = sorted(n for n in names if re.match(r"xl/worksheets/sheet\d+\.xml$", n))
        target = sheet_paths[0]
        if sheet is not None:
            # resolve by workbook sheet NAME through the r:id relationship —
            # sheetN.xml numbering does NOT track workbook order once sheets
            # have been deleted/reordered in a real editor
            rels: dict[str, str] = {}
            if "xl/_rels/workbook.xml.rels" in names:
                rroot = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
                for rel in rroot.iter():
                    rid, tgt = rel.get("Id"), rel.get("Target")
                    if rid and tgt:
                        rels[rid] = "xl/" + tgt.lstrip("/").removeprefix("xl/")
            wb = ET.fromstring(z.read("xl/workbook.xml"))
            rid_attr = (
                "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
            )
            for i, sh in enumerate(wb.iter(f"{_NS}sheet")):
                if sh.get("name") == sheet:
                    # positional fallback for minimal workbooks without a
                    # rels part (sheetN.xml in listed order)
                    fallback = (
                        sheet_paths[i] if i < len(sheet_paths) else target
                    )
                    target = rels.get(sh.get(rid_attr), fallback)
                    break
            else:
                raise ValueError(f"read_xlsx: no sheet named {sheet!r}")
        root = ET.fromstring(z.read(target))
        rows: list[list[str | None]] = []
        for row in root.iter(f"{_NS}row"):
            out: list[str | None] = []
            for c in row.iter(f"{_NS}c"):
                ref = c.get("r")
                idx = _col_index(ref) if ref else len(out)
                while len(out) < idx:
                    out.append(None)  # gap = empty cell
                out.append(_cell_value(c, shared))
            rows.append(out)
        return rows


def read_xlsx(
    spark: SparkSession,
    path: str,
    sheet: str | None = None,
    header: bool = True,
) -> DataFrame:
    """xlsx → DataFrame of strings (reference format_excel.py:1-80). First
    row is the header by default (``c1..cN`` otherwise)."""
    rows = _read_xlsx_rows(path, sheet)
    if not rows:
        return spark.createDataFrame([], "c1 string")
    width = max(len(r) for r in rows)
    rows = [r + [None] * (width - len(r)) for r in rows]
    if header:
        cols = [(h if h not in (None, "") else f"c{i + 1}") for i, h in enumerate(rows[0])]
        data = rows[1:]
    else:
        cols = [f"c{i + 1}" for i in range(width)]
        data = rows
    schema = ", ".join(f"`{c}` string" for c in cols)
    return spark.createDataFrame([tuple(r) for r in data], schema)


# ----------------------------------------------------------------- xlsx write

_XLSX_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)
_XLSX_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_XLSX_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def write_xlsx(df: DataFrame, path: str, sheet_name: str = "Sheet1") -> None:
    """DataFrame → single-sheet xlsx, inline strings (small results only —
    the data is collected on the driver, like the reference's workbook
    writer format_excel.py:83-126)."""
    cols = df.columns
    data = [[("" if v is None else str(v)) for v in row] for row in df.collect()]
    body = []
    for r_i, row in enumerate([cols, *data], start=1):
        cells = "".join(
            f'<c t="inlineStr"><is><t xml:space="preserve">{_esc(v)}</t></is></c>' for v in row
        )
        body.append(f'<row r="{r_i}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS[1:-1]}"><sheetData>{"".join(body)}</sheetData></worksheet>'
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS[1:-1]}" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{_esc(sheet_name)}" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _XLSX_CONTENT_TYPES)
        z.writestr("_rels/.rels", _XLSX_RELS)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", _XLSX_WB_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


# ------------------------------------------------------------------------ dbf


def read_dbf(spark: SparkSession, path: str, encoding: str = "cp1252") -> DataFrame:
    """dBASE III file → DataFrame of strings (reference format_dbf.py parses
    the same header layout by hand). Deleted records ('*' flag) skipped."""
    with open(path, "rb") as f:
        buf = f.read()
    n_records, header_size, record_size = struct.unpack_from("<IHH", buf, 4)
    fields: list[tuple[str, str, int]] = []  # (name, type, length)
    off = 32
    while buf[off] != 0x0D:
        name = buf[off : off + 11].split(b"\x00", 1)[0].decode("ascii", "replace")
        ftype = chr(buf[off + 11])
        length = buf[off + 16]
        fields.append((name, ftype, length))
        off += 32
    rows = []
    pos = header_size
    for _ in range(n_records):
        rec = buf[pos : pos + record_size]
        pos += record_size
        if not rec or rec[0:1] == b"*":  # deleted
            continue
        vals, fo = [], 1
        for _name, _ftype, length in fields:
            raw = rec[fo : fo + length].decode(encoding, "replace").strip()
            vals.append(raw if raw != "" else None)
            fo += length
        rows.append(tuple(vals))
    schema = ", ".join(f"`{name}` string" for name, _, _ in fields)
    return spark.createDataFrame(rows, schema)


def write_dbf(df: DataFrame, path: str, encoding: str = "cp1252") -> None:
    """DataFrame → dBASE III, every field type 'C' (text model), widths from
    the data (driver-side; small results only)."""
    cols = df.columns
    data = [[("" if v is None else str(v)) for v in row] for row in df.collect()]
    widths = [
        min(254, max([len(c.encode(encoding, "replace")) for c in [col]] +
                     [len(r[i].encode(encoding, "replace")) for r in data] + [1]))
        for i, col in enumerate(cols)
    ]
    record_size = 1 + sum(widths)
    header_size = 32 + 32 * len(cols) + 1
    out = bytearray()
    out += struct.pack("<BBBBIHH20x", 0x03, 26, 8, 17, len(data), header_size, record_size)
    for col, w in zip(cols, widths):
        name = col.encode("ascii", "replace")[:10].ljust(11, b"\x00")
        out += name + b"C" + b"\x00" * 4 + bytes([w, 0]) + b"\x00" * 14
    out += b"\x0d"
    for row in data:
        out += b" "
        for v, w in zip(row, widths):
            out += v.encode(encoding, "replace")[:w].ljust(w, b" ")
    out += b"\x1a"
    with open(path, "wb") as f:
        f.write(bytes(out))


# ------------------------------------------------------------------ archives


def zip_list(path: str) -> list[str]:
    """member names of a zip — ``f_zipdir`` (reference
    traitement_archives.py:126-148, listing form)."""
    with zipfile.ZipFile(path) as z:
        return [n for n in z.namelist() if not n.endswith("/")]


def zip_extract(path: str, out_dir: str | None = None) -> tuple[str, str]:
    """extract a zipped delivery — ``f_zipextract`` (reference
    traitement_archives.py:151-186). Returns (extraction dir, majority file
    extension) so callers can format-detect the extracted tree; the dir is
    the caller's to keep alive while lazy reads reference it."""
    import collections
    import tempfile

    out_dir = out_dir or tempfile.mkdtemp(prefix="pyetl_zip_")
    with zipfile.ZipFile(path) as z:
        # refuse path traversal (zip-slip)
        for n in z.namelist():
            dest = os.path.realpath(os.path.join(out_dir, n))
            if not dest.startswith(os.path.realpath(out_dir) + os.sep):
                raise ValueError(f"zip member escapes extraction dir: {n!r}")
        z.extractall(out_dir)
    exts = collections.Counter(
        os.path.splitext(n)[1].lstrip(".").lower()
        for n in zip_list(path)
        if os.path.splitext(n)[1]
    )
    inner = exts.most_common(1)[0][0] if exts else ""
    return out_dir, inner
