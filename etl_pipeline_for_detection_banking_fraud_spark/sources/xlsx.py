"""Minimal XLSX reader (stdlib zipfile + ElementTree) -> Spark DataFrame.

The reference ingests two small Excel feeds with pandas read_excel
(reference: main.py:70,78): the terminals full snapshot (~150 rows/day)
and the cumulative passport blacklist (~7-24 rows/day). These files are
tiny and driver-side by nature — one workbook is one unsplittable blob —
so the scale posture is: parse on the driver (or, for many files, inside
``mapInPandas`` over a DataFrame of paths), then hand Spark a typed
DataFrame immediately. openpyxl is not in this image; xlsx is just a
zip of XML, so a ~60-line stdlib parser covers the subset these feeds
use (sharedStrings + inline numeric cells).

Fidelity notes (SURVEY §2 SRC2, §4):
- blacklist sheets carry trailing all-NULL rows (day-1: 7 data + 17
  empty); the reference loads them into staging and they leak into the
  blacklist fact via its NULL-blind NOT EXISTS (comm_funcs.py:49-55).
  This engine drops all-null rows at the source and records the
  divergence here.
- the blacklist ``date`` column arrives as an Excel serial number
  (44256 == 2021-03-01); converted via functions.excel_serial_to_date
  semantics (applied here driver-side for exactness).
"""

from __future__ import annotations

import datetime
import re
import zipfile
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

from .. import schemas
from ..functions.localframe import local_rows_df

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_EXCEL_EPOCH = datetime.date(1899, 12, 30)


def _col_index(cell_ref: str) -> int:
    """'B7' -> 1 (zero-based column index)."""
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def read_xlsx_rows(path, sheet: str = "xl/worksheets/sheet1.xml") -> list[list]:
    """Parse one worksheet into a list of row value-lists (ragged-padded).

    ``path`` is a filesystem path OR any seekable binary file-like
    (``zipfile.ZipFile`` accepts both) — the latter is how the
    distributed readers hand executor-side ``binaryFile`` content in."""
    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        try:
            sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in sst.iter(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        except KeyError:
            pass
        ws = ET.fromstring(zf.read(sheet))

    rows: list[list] = []
    width = 0
    for row_el in ws.iter(f"{_NS}row"):
        row: list = []
        for c in row_el.iter(f"{_NS}c"):
            col = _col_index(c.attrib.get("r", "A1"))
            while len(row) <= col:
                row.append(None)
            ctype = c.attrib.get("t", "n")
            v_el = c.find(f"{_NS}v")
            if ctype == "inlineStr":
                is_el = c.find(f"{_NS}is")
                row[col] = "".join(t.text or "" for t in is_el.iter(f"{_NS}t")) if is_el is not None else None
            elif v_el is None or v_el.text is None:
                row[col] = None
            elif ctype == "s":
                row[col] = shared[int(v_el.text)]
            elif ctype in ("str",):
                row[col] = v_el.text
            elif ctype == "b":
                row[col] = v_el.text == "1"
            else:  # numeric
                txt = v_el.text
                row[col] = float(txt) if ("." in txt or "e" in txt.lower()) else int(txt)
        width = max(width, len(row))
        rows.append(row)
    return [r + [None] * (width - len(r)) for r in rows]


def _records(path: str, expected_cols: list[str]) -> list[dict]:
    """Header + data rows -> list of dicts; drops trailing all-NULL rows."""
    rows = read_xlsx_rows(path)
    if not rows:
        return []
    header = [str(h) if h is not None else f"_c{i}" for i, h in enumerate(rows[0])]
    if header[: len(expected_cols)] != expected_cols:
        raise ValueError(f"{path}: header {header} != expected {expected_cols}")
    out = []
    for r in rows[1:]:
        if all(v is None for v in r):
            continue  # phantom styled-but-empty rows (SURVEY §4 divergence note)
        out.append(dict(zip(header, r)))
    return out


def read_terminals(spark: SparkSession, path: str) -> DataFrame:
    """Terminals full-snapshot feed (reference: main.py:77-82)."""
    recs = _records(path, ["terminal_id", "terminal_type", "terminal_city", "terminal_address"])
    data = [
        (r["terminal_id"], r["terminal_type"], r["terminal_city"], r["terminal_address"])
        for r in recs
    ]
    return local_rows_df(spark, data, schemas.TERMINALS)


def read_passport_blacklist(spark: SparkSession, path: str) -> DataFrame:
    """Cumulative blacklist feed (reference: main.py:69-74).

    Converts the Excel serial `date` column to a real date.
    """
    recs = _records(path, ["date", "passport"])
    data = []
    for r in recs:
        d = r["date"]
        if isinstance(d, (int, float)):
            d = _EXCEL_EPOCH + datetime.timedelta(days=int(d))
        data.append((d, str(r["passport"]) if r["passport"] is not None else None))
    return local_rows_df(spark, data, schemas.PASSPORT_BLACKLIST)


# ---------------------------------------------------------------------------
# Distributed many-file ingest (round 6; closes the r5 "driver-side xlsx"
# scale note). One workbook is one unsplittable blob, so the distribution
# unit is the FILE: Spark's binaryFile source ships each workbook's bytes
# to an executor and the same stdlib parser runs inside mapInPandas —
# a backlog of thousands of daily snapshots ingests with cluster
# parallelism and zero driver memory, while the per-file parse stays the
# single battle-tested code path used by the driver-side readers.
# ---------------------------------------------------------------------------

def _records_bytes(content: bytes, expected_cols: list[str]) -> list[dict]:
    import io

    return _records(io.BytesIO(content), expected_cols)


def read_terminals_many(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed terminals ingest: every workbook matching
    ``path_glob`` parsed executor-side; output carries ``src_file`` so
    per-day snapshots stay attributable."""
    import pandas as pd

    cols = ["terminal_id", "terminal_type", "terminal_city", "terminal_address"]
    bin_df = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )

    def parse(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for r in _records_bytes(bytes(content), cols):
                    rows.append([path] + [r[c] for c in cols])
            yield pd.DataFrame(rows, columns=["src_file"] + cols)

    return bin_df.mapInPandas(
        parse,
        schema=("src_file string, terminal_id string, terminal_type string, "
                "terminal_city string, terminal_address string"),
    )


def read_passport_blacklist_many(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed blacklist ingest (Excel serial dates converted
    in-executor, same semantics as the driver-side reader)."""
    import pandas as pd

    cols = ["date", "passport"]
    bin_df = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )

    def parse(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for r in _records_bytes(bytes(content), cols):
                    d = r["date"]
                    if isinstance(d, (int, float)):
                        d = _EXCEL_EPOCH + datetime.timedelta(days=int(d))
                    p = str(r["passport"]) if r["passport"] is not None else None
                    rows.append((path, d, p))
            yield pd.DataFrame(rows, columns=["src_file", "date", "passport"])

    return bin_df.mapInPandas(
        parse, schema="src_file string, date date, passport string"
    )
