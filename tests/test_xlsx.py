"""Dependency-free XLSX status sink (S21): structure and styling read back
via stdlib zipfile + ElementTree (openpyxl is deliberately absent here)."""

import xml.etree.ElementTree as ET
import zipfile

from tern_ep_data_pipeline_spark.plans.status import write_status_xlsx
from tern_ep_data_pipeline_spark.sources.xlsx import write_xlsx

NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


def _sheet_cells(z, n):
    root = ET.fromstring(z.read(f"xl/worksheets/sheet{n}.xml"))
    cells = {}
    for c in root.iter("{%s}c" % NS["m"]):
        v = c.find("m:v", NS)
        t = c.find("m:is/m:t", NS)
        cells[c.get("r")] = (
            t.text if t is not None else (v.text if v is not None else None),
            c.get("s", "0"),
        )
    return cells


def test_write_xlsx_values_types_and_alert_fill(tmp_path):
    p = str(tmp_path / "t.xlsx")
    write_xlsx(
        p,
        {"s1": (["name", "n"], [["ok", 1], ["bad", 2.5], [None, float("nan")]])},
        alert=lambda sheet, r, col, v: col == "n" and v == 2.5,
    )
    with zipfile.ZipFile(p) as z:
        assert set(z.namelist()) >= {
            "[Content_Types].xml", "xl/workbook.xml", "xl/styles.xml",
            "xl/worksheets/sheet1.xml",
        }
        cells = _sheet_cells(z, 1)
    assert cells["A1"] == ("name", "1") and cells["B1"] == ("n", "1")  # bold header
    assert cells["A2"] == ("ok", "0") and cells["B2"] == ("1", "0")
    assert cells["B3"] == ("2.5", "2")          # alert fill
    assert cells["A4"][0] is None               # None -> empty cell
    assert cells["B4"][0] is None               # NaN -> empty cell


def test_status_workbook_sheets_and_staleness(tmp_path):
    p = str(tmp_path / "status.xlsx")
    rows = [
        {"site": "Calperum", "variable": "Ta", "days_since_last_record": 0.5},
        {"site": "Calperum", "variable": "RH", "days_since_last_record": 3.0},
        {"site": "Gingin", "variable": "Ta", "days_since_last_record": 1.0},
    ]
    write_status_xlsx(rows, p, stale_after_days=2.0)
    with zipfile.ZipFile(p) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        names = [s.get("name") for s in wb.iter("{%s}sheet" % NS["m"])]
        assert names == ["summary", "detail"]
        summary = _sheet_cells(z, 1)
        detail = _sheet_cells(z, 2)
    # summary: Calperum max-staleness 3.0 flagged, Gingin not
    assert summary["A2"][0] == "Calperum" and summary["B2"] == ("3.0", "0")
    assert summary["C2"][0] == "1"   # is_stale boolean true
    assert summary["A3"][0] == "Gingin" and summary["C3"][0] == "0"
    # detail: the stale cell (and only it) carries the alert style
    stale = [v for v in detail.values() if v == ("3.0", "2")]
    assert len(stale) == 1
