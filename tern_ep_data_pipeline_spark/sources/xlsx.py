"""Minimal stdlib-only XLSX writer for the status workbook (S21).

Parity target: ``write_status_xlsx`` (reference
``code/network_monitoring/network_status.py:131-238, 635-884``) — a
multi-sheet workbook with conditional colour highlighting of stale/alert
cells. The reference uses openpyxl styling; that library is not in this
container, and the workbook is a driver-side product over a tiny collected
result, so this writes the OOXML parts directly (an .xlsx file is a zip of
XML) with zero dependencies: inline-string cells, numeric cells, and a
small fixed style table (normal / alert fill / header bold).

Scope is deliberately the reference's actual usage: values + conditional
fills + a bold header row. Column widths, merged cells, and formulas are
out of scope.
"""

from __future__ import annotations

import os
import zipfile
from collections.abc import Callable, Mapping, Sequence
from xml.sax.saxutils import escape

#: style ids in the fixed cellXfs table below
STYLE_NORMAL = 0
STYLE_HEADER = 1
STYLE_ALERT = 2

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

# gray125 fill at index 1 is mandated by the spec; index 2 is the alert fill
_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<fonts count="2"><font/><font><b/></font></fonts>
<fills count="3">
<fill><patternFill patternType="none"/></fill>
<fill><patternFill patternType="gray125"/></fill>
<fill><patternFill patternType="solid"><fgColor rgb="FFFFC7CE"/><bgColor rgb="FFFFC7CE"/></patternFill></fill>
</fills>
<borders count="1"><border/></borders>
<cellStyleXfs count="1"><xf/></cellStyleXfs>
<cellXfs count="3">
<xf fontId="0" fillId="0" borderId="0"/>
<xf fontId="1" fillId="0" borderId="0" applyFont="1"/>
<xf fontId="0" fillId="2" borderId="0" applyFill="1"/>
</cellXfs>
</styleSheet>"""


def _col_ref(idx: int) -> str:
    """0-based column index -> A1-style column letters."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(row: int, col: int, value, style: int) -> str:
    ref = f"{_col_ref(col)}{row + 1}"
    s = f' s="{style}"' if style else ""
    if value is None:
        return f'<c r="{ref}"{s}/>'
    if isinstance(value, bool):
        return f'<c r="{ref}"{s} t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        if value != value:  # NaN has no numeric representation in OOXML
            return f'<c r="{ref}"{s}/>'
        return f'<c r="{ref}"{s}><v>{value!r}</v></c>'
    text = escape(str(value))
    return f'<c r="{ref}"{s} t="inlineStr"><is><t>{text}</t></is></c>'


def _sheet_xml(
    header: Sequence[str],
    rows: Sequence[Sequence],
    alert: Callable[[int, str, object], bool] | None,
) -> str:
    parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>']
    parts.append(
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
    )
    parts.append("<row r=\"1\">")
    parts.extend(_cell_xml(0, c, h, STYLE_HEADER) for c, h in enumerate(header))
    parts.append("</row>")
    for r, row in enumerate(rows, start=1):
        parts.append(f'<row r="{r + 1}">')
        for c, v in enumerate(row):
            hot = bool(alert and alert(r - 1, header[c], v))
            parts.append(_cell_xml(r, c, v, STYLE_ALERT if hot else STYLE_NORMAL))
        parts.append("</row>")
    parts.append("</sheetData></worksheet>")
    return "".join(parts)


def write_xlsx(
    path: str,
    sheets: Mapping[str, tuple[Sequence[str], Sequence[Sequence]]],
    alert: Callable[[str, int, str, object], bool] | None = None,
) -> None:
    """Write ``{sheet_name: (header, rows)}`` to ``path``.

    ``alert(sheet, row_idx, col_name, value) -> bool`` marks cells that get
    the alert fill (the reference's conditional colour styling).
    """
    names = list(sheets)
    sheet_overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for i in range(len(names))
    )
    wb_sheets = "".join(
        f'<sheet name="{escape(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + f'<Relationship Id="rId{len(names) + 1}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" '
        'Target="styles.xml"/>'
        "</Relationships>"
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "[Content_Types].xml",
            _CONTENT_TYPES.format(sheet_overrides=sheet_overrides),
        )
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/styles.xml", _STYLES)
        for i, n in enumerate(names):
            header, rows = sheets[n]
            z.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                _sheet_xml(header, rows, (lambda r, c, v, _n=n: alert(_n, r, c, v)) if alert else None),
            )
