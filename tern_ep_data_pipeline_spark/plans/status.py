"""Network-monitoring status products.

Parity target: ``construct_status_xlsx`` lifecycle (SURVEY.md §3.2;
network_status.py:131-238) — per-(site, variable) staleness/validity stats
over the newest L1 data, collated with per-file missing-record stats (J3),
rendered to status artifacts:

- GeoJSON FeatureCollection of per-site points with staleness props
  (network_status.py:57-128) — pure-json writer, no geo libs needed.
- JSON site-details dump (details_constructor.py:248-273).
- Excel styling sink is gated (openpyxl not in this container).

Spark shape: ONE job over the lake — groupBy(site, variable) conditional
aggregates with catalog bounds as literals — then driver-side rendering of
the tiny collected result.
"""

from __future__ import annotations

import json
import os
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.status import last_valid_stats


def site_variable_status(
    long_df: DataFrame,
    bounds: Mapping[str, tuple[float | None, float | None]],
    site_col: str = "site",
    var_col: str = "variable",
    ts_col: str = "DATETIME",
    value_col: str = "value",
) -> DataFrame:
    """A7 per (site, variable): last record/valid-value stats.

    ``long_df`` is the lake in long form (site, variable, ts, value); bounds
    arrive as a literal CASE over the variable name — no join needed.
    """
    valid = F.lit(False)
    for name, (lo, hi) in bounds.items():
        cond = F.col(var_col) == name
        rng = F.lit(True)
        if lo is not None:
            rng = rng & (F.col(value_col) >= lo)
        if hi is not None:
            rng = rng & (F.col(value_col) <= hi)
        valid = F.when(cond, rng).otherwise(valid)
    return last_valid_stats(
        long_df, ts_col, value_col, valid, [site_col, var_col]
    )


def staleness_days(df: DataFrame, as_of, ts_col: str = "last_ts") -> DataFrame:
    """days_since_last_record relative to an explicit as-of time
    (network_status.py:496-557; site-local 'now' passed by the caller)."""
    return df.withColumn(
        "days_since_last_record",
        F.round(
            F.expr(f"timestampdiff(MICROSECOND, {ts_col}, TIMESTAMP_NTZ '{as_of}')")
            / 86_400_000_000.0,
            3,
        ),
    )


def write_status_geojson(
    rows: Sequence[Mapping],
    path: str,
    lat_key: str = "latitude",
    lon_key: str = "longitude",
) -> None:
    """S22: FeatureCollection of per-site points with status properties
    (network_status.py:57-128). Pure json — no geo dependencies."""
    features = []
    for rec in rows:
        props = {k: v for k, v in rec.items() if k not in (lat_key, lon_key)}
        features.append(
            {
                "type": "Feature",
                "geometry": {
                    "type": "Point",
                    "coordinates": [rec.get(lon_key), rec.get(lat_key)],
                },
                "properties": props,
            }
        )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        json.dump({"type": "FeatureCollection", "features": features}, fh, default=str)


def write_site_details_json(records: Sequence[Mapping], path: str) -> None:
    """S23: site-details JSON dump (details_constructor.py:248-273)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        json.dump({rec.get("site", str(i)): dict(rec) for i, rec in enumerate(records)}, fh, default=str)


def write_status_xlsx(
    rows: Sequence[Mapping],
    path: str,
    stale_after_days: float = 2.0,
) -> None:
    """S21: styled multi-sheet Excel status workbook
    (network_status.py:131-238, 635-884).

    Sheets: a summary per site and the full per-(site, variable) detail;
    cells whose ``days_since_last_record`` exceeds ``stale_after_days``
    get the alert fill — the reference's conditional colour styling.
    Written by the dependency-free OOXML writer (sources.xlsx); the
    collected status result is tiny, so this is pure driver work.
    """
    from ..sources.xlsx import write_xlsx

    rows = [dict(r) for r in rows]
    detail_cols = sorted({k for r in rows for k in r})
    detail = [[r.get(c) for c in detail_cols] for r in rows]

    per_site: dict[str, float] = {}
    for r in rows:
        site = str(r.get("site", ""))
        days = r.get("days_since_last_record")
        if days is not None:
            per_site[site] = max(per_site.get(site, 0.0), float(days))
    summary = [[s, d, d > stale_after_days] for s, d in sorted(per_site.items())]

    def alert(sheet: str, row_idx: int, col: str, value) -> bool:
        if col != "days_since_last_record" or value is None:
            return False
        return float(value) > stale_after_days

    write_xlsx(
        path,
        {
            "summary": (["site", "max_days_stale", "is_stale"], summary),
            "detail": (detail_cols, detail),
        },
        alert=alert,
    )
