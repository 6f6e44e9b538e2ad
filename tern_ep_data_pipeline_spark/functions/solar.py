"""Solar position / sunrise-sunset (NOAA approximation).

Parity target: W7 — the reference uses the ephem package for next/last
rise/set times (convert_calc_filter.py:58-134). ephem is not in this
container, so this is a self-contained NOAA Solar Calculator approximation
(public algorithm; accurate to ~1-2 minutes for |lat| < 72), evaluated
driver-side per (site, day) exactly like the reference's usage.
"""

from __future__ import annotations

import datetime
import math


def _solar_params(day_of_year: float):
    g = 2.0 * math.pi / 365.0 * (day_of_year - 1)
    eqtime = 229.18 * (
        0.000075
        + 0.001868 * math.cos(g)
        - 0.032077 * math.sin(g)
        - 0.014615 * math.cos(2 * g)
        - 0.040849 * math.sin(2 * g)
    )
    decl = (
        0.006918
        - 0.399912 * math.cos(g)
        + 0.070257 * math.sin(g)
        - 0.006758 * math.cos(2 * g)
        + 0.000907 * math.sin(2 * g)
        - 0.002697 * math.cos(3 * g)
        + 0.00148 * math.sin(3 * g)
    )
    return eqtime, decl


def sunrise_sunset(
    date: datetime.date,
    latitude: float,
    longitude: float,
    utc_offset_hours: float = 0.0,
) -> tuple[datetime.datetime | None, datetime.datetime | None]:
    """Local (utc_offset-shifted) sunrise and sunset for a site and day.

    Returns (None, None) for polar day/night. Zenith 90.833 deg (official
    sunrise with refraction).
    """
    doy = date.timetuple().tm_yday
    eqtime, decl = _solar_params(doy)
    lat = math.radians(latitude)
    cos_ha = (
        math.cos(math.radians(90.833)) / (math.cos(lat) * math.cos(decl))
        - math.tan(lat) * math.tan(decl)
    )
    if cos_ha < -1 or cos_ha > 1:
        return None, None
    ha_deg = math.degrees(math.acos(cos_ha))
    base = datetime.datetime.combine(date, datetime.time())

    def at(minutes_utc: float) -> datetime.datetime:
        return base + datetime.timedelta(minutes=minutes_utc + utc_offset_hours * 60)

    sunrise_min = 720.0 - 4.0 * (longitude + ha_deg) - eqtime
    sunset_min = 720.0 - 4.0 * (longitude - ha_deg) - eqtime
    return at(sunrise_min), at(sunset_min)


def daylight_hours(date: datetime.date, latitude: float, longitude: float) -> float:
    """Day length in hours (24/0 for polar day/night)."""
    rise, sset = sunrise_sunset(date, latitude, longitude)
    if rise is None:
        doy = date.timetuple().tm_yday
        _, decl = _solar_params(doy)
        return 24.0 if (latitude > 0) == (decl > 0) else 0.0
    return (sset - rise).total_seconds() / 3600.0
