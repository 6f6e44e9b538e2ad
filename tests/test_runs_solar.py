from __future__ import annotations

import datetime

import pytest

from tern_ep_data_pipeline_spark.functions import solar
from tern_ep_data_pipeline_spark.operators import merge


def test_coalesce_runs(spark):
    rows = [
        (1, 1, "A"), (1, 2, "A"), (1, 3, "B"), (1, 4, "A"),
        (2, 1, "C"),
    ]
    df = spark.createDataFrame(rows, ["site", "seq", "instrument"])
    out = merge.coalesce_runs(df, ["site"], ["seq"], "instrument")
    got = {(r["site"], r["run_start"]): (r["instrument"], r["n_in_run"]) for r in out.collect()}
    assert got == {
        (1, 1): ("A", 2),
        (1, 3): ("B", 1),
        (1, 4): ("A", 1),
        (2, 1): ("C", 1),
    }


def test_assert_no_overlap():
    ok = [("A", 0, 5), ("B", 5, 9)]
    merge.assert_no_overlap(ok)
    with pytest.raises(ValueError, match="overlap"):
        merge.assert_no_overlap([("A", 0, 6), ("B", 5, 9)])


def test_sunrise_sunset_equator_equinox():
    rise, sset = solar.sunrise_sunset(datetime.date(2024, 3, 20), 0.0, 0.0)
    # equator at equinox: ~6:00 / ~18:00 UTC, 12 h daylight
    assert abs(rise.hour * 60 + rise.minute - 360) < 20
    assert abs(sset.hour * 60 + sset.minute - 1080) < 20
    assert solar.daylight_hours(datetime.date(2024, 3, 20), 0.0, 0.0) == pytest.approx(12.0, abs=0.3)


def test_sunrise_polar_night():
    rise, sset = solar.sunrise_sunset(datetime.date(2024, 12, 21), 80.0, 0.0)
    assert rise is None and sset is None
    assert solar.daylight_hours(datetime.date(2024, 12, 21), 80.0, 0.0) == 0.0
    assert solar.daylight_hours(datetime.date(2024, 6, 21), 80.0, 0.0) == 24.0


def test_southern_summer_longer_days():
    # Tumbarumba (~ -35.66, 148.15) in January: > 13 h daylight
    h = solar.daylight_hours(datetime.date(2024, 1, 10), -35.66, 148.15)
    assert h > 13.0
