from __future__ import annotations

import datetime

import pytest

from tern_ep_data_pipeline_spark.plans import append


def _df(spark, rows):
    return spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=30 * i), v) for i, v in rows],
        ["DATETIME", "co2_flux"],
    )


def test_append_only_new_rows(spark):
    master = _df(spark, [(0, 1.0), (1, 2.0), (2, 3.0)])
    daily = _df(spark, [(1, 99.0), (2, 98.0), (3, 4.0), (4, 5.0)])  # overlaps 1,2
    grown = append.append_incremental(master, daily)
    got = {r["DATETIME"].minute + 60 * r["DATETIME"].hour: r["co2_flux"] for r in grown.collect()}
    # overlapping timestamps keep the MASTER values; only 3,4 are new
    assert got == {0: 1.0, 30: 2.0, 60: 3.0, 90: 4.0, 120: 5.0}


def test_append_rejects_schema_drift(spark):
    master = _df(spark, [(0, 1.0)])
    bad = master.withColumnRenamed("co2_flux", "corrupted_name")
    with pytest.raises(append.SchemaCompatibilityError, match="candidate-only"):
        append.append_incremental(master, bad)


def test_append_to_empty_master(spark):
    daily = _df(spark, [(0, 1.0)])
    master = daily.limit(0)
    assert append.append_incremental(master, daily).count() == 1
