from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from tern_ep_data_pipeline_spark.operators import merge, reshape


def _ts(i):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=30 * i)


def test_merge_on_time_full_outer(spark):
    a = spark.createDataFrame([(_ts(0), 1.0), (_ts(1), 2.0)], ["DATETIME", "Ta"])
    b = spark.createDataFrame([(_ts(1), 3.0), (_ts(2), 4.0)], ["DATETIME", "RH"])
    out = merge.merge_on_time([a, b]).orderBy("DATETIME").collect()
    assert len(out) == 3
    assert out[0]["RH"] is None and out[2]["Ta"] is None
    assert out[1]["Ta"] == 2.0 and out[1]["RH"] == 3.0


def test_merge_rejects_duplicate_variables(spark):
    a = spark.createDataFrame([(_ts(0), 1.0)], ["DATETIME", "Ta"])
    b = spark.createDataFrame([(_ts(0), 2.0)], ["DATETIME", "Ta"])
    with pytest.raises(ValueError, match="duplicate variable"):
        merge.merge_on_time([a, b])


def test_assert_adds_new_dates(spark):
    master = spark.createDataFrame([(_ts(0),), (_ts(1),)], ["DATETIME"])
    same = spark.createDataFrame([(_ts(1),)], ["DATETIME"])
    with pytest.raises(ValueError, match="no new dates"):
        merge.assert_adds_new_dates(master, same)
    newer = spark.createDataFrame([(_ts(2),)], ["DATETIME"])
    merge.assert_adds_new_dates(master, newer)  # no raise


def test_union_dedup_sort(spark):
    a = spark.createDataFrame([(_ts(0), 1.0), (_ts(1), 2.0)], ["DATETIME", "v"])
    b = spark.createDataFrame([(_ts(1), 2.0), (_ts(2), 3.0)], ["DATETIME", "v"])
    out = merge.union_dedup_sort([a, b])
    assert out.count() == 3


def test_variable_overlap():
    out = merge.variable_overlap(["a", "b"], ["b", "c"])
    assert out == {"common": ["b"], "master_only": ["a"], "merge_only": ["c"]}


def test_valve_height_pivot_roundtrip(spark):
    heights = {0: 0.5, 1: 1.0, 2: 2.0}
    rows = [(_ts(i), i % 3, 400.0 + i) for i in range(9)]
    df = spark.createDataFrame(rows, ["DATETIME", "ValveNo", "CO2"])
    mapped = reshape.map_valve_to_height(df, "ValveNo", heights)
    assert dict(mapped.dtypes)["height"] == "double"
    wide = reshape.pivot_wide(
        mapped.withColumn("t", F.date_trunc("hour", "DATETIME")),
        ["t"], "height", "CO2", pivot_values=[0.5, 1.0, 2.0],
    )
    assert set(wide.columns) == {"t", "0.5", "1.0", "2.0"}
    long = reshape.melt_long(wide, ["t"], ["0.5", "1.0", "2.0"], "height", "CO2")
    assert long.filter(F.col("CO2").isNotNull()).count() == 9


def test_interpolate_heights(spark):
    df = spark.createDataFrame([(10.0, 20.0)], ["t_low", "t_high"])
    out = reshape.interpolate_heights(df, "t_low", "t_high", 0.0, 10.0, [5.0]).collect()[0]
    assert out["interp_5.0"] == pytest.approx(15.0)


def test_broadcast_to_heights(spark):
    df = spark.createDataFrame([(1.0,)], ["p"])
    out = reshape.broadcast_to_heights(df, [0.5, 1.0, 2.0])
    assert out.count() == 3
