from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tern_ep_data_pipeline_spark.operators import downcast


def test_round_significant(spark):
    df = spark.createDataFrame(
        [(1234567.89,), (0.000123456789,), (0.0,), (None,)], ["v"]
    )
    out = [r["r"] for r in df.select(downcast.round_significant(F.col("v"), 7).alias("r")).collect()]
    assert out[0] == pytest.approx(1234568.0)
    assert out[1] == pytest.approx(0.0001234568, rel=1e-9)
    assert out[2] == 0.0
    assert out[3] is None


def test_integral_probe_and_downcast(spark):
    df = spark.createDataFrame(
        [(1.0, 1.5, True), (2.0, 2.5, False), (None, None, None)],
        ["counts", "temps", "flag"],
    )
    assert downcast.integral_columns(df, ["counts", "temps"]) == ["counts"]
    out = downcast.downcast_for_storage(df)
    types = dict(out.dtypes)
    assert types == {"counts": "int", "temps": "float", "flag": "int"}
    rows = out.collect()
    assert rows[0]["counts"] == 1 and rows[0]["temps"] == pytest.approx(1.5)
    assert rows[0]["flag"] == 1 and rows[2]["flag"] is None


def test_downcast_rejects_wide_ints(spark):
    df = spark.createDataFrame([(3e10,)], ["big"])
    # 3e10 > int32 range -> stays float path
    assert downcast.integral_columns(df, ["big"]) == []
