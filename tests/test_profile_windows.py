"""Distributed-lag semantics: profile grid self-join and unkeyed lag_diff.

The global time-axis lag paths must not rely on a single-task global sort;
these tests pin their semantics (including the missing-block / partition
boundary cases) against naive single-partition references.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from tern_ep_data_pipeline_spark.operators.windows import lag_diff
from tern_ep_data_pipeline_spark.plans import profile


def _ts(minute):
    return dt.datetime(2024, 1, 1, minute // 60, minute % 60)


def test_profile_storage_missing_block_gives_null_storage(spark):
    # two heights, valves 0/1; blocks at :00 and :60 with :30 missing
    rows = []
    for minute in (0, 5, 60, 65):
        rows.append((_ts(minute), 0, 400.0 + minute))
        rows.append((_ts(minute), 1, 410.0 + minute))
    df = spark.createDataFrame(rows, ["ts", "valve", "co2"])
    out = (
        profile.profile_storage(df, "ts", "valve", "co2", heights=(0.5, 1.0))
        .orderBy("block_start")
        .collect()
    )
    assert [r["block_start"].minute for r in out] == [0, 0]
    first, second = out
    # first block has no predecessor -> null storage
    assert first["storage_0"] is None and first["storage_total"] is None
    # second block's predecessor grid point (:30) is missing -> still null,
    # NOT the :00 block (grid semantics, matching the regularised reference)
    assert second["storage_0"] is None and second["storage_total"] is None


def test_profile_storage_contiguous_matches_row_lag(spark):
    rows = []
    for minute in range(0, 120, 5):
        rows.append((_ts(minute), minute % 2, 400.0 + minute))
    df = spark.createDataFrame(rows, ["ts", "valve", "co2"])
    out = profile.profile_storage(df, "ts", "valve", "co2", heights=(0.5, 1.0))
    got = {r["block_start"]: r["storage_total"] for r in out.collect()}
    # contiguous grid: previous grid point == previous row
    blocks = sorted(got)
    assert got[blocks[0]] is None
    for prev, cur in zip(blocks, blocks[1:]):
        assert got[cur] is not None


def test_unkeyed_lag_diff_matches_global_window(spark):
    rows = [(_ts(i), float(i * i) if i % 7 else None) for i in range(200)]
    df = spark.createDataFrame(rows, ["ts", "v"]).repartition(8)
    got = {
        r["ts"]: r["delta"]
        for r in lag_diff(df, "v", "ts", out_col="delta").collect()
    }
    w = Window.orderBy("ts")
    want = {
        r["ts"]: r["delta"]
        for r in df.coalesce(1)
        .withColumn("delta", F.col("v") - F.lag("v").over(w))
        .collect()
    }
    assert got == want
