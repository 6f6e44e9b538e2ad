"""Rollup cascade: partial re-aggregation must be lossless."""

import datetime as dt

from pyspark.sql import functions as F

from tern_ep_data_pipeline_spark.operators import rollup

T = dt.datetime


def _events(spark):
    rows = [
        ("a", T(2024, 1, 1, 0, 10, 0), 1.25),
        ("a", T(2024, 1, 1, 0, 40, 0), 2.50),   # second half-hour bucket
        ("a", T(2024, 1, 2, 5, 0, 0), -3.00),   # next day
        ("a", T(2024, 2, 1, 0, 0, 0), 10.00),   # next month, bucket boundary
        ("b", T(2024, 1, 1, 0, 10, 0), 7.75),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def test_cascade_equals_direct_aggregation(spark):
    ev = _events(spark)
    base = rollup.base_rollup(ev, "ts", ["k"], "v", minutes=30)
    daily = rollup.rollup_up(base, ["k"], "day")
    monthly = rollup.with_avg(rollup.rollup_up(daily, ["k"], "month"))

    direct = (
        ev.groupBy("k", F.date_trunc("month", "ts").alias("bucket_start"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(20,2)")).alias("sum_v"),
            F.min(F.col("v").cast("decimal(20,2)")).alias("min_v"),
            F.max(F.col("v").cast("decimal(20,2)")).alias("max_v"),
        )
    )
    got = {
        (r["k"], r["bucket_start"]): (r["n"], r["sum_v"], r["min_v"], r["max_v"])
        for r in monthly.collect()
    }
    want = {
        (r["k"], r["bucket_start"]): (r["n"], r["sum_v"], r["min_v"], r["max_v"])
        for r in direct.collect()
    }
    assert got == want
    # avg derives from exact partials
    jan_a = [r for r in monthly.collect() if r["k"] == "a" and r["bucket_start"].month == 1][0]
    assert jan_a["avg_v"] == round((1.25 + 2.50 - 3.00) / 3, 6)


def test_base_bucket_boundaries(spark):
    ev = _events(spark)
    base = rollup.base_rollup(ev, "ts", ["k"], "v", minutes=30)
    buckets = {
        r["bucket_start"] for r in base.filter(F.col("k") == "a").collect()
    }
    assert T(2024, 1, 1, 0, 0, 0) in buckets
    assert T(2024, 1, 1, 0, 30, 0) in buckets  # 0:40 lands in the 0:30 bucket
    assert T(2024, 2, 1, 0, 0, 0) in buckets   # boundary event starts its bucket
