from __future__ import annotations

from pyspark.sql import functions as F

from tern_ep_data_pipeline_spark.operators import conditioning
from tern_ep_data_pipeline_spark.sources.tables import load_table


def test_drop_duplicate_records_idempotent(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], ["k", "v"]
    )
    once = conditioning.drop_duplicate_records(df)
    twice = conditioning.drop_duplicate_records(once)
    assert once.count() == 2 == twice.count()


def test_keep_first_per_timestamp_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01", 10.0, 2), (1, "2024-01-01", 20.0, 1), (2, "2024-01-01", 5.0, 3)],
        ["site", "ts", "v", "prio"],
    )
    out = conditioning.keep_first_per_timestamp(df, ["site", "ts"], [F.col("prio")])
    rows = {r["site"]: r["v"] for r in out.collect()}
    assert rows == {1: 20.0, 2: 5.0}  # lowest priority value wins


def test_coerce_numeric_null_on_failure(spark):
    df = spark.createDataFrame([("1.5", "x"), ("oops", "y")], ["num", "keep"])
    out = conditioning.coerce_numeric(df, exclude=["keep"])
    vals = [r["num"] for r in out.orderBy("keep").collect()]
    assert vals == [1.5, None]
    assert dict(out.dtypes)["keep"] == "string"


def test_select_rename_dict(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = conditioning.select_rename(ev, {"ts": "DATETIME", "value": "Fco2"})
    assert out.columns == ["DATETIME", "Fco2"]


def test_duplicate_timestamp_count(spark):
    df = spark.createDataFrame(
        [(1, "t1", 1.0), (1, "t1", 2.0), (1, "t2", 3.0)], ["site", "ts", "v"]
    )
    dup = conditioning.duplicate_timestamp_count(df, ["site", "ts"])
    assert dup.collect()[0]["n_rows"] == 2
