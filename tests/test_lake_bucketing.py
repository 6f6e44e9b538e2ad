from __future__ import annotations

from pyspark.sql import functions as F

from tern_ep_data_pipeline_spark.sources import lake
from tern_ep_data_pipeline_spark.sources.tables import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    left = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    right = ev.groupBy("user_id").agg(F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total"))
    lake.write_bucketed(left, "bkt_left", ["user_id"], n_buckets=4, sort_cols=["user_id"])
    lake.write_bucketed(right, "bkt_right", ["user_id"], n_buckets=4, sort_cols=["user_id"])

    joined = lake.colocated_join(spark, "bkt_left", "bkt_right", on=["user_id"])
    assert lake.exchange_count(joined) == 0  # co-located: no shuffle at all
    assert joined.count() == left.count()

    # contrast: the same join on unbucketed frames shuffles both sides
    plain = left.join(right, on="user_id")
    assert lake.exchange_count(plain) > 0


def test_compact_partition_atomic(spark, tmp_path):
    from tern_ep_data_pipeline_spark.sources.lake import compact_partition

    path = str(tmp_path / "part")
    # 40 tiny files (a streaming micro-batch pattern)
    for i in range(40):
        spark.range(i * 10, (i + 1) * 10).toDF("v").coalesce(1).write.mode(
            "append"
        ).parquet(path)
    before = spark.read.parquet(path)
    before_rows = sorted(r["v"] for r in before.collect())

    stats = compact_partition(spark, path, target_mb=128, sort_cols=["v"])
    assert stats["files_before"] >= 40 and stats["files_after"] == 1

    after = spark.read.parquet(path)
    assert sorted(r["v"] for r in after.collect()) == before_rows
    # idempotent: a second call is a no-op
    stats2 = compact_partition(spark, path, target_mb=128)
    assert stats2["files_before"] == stats2["files_after"]
