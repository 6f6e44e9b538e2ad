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
