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


def test_zorder_value_interleaving(spark):
    from pyspark.sql import functions as F

    from tern_ep_data_pipeline_spark.sources.lake import zorder_value

    df = spark.createDataFrame([(0, 0), (3, 0), (0, 3), (3, 3)], "x long, y long")
    z = df.select(
        "x", "y", zorder_value(["x", "y"], [0, 0], [3, 3], bits=2).alias("z")
    )
    got = {(r["x"], r["y"]): r["z"] for r in z.collect()}
    # 2-bit interleave: x bits land at even positions, y at odd
    assert got[(0, 0)] == 0b0000
    assert got[(3, 0)] == 0b0101
    assert got[(0, 3)] == 0b1010
    assert got[(3, 3)] == 0b1111


def test_write_zordered_clusters_files(spark, tmp_path):
    """Z-ordered output files cover narrow ranges of BOTH cluster columns
    (a random layout gives every file the full span)."""
    from pyspark.sql import functions as F

    from tern_ep_data_pipeline_spark.sources.lake import write_zordered

    df = (
        spark.range(40_000)
        .withColumn("a", (F.col("id") * 2654435761) % 10_000)  # shuffled order
        .withColumn("b", (F.col("id") * 40503) % 10_000)
        .repartition(8)
    )
    out = str(tmp_path / "z")
    write_zordered(df, out, ["a", "b"], n_files=8)
    spans = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("a") - F.min("a")).alias("sa"),
            (F.max("b") - F.min("b")).alias("sb"),
        )
        .collect()
    )
    assert len(spans) > 1

    # baseline: the same data written without clustering — every file
    # covers essentially the full span of both dims
    base = str(tmp_path / "plain")
    df.write.parquet(base)
    bspans = (
        spark.read.parquet(base)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("a") - F.min("a")).alias("sa"),
            (F.max("b") - F.min("b")).alias("sb"),
        )
        .collect()
    )
    mean = lambda rows, c: sum(r[c] for r in rows) / len(rows)
    # z-order guarantees AVERAGE locality (range-partition boundaries are
    # sampled, and a partition can straddle a curve quadrant): the mean
    # per-file span must beat the unclustered layout decisively on BOTH
    # dims — the property min/max pruning actually uses
    assert mean(spans, "sa") < 0.75 * mean(bspans, "sa")
    assert mean(spans, "sb") < 0.75 * mean(bspans, "sb")
