"""Structured Streaming ingest — the reference's scheduled-batch semantics
as a real streaming runtime.

Parity targets (SURVEY.md §2.10): the reference approximates streaming with
scheduled batch; the semantics it implements map 1:1 onto Structured
Streaming primitives:

- incremental file append with schema re-validation
  (eddypro_concatenator.py:44-97)        -> file source (exactly-once listing)
- always sort+dedupe after union; duplicate-timestamp-different-data is an
  error option (file_handler.py:88-96)   -> withWatermark + dropDuplicates
- 30-min block partitioning of 10 Hz data (fast_file_io.py:471-519)
                                         -> tumbling window aggregation
- logger API backfill/since-record/since-time modes
  (logger_functions.py:26-29)            -> replayable source offsets

All builders return unstarted streaming DataFrames/writers so tests can run
them with ``trigger(availableNow=True)`` and production can attach real
checkpoints. State stores are keyed exactly like the batch operators (entity
key + event time), so the same plans scale to a cluster.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def conditioned_file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
    watermark: str = "1 hour",
    fmt: str = "parquet",
) -> DataFrame:
    """Incremental file ingest with the reference's late/duplicate handling.

    The file source gives exactly-once listing (J7's watermark anti-join for
    free); ``withWatermark`` bounds state; ``dropDuplicates`` on
    (key, event-time) implements the always-dedupe-after-union rule within
    the lateness horizon.
    """
    stream = (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", 64)
        .load(path)
    )
    return watermarked_dedupe(stream, ts_col, key_cols, watermark)


def watermarked_dedupe(
    stream: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    watermark: str = "1 hour",
) -> DataFrame:
    """Late/duplicate policy: drop exact duplicate (key, timestamp) arrivals
    within the watermark horizon (file_handler.py:88-96 semantics).

    Spark event time must be TIMESTAMP (not NTZ); the engine pins the
    session timezone to UTC, so the cast is value-preserving.
    """
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream.withWatermark(ts_col, watermark).dropDuplicates(
        [*key_cols, ts_col]
    )


def tumbling_block_stream(
    stream: DataFrame,
    ts_col: str,
    value_col: str,
    minutes: int = 30,
    watermark: str = "1 hour",
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """W6 streaming variant: per-block (start, end, n_recs, sum) aggregates
    emitted once the watermark passes the block end."""
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    w = stream.withWatermark(ts_col, watermark)
    return (
        w.groupBy(
            F.window(F.col(ts_col), f"{minutes} minutes").alias("block"),
            *partition_cols,
        )
        .agg(
            F.count(F.lit(1)).alias("n_recs"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            F.col("block.start").alias("block_start"),
            F.col("block.end").alias("block_end"),
            *partition_cols,
            "n_recs",
            "sum_value",
            "first_ts",
            "last_ts",
        )
    )


def write_bronze(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: Sequence[str] = (),
):
    """Bronze-layer sink: append-only parquet with checkpointed progress —
    the landing zone the batch pipeline then conditions (SURVEY.md §7.1)."""
    writer = (
        stream.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    return writer


def write_toa5_block_files(
    stream: DataFrame,
    out_dir: str,
    checkpoint: str,
    header,
    ts_col: str = "TIMESTAMP",
    minutes: int = 30,
):
    """Streaming fast-path sink: each micro-batch lands as complete TOA5
    block files via the distributed block writer (sources.toa5_blocks) in a
    ``foreachBatch``.

    Batches write in ``merge`` mode: a block file that already exists
    accumulates the new rows (timestamp-keyed union, new wins, atomic
    replace) instead of being truncated to the latest batch's rows. That
    makes the sink safe both when a 30-min block's rows span micro-batches
    (file-source triggers routinely split them) and on batch re-delivery
    after failure — replayed rows key-collide with themselves, so the merge
    is a no-op and checkpointed progress gives effectively-once output.
    """
    from ..sources.toa5_blocks import write_toa5_blocks

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_toa5_blocks(
            batch_df, out_dir, header, ts_col=ts_col, minutes=minutes, mode="merge"
        )

    return (
        stream.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
