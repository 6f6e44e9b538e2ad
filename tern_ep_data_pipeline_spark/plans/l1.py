"""End-to-end pipeline compositions (the reference's `.pipe(...)` chains).

Parity target: the L1 constructor pipeline
(ref nc_constructors.py:100-154 + file_handler.get_conditioned_data:49-124):
parse -> dedupe -> time-regularise -> range-mask -> convert -> QC-flag ->
aggregate. Composition uses ``DataFrame.transform`` exactly like the
reference's pandas ``.pipe`` chains, and stays one Catalyst plan end-to-end —
the optimizer fuses the projections into a single stage over the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import conditioning, masking, regularise, windows
from ..sources.tables import load_table


def condition_events(
    spark: SparkSession,
    sf_dir: str,
    value_lo: float = 10.0,
    value_hi: float = 400.0,
    block_minutes: int = 30,
) -> DataFrame:
    """Flagship slice: the reference conditioning chain re-expressed on the
    driver ``events`` table.

    dedupe (P6) -> keep-first-per-key (P7, deterministic ordering) ->
    range-mask (P3) -> QC flag -> 30-min tumbling block stats (W6/A4-shape).
    """
    ev = load_table(spark, sf_dir, "events")
    # P6 exact dedupe is subsumed by the P7 keep-first window: identical rows
    # share the (user_id, ts) key and collapse to one — saves a full shuffle
    # versus dropDuplicates-then-window at scale.
    conditioned = (
        ev.transform(lambda d: conditioning.drop_bad_timestamps(d, "ts"))
        .transform(
            lambda d: conditioning.keep_first_per_timestamp(
                d, ["user_id", "ts"], [F.col("event_id")]
            )
        )
        .withColumn("value", masking.mask_range(F.col("value"), value_lo, value_hi))
        .withColumn("value_QCFlag", masking.qc_flag(F.col("value")))
    )
    blocks = (
        conditioned.withColumn(
            "block_start", windows.tumbling_bucket("ts", block_minutes)
        )
        .groupBy("block_start")
        .agg(
            F.count(F.lit(1)).alias("n_recs"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
            F.sum("value_QCFlag").alias("n_flagged"),
        )
    )
    return blocks
