"""Multi-resolution time rollups with partial-aggregate reuse.

The continuous-aggregate / hypertable-rollup pattern: fine buckets are
aggregated once from the raw stream, and every coarser level re-aggregates
the *partials* of the previous level — never the raw rows. At 100 TB the
raw scan happens exactly once; daily/monthly levels read orders of
magnitude fewer rows (48 half-hour partials per day, ~30 daily per month).

Composable partial set: (count, sum, min, max) — all re-aggregable by
(sum, sum, min, max); avg derives as sum/count at read time. This is the
same decomposition Spark's own partial/final aggregation uses map-side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: level name -> date_trunc unit (coarser levels must be exact supersets
#: of finer buckets, so each partial belongs to exactly one parent bucket)
TRUNC_UNITS = ("hour", "day", "month", "year")


def base_rollup(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    minutes: int = 30,
    decimal_type: str = "decimal(20,2)",
) -> DataFrame:
    """Finest level: tumbling ``minutes`` buckets holding the composable
    partials (n, sum, min, max). ``decimal_type`` keeps the sums exact so
    every cascade level is bit-deterministic regardless of add order."""
    bucket = F.timestamp_seconds(
        (F.unix_timestamp(ts_col) / (minutes * 60)).cast("long") * (minutes * 60)
    )
    if dict(df.dtypes)[ts_col] == "timestamp_ntz":
        bucket = F.expr(
            f"timestampadd(MICROSECOND, (timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col}) div {minutes * 60_000_000})"
            f" * {minutes * 60_000_000}, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        )
    v = F.col(value_col).cast(decimal_type)
    return (
        df.withColumn("bucket_start", bucket)
        .groupBy(*key_cols, "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v).alias("sum_v"),
            F.min(v).alias("min_v"),
            F.max(v).alias("max_v"),
        )
    )


def rollup_up(partials: DataFrame, key_cols: Sequence[str], unit: str) -> DataFrame:
    """One cascade step: re-aggregate partials into ``date_trunc(unit)``
    buckets. Input and output share the partial schema, so steps chain."""
    assert unit in TRUNC_UNITS, unit
    return (
        partials.withColumn("bucket_start", F.date_trunc(unit, "bucket_start"))
        .groupBy(*key_cols, "bucket_start")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


def with_avg(partials: DataFrame, scale: int = 6) -> DataFrame:
    """Derive the non-composable average from the partials at read time."""
    # double division of the exact decimal sum: identical IEEE result in any
    # engine, avoiding cross-engine decimal-quotient scale rules
    return partials.withColumn(
        "avg_v",
        F.round(F.col("sum_v").cast("double") / F.col("n"), scale),
    )
