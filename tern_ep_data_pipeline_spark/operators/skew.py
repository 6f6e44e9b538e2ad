"""Skew-aware aggregation: salted two-stage combine.

Beyond-reference scale utility (SURVEY.md §7 / driver mandate): AQE's skew
handling covers joins, but a groupBy on a pathologically hot key still
funnels that key's rows through one reducer. Salting splits each key into N
shards for the first (parallel) aggregation, then combines the shards.

Works for any algebraic aggregate expressed as (partial, merge) pairs; the
helpers below cover the count/sum/min/max family the pipeline uses.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage (salted) sum/count/min/max per key.

    Stage 1 groups on (key, salt) — hot keys fan out over ``salt_buckets``
    reducers; stage 2 merges the tiny per-salt partials. Sums stay exact by
    accumulating in decimal.
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(value_col).cast("decimal(28,6)")).alias("__s"),
        F.min(value_col).alias("__mn"),
        F.max(value_col).alias("__mx"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").alias("n"),
        F.sum("__s").cast("double").alias("sum"),
        F.min("__mn").alias("min"),
        F.max("__mx").alias("max"),
    )
