"""Bucketed lake tables for co-located (exchange-free) joins.

At 100 TB the dominant cost of the merge/join plans is the shuffle. Tables
that are repeatedly joined or merged on the same key (site+timestamp for the
time merge, document id for dedup verification, vector id for ANN probes)
are written ``bucketBy(key)`` so sort-merge joins between them need no
Exchange at all — Spark proves co-location from the bucket spec.

This module is the thin policy layer over ``DataFrameWriter.bucketBy``;
the test suite asserts the no-Exchange property on the resulting plans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) parquet table."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Catalyst
    plans a sort-merge join with zero Exchange operators."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=list(on), how=how)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchanges in the executed plan (test/audit hook)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange") - plan.count("BroadcastExchange")
