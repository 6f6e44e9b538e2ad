"""Parquet lake loaders for the driver testdata star schema.

The reference engine's universal intermediary is a time-indexed wide table
(``code/file_handling/file_io.py:102-132`` builds it from TOA5/EddyPro files);
here the equivalent canonical store is partitioned Parquet read straight into
DataFrames. All timestamps are timezone-naive (``TIMESTAMP_NTZ``) matching the
reference's naive-local-time convention (SURVEY.md §1.2).

The driver testdata writes ``events.ts`` as parquet ``TIMESTAMP(NANOS)``,
which Spark has no native type for. With
``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as long
nanoseconds; we convert with *integer* division (``div 1000`` — a double
division would lose precision above 2^53) and ``timestampadd`` on a
TIMESTAMP_NTZ base so the result is timezone-independent and matches DuckDB's
nanos->micros truncation bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: All tables in the driver testdata lake.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Columns stored as TIMESTAMP(NANOS) that arrive as long nanoseconds.
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _nanos_to_ntz(col: str) -> F.Column:
    # `div` = integer division on longs: exact for any epoch-nanos value,
    # and truncation == floor for post-1970 data (matches DuckDB).
    return F.expr(f"timestampadd(MICROSECOND, {col} div 1000, {_EPOCH_NTZ})")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with normalised timestamp types."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    dtypes = dict(df.dtypes)
    for c in _NANO_TS_COLS.get(name, ()):
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, _nanos_to_ntz(c))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each table as a temp view (mirrors the DuckDB oracle setup)."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
