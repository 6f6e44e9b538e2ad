"""Per-source conditioning transforms.

Parity targets: reference ``code/file_handling/file_handler.py``
(get_conditioned_data :49-124, duplicate masks :192-238, usecols select+rename
:506-520) and ``code/file_handling/file_io.py`` numeric coercion :145-152.

Reference semantics worth preserving exactly:
- "usecols as dict" = select + rename in one step (P1).
- duplicate *records* (full row) are dropped silently (P6); duplicate
  *timestamps with different data* are an error or a keep-first (P7) — under
  parallelism "first" must be made explicit with a deterministic ordering.
- non-critical columns are force-coerced to numeric, failures -> null.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def select_rename(df: DataFrame, usecols: Mapping[str, str] | Sequence[str]) -> DataFrame:
    """P1: column subset; dict = select+rename (ref file_handler.py:506-520)."""
    if isinstance(usecols, Mapping):
        return df.select([F.col(old).alias(new) for old, new in usecols.items()])
    return df.select(list(usecols))


def coerce_numeric(df: DataFrame, exclude: Sequence[str] = ()) -> DataFrame:
    """Force non-critical columns to DOUBLE with null-on-failure, mirroring
    ``pd.to_numeric(errors='coerce')`` (ref file_io.py:145-149).

    ``try_cast`` gives exactly the coerce semantics JVM-side.
    """
    keep = set(exclude)
    cols = [
        F.col(c)
        if c in keep or t not in ("string",)
        else F.expr(f"try_cast(`{c}` AS double)").alias(c)
        for c, t in df.dtypes
    ]
    return df.select(cols)


def drop_duplicate_records(df: DataFrame) -> DataFrame:
    """P6: drop exact duplicate rows (ref file_handler.py:192-213)."""
    return df.dropDuplicates()


def drop_bad_timestamps(df: DataFrame, ts_col: str = "DATETIME") -> DataFrame:
    """P4: drop rows whose timestamp failed to parse (ref file_io.py:151-152)."""
    return df.filter(F.col(ts_col).isNotNull())


def keep_first_per_timestamp(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[Column | str],
) -> DataFrame:
    """P7: one row per timestamp key, deterministic "first wins".

    The reference keeps pandas' file-order first duplicate
    (file_handler.py:216-238); under distributed execution that order is not
    reproducible, so callers must supply an explicit priority ordering
    (e.g. source-file rank, then record number) — SURVEY.md §7.4.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def duplicate_timestamp_count(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """P7 report: keys holding >1 distinct rows (ref file_handler.py:216-238)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )
