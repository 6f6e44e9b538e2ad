"""Incremental master-file append (EddyPro concatenation semantics).

Parity target: reference ``code/file_handling/eddypro_concatenator.py``
:44-97 — a master accumulation table grows from daily files; only files
strictly beyond the master's end date are appended, and each candidate's
schema is re-validated first (the reference guards against logger column
corruption, rationale at :10-17).

Spark shape: the watermark filter is J7's anti-join collapsed to a
``max(ts)`` probe + predicate (pushed to the candidate scan); the union is
by-name; dedupe keeps the master row on conflicts via an explicit priority
column (determinism under parallelism — SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import conditioning


class SchemaCompatibilityError(ValueError):
    """Candidate columns diverge from the master's."""


def validate_compatible(master: DataFrame, candidate: DataFrame) -> None:
    """Schema re-validation before any append (eddypro_concatenator.py:44-67)."""
    m, c = set(master.columns), set(candidate.columns)
    if m != c:
        raise SchemaCompatibilityError(
            f"schema mismatch: master-only={sorted(m - c)}, candidate-only={sorted(c - m)}"
        )


def append_incremental(
    master: DataFrame,
    candidate: DataFrame,
    ts_col: str = "DATETIME",
    validate: bool = True,
) -> DataFrame:
    """Append candidate rows strictly beyond the master's watermark.

    Master rows always win on timestamp conflicts (priority column 0 vs 1);
    output is the grown master.
    """
    if validate:
        validate_compatible(master, candidate)
    watermark = master.agg(F.max(ts_col)).collect()[0][0]
    fresh = (
        candidate.filter(F.col(ts_col) > F.lit(watermark))
        if watermark is not None
        else candidate
    )
    unioned = master.withColumn("__prio", F.lit(0)).unionByName(
        fresh.withColumn("__prio", F.lit(1))
    )
    return conditioning.keep_first_per_timestamp(
        unioned, [ts_col], [F.col("__prio")]
    ).drop("__prio")
