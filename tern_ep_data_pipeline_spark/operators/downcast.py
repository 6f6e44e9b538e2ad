"""Storage-width reduction: lossless integer downcast + significant-digit
rounding.

Parity target: the reference fast-file converter keeps 10 Hz CSV output
byte-stable and small via float32 + 7-significant-digit rounding and a
lossless Int32 downcast when every value is integral
(fast_file_io.py:228-243, 615-620; SURVEY.md §1.2).

Spark shape: the losslessness probe is one aggregate over the candidate
columns (max |x - round(x)|); the chosen casts are a single projection.
Parquet dictionary/byte-packing then does the rest at the sink.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def round_significant(col: Column, digits: int = 7) -> Column:
    """Round to N significant digits (the reference's %.7g CSV shaping).

    scale = 10^(digits-1-floor(log10(|x|))); exact zeros/nulls pass through.
    """
    magnitude = F.floor(F.log10(F.abs(col)))
    scale = F.pow(F.lit(10.0), F.lit(digits - 1) - magnitude)
    rounded = F.round(col * scale) / scale
    return F.when(col.isNull() | (col == 0.0), col).otherwise(rounded)


def integral_columns(df: DataFrame, candidates: Sequence[str]) -> list[str]:
    """One aggregate pass: which double columns hold only integral values
    (within int range) — the lossless-downcast probe."""
    if not candidates:
        return []
    checks = [
        F.max(
            F.when(
                F.col(c).isNotNull()
                & (
                    (F.abs(F.col(c) - F.round(F.col(c))) > 0)
                    | (F.abs(F.col(c)) > 2**31 - 1)
                ),
                1,
            ).otherwise(0)
        ).alias(c)
        for c in candidates
    ]
    row = df.agg(*checks).collect()[0]
    return [c for c in candidates if row[c] == 0 or row[c] is None]


def downcast_for_storage(
    df: DataFrame,
    exclude: Sequence[str] = (),
    sig_digits: int = 7,
) -> DataFrame:
    """Apply the width-reduction policy to every double column:
    integral-only -> INT, else FLOAT with significant-digit rounding;
    booleans -> INT (fast_file_io.py:638-640)."""
    doubles = [c for c, t in df.dtypes if t == "double" and c not in exclude]
    bools = [c for c, t in df.dtypes if t == "boolean" and c not in exclude]
    lossless = set(integral_columns(df, doubles))
    out = []
    for c, t in df.dtypes:
        if c in lossless:
            out.append(F.col(c).cast("int").alias(c))
        elif c in doubles:
            out.append(round_significant(F.col(c), sig_digits).cast("float").alias(c))
        elif c in bools:
            out.append(F.col(c).cast("int").alias(c))
        else:
            out.append(F.col(c))
    return df.select(out)
