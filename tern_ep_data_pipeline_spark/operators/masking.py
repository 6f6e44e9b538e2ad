"""Range filtering with *masking* semantics (null-out, never row-drop).

Parity target: P3 ``filter_range(series, max_val, min_val)`` — out-of-range
values become null while the row (and its timestamp) survives
(ref convert_calc_filter.py:397-406, applied dataset-wide in
nc_toa5_constructor.py:372-403). QC flags later derive from nullness
(nc_constructors.py:701-720), so masking must happen before flagging.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mask_range(col: Column, lo: float | None, hi: float | None) -> Column:
    """P3 single-column mask: value kept iff within [lo, hi], else null."""
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (col >= F.lit(lo))
    if hi is not None:
        cond = cond & (col <= F.lit(hi))
    return F.when(cond, col)


def apply_plausible_ranges(
    df: DataFrame, bounds: Mapping[str, tuple[float | None, float | None]]
) -> DataFrame:
    """Mask every configured column to its catalog plausible_min/max.

    ``bounds`` comes from the variable catalog (pfp_std_names
    plausible_min/plausible_max) — one ``when`` expression per column, fused
    by Catalyst into a single projection.
    """
    exprs = []
    for c in df.columns:
        if c in bounds:
            lo, hi = bounds[c]
            exprs.append(mask_range(F.col(c), lo, hi).alias(c))
        else:
            exprs.append(F.col(c))
    return df.select(exprs)


def qc_flag(col: Column) -> Column:
    """QC flag companion: 1 where the value is null else 0
    (ref nc_constructors.py:701-720)."""
    return F.when(col.isNull(), F.lit(1)).otherwise(F.lit(0))


def with_qc_flags(df: DataFrame, value_cols: list[str], suffix: str = "_QCFlag") -> DataFrame:
    """Add an int flag column per value column, mirroring the L1 product."""
    flags = [qc_flag(F.col(c)).alias(f"{c}{suffix}") for c in value_cols]
    return df.select("*", *flags)
