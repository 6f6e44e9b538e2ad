"""Reshape operators: pivot / melt / broadcast-to-heights.

Parity targets (SURVEY.md §2.9, profile pipeline):
- R1 pivot: valve-multiplexed long rows -> height columns
  (ref CumberlandPlain_data_prep.py:113-119 ``unstack``).
- R2 melt: wide height columns -> long series (:88-94).
- R4 broadcast one column across N heights (:180-186).
- J5 valve->height mapping join (:97-119): small dict -> broadcast map.

Spark shapes: ``groupBy().pivot()`` with explicit pivot values (avoids the
extra distinct-scan job and keeps output schema deterministic); melt via the
built-in ``unpivot``; R4 via explode of a literal array (no cross join).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import lit


def map_valve_to_height(
    df: DataFrame, valve_col: str, mapping: Mapping[int, float], out_col: str = "height"
) -> DataFrame:
    """J5: broadcast map join via a literal CASE/map expression."""
    pairs = [x for k, v in mapping.items() for x in (lit(int(k)), lit(float(v)))]
    return df.withColumn(out_col, F.create_map(*pairs)[F.col(valve_col)])


def pivot_wide(
    df: DataFrame,
    key_cols: Sequence[str],
    pivot_col: str,
    value_col: str,
    pivot_values: Sequence | None = None,
    agg: str = "first",
) -> DataFrame:
    """R1: long -> wide. Explicit ``pivot_values`` keeps the plan one-pass."""
    agg_fn = getattr(F, agg)
    gb = df.groupBy(*key_cols)
    p = gb.pivot(pivot_col, list(pivot_values)) if pivot_values is not None else gb.pivot(pivot_col)
    return p.agg(agg_fn(value_col))


def melt_long(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """R2: wide -> long via built-in unpivot (names quoted so dotted pivot
    labels like ``0.5`` stay literal)."""
    return df.unpivot(
        [F.col(f"`{c}`") for c in id_cols],
        [F.col(f"`{c}`") for c in value_cols],
        var_name,
        value_name,
    )


def broadcast_to_heights(
    df: DataFrame, heights: Sequence[float], out_col: str = "height"
) -> DataFrame:
    """R4: replicate each row once per height (explode of a literal array —
    cheaper than a cross join, stays in the same stage)."""
    arr = F.array([lit(float(h)) for h in heights])
    return df.withColumn(out_col, F.explode(arr))


def interpolate_heights(
    df: DataFrame,
    low_col: str,
    high_col: str,
    low_height: float,
    high_height: float,
    targets: Sequence[float],
    prefix: str = "interp_",
) -> DataFrame:
    """R3: linear interpolation from two measured heights to N targets
    (ref CumberlandPlain_data_prep.py:74-84): value + dV/dz * (z - z_low)."""
    grad = (F.col(high_col) - F.col(low_col)) / (high_height - low_height)
    cols = [
        (F.col(low_col) + grad * (float(z) - low_height)).alias(f"{prefix}{z}")
        for z in targets
    ]
    return df.select("*", *cols)
