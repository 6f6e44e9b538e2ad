"""Profile (storage-flux) pipeline composition.

Parity target: the reference profile chain —
- valve->height mapping + sync predicate
  (CumberlandPlain_data_prep.py:97-119, J5),
- pivot to (time x height) (R1, :113-119),
- layer means of adjacent heights (profile_data_processor.py:111-132, A5),
- lag-difference storage term scaled by layer depth / period
  (:134-148, W1),
- null-propagating sum over layers (:150-156, A6).

The chain is one Catalyst plan: map -> bucket -> pivot (single shuffle) ->
grid self-join for the lag term -> arithmetic projection.

Scale note: the storage lag is NOT a global ``Window.orderBy`` (which would
funnel every block through one task). Blocks sit on a regular tumbling grid,
and the reference computes ``shift(Time=1)`` over a resample-regularised
index (profile_data_processor.py:134-148 after the handler's asfreq), so
"previous row" is exactly "previous grid point": a self equi-join on
``block_start - interval`` expresses the same semantics as a fully
shuffle-parallel join, with a missing block correctly yielding a null
storage term.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.reshape import map_valve_to_height
from ..operators.windows import tumbling_bucket

#: CumberlandPlain intake heights, metres (CumberlandPlain_data_prep.py:21).
DEFAULT_HEIGHTS: tuple[float, ...] = (0.5, 1.0, 2.0, 3.5, 7.0, 12.0, 20.0, 29.0)


def _col_name(h: float) -> str:
    return f"co2_{str(h).replace('.', 'p')}"


def profile_storage(
    df: DataFrame,
    ts_col: str,
    valve_col: str,
    co2_col: str,
    heights: Sequence[float] = DEFAULT_HEIGHTS,
    block_minutes: int = 30,
) -> DataFrame:
    """Long valve-multiplexed rows -> per-block storage flux per layer.

    Output: one row per block with per-height means, per-layer storage terms
    (d(layer mean)/dt * layer depth), and their null-propagating total.
    """
    heights = [float(h) for h in heights]
    mapping = {i: h for i, h in enumerate(heights)}
    mapped = map_valve_to_height(df, valve_col, mapping, out_col="__height")
    blocked = mapped.withColumn("__block", tumbling_bucket(ts_col, block_minutes))

    # R1 pivot: exact decimal mean per (block, height) cell
    mean_expr = (
        F.sum(F.col(co2_col).cast("decimal(18,2)")).cast("double")
        / F.count(F.lit(1))
    )
    wide = (
        blocked.groupBy(F.col("__block").alias("block_start"))
        .pivot("__height", heights)
        .agg(mean_expr)
    )
    for h in heights:
        wide = wide.withColumnRenamed(str(h), _col_name(h))

    # A5 layer means: adjacent-height pair averages; bottom layer = lowest
    # intake (profile_data_processor.py:111-132)
    layer_cols = []
    depths = []
    for i, h in enumerate(heights):
        name = f"layer_{i}"
        if i == 0:
            expr = F.col(_col_name(h))
            depth = h
        else:
            expr = (F.col(_col_name(h)) + F.col(_col_name(heights[i - 1]))) / 2.0
            depth = h - heights[i - 1]
        layer_cols.append(expr.alias(name))
        depths.append(depth)
    layered = wide.select("block_start", *[F.col(_col_name(h)) for h in heights], *layer_cols)

    # W1 storage term: d(layer)/dt * depth, dt = block length in seconds.
    # Previous grid point via self equi-join (see module docstring).
    dt = float(block_minutes * 60)
    prev = layered.select(
        F.expr(f"timestampadd(MINUTE, {block_minutes}, block_start)").alias(
            "block_start"
        ),
        *[F.col(f"layer_{i}").alias(f"__prev_{i}") for i in range(len(heights))],
    )
    joined = layered.join(prev, on="block_start", how="left")
    storage_cols = [
        ((F.col(f"layer_{i}") - F.col(f"__prev_{i}")) / dt * depths[i]).alias(
            f"storage_{i}"
        )
        for i in range(len(heights))
    ]
    stored = joined.select(
        "block_start",
        *[F.col(_col_name(h)) for h in heights],
        *[F.col(f"layer_{i}") for i in range(len(heights))],
        *storage_cols,
    )

    # A6: null-propagating sum over layers (skipna=False)
    total = None
    for i in range(len(heights)):
        c = F.col(f"storage_{i}")
        total = c if total is None else total + c
    return stored.withColumn("storage_total", total)
