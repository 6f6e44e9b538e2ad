"""Multi-source time alignment ("merge") and concat legality checks.

Parity targets:
- J1 ``merge_data`` — N per-file tables regularised to the site interval then
  concatenated column-wise on the DatetimeIndex == iterated **full outer
  equi-join on the timestamp** (ref file_handler.py:534-606).
- U1-U4 / FileConcatenator legality analysis (ref file_concatenators.py:
  79-126, 187-402): same-variable unit compatibility, interval equality,
  "merge must add new dates".
- J7 incremental append watermark (ref eddypro_concatenator.py:69-89).

Scale note: the time-join sides are all big on the time axis — no broadcast;
instead all inputs share the timestamp as join key so AQE plans sort-merge
joins with a single exchange per input, and pre-bucketing by (site, ts) makes
the joins co-located on a real cluster.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_on_time(frames: Sequence[DataFrame], ts_col: str = "DATETIME") -> DataFrame:
    """J1: N-way full outer equi-join on the timestamp column.

    Inputs must have disjoint non-timestamp column sets (the reference
    alias-renames collisions upstream via the variable map).
    """
    if not frames:
        raise ValueError("merge_on_time needs at least one frame")
    seen: set[str] = set()
    for f in frames:
        cols = set(f.columns) - {ts_col}
        dup = seen & cols
        if dup:
            raise ValueError(f"duplicate variable names across inputs: {sorted(dup)}")
        seen |= cols
    return reduce(lambda a, b: a.join(b, on=ts_col, how="full"), frames)


def union_dedup_sort(frames: Sequence[DataFrame], ts_col: str = "DATETIME") -> DataFrame:
    """U1: same-schema union (by name) -> dedupe -> time sort
    (ref file_concatenators.py:79-102)."""
    out = reduce(lambda a, b: a.unionByName(b), frames)
    return out.dropDuplicates().orderBy(ts_col)


def assert_adds_new_dates(master: DataFrame, merge: DataFrame, ts_col: str = "DATETIME") -> None:
    """U4 legality: the merge frame must contribute timestamps the master
    lacks (ref file_concatenators.py:326-349)."""
    n_new = (
        merge.select(ts_col).distinct()
        .join(master.select(ts_col).distinct(), on=ts_col, how="left_anti")
        .count()
    )
    if n_new == 0:
        raise ValueError("merge adds no new dates to master")


def incremental_new_files(
    listing: DataFrame, watermark_col: str, watermark_value
) -> DataFrame:
    """J7: select inputs strictly beyond the master watermark
    (ref eddypro_concatenator.py:69-89)."""
    return listing.filter(F.col(watermark_col) > F.lit(watermark_value))


def coalesce_runs(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """J6: interval coalescing — collapse consecutive equal values into
    (value, start, end, n) runs (the reference's instrument-history merge,
    nc_constructors.py:828-970: neighbour-compare then combine-concurrent).

    Gaps-and-islands: a run id is the running count of value changes; one
    window pass + one aggregation, both on the partition key.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    changed = F.when(
        F.lag(value_col).over(w).isNull()
        | (F.col(value_col) != F.lag(value_col).over(w)),
        1,
    ).otherwise(0)
    runs = df.withColumn("__run", F.sum(changed).over(w))
    return (
        runs.groupBy(*partition_cols, "__run", value_col)
        .agg(
            F.min(order_cols[0]).alias("run_start"),
            F.max(order_cols[0]).alias("run_end"),
            F.count(F.lit(1)).alias("n_in_run"),
        )
        .drop("__run")
    )


def assert_no_overlap(
    intervals: Sequence[tuple], start_idx: int = 1, end_idx: int = 2
) -> None:
    """J6 validation: (label, start, end) ranges must not overlap
    (nc_constructors.py:973-1004). Catalog-sized -> plain Python."""
    ordered = sorted(intervals, key=lambda r: r[start_idx])
    for prev, cur in zip(ordered, ordered[1:]):
        if cur[start_idx] < prev[end_idx]:
            raise ValueError(f"overlapping intervals: {prev} and {cur}")


def variable_overlap(master_cols: Sequence[str], merge_cols: Sequence[str]) -> dict[str, list[str]]:
    """J10/U3: variable-set intersection and differences
    (ref file_concatenators.py:216-244). Catalog-sized -> plain Python."""
    m, g = set(master_cols), set(merge_cols)
    return {
        "common": sorted(m & g),
        "master_only": sorted(m - g),
        "merge_only": sorted(g - m),
    }
