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


def variable_overlap(master_cols: Sequence[str], merge_cols: Sequence[str]) -> dict[str, list[str]]:
    """J10/U3: variable-set intersection and differences
    (ref file_concatenators.py:216-244). Catalog-sized -> plain Python."""
    m, g = set(master_cols), set(merge_cols)
    return {
        "common": sorted(m & g),
        "master_only": sorted(m - g),
        "merge_only": sorted(g - m),
    }
