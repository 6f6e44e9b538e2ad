"""Custom stateful streaming operator: online gap detection.

The batch gap report (operators.gaps, A3) needs the whole series; streams
need the same answer incrementally. ``applyInPandasWithState`` keeps one
tiny state row per entity (last seen timestamp) and emits a gap record the
moment a new arrival closes a gap longer than the threshold — including
gaps that span micro-batches.

State size is O(entities), not O(records): exactly the shape that scales to
a 1000-executor cluster (state store partitions by the entity key).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_SCHEMA = "user_id BIGINT, gap_start TIMESTAMP, gap_end TIMESTAMP, gap_seconds BIGINT"
STATE_SCHEMA = "last_ts TIMESTAMP"


def _detect_gaps(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    min_gap_seconds: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    last_ts = state.get[0] if state.exists else None
    out = []
    for pdf in batches:
        for ts in sorted(pdf["ts"]):
            ts = ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts
            if last_ts is not None:
                gap = int((ts - last_ts).total_seconds())
                if gap > min_gap_seconds:
                    out.append((user_id, last_ts, ts, gap))
            last_ts = ts
    if last_ts is not None:
        state.update((last_ts,))
    yield pd.DataFrame(out, columns=["user_id", "gap_start", "gap_end", "gap_seconds"])


def streaming_gap_report(
    stream: DataFrame,
    min_gap_seconds: int,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """A3 as a stateful stream: per-key gap records emitted online."""
    from pyspark.sql import functions as F

    prepared = stream.select(
        F.col(key_col).alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("ts"),
    )

    def fn(key, pdfs, state):
        return _detect_gaps(key, pdfs, state, min_gap_seconds)

    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=GAP_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
