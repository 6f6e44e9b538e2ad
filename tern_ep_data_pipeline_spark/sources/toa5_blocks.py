"""Distributed fast-path sink: one TOA5 file per tumbling block.

Parity target: the 10 Hz pipeline's block writer — daily TOB3 decoded, split
into 30-min blocks, one TOA5 file per block
(fast_file_converters.py:169-189, fast_file_io.py:573-596; SURVEY.md §3.3).
This is the 100 TB path: with N sites x 48 blocks/day x years, the writes
must happen on executors, not the driver.

Shape: assign the block bucket (pure projection), repartition by block so
each block lands in one task, then ``foreachPartition`` writes each block's
rows as a complete TOA5 file (header + body) directly from the executor.
The reference's per-file layout ``TOA5/%Y_%m/%d/`` maps to the output
directory template.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .toa5 import INFO_FIELD_NAMES, FileHeader, _format_value
from ..operators.windows import tumbling_bucket


def write_toa5_blocks(
    df: DataFrame,
    out_dir: str,
    header: FileHeader,
    ts_col: str = "TIMESTAMP",
    minutes: int = 30,
    station: str | None = None,
) -> None:
    """Write one TOA5 file per N-minute block, in parallel on executors.

    File name: ``<station>_<yyyymmdd_HHMM>.dat`` under
    ``out_dir/%Y_%m/%d/`` (reference layout). Executors must share the
    filesystem (true locally and on any shared/object store via a mount).
    """
    info = dict(header.info or {})
    if station:
        info["station_name"] = station
    value_cols = [c for c in df.columns if c != ts_col]
    variables = ["TIMESTAMP", *value_cols]
    header_lines = [
        ",".join(f'"{info.get(k, "")}"' for k in INFO_FIELD_NAMES),
        ",".join(f'"{v}"' for v in variables),
        ",".join(
            f'"{header.units.get(v, "TS" if v == "TIMESTAMP" else "")}"' for v in variables
        ),
        ",".join(f'"{header.sampling.get(v, "")}"' for v in variables),
    ]
    station_name = info.get("station_name", "station")

    blocked = (
        df.withColumn("__block", tumbling_bucket(ts_col, minutes))
        .repartition(F.col("__block"))
        .sortWithinPartitions("__block", ts_col)
    )
    cols = [ts_col, *value_cols]

    def write_partition(rows) -> None:
        handles: dict = {}
        try:
            for row in rows:
                block = row["__block"]
                fh = handles.get(block)
                if fh is None:
                    subdir = os.path.join(
                        out_dir, block.strftime("%Y_%m"), block.strftime("%d")
                    )
                    os.makedirs(subdir, exist_ok=True)
                    fname = f"{station_name}_{block.strftime('%Y%m%d_%H%M')}.dat"
                    fh = open(os.path.join(subdir, fname), "w")
                    fh.write("\n".join(header_lines) + "\n")
                    handles[block] = fh
                out = []
                for c in cols:
                    v = row[c]
                    if c == ts_col:
                        ts = v.strftime("%Y-%m-%d %H:%M:%S")
                        if v.microsecond:
                            ts += f".{v.microsecond // 100000}"
                        out.append(f'"{ts}"')
                    else:
                        out.append(_format_value(v))
                fh.write(",".join(out) + "\n")
        finally:
            for fh in handles.values():
                fh.close()

    blocked.foreachPartition(write_partition)
