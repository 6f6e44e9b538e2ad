"""Distributed fast-path sink: one TOA5 file per tumbling block.

Parity target: the 10 Hz pipeline's block writer — daily TOB3 decoded, split
into 30-min blocks, one TOA5 file per block
(fast_file_converters.py:169-189, fast_file_io.py:573-596; SURVEY.md §3.3).
This is the 100 TB path: with N sites x 48 blocks/day x years, the writes
must happen on executors, not the driver.

Shape: assign the block bucket (pure projection), repartition by block so
each block lands in one task, then an Arrow-batched ``mapInPandas`` writes
each block's rows as a complete TOA5 file (header + body) directly from the
executor. Formatting is vectorised (numpy ``%.7g`` / integer fast paths)
and byte-identical to the per-value golden formatter
(``toa5._format_value``) — pinned by test_sources round-trip tests.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .toa5 import INFO_FIELD_NAMES, FileHeader
from ..operators.windows import tumbling_bucket


def _format_float_array(v: np.ndarray, float_sig: int = 7, na_token: str = "NAN") -> np.ndarray:
    """Vectorised ``toa5._format_value`` for a float array.

    Same bytes: NA token for NaN/None, ``str(v)`` for whole-valued floats
    (integer part + ".0", incl. the "-0.0" case), ``%.<sig>g`` otherwise.
    """
    v = np.asarray(v, dtype="float64")
    out = np.char.mod(f"%.{float_sig}g", v).astype(object)
    whole = np.isfinite(v) & (v == np.trunc(v)) & (np.abs(v) < 1e15)
    if whole.any():
        ints = np.trunc(v[whole]).astype("int64").astype("U")
        out[whole] = np.char.add(ints, ".0")
        negzero = whole & (v == 0) & np.signbit(v)
        if negzero.any():
            out[negzero] = "-0.0"
    out[np.isnan(v)] = na_token
    return out


def _format_timestamps(ts: pd.Series) -> np.ndarray:
    """Golden timestamp strings: ``YYYY-mm-dd HH:MM:SS[.t]`` (0.1 s suffix
    only when non-zero). C-speed path: ``np.datetime_as_string`` (~4x faster
    than ``Series.dt.strftime``), then patch the fixed-width 'T' separator
    in place via a U1 view."""
    t64 = ts.to_numpy().astype("datetime64[us]")
    secs = np.datetime_as_string(t64.astype("datetime64[s]"), unit="s")
    # fixed-width (NUL-padded) U array: patch the 'T' separator in place at
    # char 10 via a U1 view — free compared to np.char.replace's full scan
    width = secs.dtype.itemsize // np.dtype("U1").itemsize
    secs.view("U1").reshape(-1, width)[:, 10] = " "
    secs = secs.astype(object)
    # suffix on ANY sub-second remainder (golden: toa5.py emits ".0" for
    # 0 < microsecond < 100000, not just whole tenths)
    rem = t64.astype("int64") % 1_000_000
    if (rem > 0).any():
        tenths = rem // 100_000
        frac = np.where(rem > 0, np.char.add(".", tenths.astype("U1")), "").astype(
            object
        )
        return '"' + secs + frac + '"'
    return '"' + secs + '"'


def _format_frame(pdf: pd.DataFrame, ts_col: str, cols: list[str]) -> np.ndarray:
    """One CSV line per row (QUOTE_NONNUMERIC timestamps, golden floats).

    All-numpy object-array assembly: elementwise ``+`` on object arrays is
    several times faster than the pandas ``Series`` equivalent (no index
    alignment, no block manager churn per column)."""
    line = _format_timestamps(pdf[ts_col])
    for c in cols:
        if c == ts_col:
            continue
        s = pdf[c]
        if pd.api.types.is_float_dtype(s):
            part = _format_float_array(s.to_numpy(dtype="float64"))
        elif pd.api.types.is_integer_dtype(s) or pd.api.types.is_bool_dtype(s):
            part = s.to_numpy(dtype="int64").astype("U").astype(object)
        else:
            part = s.astype("string").fillna("NAN").to_numpy(dtype=object)
        line = line + "," + part
    return line


def _merge_block_file(path: str, header_text: str, new_lines: np.ndarray) -> None:
    """Merge new body lines into an existing block file, atomically.

    Keyed by the timestamp field (first CSV field); new rows win on a key
    collision, so re-delivery of identical rows is a no-op and a block whose
    rows arrive across micro-batches accumulates instead of truncating.
    The zero-padded quoted timestamp sorts lexicographically in time order
    ('"' < '.', so a bare second sorts before its .t variants)."""
    with open(path) as fh:
        existing = fh.read().splitlines()
    rows = {ln.split(",", 1)[0]: ln for ln in existing[4:] if ln}
    rows.update((ln.split(",", 1)[0], ln) for ln in new_lines)
    tmp = path + ".__merge_tmp"
    with open(tmp, "w") as fh:
        fh.write(header_text)
        fh.write("\n".join(rows[k] for k in sorted(rows)) + "\n")
    os.replace(tmp, path)


def write_toa5_blocks(
    df: DataFrame,
    out_dir: str,
    header: FileHeader,
    ts_col: str = "TIMESTAMP",
    minutes: int = 30,
    station: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write one TOA5 file per N-minute block, in parallel on executors.

    File name: ``<station>_<yyyymmdd_HHMM>.dat`` under
    ``out_dir/%Y_%m/%d/`` (reference layout). Executors must share the
    filesystem (true locally and on any shared/object store via a mount).

    ``mode='overwrite'`` (batch semantics) rewrites each touched block file
    from scratch — correct when this call owns every row of the block.
    ``mode='merge'`` unions new rows into any block file that already
    exists (timestamp-keyed, new wins, atomic replace) — required when rows
    for one block can arrive across calls, e.g. streaming micro-batches.
    """
    if mode not in ("overwrite", "merge"):
        raise ValueError(f"mode must be 'overwrite' or 'merge', got {mode!r}")
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
    header_text = "\n".join(header_lines) + "\n"
    station_name = info.get("station_name", "station")

    blocked = (
        df.withColumn("__block", tumbling_bucket(ts_col, minutes))
        .repartition(F.col("__block"))
        .sortWithinPartitions("__block", ts_col)
    )
    cols = [ts_col, *value_cols]

    merge = mode == "merge"

    def write_partition(batches):
        # Arrow batches arrive in partition order (pre-sorted); a block can
        # span batches, so handles persist across the iterator. In merge
        # mode, a block whose file already exists accumulates its lines and
        # is merged once at the end (atomic replace) instead of truncating.
        handles: dict = {}
        pending: dict = {}
        pending_paths: dict = {}
        n = 0
        try:
            for pdf in batches:
                if pdf.empty:
                    continue
                n += len(pdf)
                lines = _format_frame(pdf, ts_col, cols)
                for block, idx in pdf.groupby("__block", sort=False).groups.items():
                    blines = lines[np.asarray(idx)]
                    if block in pending:
                        pending[block].append(blines)
                        continue
                    fh = handles.get(block)
                    if fh is None:
                        subdir = os.path.join(
                            out_dir, block.strftime("%Y_%m"), block.strftime("%d")
                        )
                        fname = f"{station_name}_{block.strftime('%Y%m%d_%H%M')}.dat"
                        path = os.path.join(subdir, fname)
                        if merge and os.path.exists(path):
                            pending[block] = [blines]
                            pending_paths[block] = path
                            continue
                        os.makedirs(subdir, exist_ok=True)
                        fh = open(path, "w")
                        fh.write(header_text)
                        handles[block] = fh
                    fh.write("\n".join(blines) + "\n")
        finally:
            for fh in handles.values():
                fh.close()
        for block, parts in pending.items():
            _merge_block_file(
                pending_paths[block], header_text, np.concatenate(parts)
            )
        yield pd.DataFrame({"n": [n]})

    blocked.mapInPandas(write_partition, "n long").agg(F.sum("n")).collect()
