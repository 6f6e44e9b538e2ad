"""Throughput micro-bench for the 10 Hz fast-data path (the 100 TB design
point: TOB3 binary decode -> condition -> 30-min TOA5 blocks).

Generates a realistic daily-TOB3 workload (N day-files, 10 Hz, IEEE4+FP2
record layout, valid frame stamps) with vectorised numpy, then times the
composed ``plans.fast_path.run_fast_path`` on local Spark and prints one
JSON line with MB/s and records/s. Input bytes scale with --files/--hours;
the decode parallelises per file (binaryFile + mapInPandas), so throughput
should scale ~linearly with cores until the block-write fan-in.

Usage: python tools/bench_fastpath.py [--files 8] [--hours 4]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import struct
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from tern_ep_data_pipeline_spark.plans.fast_path import run_fast_path
from tern_ep_data_pipeline_spark.session import get_spark

FIELDS = ["Ux", "Uy", "Uz", "Ts_sonic", "diag"]
TYPES = ["IEEE4", "IEEE4", "IEEE4", "IEEE4", "FP2"]
REC_SIZE = 4 * 4 + 2
NREC = 32  # records per major frame
FRAME_SIZE = 12 + NREC * REC_SIZE + 4
VALID = 0xA5A5
HZ = 10
EPOCH_1990 = 631_152_000  # 1990-01-01 in unix seconds


def _header(station: str) -> bytes:
    lines = [
        f'"TOB3","{station}","CR6","1111","CR6.Std","CPU:fast.CR6","2222","2024-01-02 00:00:00"',
        f'"fast_table","100 MSEC","{FRAME_SIZE}","86400","{VALID}","SecUsec"',
        '"' + '","'.join(FIELDS) + '"',
        '"m/s","m/s","m/s","degC","arb"',
        '"Smp","Smp","Smp","Smp","Smp"',
        '"' + '","'.join(TYPES) + '"',
    ]
    return ("\n".join(lines) + "\n").encode()


def make_day_file(path: str, day_idx: int, hours: float) -> int:
    """Write one daily TOB3 file with ``hours`` of 10 Hz data; returns bytes."""
    n_records = int(hours * 3600 * HZ)
    n_frames = n_records // NREC
    n_records = n_frames * NREC
    sec0 = 1_072_958_400 + day_idx * 86400  # 2024-01-01 + day, 1990 epoch

    rec = np.zeros(
        n_frames,
        dtype=np.dtype(
            [
                ("sec", "<u4"),
                ("usec", "<u4"),
                ("beg", "<u4"),
                ("body", "V", NREC * REC_SIZE),
                ("foot", "<u4"),
            ]
        ),
    )
    # frame header: whole seconds + sub-second of the first record
    first_rec = np.arange(n_frames, dtype=np.uint64) * NREC
    rec["sec"] = (sec0 + first_rec // HZ).astype(np.uint32)
    rec["usec"] = ((first_rec % HZ) * (1_000_000 // HZ)).astype(np.uint32)
    rec["beg"] = first_rec.astype(np.uint32)
    rec["foot"] = VALID << 16  # offset=0, valid stamp in high half

    # record payload: 4 IEEE4 + 1 FP2 per record, vectorised
    t = (np.arange(n_frames * NREC, dtype=np.float32) / HZ)[:, None]
    vals = np.hstack(
        [
            np.sin(t * 0.1) * 3.0,
            np.cos(t * 0.1) * 3.0,
            np.sin(t * 0.01),
            20.0 + np.sin(t * 0.001) * 5.0,
        ]
    ).astype("<f4")
    fp2 = np.full(n_frames * NREC, 0x07B, dtype=">u2")  # FP2 12.3
    body = np.zeros((n_frames * NREC, REC_SIZE), dtype=np.uint8)
    body[:, : 4 * 4] = vals.view(np.uint8).reshape(-1, 16)
    body[:, 4 * 4 :] = fp2.view(np.uint8).reshape(-1, 2)
    rec["body"] = np.ascontiguousarray(body.reshape(n_frames, -1)).view(
        f"V{NREC * REC_SIZE}"
    )[:, 0]

    with open(path, "wb") as f:
        f.write(_header("BenchSite_EC"))
        f.write(rec.tobytes())
    return os.path.getsize(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=8)
    ap.add_argument("--hours", type=float, default=4.0)
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="fastpath_bench_")
    tob_dir = os.path.join(work, "tob3")
    out_dir = os.path.join(work, "blocks")
    os.makedirs(tob_dir)
    total_bytes = 0
    for d in range(args.files):
        total_bytes += make_day_file(
            os.path.join(tob_dir, f"day_{d:03d}.dat"), d, args.hours
        )

    spark = get_spark("bench-fastpath")
    try:
        sample = os.path.join(tob_dir, "day_000.dat")
        t0 = time.time()
        n = run_fast_path(
            spark, os.path.join(tob_dir, "*.dat"), out_dir, sample_path=sample
        )
        wall = time.time() - t0
        n_blocks = sum(len(fs) for _, _, fs in os.walk(out_dir))
        print(
            json.dumps(
                {
                    "metric": "fastpath_throughput",
                    "input_mb": round(total_bytes / 1e6, 1),
                    "records": n,
                    "blocks_written": n_blocks,
                    "wall_s": round(wall, 2),
                    "mb_per_s": round(total_bytes / 1e6 / wall, 1),
                    "records_per_s": int(n / wall),
                }
            )
        )
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
