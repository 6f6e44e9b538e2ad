"""Two-phase-vs-direct Bloom probe microbench (BLOOM_r13
`wide_two_phase_microbench`): a synthetic 5M-row index with a wide
payload, 1000 batch keys, and the downstream pre-aggregation shape the
prune serves. Run once with a variable-width (string) payload and once
with a fixed-width (array<long>) payload — the pair is the measured
basis for `bloom.WIDE_PAYLOAD_BYTES` counting only string/binary bytes:
Arrow conversion of variable-width payloads costs per-row offset+data
copies (two-phase wins ~1.7x), fixed-width payloads move as flat
buffers (direct wins ~1.3x; two-phase pays a second scan for nothing).

Usage:
  python tools/bench_twophase.py --payload string
  python tools/bench_twophase.py --payload array
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from tern_ep_data_pipeline_spark.operators import bloom
from tern_ep_data_pipeline_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--payload", choices=["string", "array"], default="string")
    ap.add_argument("--rows", type=int, default=5_000_000)
    ap.add_argument("--batch", type=int, default=1_000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    spark = get_spark("bench-twophase")
    payload = (
        "repeat(uuid(), 8) as payload"          # ~290 B variable-width
        if args.payload == "string"
        else "array_repeat(id, 32) as payload"  # ~260 B fixed-width
    )
    scratch = "/tmp/twophase_idx"
    spark.range(args.rows).selectExpr("id % 1000000 as k", payload).write.mode(
        "overwrite"
    ).parquet(scratch)
    idx = spark.read.parquet(scratch)
    keys = spark.range(args.batch).select((F.col("id") * 997).alias("k"))
    probe = (
        F.min(F.substring("payload", 1, 8))
        if args.payload == "string"
        else F.min(F.element_at("payload", 1))
    )

    def timed(frame) -> float:
        t0 = time.monotonic()
        frame.groupBy("k").agg(F.count(F.lit(1)).alias("c"), probe.alias("m")).count()
        return round(time.monotonic() - t0, 2)

    cells = {}
    for tag, wide_bytes, strategy in (
        ("unpruned", None, None),
        ("semi", 1 << 30, "semi"),
        ("direct_arrow", 1 << 30, "bloom"),  # gate raised -> direct probe
        ("two_phase", 0, "bloom"),           # gate floored -> two-phase
    ):
        runs = []
        for _ in range(args.runs):
            if strategy is None:
                frame = idx
            else:
                orig = bloom.WIDE_PAYLOAD_BYTES
                bloom.WIDE_PAYLOAD_BYTES = wide_bytes
                try:
                    frame = bloom.prune_index_by_keys(
                        idx, ["k"], keys, strategy=strategy
                    )
                finally:
                    bloom.WIDE_PAYLOAD_BYTES = orig
            runs.append(timed(frame))
        cells[tag] = {"min_s": min(runs), "runs_s": runs}
        print(f"# {tag}: {cells[tag]}", file=sys.stderr)

    line = json.dumps({
        "metric": "wide_two_phase_microbench",
        "payload": args.payload,
        "index_rows": args.rows,
        "batch_keys": args.batch,
        "cells": cells,
        "loadavg": list(os.getloadavg()),
    })
    if args.json_out:
        with open(args.json_out, "w") as fh:
            fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
