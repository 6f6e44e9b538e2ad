"""Root-cause probe for the bucketed match-index append growth
(BLOOM_r15 aging probe -> VERDICT r15 #2): drive N bucketed batches and
record, per batch, the wall NEXT TO the physical state that could explain
its growth — parquet file counts per table, warehouse listing time, and
the classify-vs-append split inside the sink.

Usage: SPARK_GRAFT_CPUS=32 python tools/probe_bucketed_aging.py \
    [--dir scaledata/sf3] [--seed-docs 50000] [--batches 20] [--batch 1000] \
    [--compact-every 10] [--json-out /tmp/aging.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_stream_match import _build_index, _dedup_seed, _drain, _make_stream  # noqa: E402
from tern_ep_data_pipeline_spark.session import get_spark  # noqa: E402


def _file_stats(table_dir: str) -> tuple[int, int]:
    files = glob.glob(os.path.join(table_dir, "**", "*"), recursive=True)
    pq = [f for f in files if os.path.isfile(f)]
    return len(pq), sum(os.path.getsize(f) for f in pq)


def main() -> None:
    ap = argparse.ArgumentParser()
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scaledata"
    )
    ap.add_argument("--dir", default=os.path.join(root, "sf3"))
    ap.add_argument("--seed-docs", type=int, default=50_000)
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--batch", type=int, default=1000)
    ap.add_argument("--dup-frac", type=float, default=0.3)
    ap.add_argument("--compact-every", type=int, default=10)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="aging-probe-")
    wh = os.path.join(work, "warehouse")
    spark = get_spark(
        "aging-probe",
        extra_conf={
            "spark.sql.warehouse.dir": wh,
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    from pyspark.sql import functions as F

    from tern_ep_data_pipeline_spark.operators.dedup import release_staged
    from tern_ep_data_pipeline_spark.operators.dedup_index import (
        compact_match_index_bucketed,
    )
    from tern_ep_data_pipeline_spark.streaming.curation import match_dedup_batch

    docs = spark.read.parquet(
        os.path.join(args.dir, "documents.parquet")
    ).select("doc_id", "text")
    seed = _dedup_seed(docs, args.seed_docs)
    seed.count()
    idx, kw, build_s, cleanup = _build_index(spark, seed, "bucketed", work, "aging")
    table = kw["index_table"]
    total = args.batches * args.batch
    stream = _make_stream(docs, seed, args.seed_docs, total, args.dup_frac)

    cells = []
    for b in range(args.batches):
        blo = args.seed_docs + b * args.batch
        part = stream.where(
            (F.col("doc_id") >= blo) & (F.col("doc_id") < blo + args.batch)
        ).localCheckpoint()
        _drain(spark)
        t0 = time.time()
        out = match_dedup_batch(part, idx, **kw)
        n = len(out.collect())
        wall = round(time.time() - t0, 3)
        release_staged(spark)
        ex_files, ex_bytes = _file_stats(os.path.join(wh, f"{table}_exact".lower()))
        bd_files, bd_bytes = _file_stats(os.path.join(wh, f"{table}_bands".lower()))
        meta_files = 0
        for suffix in ("_exact_meta", "_bands_meta", "_meta"):
            d = os.path.join(wh, f"{table}{suffix}".lower())
            if os.path.isdir(d):
                meta_files += _file_stats(d)[0]
        cell = {
            "batch_id": b,
            "rows": n,
            "wall_s": wall,
            "exact_files": ex_files,
            "bands_files": bd_files,
            "meta_files": meta_files,
            "exact_mb": round(ex_bytes / 1e6, 1),
            "bands_mb": round(bd_bytes / 1e6, 1),
        }
        if args.compact_every and (b + 1) % args.compact_every == 0:
            t0 = time.time()
            compact_match_index_bucketed(spark, table)
            cell["compact_s"] = round(time.time() - t0, 3)
            cell["post_compact_files"] = (
                _file_stats(os.path.join(wh, f"{table}_exact".lower()))[0],
                _file_stats(os.path.join(wh, f"{table}_bands".lower()))[0],
            )
        cells.append(cell)
        print(f"# b{b}: {cell}", file=sys.stderr)

    result = {
        "metric": "bucketed_aging_rootcause",
        "seed_docs": args.seed_docs,
        "batch": args.batch,
        "seed_build_s": build_s,
        "cells": cells,
        "loadavg": os.getloadavg()[0],
    }
    line = json.dumps(result)
    if args.json_out:
        with open(args.json_out, "w") as fh:
            fh.write(line + "\n")
    print(line)
    cleanup()
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
