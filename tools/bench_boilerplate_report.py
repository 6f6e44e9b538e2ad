"""End-to-end two-phase probe cell through a REAL consumer (r14
verdict #2): the wide (keep_text) line-index twin + the boilerplate
lines report.

Builds the wide line index from a scale-corpus prefix, then runs the
SAME backfill-sized report three ways and pins the rows identical:

- ``scan``      — no prune (bloom_fpp=None): the full wide index scan
                  feeds the count aggregation.
- ``direct``    — bloom prune, wide-payload routing suppressed
                  (WIDE_PAYLOAD_BYTES raised): the Arrow kernel probes
                  FULL rows, line bytes cross the Arrow boundary.
- ``two_phase`` — bloom prune, default gate: the kernel probes a
                  key-only projection, survivors broadcast back as a
                  JVM semi join; payload bytes never reach Arrow. The
                  route is asserted from the
                  ``tern.bloom_prune.two_phase`` local property.

The bloom strategy is forced (prune_strategy='bloom') because this is
the BACKFILL regime the two-phase path exists for — a batch past the
32 MiB broadcast-semi budget; small incremental batches take the exact
semi and never reach the bloom kernel at all.

Usage:
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEMORY=8g \
      python tools/bench_boilerplate_report.py --dir scaledata/sf3 \
      --index-docs 50000 --batch-docs 20000

Prints one JSON line (merge into BLOOM_r15.json / cite in README).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from tern_ep_data_pipeline_spark.operators import bloom  # noqa: E402
from tern_ep_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    root = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "scaledata"
    )
    ap.add_argument("--dir", default=os.path.join(root, "sf3"))
    ap.add_argument("--index-docs", type=int, default=50_000)
    ap.add_argument("--batch-docs", type=int, default=20_000)
    ap.add_argument("--min-docs", type=int, default=3)
    ap.add_argument("--line-tokens", type=int, default=8)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="boiler-report-")
    spark = get_spark("boilerplate-report")
    from pyspark.sql import functions as F

    from tern_ep_data_pipeline_spark.operators.dedup import release_staged
    from tern_ep_data_pipeline_spark.operators.dedup_index import (
        boilerplate_lines_report,
        build_line_index,
    )

    docs = spark.read.parquet(
        os.path.join(args.dir, "documents.parquet")
    ).select("doc_id", "text")
    # synthetic docs are space-joined single lines; split them into
    # multi-token pseudo-lines so the line table has realistic shape
    n = args.line_tokens
    lined = docs.select(
        "doc_id",
        F.regexp_replace(
            "text", r"((\S+\s+){%d}\S+)\s+" % (n - 1), r"$1\n"
        ).alias("text"),
    )
    corpus = lined.where(F.col("doc_id") < args.index_docs)
    idx = os.path.join(work, "lidx")
    t0 = time.time()
    n_lines = build_line_index(corpus, idx, keep_text=True)
    build_s = round(time.time() - t0, 3)
    release_staged(spark)

    bpath = os.path.join(work, "batch")
    lined.where(
        (F.col("doc_id") >= args.index_docs)
        & (F.col("doc_id") < args.index_docs + args.batch_docs)
    ).write.parquet(bpath)
    batch = spark.read.parquet(bpath)

    sc = spark.sparkContext
    routes = {
        "scan": dict(bloom_fpp=None),
        "direct": dict(bloom_fpp=0.01, prune_strategy="bloom"),
        "two_phase": dict(bloom_fpp=0.01, prune_strategy="bloom"),
    }
    cells: dict = {}
    digests = set()
    wide_default = bloom.WIDE_PAYLOAD_BYTES
    for name, kw in routes.items():
        bloom.WIDE_PAYLOAD_BYTES = (
            1 << 40 if name == "direct" else wide_default
        )
        walls = []
        rows = None
        for _ in range(args.runs):
            t0 = time.time()
            rows = boilerplate_lines_report(
                spark, batch, idx, min_docs=args.min_docs, **kw
            ).collect()
            walls.append(round(time.time() - t0, 3))
            release_staged(spark)
        prop = sc.getLocalProperty("tern.bloom_prune.two_phase")
        digest = hashlib.md5(
            repr(sorted(map(tuple, rows))).encode()
        ).hexdigest()[:16]
        digests.add(digest)
        cells[name] = {
            "wall_s": walls,
            "best_s": min(walls),
            "report_rows": len(rows),
            "two_phase_property": prop,
            "report_digest": digest,
        }
        print(f"# {name}: {cells[name]}", file=sys.stderr)
    bloom.WIDE_PAYLOAD_BYTES = wide_default

    assert cells["two_phase"]["two_phase_property"] == "broadcast", cells
    assert cells["direct"]["two_phase_property"].startswith(
        "direct"
    ) or cells["direct"]["two_phase_property"].startswith("declined"), cells

    result = {
        "metric": "boilerplate_report_two_phase_end_to_end",
        "dir": args.dir,
        "heap": os.environ.get("SPARK_DRIVER_MEMORY", "(default)"),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "(default)"),
        "index_docs": args.index_docs,
        "index_lines": n_lines,
        "batch_docs": args.batch_docs,
        "index_build_s": build_s,
        "routes": cells,
        "reports_identical_across_routes": len(digests) == 1,
        "speedup_two_phase_over_direct_best": round(
            cells["direct"]["best_s"] / cells["two_phase"]["best_s"], 2
        ),
        "loadavg": os.getloadavg()[0],
    }
    line = json.dumps(result)
    if args.json_out:
        with open(args.json_out, "w") as fh:
            fh.write(line + "\n")
    print(line)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
