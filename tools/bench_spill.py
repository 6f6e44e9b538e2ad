"""Spill-regime bench: the two shuffle-heaviest queries under constrained
executor memory, closing SCALING.md's last caveat — the sf10 curve
(~360 MB parquet vs a 128 GiB sandbox) isolates compute/shuffle scaling
and never exercises memory pressure. This tool runs the same queries with
the JVM heap squeezed (SPARK_DRIVER_MEMORY, a static conf: in local mode
the driver IS the executor) so shuffle/aggregation actually spills, and
records wall time plus the spill counters from Spark's status REST API.

The question it answers for the 100 TB design: when a partition no longer
fits in execution memory, do these queries degrade boundedly (spill to
disk, finish slower) or fall off a cliff (OOM)? Spark's unified memory
manager + sort-based shuffle should give the former IF no operator holds
an unbounded in-memory structure per task — which is exactly what the
plan audit claims (banded self-joins, map-side partial aggs, no
collect_list over unbounded groups).

Usage (two runs, compare artifacts):
  SPARK_DRIVER_MEMORY=8g python tools/bench_spill.py --dir scaledata/sf10
  SPARK_DRIVER_MEMORY=2g python tools/bench_spill.py --dir scaledata/sf10

Prints one JSON line: heap, per-query sec + spill bytes, totals.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import __spark_entry__ as entrymod
from tern_ep_data_pipeline_spark.operators.dedup import (
    release_staged,
    stage_decisions,
)
from tern_ep_data_pipeline_spark.session import get_spark

#: The two queries whose shuffles carry the most bytes at sf10 (signature
#: tables + band self-joins + the 11-branch curation suite).
QUERIES = ["minhash_dedup", "llm_curation_suite"]


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=10) as resp:
        return json.load(resp)


def stage_spill_totals(spark) -> tuple[int, int, int]:
    """(memoryBytesSpilled, diskBytesSpilled, shuffleWriteBytes) summed over
    all completed stages, via the status REST API (needs spark.ui.enabled)."""
    base = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"
    app_id = spark.sparkContext.applicationId
    mem = disk = shuf = 0
    for st in _api(base, f"/api/v1/applications/{app_id}/stages?status=complete"):
        mem += st.get("memoryBytesSpilled", 0)
        disk += st.get("diskBytesSpilled", 0)
        shuf += st.get("shuffleWriteBytes", 0)
    return mem, disk, shuf


def main() -> None:
    ap = argparse.ArgumentParser()
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "scaledata")
    ap.add_argument("--dir", default=os.path.join(root, "sf10"))
    ap.add_argument("--queries", nargs="+", default=QUERIES)
    ap.add_argument("--runs", type=int, default=2)
    # the JVM logs gc,alloc warnings to STDOUT under memory pressure, which
    # pollutes a shell-redirected JSON; --json-out keeps the artifact clean
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    heap = os.environ.get("SPARK_DRIVER_MEMORY", "8g")
    spark = get_spark(
        f"bench-spill-{heap}",
        # the REST API is the only spill-metrics source; enable the UI for
        # this tool only (bench.py keeps it off)
        extra_conf={"spark.ui.enabled": "true"},
    )

    def spill_totals_safe(tag: str) -> tuple:
        # a raw JVM heap death takes the REST endpoint with it; the
        # artifact must still land with the error recorded
        try:
            return stage_spill_totals(spark)
        except Exception as exc:
            print(f"# spill metrics unavailable ({tag}): {exc}", file=sys.stderr)
            return None, None, None

    out: dict[str, dict] = {}
    for name in args.queries:
        fn = getattr(entrymod, f"q_{name}")
        runs = []
        rows = 0
        err = None
        m0, d0, s0 = spill_totals_safe(f"{name} pre")
        all_so_far = stage_decisions(spark)
        dec0 = all_so_far[-1]["seq"] if all_so_far else 0
        for _ in range(args.runs):
            t0 = time.time()
            # a query that OOMs under the constrained heap is itself a
            # result — record it instead of losing the whole artifact
            try:
                rows = fn(spark, args.dir).count()
                runs.append(round(time.time() - t0, 3))
            except Exception as exc:
                # classify memory deaths against the sizing invariant so the
                # artifact names the cause, not a Py4J call-site
                s = str(exc)
                if "OutOfMemoryError" in s:
                    err = (
                        "java.lang.OutOfMemoryError (executor heap): below "
                        "the executor sizing floor — SCALING.md ~100 MB/core "
                        "at sf10 density"
                    )
                elif "UNABLE_TO_ACQUIRE_MEMORY" in s:
                    err = (
                        "UNABLE_TO_ACQUIRE_MEMORY (execution pool exhausted): "
                        "below the executor sizing floor — SCALING.md "
                        "~100 MB/core at sf10 density"
                    )
                else:
                    err = f"{type(exc).__name__}: {s.splitlines()[0][:200]}"
                break
            finally:
                try:
                    release_staged(spark)
                    # under a squeezed heap, dead broadcast/staged blocks
                    # from the PREVIOUS query linger until the GC-driven
                    # ContextCleaner runs; nudge it so each query starts
                    # from a clean pool instead of inheriting fragments
                    spark.sparkContext._jvm.System.gc()
                except Exception:
                    pass
        m1, d1, s1 = spill_totals_safe(f"{name} post")
        have_metrics = None not in (m0, d0, s0, m1, d1, s1)
        # the plan-time persist-level decisions memguard made for this
        # query's staged frames (VERDICT r11 #3): how many derated to
        # DISK_ONLY, and why — the classified twin of the runtime spill
        # counters above
        decs = stage_decisions(spark, after_seq=dec0)
        derated = [d for d in decs if d["level"] == "disk"]
        out[name] = {
            "sec": min(runs) if runs else None,
            "sec_runs": runs,
            "rows": rows,
            "error": err,
            "memory_spilled_mb": round((m1 - m0) / 2**20, 1) if have_metrics else None,
            "disk_spilled_mb": round((d1 - d0) / 2**20, 1) if have_metrics else None,
            "shuffle_write_mb": round((s1 - s0) / 2**20, 1) if have_metrics else None,
            "staged_persists": len(decs),
            "staged_derated_to_disk": len(derated),
            "derate_reason": derated[0]["reason"] if derated else None,
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)

    line = json.dumps(
        {
            "metric": "spill_regime",
            "heap": heap,
            "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
            "dir": args.dir,
            "loadavg": round(os.getloadavg()[0], 2),
            "queries": out,
        }
    )
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as fh:
            fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
