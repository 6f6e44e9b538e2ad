"""SPILL_r10/r11 evidence tool (VERDICT r9 #3 + #8; r10 #1).

Two measurements backing this round's scale claims:

A. **Streaming dedup state boundedness** — runs the real
   ``streaming.curation.curated_document_stream`` (watermarked
   ``dropDuplicatesWithinWatermark`` on the content hash) over >= 20
   file-source micro-batches at dup_frac 0.5 with event time advancing
   past the watermark horizon, and logs the state store's
   ``numRowsTotal`` / ``numRowsDroppedByWatermark`` / state memory from
   each batch's StreamingQueryProgress. The boundedness claim in
   ``streaming/curation.py`` is that state is (arrival rate x horizon),
   not corpus size: the artifact shows rows peaking at the horizon's
   distinct-hash count and then PLATEAUING while total ingested rows
   keep growing, with watermark evictions visible.

B. **Partition-scoped compaction cost ∝ dirty bytes** — builds the
   range-partitioned gram index over a dup-heavy corpus slice, runs a
   full first compaction (every partition dirty), then appends a small
   batch and re-compacts: the second run must rewrite only the dirtied
   partitions, with bytes_rewritten tracking dirty bytes rather than
   index bytes. r11 (VERDICT r10 #1): with LSM run tiering, a uniform
   gram-hash workload — which dirties EVERY range partition at once and
   previously forced whole-partition rewrites at 4.7x its dirty bytes —
   must now run-fold at write amplification <= 1.5x over the triggered
   passes of the schedule (the tool ASSERTS this bar).

Usage:
  SPARK_GRAFT_CPUS=8 python tools/bench_stream_state.py \
      --dir scaledata/sf1 --batches 20 --dup-frac 0.5
Prints one JSON line (goes to SPILL_r11.json).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from tern_ep_data_pipeline_spark.session import get_spark  # noqa: E402


def stream_state_run(spark, n_batches: int, rows_per_batch: int, dup_frac: float) -> dict:
    from pyspark.sql import functions as F

    from tern_ep_data_pipeline_spark.streaming.curation import (
        curated_document_stream,
    )

    work = tempfile.mkdtemp(prefix="stream_state_")
    src = os.path.join(work, "src")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(src)
    try:
        # batch k advances event time by 30 min; watermark 1 hour -> a
        # hash's state lives ~2-3 batches, so distinct content repeating
        # EVERY batch (the dup half) re-enters state after eviction and
        # the plateau, not the total distinct count, bounds the store
        n_dup = int(rows_per_batch * dup_frac)
        for k in range(n_batches):
            rows = []
            base_ts = k * 1800  # seconds; 30 min per batch
            for i in range(rows_per_batch):
                if i < n_dup:
                    body = f"shared boilerplate body number {i % 50} " + "pad " * 20
                else:
                    body = f"unique document {k}-{i} " + " ".join(
                        f"w{k}x{i}y{j}" for j in range(20)
                    )
                rows.append((k * rows_per_batch + i, body, base_ts + (i % 1800)))
            spark.createDataFrame(
                rows, "doc_id long, text string, ingest_sec long"
            ).withColumn(
                "ingest_ts", F.timestamp_seconds(F.col("ingest_sec"))
            ).drop("ingest_sec").coalesce(1).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema("doc_id long, text string, ingest_ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = curated_document_stream(stream, watermark="1 hour")
        q = (
            out.writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        prog = [json.loads(p.json) for p in q.recentProgress]
        batches = []
        for p in prog:
            ops = p.get("stateOperators") or []
            if not ops:
                continue
            op = ops[0]
            batches.append(
                {
                    "batch_id": p.get("batchId"),
                    "input_rows": p.get("numInputRows"),
                    "state_rows": op.get("numRowsTotal"),
                    "state_bytes": op.get("memoryUsedBytes"),
                    "rows_dropped_by_watermark": op.get(
                        "numRowsDroppedByWatermark"
                    ),
                    "rows_removed": op.get("numRowsRemoved"),
                }
            )
        peak = max(b["state_rows"] for b in batches)
        final = batches[-1]["state_rows"]
        total_in = sum(b["input_rows"] or 0 for b in batches)
        # the boundedness assertion: a key's state lives until the
        # watermark passes it — the 1 h delay spans 2 batches at 30 min
        # per batch, plus the watermark's own update lag (computed from
        # the PREVIOUS batch's max event time, evicted the batch after):
        # retention <= delay_batches + 3. Peak state must fit that many
        # batches' distinct hashes — a HORIZON bound, not corpus size.
        distinct_per_batch = rows_per_batch - n_dup + 50
        horizon_distinct = (2 + 3) * distinct_per_batch
        assert peak <= horizon_distinct, (
            f"state peaked at {peak} rows > horizon bound {horizon_distinct} "
            f"— dropDuplicatesWithinWatermark state is NOT bounded as claimed"
        )
        # and it PLATEAUS: the final batch's state is at the plateau, far
        # below the run's total distinct count (which keeps growing)
        total_distinct = n_batches * distinct_per_batch
        assert peak < total_distinct / 2, (
            f"peak state {peak} tracks the corpus ({total_distinct} distinct)"
        )
        evicted = sum(b["rows_removed"] or 0 for b in batches)
        assert evicted > 0, "watermark never evicted state — horizon untested"
        return {
            "batches": batches,
            "n_batches": len(batches),
            "rows_ingested": total_in,
            "peak_state_rows": peak,
            "final_state_rows": final,
            "state_rows_evicted": evicted,
            "horizon_bound_rows": horizon_distinct,
            "bounded": True,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def compaction_dirty_run(spark, sf_dir: str, parts: int) -> dict:
    from tern_ep_data_pipeline_spark.operators.dedup_index import (
        append_to_gram_index,
        build_gram_index,
        compact_gram_index,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = docs.count()
    base = docs.where(f"doc_id < {int(n * 0.7)}")
    work = tempfile.mkdtemp(prefix="ranged_idx_")
    idx = os.path.join(work, "gidx")
    try:
        build_gram_index(base, idx, range_partitions=parts)
        t0 = time.time()
        s_full = compact_gram_index(spark, idx)
        t_full = time.time() - t0
        # a per-batch compaction schedule (the r9 flat layout paid
        # t_full x O(index) on EVERY one of these): sub-threshold passes
        # must cost ~0, and the rewrite only triggers once accumulated
        # appends cross the 20% dirty threshold
        runs = []
        lo = int(n * 0.7)
        step = max(1, int(n * 0.0375))
        for i in range(8):
            batch = docs.where(
                f"doc_id >= {lo + i * step} and doc_id < {lo + (i + 1) * step}"
            )
            append_to_gram_index(batch, idx)
            t0 = time.time()
            s = compact_gram_index(spark, idx)
            runs.append(
                {
                    "t_sec": round(time.time() - t0, 3),
                    "partitions_compacted": s["partitions_compacted"],
                    "partitions_merged": s["partitions_merged"],
                    "partitions_run_folded": s["partitions_run_folded"],
                    "partitions_total": s["partitions_total"],
                    "bytes_rewritten": s["bytes_rewritten"],
                    "bytes_total": s["bytes_total"],
                    "bytes_dirty": s["bytes_dirty"],
                    "bytes_dirty_compacted": s["bytes_dirty_compacted"],
                }
            )
        skipped = [r for r in runs if r["partitions_compacted"] == 0]
        assert skipped, "no sub-threshold pass was skipped"
        assert max(r["t_sec"] for r in skipped) < 0.05 * t_full, (
            "a skipped pass still paid a meaningful fraction of a full rewrite"
        )
        # the r11 bar (VERDICT r10 #1): across the schedule's TRIGGERED
        # passes, bytes rewritten <= 1.5x the dirty bytes of the
        # partitions those passes ACTUALLY compacted (the global
        # bytes_dirty would re-count sub-threshold partitions' L0 every
        # pass and understate amplification) — the LSM run tier absorbs
        # uniform appends without base rewrites
        triggered = [r for r in runs if r["partitions_compacted"] > 0]
        assert triggered, "no pass ever triggered — schedule can't measure"
        amp_num = sum(r["bytes_rewritten"] for r in triggered)
        amp_den = max(sum(r["bytes_dirty_compacted"] for r in triggered), 1)
        amplification = amp_num / amp_den
        assert amplification <= 1.5, (
            f"write amplification {amplification:.2f}x > 1.5x — run tiering "
            "is not bounding the uniform-key rewrite cost"
        )
        total_rewritten = sum(r["bytes_rewritten"] for r in runs)
        flat_equiv = t_full * len(runs)
        return {
            "range_partitions": parts,
            "full_pass": {
                "t_sec": round(t_full, 3),
                "partitions_compacted": s_full["partitions_compacted"],
                "bytes_rewritten": s_full["bytes_rewritten"],
            },
            "incremental_passes": runs,
            "schedule_cost_sec": round(sum(r["t_sec"] for r in runs), 3),
            "flat_layout_equivalent_sec": round(flat_equiv, 3),
            "bytes_rewritten_over_schedule": total_rewritten,
            "write_amplification_triggered": round(amplification, 3),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def merge_crossing_run(
    spark,
    sf_dir: str,
    parts: int,
    base_merge_fraction: float | None = None,
    appends: int = 16,
) -> dict:
    """Amortised write amplification across a schedule long enough to
    CROSS a base merge (the triggered-pass 1.0x figure covers run folds
    only; an honest LSM accounting must include the deferred base
    rewrite it amortises). Aggressive threshold + many small appends
    push runs past _BASE_MERGE_FRACTION; reported:
    amortised = total bytes_rewritten / total dirty bytes compacted,
    merges included. ``base_merge_fraction`` overrides the module
    default for the duration of the run (the --merge-fraction-sweep
    mode maps the write-amp vs read-amp trade this knob controls); the
    final tier byte split and max run-generation depth are reported as
    the read-amplification side of that trade."""
    from tern_ep_data_pipeline_spark.operators import dedup_index as di
    from tern_ep_data_pipeline_spark.operators.dedup_index import (
        append_to_gram_index,
        build_gram_index,
        compact_gram_index,
    )

    prev_fraction = di._BASE_MERGE_FRACTION
    if base_merge_fraction is not None:
        di._BASE_MERGE_FRACTION = base_merge_fraction

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = docs.count()
    base = docs.where(f"doc_id < {int(n * 0.5)}")
    work = tempfile.mkdtemp(prefix="ranged_idx_merge_")
    idx = os.path.join(work, "gidx")
    try:
        build_gram_index(base, idx, range_partitions=parts)
        compact_gram_index(spark, idx)  # establish the base tier
        lo = int(n * 0.5)
        # spread the remaining half of the corpus over the schedule so a
        # longer schedule (sweep mode at high merge fractions) still has
        # real rows per append
        step = max(1, (n - lo) // appends)
        rewritten = dirty_compacted = merges = folds = 0
        passes = []
        for i in range(appends):
            batch = docs.where(
                f"doc_id >= {lo + i * step} and doc_id < {lo + (i + 1) * step}"
            )
            append_to_gram_index(batch, idx)
            s = compact_gram_index(spark, idx, dirty_threshold=0.05)
            rewritten += s["bytes_rewritten"]
            dirty_compacted += s["bytes_dirty_compacted"]
            merges += s["partitions_merged"]
            folds += s["partitions_run_folded"]
            if s["partitions_compacted"]:
                passes.append(
                    {
                        "i": i,
                        "merged": s["partitions_merged"],
                        "run_folded": s["partitions_run_folded"],
                        "bytes_rewritten": s["bytes_rewritten"],
                        "bytes_dirty_compacted": s["bytes_dirty_compacted"],
                    }
                )
        amortised = rewritten / max(dirty_compacted, 1)
        # read-amplification side of the trade: how much of the final
        # table lives OUTSIDE the base tier (readers re-fold it on every
        # clean), and how deep the run stack got
        gp = os.path.join(idx, "grams")
        tier_bytes = {"base": 0, "run": 0, "l0": 0}
        max_gens = 0
        for d in os.listdir(gp):
            pdir = os.path.join(gp, d)
            if d.startswith("__part=") and os.path.isdir(pdir):
                t = di._part_tiers(pdir)
                for k in tier_bytes:
                    tier_bytes[k] += sum(sz for _f, sz in t[k])
                max_gens = max(max_gens, di._run_generations(t))
        return {
            "range_partitions": parts,
            "dirty_threshold": 0.05,
            "base_merge_fraction": di._BASE_MERGE_FRACTION,
            "appends": appends,
            "partition_merges": merges,
            "partition_run_folds": folds,
            "triggered_passes": passes,
            "bytes_rewritten_total": rewritten,
            "bytes_dirty_compacted_total": dirty_compacted,
            "amortised_amplification_incl_merges": round(amortised, 3),
            # crossed_base_merge False would mean the schedule never
            # exercised the deferred rewrite — the figure above would
            # then be the run-fold-only number, not the amortised one
            "crossed_base_merge": merges > 0,
            "final_tier_bytes": tier_bytes,
            "final_nonbase_fraction": round(
                (tier_bytes["run"] + tier_bytes["l0"])
                / max(sum(tier_bytes.values()), 1),
                3,
            ),
            "final_max_run_generations": max_gens,
        }
    finally:
        di._BASE_MERGE_FRACTION = prev_fraction
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="scaledata/sf1")
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--rows-per-batch", type=int, default=2000)
    ap.add_argument("--dup-frac", type=float, default=0.5)
    ap.add_argument("--range-partitions", type=int, default=16)
    ap.add_argument(
        "--merge-fraction-sweep",
        nargs="*",
        type=float,
        default=None,
        help="instead of the full artifact, run merge_crossing at each "
        "given _BASE_MERGE_FRACTION (default sweep: 0.5 1.0 2.0) and "
        "print the write-amp vs read-amp trade curve",
    )
    args = ap.parse_args()
    spark = get_spark("stream-state-bench")
    if args.merge_fraction_sweep is not None:
        fracs = args.merge_fraction_sweep or [0.5, 1.0, 2.0]
        # scale the schedule so every point actually CROSSES its merge
        # trigger (runs must accumulate past f x base) — a point that
        # never merges reports a fold-only number, not the amortised one
        points = [
            merge_crossing_run(
                spark,
                args.dir,
                args.range_partitions,
                base_merge_fraction=f,
                appends=int(16 * max(1.0, 2.0 * f)),
            )
            for f in fracs
        ]
        print(json.dumps({"metric": "merge_fraction_sweep", "points": points}))
        spark.stop()
        return
    out = {
        "metric": "spill_r11",
        "dup_frac": args.dup_frac,
        "stream_state": stream_state_run(
            spark, args.batches, args.rows_per_batch, args.dup_frac
        ),
        "ranged_compaction": compaction_dirty_run(
            spark, args.dir, args.range_partitions
        ),
        "merge_crossing": merge_crossing_run(
            spark, args.dir, args.range_partitions
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
