"""Streaming match-dedup sink + DSIR scorer evidence cells (r13 verdict
#2 and #1's measured cell).

The match-dedup sink (``streaming.curation.match_dedup_batch`` — the
exact foreachBatch body of ``match_deduped_stream_sink``) has
correctness and exactly-once tests but, unlike the span sink, no
BLOOM/SPILL-style per-micro-batch evidence. This tool seeds the match
index from a corpus prefix, then drives sequential micro-batches with a
configurable duplicate fraction and records per batch: wall, shuffle
bytes, classification counts, index growth — on BOTH layouts (parquet
dir and bucketed table), asserting the decisions identical in-run.

The DSIR cell measures the r14 vectorised scorer (hash_mode='fast')
against the per-token portable twin over the same documents through
the real mapInPandas path, repeated so the warm (steady-state) rate is
visible next to the cold one, asserting score parity in-run.

Usage:
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEMORY=8g \
      python tools/bench_stream_match.py --dir scaledata/sf3 \
      --seed-docs 50000 --batches 3 --batch 1000 --dup-frac 0.3

Prints one JSON line (merge into BLOOM_r14.json / cite in README).
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_spill import stage_spill_totals  # noqa: E402
from tern_ep_data_pipeline_spark.session import get_spark  # noqa: E402


def _drain(spark) -> None:
    try:
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(10_000)
    except Exception:
        time.sleep(1.0)


def main() -> None:
    ap = argparse.ArgumentParser()
    root = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "scaledata"
    )
    ap.add_argument("--dir", default=os.path.join(root, "sf3"))
    ap.add_argument("--seed-docs", type=int, default=50_000)
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1000)
    ap.add_argument("--dup-frac", type=float, default=0.3)
    ap.add_argument("--dsir-runs", type=int, default=3)
    ap.add_argument("--dsir-zipf-docs", type=int, default=30_000)
    ap.add_argument("--dsir-zipf-vocab", type=int, default=200_000)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="stream-match-")
    spark = get_spark(
        "stream-match",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.sql.warehouse.dir": os.path.join(work, "warehouse"),
        },
    )
    from pyspark.sql import functions as F

    from tern_ep_data_pipeline_spark.operators.dedup import release_staged
    from tern_ep_data_pipeline_spark.operators.dedup_index import (
        build_dedup_index,
        build_dedup_index_bucketed,
    )
    from tern_ep_data_pipeline_spark.streaming.curation import (
        match_dedup_batch,
    )

    docs = spark.read.parquet(
        os.path.join(args.dir, "documents.parquet")
    ).select("doc_id", "text")
    from pyspark.sql.window import Window

    seed = docs.where(F.col("doc_id") < args.seed_docs)
    # the index contract wants an already-deduplicated corpus: collapse
    # exact copies to the min-id representative before seeding
    seed = (
        seed.withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy(F.md5("text")).orderBy("doc_id")
            ),
        )
        .where("__r = 1")
        .drop("__r")
        .localCheckpoint()
    )
    n_seed = seed.count()

    # micro-batches: fresh ids after the seed range; dup-frac of each
    # batch's docs copy a seed doc's text (half exact, half with a
    # 2-token suffix -> near), deterministically by id
    base = seed.select(
        (F.col("doc_id") % args.batch).alias("__k"),
        F.col("text").alias("__seed_text"),
    ).dropDuplicates(["__k"])
    batch_frames = []
    for b in range(args.batches):
        lo = args.seed_docs + b * args.batch
        part = (
            docs.where(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + args.batch)
            )
            .withColumn("__k", F.col("doc_id") % args.batch)
            .join(F.broadcast(base), "__k", "left")
        )
        cut = int(args.dup_frac * args.batch)
        part = part.select(
            "doc_id",
            F.when(
                (F.col("doc_id") % args.batch < cut // 2)
                & F.col("__seed_text").isNotNull(),
                F.col("__seed_text"),
            )
            .when(
                (F.col("doc_id") % args.batch < cut)
                & F.col("__seed_text").isNotNull(),
                F.concat_ws(" ", F.col("__seed_text"), F.lit("zz98 zz99")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        ).localCheckpoint()
        batch_frames.append(part)

    layouts = {}
    for layout in ("dir", "bucketed"):
        idx = os.path.join(work, f"midx_{layout}")
        kw = (
            {"index_table": f"bench_midx_{layout}", "n_buckets": 32}
            if layout == "bucketed"
            else {}
        )
        t0 = time.time()
        if layout == "bucketed":
            build_dedup_index_bucketed(seed, kw["index_table"])
        else:
            build_dedup_index(seed, idx)
        seed_s = round(time.time() - t0, 3)
        release_staged(spark)
        cells = []
        decisions = []
        for b, part in enumerate(batch_frames):
            _drain(spark)
            m0, d0, s0 = stage_spill_totals(spark)
            t0 = time.time()
            out = match_dedup_batch(part, idx, **kw)
            rows = sorted(map(tuple, out.collect()))
            wall = round(time.time() - t0, 3)
            _drain(spark)
            m1, d1, s1 = stage_spill_totals(spark)
            release_staged(spark)
            counts: dict = {}
            for _, status, _m in rows:
                counts[status] = counts.get(status, 0) + 1
            decisions.append(rows)
            cells.append(
                {
                    "batch_id": b,
                    "rows": len(rows),
                    "wall_s": wall,
                    "shuffle_mb": round((s1 - s0) / 1e6, 1),
                    "spill_mb": round(((m1 - m0) + (d1 - d0)) / 1e6, 1),
                    "status_counts": counts,
                }
            )
            print(f"# {layout} b{b}: {cells[-1]}", file=sys.stderr)
        import hashlib

        layouts[layout] = {
            "seed_build_s": seed_s,
            "batches": cells,
            "decisions_digest": hashlib.md5(
                repr(decisions).encode()
            ).hexdigest()[:16],
        }
        layouts[layout]["_decisions"] = decisions

    identical = layouts["dir"].pop("_decisions") == layouts["bucketed"].pop(
        "_decisions"
    )

    # ---- DSIR scorer cell: vectorised fast vs per-token portable ----
    from tern_ep_data_pipeline_spark.streaming.curation import (
        dsir_scored_stream,
        write_dsir_ratio_artifact,
    )

    ratio = os.path.join(work, "dsir_ratio")
    write_dsir_ratio_artifact(
        seed, seed.where("doc_id % 3 = 0"), ratio
    )
    score_docs = docs.where(
        F.col("doc_id") < args.seed_docs
    ).localCheckpoint()
    n_score = score_docs.count()
    dsir: dict = {"n_docs": n_score, "runs": {}}
    sums = {}
    for mode in ("portable", "fast"):
        walls = []
        for _ in range(args.dsir_runs):
            t0 = time.time()
            row = (
                dsir_scored_stream(score_docs, ratio, hash_mode=mode)
                .agg(F.sum("logweight_micro").alias("s"))
                .collect()[0]
            )
            walls.append(round(time.time() - t0, 3))
            release_staged(spark)
        sums[mode] = int(row["s"])
        dsir["runs"][mode] = {
            "wall_s": walls,
            "docs_per_s_best": round(n_score / min(walls)),
        }
        print(f"# dsir {mode}: {dsir['runs'][mode]}", file=sys.stderr)
    dsir["score_sums_equal"] = sums["portable"] == sums["fast"]
    dsir["speedup_fast_over_portable_best"] = round(
        min(dsir["runs"]["portable"]["wall_s"])
        / min(dsir["runs"]["fast"]["wall_s"]),
        2,
    )

    # Second DSIR cell on a HEAVY-TAILED vocabulary (the synthetic
    # corpus has ~31 distinct tokens, so both kernels saturate on
    # Arrow/tokenisation overhead there): zipf(1.3) draw over a 200k
    # vocabulary, deterministic seed — the shape where the portable
    # twin's per-token dict walk actually costs and the vectorised
    # kernel's steady state shows.
    import numpy as np

    rng = np.random.default_rng(3)
    zvocab = args.dsir_zipf_vocab
    zdocs = args.dsir_zipf_docs
    draw = np.minimum(rng.zipf(1.3, size=zdocs * 54) - 1, zvocab - 1)
    vocab = [f"w{i}" for i in range(zvocab)]
    ztexts = [
        (int(args.seed_docs + i),
         " ".join(vocab[j] for j in draw[i * 54:(i + 1) * 54]))
        for i in range(zdocs)
    ]
    zdf = spark.createDataFrame(
        ztexts, "doc_id long, text string"
    ).repartition(8).localCheckpoint()
    zcell: dict = {"n_docs": zdocs, "vocab": zvocab, "runs": {}}
    zsums = {}
    for mode in ("portable", "fast"):
        walls = []
        for _ in range(args.dsir_runs):
            t0 = time.time()
            row = (
                dsir_scored_stream(zdf, ratio, hash_mode=mode)
                .agg(F.sum("logweight_micro").alias("s"))
                .collect()[0]
            )
            walls.append(round(time.time() - t0, 3))
            release_staged(spark)
        zsums[mode] = int(row["s"])
        zcell["runs"][mode] = {
            "wall_s": walls,
            "docs_per_s_best": round(zdocs / min(walls)),
        }
        print(f"# dsir-zipf {mode}: {zcell['runs'][mode]}", file=sys.stderr)
    zcell["score_sums_equal"] = zsums["portable"] == zsums["fast"]
    zcell["speedup_fast_over_portable_best"] = round(
        min(zcell["runs"]["portable"]["wall_s"])
        / min(zcell["runs"]["fast"]["wall_s"]),
        2,
    )
    dsir["zipf_vocab_cell"] = zcell

    result = {
        "metric": "streaming_match_dedup_and_dsir_scorer",
        "dir": args.dir,
        "heap": os.environ.get("SPARK_DRIVER_MEMORY", "(default)"),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "(default)"),
        "seed_docs": n_seed,
        "batch_docs": args.batch,
        "dup_frac": args.dup_frac,
        "layouts": layouts,
        "decisions_identical_across_layouts": identical,
        "dsir_scorer": dsir,
        "loadavg": os.getloadavg()[0],
    }
    line = json.dumps(result)
    if args.json_out:
        with open(args.json_out, "w") as fh:
            fh.write(line + "\n")
    print(line)
    shutil.rmtree(work, ignore_errors=True)
    for layout in ("dir", "bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS bench_midx_{layout}_exact")
        spark.sql(f"DROP TABLE IF EXISTS bench_midx_{layout}_bands")


if __name__ == "__main__":
    main()
