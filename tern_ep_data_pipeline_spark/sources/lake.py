"""Bucketed lake tables for co-located (exchange-free) joins.

At 100 TB the dominant cost of the merge/join plans is the shuffle. Tables
that are repeatedly joined or merged on the same key (site+timestamp for the
time merge, document id for dedup verification, vector id for ANN probes)
are written ``bucketBy(key)`` so sort-merge joins between them need no
Exchange at all — Spark proves co-location from the bucket spec.

This module is the thin policy layer over ``DataFrameWriter.bucketBy``;
the test suite asserts the no-Exchange property on the resulting plans.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) parquet table.

    The frame is hash-repartitioned by the bucket columns into
    ``n_buckets`` partitions first — ``repartition(n, cols)`` and Spark's
    bucket-id assignment use the SAME murmur3-pmod function, so each task
    then holds exactly one bucket and writes exactly one file. Without
    this (r16, the BLOOM_r15 aging-probe root cause) a bucketed write
    emits one file per (task x touched bucket): the streaming band-table
    append wrote ~1,013 files per 1,000-doc batch (measured), so the
    per-batch index scan paid O(appends x buckets) file opens and the
    per-batch wall climbed linearly with append history. This is the
    distribution-mode=hash discipline table formats apply before
    clustered writes (guide §6); the exchange itself is O(frame), tiny
    for appends, and for full builds it is the layout-correct write
    shape at any scale."""
    writer = (
        df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
        .write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Catalyst
    plans a sort-merge join with zero Exchange operators."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=list(on), how=how)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchanges the plan will EXECUTE (audit hook).

    Three corrections over a naive substring count (r10 fusion audit):
    each DISTINCT cached subtree counts once — the executedPlan string
    prints an InMemoryRelation's child plan under EVERY InMemoryTableScan
    that references it, so a staged frame shared by two branches
    double-counted its exchanges (gap_suite printed 15 where runtime
    pays 8); ``ReusedExchange`` nodes are excluded (they read an
    existing shuffle, writing nothing); broadcasts are excluded as
    before."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()

    def count_line(s: str) -> int:
        return (
            s.count("Exchange")
            - s.count("BroadcastExchange")
            - s.count("ReusedExchange")
        )

    def depth(s: str) -> int:
        return len(re.match(r"^[\s:+\-*]*", s).group(0))

    seen_blocks: set[str] = set()
    lines = plan.splitlines()

    def norm(seg: list[str]) -> str:
        # two scans of ONE cache print it with different attribute ids
        # (ts#1 vs ts#56) and different tree-drawing prefixes (branch
        # position) but identical plan_ids — normalise both away so the
        # dedupe key matches. Distinct caches CANNOT collapse into one
        # key whenever they contain an Exchange: every Exchange prints
        # its [plan_id=N], which this normalisation keeps, and separate
        # cache instantiations get separate plan_ids (the CacheManager
        # dedupes semantically-equal plans into one relation anyway);
        # exchange-free caches collapse harmlessly — they contribute 0.
        return re.sub(
            r"#\d+",
            "#",
            "\n".join(re.sub(r"^[\s:+\-*]*", "", x) for x in seg),
        )

    def count_range(lo: int, hi: int) -> int:
        total = 0
        i = lo
        while i < hi:
            line = lines[i]
            if "InMemoryRelation" in line:
                d = depth(line)
                j = i + 1
                while j < hi and depth(lines[j]) > d and lines[j].strip():
                    j += 1
                block = norm(lines[i:j])
                if block not in seen_blocks:
                    seen_blocks.add(block)
                    # recurse: a cached plan can itself scan other caches
                    total += count_range(i + 1, j)
                i = j
            else:
                total += count_line(line)
                i += 1
        return total

    return count_range(0, len(lines))


def compact_partition(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    sort_cols: Sequence[str] = (),
) -> dict:
    """Compact a lake partition directory: streaming micro-batches and
    per-block writes leave many small parquet files; small files dominate
    task-scheduling and footer-reading cost at 100 TB. Rewrites the
    directory to ``ceil(bytes / target_mb)`` files, optionally sorted
    within files (``sort_cols``) for better min/max pruning and encoding.

    The rewrite lands in a sibling temp dir and swaps in only after
    success, so no reader ever sees a half-compacted partition — but the
    swap itself is two renames, not one atomic exchange (POSIX has no
    portable renameat2), so the caller must hold exclusive access to the
    partition for the duration (the reference's batch jobs do; streaming
    writers must pause the block sink first). A crash between the two
    renames is repaired automatically: the old directory is restored to
    ``path`` before the error propagates, so data is never stranded.
    Returns {files_before, files_after, bytes}.
    """
    import math
    import shutil
    import uuid

    files = [
        (p, os.path.getsize(p))
        for p in glob.glob(os.path.join(path, "*.parquet"))
    ]
    total = sum(sz for _, sz in files)
    n_out = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    if len(files) <= n_out:
        return {"files_before": len(files), "files_after": len(files), "bytes": total}

    df = spark.read.parquet(path)
    df = df.repartition(n_out)
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except BaseException:
        os.rename(old, path)  # restore — never leave `path` missing
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(old)
    after = len(glob.glob(os.path.join(path, "*.parquet")))
    return {"files_before": len(files), "files_after": after, "bytes": total}


def zorder_value(cols, mins, maxs, bits: int = 16):
    """Z-order (Morton) key: normalise each column to a ``bits``-bit
    integer over its [min, max] range, then bit-interleave — rows close
    in EVERY dimension get close keys, so clustering by this key gives
    parquet min/max pruning on all the z-ordered columns at once
    (single-column sorting prunes only its leading column).

    ``bits`` is clamped so ``bits * len(cols) <= 63``: bit 63 is the
    long sign bit (rows landing there would sort before everything)
    and Java shift amounts wrap at 64, so exceeding the budget would
    silently scramble the key instead of clustering.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if n == 0:
        raise ValueError("zorder_value needs at least one column")
    bits = min(bits, 63 // n)
    scaled = []
    for c, lo, hi in zip(cols, mins, maxs):
        span = float(hi - lo) if hi != lo else 1.0
        v = (
            ((F.col(c).cast("double") - float(lo)) / span)
            * float((1 << bits) - 1)
        ).cast("bigint")
        scaled.append(F.greatest(F.lit(0), F.least(v, F.lit((1 << bits) - 1))))
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for j, s in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(s, bit).bitwiseAND(F.lit(1)), bit * n + j)
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    mode: str = "overwrite",
    n_files: int | None = None,
) -> None:
    """Write parquet clustered by the Z-order key of ``cols``: one cheap
    min/max aggregation to fix the normalisation ranges, range-partition
    on the key (parallel, no global sort), sort within partitions, drop
    the key. Point/range scans on ANY z-ordered column then prune files
    and row groups by footer statistics."""
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(c).alias(f"__mn_{c}") for c in cols],
        *[F.max(c).alias(f"__mx_{c}") for c in cols],
    ).collect()[0]
    mins = [stats[f"__mn_{c}"] for c in cols]
    maxs = [stats[f"__mx_{c}"] for c in cols]
    z = zorder_value(list(cols), mins, maxs, bits)
    ranged = df.withColumn("__z", z)
    # explicit file count when given: AQE happily coalesces a small
    # keyed range-partitioning down to one file
    ranged = (
        ranged.repartitionByRange(n_files, "__z")
        if n_files
        else ranged.repartitionByRange("__z")
    )
    (
        ranged
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
