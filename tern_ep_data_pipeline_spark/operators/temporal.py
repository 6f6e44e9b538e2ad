"""Temporal joins and sessionisation: as-of join, range (interval) join,
session windows.

Beyond-reference operators (SURVEY.md §2.3 notes the reference has no
range/as-of machinery — its time alignment is exact-equality after grid
regularisation). These are the general forms a sensor-fusion or
event-analytics workload needs, built for 100 TB:

- **as-of join**: union + running ``last(ignorenulls)`` window — one
  shuffle on the partition keys, no range cross-join, no per-row probe.
  The standard broadcastable-right implementations fall over when the
  right side is a full event stream; this shape is symmetric in size.
- **range join**: coarse-bucket equi-join + refine filter. A naive
  theta-join (``point BETWEEN start AND end``) is a broadcast
  nested-loop at best and a cartesian at worst; bucketing turns it into
  a plain shuffle join whose cost is the number of covered buckets.
- **sessionize**: the built-in ``session_window`` (merge-on-gap) —
  Catalyst handles it natively in both batch and streaming.

Determinism: all orderings carry explicit tiebreak columns, so results
are stable under retries and across cluster sizes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: Sequence[str],
    value_cols: Sequence[str],
    right_ts_out: str = "matched_ts",
    tolerance_seconds: int | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: each left row picks the latest right row with
    ``right.ts <= left.ts`` within the same ``by_cols`` group (inclusive at
    equality — DuckDB/pandas ``merge_asof`` semantics).

    Returns all left columns plus ``right_ts_out`` (the matched right
    timestamp) and ``value_cols`` from the right side; unmatched (or
    out-of-tolerance) rows keep them null, like a left join.

    Shape: tag sides, union, one window per group ordered by
    ``(ts, side, tiebreak)`` with a running ``last(..., ignorenulls)``;
    right rows sort before left rows at equal timestamps so equality
    matches. One shuffle total; no interval explosion. With multiple
    right rows at an identical (group, ts), ``right_tiebreak`` picks the
    max deterministically.
    """
    lcols = left.columns
    tb = F.col(right_tiebreak) if right_tiebreak else F.lit(0)
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        F.lit(None).cast(dict(left.dtypes)[ts_col]).alias("__rts"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__v_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) for c in lcols if c not in by_cols and c != ts_col],
        *[F.col(c) for c in [*by_cols, ts_col]],
        F.lit(0).alias("__side"),
        tb.cast("long").alias("__tb"),
        F.col(ts_col).alias("__rts"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    ).select(*l_tagged.columns)
    unioned = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        F.col("__side"),
        F.last("__rts", ignorenulls=True).over(w).alias(right_ts_out),
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("__side") == 1).drop("__side")
    if tolerance_seconds is not None:
        in_tol = F.expr(
            f"timestampdiff(MICROSECOND, {right_ts_out}, {ts_col})"
        ) <= tolerance_seconds * 1_000_000
        out = out.select(
            *lcols,
            F.when(in_tol, F.col(right_ts_out)).alias(right_ts_out),
            *[F.when(in_tol, F.col(c)).alias(c) for c in value_cols],
        )
    return out


def asof_join_sliced(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: Sequence[str],
    value_cols: Sequence[str],
    slice_seconds: int,
    right_ts_out: str = "matched_ts",
    tolerance_seconds: int | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Skew-hardened :func:`asof_join`: identical semantics, but the window
    partitions on ``(by_cols, time slice)`` instead of ``by_cols`` alone.

    Window stages get no AQE skew splitting, so one hot key (a device
    emitting a large share of all events) serialises the plain as-of onto
    one task. Slicing bounds every partition at ~``slice_seconds`` of one
    key's data. Cross-slice correctness comes from injecting, per (key,
    slice), the latest right row from ALL earlier slices as a synthetic
    right row: it is built with one slice-grain aggregate plus a running
    window over slice numbers (rows per key = slices, not events), then
    sorts before every in-slice row. Pick ``slice_seconds`` so a hot key's
    densest slice fits one task comfortably.
    """
    us = slice_seconds * 1_000_000
    slice_of = lambda df: (_epoch_micros(df, ts_col) / us).cast("long")  # noqa: E731

    tb = F.col(right_tiebreak) if right_tiebreak else F.lit(0)
    r_s = right.withColumn("__slice", slice_of(right))
    # newest right row per (key, slice): max_by over (ts, tiebreak)
    order_key = F.struct(F.col(ts_col), tb.cast("long"))
    last_per_slice = r_s.groupBy(*by_cols, "__slice").agg(
        F.max_by(
            F.struct(F.col(ts_col).alias("__ts"), tb.cast("long").alias("__tb"),
                     *[F.col(c).alias(c) for c in value_cols]),
            order_key,
        ).alias("__last")
    )
    l_s = left.withColumn("__slice", slice_of(left))
    # every (key, slice) either side touches, with the running
    # latest-right-state strictly before the slice
    slices = (
        l_s.select(*by_cols, "__slice")
        .unionByName(r_s.select(*by_cols, "__slice"))
        .distinct()
        .join(last_per_slice, on=[*by_cols, "__slice"], how="left")
    )
    w_prev = (
        Window.partitionBy(*by_cols)
        .orderBy("__slice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = (
        slices.withColumn("__prev", F.last("__last", ignorenulls=True).over(w_prev))
        .filter(F.col("__prev").isNotNull())
        .select(
            *by_cols,
            "__slice",
            F.col("__prev.__ts").alias(ts_col),
            F.col("__prev.__tb").alias("__tb_in"),
            *[F.col(f"__prev.{c}").alias(c) for c in value_cols],
        )
    )
    # synthetic right rows carrying the pre-slice state; they keep their
    # ORIGINAL ts but belong to the TARGET slice, so __slice is explicit
    injected = carry_in.select(
        *[F.col(c) for c in [*by_cols, "__slice", ts_col]],
        F.col("__tb_in"),
        *[F.col(c) for c in value_cols],
    )
    r_aug = r_s.select(
        *[F.col(c) for c in [*by_cols, "__slice", ts_col]],
        tb.cast("long").alias("__tb_in"),
        *[F.col(c) for c in value_cols],
    )
    r_all = injected.unionByName(r_aug)
    out = asof_join(
        l_s,
        r_all,
        ts_col,
        [*by_cols, "__slice"],
        value_cols,
        right_ts_out=right_ts_out,
        tolerance_seconds=tolerance_seconds,
        right_tiebreak="__tb_in",
    )
    return out.drop("__slice")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    key_cols: Sequence[str] = (),
    bucket_seconds: int = 86400,
    end_inclusive: bool = False,
) -> DataFrame:
    """Interval-containment join: each point row joins every interval row
    with ``start <= point_ts < end`` (``<= end`` when ``end_inclusive``)
    and equal ``key_cols``.

    Shape: both sides map to coarse time buckets (intervals explode to the
    buckets they cover via ``sequence``), equi-join on (keys, bucket),
    then the exact predicate refines. Pick ``bucket_seconds`` near the
    typical interval length: cost scales with covered-bucket count, and
    the equi-join shuffles instead of nested-looping. Empty intervals
    (start >= end under half-open semantics) match nothing.
    """
    us = F.lit(bucket_seconds * 1_000_000)
    p_b = points.withColumn(
        "__bucket", F.floor(_epoch_micros(points, point_ts) / us)
    )
    end_us = _epoch_micros(intervals, end_col) + (0 if end_inclusive else -1)
    i_b = intervals.filter(
        F.col(start_col) <= F.col(end_col)
        if end_inclusive
        else F.col(start_col) < F.col(end_col)
    ).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(_epoch_micros(intervals, start_col) / us), F.floor(end_us / us)
            )
        ),
    )
    contains = (F.col(point_ts) >= F.col(start_col)) & (
        F.col(point_ts) <= F.col(end_col)
        if end_inclusive
        else F.col(point_ts) < F.col(end_col)
    )
    return p_b.join(i_b, on=["__bucket", *key_cols]).filter(contains).drop("__bucket")


def _epoch_micros(df: DataFrame, col: str) -> Column:
    """Microseconds since epoch for TIMESTAMP or TIMESTAMP_NTZ columns
    (``unix_micros`` rejects NTZ; ``timestampdiff`` handles it exactly)."""
    if dict(df.dtypes)[col] == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
        )
    return F.unix_micros(F.col(col))


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    gap_minutes: int,
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Session windows: events in the same ``key_cols`` group merge while
    consecutive gaps are <= ``gap_minutes`` (boundary-equal gaps merge —
    native ``session_window`` semantics); ``session_end`` is the last
    event time plus the gap.

    Output: keys, session_start, session_end, n_events, plus ``aggs``.
    Works identically over a streaming DataFrame (with a watermark).
    """
    agg_names = [_agg_name(a) for a in aggs]
    return (
        df.groupBy(*key_cols, F.session_window(ts_col, f"{gap_minutes} minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"), *aggs)
        .select(
            *key_cols,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            *agg_names,
        )
    )


def _agg_name(c: Column) -> str:
    """Output name of an aliased aggregate Column."""
    return c._jc.toString().rsplit(" AS ", 1)[-1].strip("`")
