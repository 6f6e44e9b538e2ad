"""Temporal operators: as-of join, range join, session windows.

Pins the boundary semantics the oracles rely on: inclusive equality for
backward as-of, tolerance masking, half-open [start, end) containment,
empty-interval exclusion, and gap-boundary session merging.
"""

import datetime as dt

from pyspark.sql import functions as F

from tern_ep_data_pipeline_spark.operators.temporal import (
    asof_join,
    range_join,
    sessionize,
)

T = dt.datetime


def test_asof_backward_inclusive_and_left_semantics(spark):
    left = spark.createDataFrame(
        [(1, T(2024, 1, 1, 1, 0, 0), "e1"), (1, T(2024, 1, 1, 2, 0, 0), "e2"),
         (2, T(2024, 1, 1, 1, 0, 0), "e3")],
        "uid long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1, 0, 30, 0), 10.0, 100),
         (1, T(2024, 1, 1, 1, 0, 0), 20.0, 101),
         (3, T(2024, 1, 1, 0, 0, 0), 5.0, 102)],
        "uid long, ts timestamp, v double, rid long",
    )
    out = {
        r["tag"]: (r["matched_ts"], r["v"])
        for r in asof_join(left, right, "ts", ["uid"], ["v"], right_tiebreak="rid").collect()
    }
    # equality matches (inclusive), later left rows carry the latest right row
    assert out["e1"] == (T(2024, 1, 1, 1, 0, 0), 20.0)
    assert out["e2"] == (T(2024, 1, 1, 1, 0, 0), 20.0)
    # no right rows for uid=2 -> left-join nulls
    assert out["e3"] == (None, None)


def test_asof_tolerance_masks_stale_matches(spark):
    left = spark.createDataFrame(
        [(1, T(2024, 1, 1, 2, 0, 0), "e")], "uid long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1, 1, 0, 0), 20.0)], "uid long, ts timestamp, v double"
    )
    row = asof_join(
        left, right, "ts", ["uid"], ["v"], tolerance_seconds=1800
    ).collect()[0]
    assert row["matched_ts"] is None and row["v"] is None
    row = asof_join(
        left, right, "ts", ["uid"], ["v"], tolerance_seconds=3600
    ).collect()[0]
    assert row["v"] == 20.0


def test_asof_equal_ts_right_tiebreak_is_max(spark):
    left = spark.createDataFrame([(1, T(2024, 1, 1, 1, 0, 0))], "uid long, ts timestamp")
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1, 0, 30, 0), 10.0, 7), (1, T(2024, 1, 1, 0, 30, 0), 11.0, 9)],
        "uid long, ts timestamp, v double, rid long",
    )
    row = asof_join(left, right, "ts", ["uid"], ["v"], right_tiebreak="rid").collect()[0]
    assert row["v"] == 11.0


def test_range_join_half_open_and_empty_interval(spark):
    iv = spark.createDataFrame(
        [(1, T(2024, 1, 1, 0, 0, 0), T(2024, 1, 1, 1, 0, 0), "A"),
         (1, T(2024, 1, 1, 3, 0, 0), T(2024, 1, 1, 3, 0, 0), "EMPTY")],
        "uid long, s timestamp, e timestamp, label string",
    )
    pts = spark.createDataFrame(
        [(1, T(2024, 1, 1, 0, 59, 59), "p1"), (1, T(2024, 1, 1, 1, 0, 0), "p2"),
         (1, T(2024, 1, 1, 3, 0, 0), "p3"), (2, T(2024, 1, 1, 0, 30, 0), "p4")],
        "uid long, ts timestamp, pid string",
    )
    got = {
        (r["pid"], r["label"])
        for r in range_join(pts, iv, "ts", "s", "e", key_cols=["uid"], bucket_seconds=1800).collect()
    }
    # p2 at exactly end excluded (half-open); empty interval matches nothing;
    # key isolation keeps p4 (uid=2) out
    assert got == {("p1", "A")}
    inc = {
        (r["pid"], r["label"])
        for r in range_join(
            pts, iv, "ts", "s", "e", key_cols=["uid"], bucket_seconds=1800, end_inclusive=True
        ).collect()
    }
    assert inc == {("p1", "A"), ("p2", "A"), ("p3", "EMPTY")}


def test_range_join_interval_spanning_many_buckets(spark):
    iv = spark.createDataFrame(
        [(T(2024, 1, 1, 0, 0, 0), T(2024, 1, 3, 0, 0, 0), "wide")],
        "s timestamp, e timestamp, label string",
    )
    pts = spark.createDataFrame(
        [(T(2024, 1, 2, 12, 0, 0), "in"), (T(2024, 1, 3, 0, 0, 1), "out")],
        "ts timestamp, pid string",
    )
    got = {r["pid"] for r in range_join(pts, iv, "ts", "s", "e", bucket_seconds=3600).collect()}
    assert got == {"in"}


def test_sessionize_boundary_gap_merges(spark):
    ev = spark.createDataFrame(
        [(1, T(2024, 1, 1, 0, 0, 0), 1.0),
         (1, T(2024, 1, 1, 0, 30, 0), 2.0),   # exactly gap apart -> merges
         (1, T(2024, 1, 1, 2, 0, 0), 4.0),
         (2, T(2024, 1, 1, 0, 0, 0), 8.0)],
        "uid long, ts timestamp, v double",
    )
    out = sessionize(
        ev, "ts", ["uid"], 30, [F.sum("v").alias("sum_v")]
    ).orderBy("uid", "session_start").collect()
    assert [(r["uid"], r["n_events"], r["sum_v"]) for r in out] == [
        (1, 2, 3.0), (1, 1, 4.0), (2, 1, 8.0)
    ]
    # session_end = last event + gap
    assert out[0]["session_end"] == T(2024, 1, 1, 1, 0, 0)


def test_sessionize_streaming_matches_batch(spark, tmp_path):
    """sessionize works unchanged over a watermarked stream: with an
    availableNow trigger and a generous watermark, emitted sessions equal
    the batch sessionisation of the same input."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 1.0),
        (1, dt.datetime(2024, 1, 1, 0, 10, 0), 2.0),
        (1, dt.datetime(2024, 1, 1, 2, 0, 0), 3.0),
        (2, dt.datetime(2024, 1, 1, 1, 0, 0), 4.0),
        (2, dt.datetime(2024, 1, 2, 1, 0, 0), 5.0),
    ]
    src = str(tmp_path / "sess_src")
    batch_df = spark.createDataFrame(rows, "uid long, ts timestamp, v double")
    batch_df.write.parquet(src)

    stream = spark.readStream.format("parquet").schema(batch_df.schema).load(src)
    sess_stream = sessionize(
        stream.withWatermark("ts", "0 seconds"), "ts", ["uid"], 30,
        [F.sum("v").alias("sum_v")],
    )
    q = (
        sess_stream.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["uid"], r["session_start"], r["session_end"], r["n_events"], r["sum_v"])
        for r in spark.sql("select * from sess_stream").collect()
    }
    # append mode emits a session only after the watermark (here: the max
    # event time) passes its end — the final still-open session stays in
    # state, everything else must match the batch sessionisation exactly
    max_ts = max(r[1] for r in rows)
    want = {
        (r["uid"], r["session_start"], r["session_end"], r["n_events"], r["sum_v"])
        for r in sessionize(batch_df, "ts", ["uid"], 30, [F.sum("v").alias("sum_v")]).collect()
        if r["session_end"] <= max_ts
    }
    assert got == want and len(got) == 3


def test_asof_sliced_equals_plain(spark):
    """The skew-hardened sliced as-of must equal the plain one on random
    data with a hot key (most events on one key) and cross-slice matches."""
    import random

    from tern_ep_data_pipeline_spark.operators.temporal import asof_join_sliced

    rng = random.Random(7)
    base = T(2024, 1, 1).timestamp()
    def rand_rows(n, hot_share=0.7):
        rows = []
        for i in range(n):
            uid = 1 if rng.random() < hot_share else rng.randint(2, 5)
            ts = dt.datetime.fromtimestamp(base + rng.uniform(0, 6 * 3600))
            rows.append((uid, ts, float(i), i))
        return rows

    left = spark.createDataFrame(rand_rows(300), "uid long, ts timestamp, lv double, lid long")
    right = spark.createDataFrame(rand_rows(200), "uid long, ts timestamp, v double, rid long")

    def key(df):
        return sorted(
            (r["uid"], r["ts"], r["lid"], r["matched_ts"], r["v"])
            for r in df.collect()
        )

    for tol in (None, 1800):
        plain = asof_join(
            left, right, "ts", ["uid"], ["v"],
            tolerance_seconds=tol, right_tiebreak="rid",
        )
        sliced = asof_join_sliced(
            left, right, "ts", ["uid"], ["v"], slice_seconds=900,
            tolerance_seconds=tol, right_tiebreak="rid",
        )
        assert key(plain) == key(sliced)
