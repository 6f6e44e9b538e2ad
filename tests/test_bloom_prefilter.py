"""Batch-keyed Bloom prefilter (operators.bloom + dedup_index bloom_fpp).

The contract under test: ``bloom_fpp`` changes the PLAN (index rows that
cannot join are dropped at the scan), never the RESULT — every consumer
is pinned bit-identical against its unpruned twin, and the kernel itself
is pinned for the property the equality proofs rest on: no false
negatives, under any partitioning of the build side.
"""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tern_ep_data_pipeline_spark.operators import bloom
from tern_ep_data_pipeline_spark.operators import dedup_index as di


# ------------------------------------------------------------- kernel

def test_bloom_no_false_negatives_any_partitioning(spark):
    """Every inserted key tests positive, and the bitmap is identical no
    matter how the build side is partitioned (partial bitmaps OR-fold to
    the same bits) — the invariant the decision-preservation argument
    needs."""
    rng = random.Random(42)
    keys = [rng.randrange(-(1 << 62), 1 << 62) for _ in range(5_000)]
    kdf = spark.createDataFrame([(k,) for k in keys], "k long")
    specs = [
        bloom.build_key_bloom(
            kdf.repartition(p).select(bloom.bloom_key(F.col("k")).alias("__bk")),
            fpp=0.01,
        )
        for p in (1, 3, 11)
    ]
    assert specs[0].bitmap == specs[1].bitmap == specs[2].bitmap, (
        "partial-bitmap OR-fold must be partitioning-independent"
    )
    kept = bloom.prune_by_bloom(kdf, bloom.bloom_key(F.col("k")), specs[0])
    assert kept.count() == kdf.count(), "no false negatives, ever"


def test_bloom_fpp_and_empty_batch(spark):
    """Non-members survive at ~fpp (here: well under 5x the asked 1%),
    and an EMPTY batch's filter prunes the whole index — vacuously
    decision-preserving since an empty batch joins nothing."""
    members = spark.range(2_000)
    spec = bloom.build_key_bloom(
        members.select(bloom.bloom_key(F.col("id")).alias("__bk")), fpp=0.01
    )
    others = spark.range(2_000, 52_000)
    fp = bloom.prune_by_bloom(others, bloom.bloom_key(F.col("id")), spec).count()
    assert fp / 50_000 < 0.05

    empty = bloom.build_key_bloom(
        spark.range(0).select(bloom.bloom_key(F.col("id")).alias("__bk"))
    )
    assert (
        bloom.prune_by_bloom(others, bloom.bloom_key(F.col("id")), empty).count()
        == 0
    )


# ------------------------------------------- consumer equality pins

def _corpus(spark, n=40, seed=7):
    rng = random.Random(seed)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(30)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch(spark, corpus_rows, start_id=1000):
    """A batch with an exact dup, a near dup, and fresh docs — ids above
    the corpus range (gram-index monotonicity contract)."""
    dup = corpus_rows[0][1]
    near = dup.rsplit(" ", 1)[0] + " omega"
    rows = [
        (start_id, dup),
        (start_id + 1, near),
        (start_id + 2, "totally fresh content about bloom filters and scans"),
        (start_id + 3, "another fresh one\nshared line\nunique tail"),
        (start_id + 4, "yet another\nshared line\ndifferent tail"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_match_against_index_bloom_identical(spark, tmp_path):
    """r13: bloom_fpp on match_against_index is a RECORDED AUTO-DECLINE
    (no index-side pre-aggregation to save) — identical output AND an
    identical optimized plan, with the decline published as a local
    property."""
    corpus = _corpus(spark)
    rows = corpus.collect()
    path = str(tmp_path / "idx")
    di.build_dedup_index(corpus, path, num_hashes=16, bands=8)
    batch = _batch(spark, rows)
    plain = di.match_against_index(spark, batch, path, num_hashes=16, bands=8)
    with pytest.warns(RuntimeWarning, match="declines bloom_fpp"):
        pruned = di.match_against_index(
            spark, batch, path, num_hashes=16, bands=8, bloom_fpp=0.01
        )
    assert _sorted_rows(plain) == _sorted_rows(pruned)
    assert (
        spark.sparkContext.getLocalProperty("tern.bloom_prune.match")
        == "declined-no-index-preagg"
    )
    p1 = plain._jdf.queryExecution().optimizedPlan().toString()
    p2 = pruned._jdf.queryExecution().optimizedPlan().toString()
    import re as _re

    # normalise expr ids (#123L) and lambda-var counters (x_10)
    strip = lambda s: _re.sub(r"#\d+L?|_\d+", "#", s)
    assert strip(p1) == strip(p2), "declined plan must equal the default"


def test_gram_index_bloom_identical(spark, tmp_path):
    corpus = _corpus(spark)
    rows = corpus.collect()
    path = str(tmp_path / "gidx")
    di.build_gram_index(corpus, path, min_tokens=8)
    batch = _batch(spark, rows)
    plain = di.clean_against_gram_index(spark, batch, path, min_tokens=8)
    pruned = di.clean_against_gram_index(
        spark, batch, path, min_tokens=8, bloom_fpp=0.01
    )
    assert _sorted_rows(plain) == _sorted_rows(pruned)


def test_chunk_index_bloom_identical(spark, tmp_path):
    corpus = _corpus(spark)
    rows = corpus.collect()
    path = str(tmp_path / "cidx")
    di.build_chunk_index(corpus, path, chunk_tokens=10)
    batch = _batch(spark, rows)
    plain = di.chunk_stats_against_index(spark, batch, path, chunk_tokens=10)
    pruned = di.chunk_stats_against_index(
        spark, batch, path, chunk_tokens=10, bloom_fpp=0.01
    )
    assert _sorted_rows(plain) == _sorted_rows(pruned)


def test_line_index_bloom_identical(spark, tmp_path):
    corpus = spark.createDataFrame(
        [
            (1, "shared line\nunique a\nboiler"),
            (2, "shared line\nunique b\nboiler"),
            (3, "unique c only"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "lidx")
    di.build_line_index(corpus, path, min_line_chars=3)
    batch = spark.createDataFrame(
        [
            (100, "shared line\nnew body here"),
            (101, "boiler\nfresh per-doc text"),
        ],
        "doc_id long, text string",
    )
    plain = di.clean_against_line_index(
        spark, batch, path, min_docs=2, min_line_chars=3
    )
    pruned = di.clean_against_line_index(
        spark, batch, path, min_docs=2, min_line_chars=3, bloom_fpp=0.01
    )
    assert _sorted_rows(plain) == _sorted_rows(pruned)


def test_bucketed_twins_bloom_identical(spark, tmp_path):
    """The bucketed layouts accept the same flag and stay bit-identical
    (the probe drops bucket distribution, so the pruned side re-shuffles
    — correctness must not care)."""
    corpus = _corpus(spark, n=25, seed=11)
    rows = corpus.collect()
    batch = _batch(spark, rows)

    di.build_dedup_index_bucketed(corpus, "blm_m", n_buckets=4, num_hashes=16, bands=8)
    plain = di.match_against_index_bucketed(
        spark, batch, "blm_m", num_hashes=16, bands=8
    )
    pruned = di.match_against_index_bucketed(
        spark, batch, "blm_m", num_hashes=16, bands=8, bloom_fpp=0.01
    )
    assert _sorted_rows(plain) == _sorted_rows(pruned)

    di.build_gram_index_bucketed(corpus, "blm_g", n_buckets=4, min_tokens=8)
    gplain = di.clean_against_gram_index_bucketed(
        spark, batch, "blm_g", min_tokens=8
    )
    gpruned = di.clean_against_gram_index_bucketed(
        spark, batch, "blm_g", min_tokens=8, bloom_fpp=0.01
    )
    assert _sorted_rows(gplain) == _sorted_rows(gpruned)


def test_bloom_prune_actually_prunes(spark, tmp_path):
    """The point of the filter: with a batch far smaller than the corpus,
    the surviving index fraction is near batch-share, not 1.0."""
    corpus = _corpus(spark, n=400, seed=3)
    path = str(tmp_path / "gidx")
    di.build_gram_index(corpus, path, min_tokens=8)
    scan = spark.read.parquet(path + "/grams")
    total = scan.count()
    batch = spark.createDataFrame(
        [(5000, "one tiny fresh document that shares no grams at all")],
        "doc_id long, text string",
    )
    keys = di._gram_first_table(batch, "doc_id", "text", 8, 1 << 24)
    kept = di._bloom_pruned(scan, ["gram_hash"], keys, 0.01).count()
    assert kept < 0.1 * total, (kept, total)


def test_streaming_span_dedup_bloom_identical(spark, tmp_path):
    """The streaming sink's passthrough: two sequential micro-batches
    through ``span_dedup_batch`` with and without ``bloom_fpp`` produce
    identical cleaned output AND leave equivalent index decisions for the
    later batch (batch 2's cleaning sees batch 1's appended grams either
    way)."""
    from tern_ep_data_pipeline_spark.streaming.curation import span_dedup_batch

    base = "the quick brown fox jumps over the lazy dog again and again extra tail"
    b1 = spark.createDataFrame(
        [(1, base), (2, "fully distinct first-batch content with enough tokens here")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        # doc 10 pastes batch-1's doc-1 text — its span must be cut
        [(10, base + " plus a novel suffix of its very own"),
         (11, "second batch brand new document with its own words entirely")],
        "doc_id long, text string",
    )
    outs = {}
    for tag, fpp in (("plain", None), ("bloom", 0.01)):
        idx = str(tmp_path / f"idx_{tag}")
        r1 = span_dedup_batch(
            b1, idx, "doc_id", "text", memory_guard=False, bloom_fpp=fpp
        ).collect()
        r2 = span_dedup_batch(
            b2, idx, "doc_id", "text", memory_guard=False, bloom_fpp=fpp
        ).collect()
        outs[tag] = (sorted(map(tuple, r1)), sorted(map(tuple, r2)))
    assert outs["plain"] == outs["bloom"]


def test_prune_strategies_agree(spark, tmp_path):
    """The two prune strategies (exact broadcast semi, Arrow bloom) and
    the unpruned path produce identical downstream decisions; semi keeps
    exactly the true members, bloom a superset."""
    corpus = _corpus(spark, n=120, seed=9)
    path = str(tmp_path / "gidx")
    di.build_gram_index(corpus, path, min_tokens=8)
    scan = spark.read.parquet(path + "/grams")
    batch = _batch(spark, corpus.collect(), start_id=9000)
    keys = di._gram_first_table(batch, "doc_id", "text", 8, 1 << 24)

    semi = di._bloom_pruned(scan, ["gram_hash"], keys, 0.01, strategy="semi")
    blm = di._bloom_pruned(scan, ["gram_hash"], keys, 0.01, strategy="bloom")
    semi_keys = {r["gram_hash"] for r in semi.select("gram_hash").distinct().collect()}
    bloom_keys = {r["gram_hash"] for r in blm.select("gram_hash").distinct().collect()}
    assert semi_keys <= bloom_keys, "bloom must be a superset (no false negatives)"

    # end-to-end decisions equal under either forced strategy — force at
    # the ONE shared chokepoint (bloom.prune_index_by_keys), which every
    # consumer path routes through (dedup_index._bloom_pruned AND
    # substring_dedup's index_raw prune)
    plain = _sorted_rows(di.clean_against_gram_index(spark, batch, path, min_tokens=8))
    orig = bloom.prune_index_by_keys
    for strat in ("semi", "bloom"):
        calls = []

        def forced(idx, kc, kf, fpp=0.01, size_hint=None, strategy="auto",
                   _s=strat, _o=orig, _c=calls):
            _c.append(1)
            return _o(idx, kc, kf, fpp=fpp, strategy=_s)

        # consumers resolve the attribute on the bloom module object at
        # call time, so patching the module attribute reaches them all
        bloom.prune_index_by_keys = forced
        try:
            got = _sorted_rows(
                di.clean_against_gram_index(
                    spark, batch, path, min_tokens=8, bloom_fpp=0.01
                )
            )
        finally:
            bloom.prune_index_by_keys = orig
        assert calls, f"prune chokepoint not exercised under {strat}"
        assert got == plain, strat


# ------------------------------------------------- r13 scale closers

def test_geometry_honors_fpp_at_10m_keys():
    """r12 verdict #1a: with an ``expected`` estimate the bitmap is
    sized for the requested rate — MEASURED fpp at 10M inserted keys
    stays within 2x the requested 1% (pure numpy kernel; no Spark)."""
    import numpy as np

    n = 10_000_000
    num_bits, num_hashes = bloom._geometry(n, 0.01)
    assert num_bits < bloom._MAX_BITS, "10M keys must not hit the cap"
    rng = np.random.default_rng(1234)
    members = rng.integers(0, 1 << 62, size=n, dtype=np.int64).view(np.uint64)
    bitmap = np.zeros(num_bits // 8, dtype=np.uint8)
    bloom._set_bits(bitmap, members, num_bits, num_hashes)
    # probe a disjoint stream (different high bit ⇒ no overlap)
    probes = (
        rng.integers(0, 1 << 62, size=1_000_000, dtype=np.int64)
        + (np.int64(1) << np.int64(62))
    ).view(np.uint64)
    hits = bloom._test_bits(bitmap, probes, num_bits, num_hashes).sum()
    measured = hits / 1_000_000
    assert measured <= 0.02, f"measured fpp {measured:.4f} > 2x requested 1%"


def test_prune_threads_expected_from_size_hint(spark, monkeypatch):
    """ADVICE r12 #1: the auto path derives ``expected`` from the byte
    estimate it already has, so ``fpp`` is honoured on the bloom
    strategy instead of silently using the fixed default geometry."""
    captured = {}
    orig = bloom.build_key_bloom

    def spy(keys, fpp=0.01, expected=None, key_col="__bk"):
        captured["expected"] = expected
        captured["fpp"] = fpp
        return orig(keys, fpp=fpp, expected=expected, key_col=key_col)

    monkeypatch.setattr(bloom, "build_key_bloom", spy)
    idx = spark.range(100).select(F.col("id").alias("k"))
    keys = spark.range(50).select(F.col("id").alias("k"))
    hint = 64 << 20  # past the semi gate ⇒ bloom strategy
    bloom.prune_index_by_keys(idx, ["k"], keys, fpp=0.005, size_hint=hint).count()
    assert captured["fpp"] == 0.005
    row_bytes = bloom._est_row_bytes(keys.schema)
    assert captured["expected"] == hint // row_bytes
    # and the geometry actually differs from the fixed default
    bits, hashes = bloom._geometry(captured["expected"], 0.005)
    assert (bits, hashes) != (bloom._DEFAULT_BITS, bloom._DEFAULT_HASHES)


def test_prune_warns_when_bitmap_cap_saturates(spark):
    """Past the 32 MiB cap the prune degrades LOUDLY: a RuntimeWarning
    names the predicted fpp instead of letting the filter silently stop
    pruning (still correct — superset — just no longer useful)."""
    import warnings as _warnings

    idx = spark.range(100).select(F.col("id").alias("k"))
    keys = spark.range(50).select(F.col("id").alias("k"))
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        bloom.prune_index_by_keys(
            idx, ["k"], keys, fpp=0.01, size_hint=1 << 40
        ).count()
    msgs = [str(w.message) for w in rec if w.category is RuntimeWarning]
    assert any("largely stopped pruning" in m for m in msgs), msgs


def test_prune_by_bloom_key_column_collision(spark):
    """ADVICE r12 #2: a caller frame that already owns a ``__bk``
    column keeps it — the probe uses a generated collision-free temp
    name instead of silently overwriting the payload."""
    df = spark.createDataFrame(
        [(1, "payload-a"), (2, "payload-b"), (3, "payload-c")],
        "k long, __bk string",
    )
    spec = bloom.build_key_bloom(
        spark.createDataFrame([(1,), (3,)], "k long").select(
            bloom.bloom_key(F.col("k")).alias("__bk")
        ),
        fpp=0.01,
    )
    out = bloom.prune_by_bloom(df, bloom.bloom_key(F.col("k")), spec)
    rows = {(r["k"], r["__bk"]) for r in out.collect()}
    assert (1, "payload-a") in rows and (3, "payload-c") in rows
    assert out.columns == ["k", "__bk"], "payload __bk column must survive"


def test_wide_payload_routes_two_phase(spark, monkeypatch):
    """r12 verdict #1b (refined by the r13 microbench): rows with a
    VARIABLE-WIDTH-heavy payload (strings/binary — per-byte Arrow
    copies) are probed through a KEY-ONLY projection, while fixed-width
    payloads of any size (numeric arrays — flat Arrow buffers, measured
    faster direct) stay on the direct probe; the surviving row set is
    identical either way."""
    wide = spark.range(200).selectExpr(
        "id as k",
        # binary payload: schema-estimated var-width heavy (the gate is
        # a plan-time schema estimate — Catalyst default sizes)
        "cast(repeat(cast(id as string), 40) as binary) as payload",
        "array_repeat(id, 32) as sig",
    )
    assert (
        bloom._est_varwidth_bytes(wide.schema)
        - bloom._est_varwidth_bytes(wide.select("k").schema)
        > bloom.WIDE_PAYLOAD_BYTES
    )
    # fixed-width-only payload must NOT trip the gate, however big
    fixed = spark.range(10).selectExpr("id as k", "array_repeat(id, 64) as sig")
    assert (
        bloom._est_varwidth_bytes(fixed.schema)
        - bloom._est_varwidth_bytes(fixed.select("k").schema)
        == 0
    )
    keys = spark.range(0, 200, 7).select(F.col("id").alias("k"))

    probed_cols = []
    orig = bloom.prune_by_bloom

    def spy(df, key, spec):
        probed_cols.append(list(df.columns))
        return orig(df, key, spec)

    monkeypatch.setattr(bloom, "prune_by_bloom", spy)
    got = bloom.prune_index_by_keys(wide, ["k"], keys, strategy="bloom")
    got_rows = {r["k"] for r in got.select("k").collect()}
    assert probed_cols == [["k"]], "Arrow probe must see the key column only"
    # no false negatives: every true member row survives with payload
    assert {r["id"] for r in keys.withColumnRenamed("k", "id").collect()} <= got_rows
    assert set(got.columns) == {"k", "payload", "sig"}

    # the fixed-width frame routes DIRECT (probe sees all columns)
    probed_cols.clear()
    bloom.prune_index_by_keys(fixed, ["k"], keys, strategy="bloom").count()
    assert probed_cols == [["k", "sig"]], "fixed-width payload stays direct"

    # and the direct probe keeps exactly the same rows as two-phase
    monkeypatch.setattr(bloom, "WIDE_PAYLOAD_BYTES", 1 << 30)
    direct = bloom.prune_index_by_keys(wide, ["k"], keys, strategy="bloom")
    assert {r["k"] for r in direct.select("k").collect()} == got_rows


def test_two_phase_declines_oversized_broadcast(spark, monkeypatch):
    """ADVICE r13 (medium): the two-phase broadcast is gated on an
    ESTIMATED survivor size — batch keys plus fpp x index keys — not
    the docstring's old '~batch-sized' assumption. A key-set estimate
    past the broadcast budget routes back to the DIRECT probe (bounded
    memory, identical surviving rows) and records the decline."""
    wide = spark.range(500).selectExpr(
        "id as k",
        "cast(repeat(cast(id as string), 40) as binary) as payload",
    )
    keys = spark.range(0, 500, 9).select(F.col("id").alias("k"))

    probed_cols = []
    orig = bloom.prune_by_bloom

    def spy(df, key, spec):
        probed_cols.append(list(df.columns))
        return orig(df, key, spec)

    monkeypatch.setattr(bloom, "prune_by_bloom", spy)
    sc = spark.sparkContext

    # a size_hint claiming ~100M batch keys makes the survivor estimate
    # blow the 32 MiB broadcast budget -> direct probe (all columns)
    got = bloom.prune_index_by_keys(
        wide, ["k"], keys, strategy="bloom", size_hint=1 << 31
    )
    rows = {r["k"] for r in got.select("k").collect()}
    assert probed_cols == [["k", "payload"]], "oversized survivors => direct"
    assert sc.getLocalProperty("tern.bloom_prune.two_phase").startswith(
        "declined-survivor-estimate:"
    )
    assert {r["k"] for r in keys.collect()} <= rows

    # small, estimable key set: broadcast two-phase as before (row sets
    # are compared against true members only — the two runs size their
    # bitmaps from different expected-key counts, so their false-
    # positive sets legitimately differ)
    probed_cols.clear()
    small = bloom.prune_index_by_keys(wide, ["k"], keys, strategy="bloom")
    assert probed_cols == [["k"]]
    assert sc.getLocalProperty("tern.bloom_prune.two_phase") == "broadcast"
    assert {r["k"] for r in keys.collect()} <= {
        r["k"] for r in small.select("k").collect()
    }


def test_two_phase_property_resets_on_narrow_payload(spark):
    """ADVICE r14: the tern.bloom_prune.two_phase local property is
    written UNCONDITIONALLY at prune entry — a narrow-payload (direct)
    call after a wide-payload one must not leave the previous call's
    'broadcast'/'declined' value readable, or a bench sampling the
    property after a mixed sequence records a stale route."""
    sc = spark.sparkContext
    wide = spark.range(100).selectExpr(
        "id as k", "cast(repeat(cast(id as string), 40) as binary) as payload"
    )
    narrow = spark.range(100).selectExpr("id as k", "id * 2 as v")
    keys = spark.range(0, 100, 7).select(F.col("id").alias("k"))

    bloom.prune_index_by_keys(wide, ["k"], keys, strategy="bloom").count()
    assert sc.getLocalProperty("tern.bloom_prune.two_phase") == "broadcast"

    bloom.prune_index_by_keys(narrow, ["k"], keys, strategy="bloom").count()
    assert (
        sc.getLocalProperty("tern.bloom_prune.two_phase")
        == "direct-narrow-payload"
    ), "stale two-phase route survived a narrow-payload call"

    # the semi strategy never consults the wide-payload branch either
    bloom.prune_index_by_keys(wide, ["k"], keys, strategy="semi").count()
    assert (
        sc.getLocalProperty("tern.bloom_prune.two_phase")
        == "direct-narrow-payload"
    )


def test_match_index_semi_prune_regime_gate(spark, tmp_path):
    """r14: past the broadcast threshold the match joins would shuffle
    the corpus-sized index per batch (BLOOM_r14 measured 223 MB/batch
    at a 150k-doc index); index_prune='auto' then broadcast-semi-prunes
    both index frames by the batch's own keys — decision-identical,
    map-side, O(batch) survivors. Below the threshold the gate stays
    direct and the plan is the untouched default."""
    corpus = _corpus(spark)
    rows = corpus.collect()
    path = str(tmp_path / "pidx")
    di.build_dedup_index(corpus, path, num_hashes=16, bands=8)
    batch = _batch(spark, rows)
    sc = spark.sparkContext

    # small index, default threshold -> direct, same plan as prune-off
    direct = di.match_against_index(spark, batch, path, num_hashes=16, bands=8)
    got_direct = _sorted_rows(direct)
    assert sc.getLocalProperty("tern.match_prune") == "direct"
    off = di.match_against_index(
        spark, batch, path, num_hashes=16, bands=8, index_prune="off"
    )
    import re as _re

    strip = lambda s: _re.sub(r"#\d+L?|_\d+", "#", s)
    assert strip(direct._jdf.queryExecution().optimizedPlan().toString()) == \
        strip(off._jdf.queryExecution().optimizedPlan().toString())

    # force the shuffle regime: threshold below the index estimate
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
        pruned = di.match_against_index(
            spark, batch, path, num_hashes=16, bands=8
        )
        got_pruned = _sorted_rows(pruned)
        assert sc.getLocalProperty("tern.match_prune") == "semi"
        plan = pruned._jdf.queryExecution().optimizedPlan().toString()
        assert "LeftSemi" in plan  # the prune is in the plan
        assert got_pruned == got_direct  # decisions identical
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    with pytest.raises(ValueError, match="unknown index_prune"):
        di.match_against_index(
            spark, batch, path, num_hashes=16, bands=8, index_prune="maybe"
        )

    # the bucketed twin keeps the prune off (no index-side shuffle to
    # rescue) and still classifies identically
    di.build_dedup_index_bucketed(corpus, "prune_gate_bkt", num_hashes=16,
                                  bands=8, n_buckets=4)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
        bkt = di.match_against_index_bucketed(
            spark, batch, "prune_gate_bkt", num_hashes=16, bands=8
        )
        got_bkt = _sorted_rows(bkt)
        assert sc.getLocalProperty("tern.match_prune") == "direct"
        assert got_bkt == got_direct
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS prune_gate_bkt_exact")
        spark.sql("DROP TABLE IF EXISTS prune_gate_bkt_bands")
