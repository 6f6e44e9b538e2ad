"""DSIR importance resampling (sampling.dsir_logratio / importance_resample).

Reference method: Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling" — hashed unigram+bigram features, target/raw
importance log-ratio, Gumbel-top-k selection.  The engine contract under
test: layout determinism (exact integer weight sums), target enrichment
(the selection actually moves toward the target distribution), and the
Gumbel key's sampling (not head-taking) semantics.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from tern_ep_data_pipeline_spark.operators import sampling


def _two_topic_corpus(spark, n_per=60):
    """Two disjoint-vocabulary topics; ids interleave so id order carries
    no topic signal."""
    rows = []
    for i in range(n_per):
        rows.append((2 * i, "alpha beta gamma delta " * 8, "sci"))
        rows.append((2 * i + 1, "omega psi chi phi " * 8, "web"))
    return spark.createDataFrame(rows, "doc_id long, text string, topic string")


def test_dsir_selects_target_like_docs(spark):
    """With a pure-topic target, the selected pool docs are overwhelmingly
    that topic — the importance weights separate the two disjoint
    vocabularies by a huge margin, so even with Gumbel noise the
    selection should be one-sided."""
    docs = _two_topic_corpus(spark)
    target = docs.where("topic = 'sci'").select("doc_id", "text")
    pool = docs.select("doc_id", "text")
    picked = sampling.importance_resample(pool, target, 30)
    got = picked.join(docs.select("doc_id", "topic"), on="doc_id")
    counts = dict(
        (r["topic"], r["n"])
        for r in got.groupBy("topic").agg(F.count("*").alias("n")).collect()
    )
    assert counts.get("sci", 0) >= 28, counts


def test_dsir_layout_deterministic(spark):
    """Exact integer weight sums + hash-derived Gumbel noise: the same
    inputs select the same rows with the same micro values under any
    partitioning."""
    docs = _two_topic_corpus(spark).select("doc_id", "text")
    target = docs.where("doc_id % 2 = 0")
    a = sorted(tuple(r) for r in sampling.importance_resample(docs, target, 20).collect())
    b = sorted(
        tuple(r)
        for r in sampling.importance_resample(
            docs.repartition(7), target.repartition(3), 20
        ).collect()
    )
    assert a == b


def test_dsir_k_exceeds_pool(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "c d e"), (3, "e f g")], "doc_id long, text string"
    )
    out = sampling.importance_resample(docs, docs.where("doc_id = 1"), 50)
    assert out.count() == 3


def test_dsir_logratio_shape_and_sign(spark):
    """The ratio table is bounded by ``buckets`` rows and covers exactly
    the raw pool's buckets; buckets that only target-heavy grams hash to
    score positive, raw-only buckets negative."""
    docs = _two_topic_corpus(spark)
    target = docs.where("topic = 'sci'").select("doc_id", "text")
    pool = docs.select("doc_id", "text")
    lr = sampling.dsir_logratio(pool, target, buckets=512)
    rows = lr.collect()
    assert 0 < len(rows) <= 512
    # the sci vocabulary dominates its buckets in the target; web grams
    # never appear there — their buckets must score below the sci ones
    from tern_ep_data_pipeline_spark.operators.sketch import portable_hash

    probe = spark.createDataFrame(
        [("alpha beta",), ("omega psi",)], "g string"
    ).select(
        "g", (portable_hash(F.col("g"), "dsir") % 512).alias("bucket")
    )
    scored = {r["g"]: r["lr_pico"] for r in probe.join(lr, on="bucket").collect()}
    assert scored["alpha beta"] > 0 > scored["omega psi"], scored


def test_dsir_gumbel_is_sampling_not_head(spark):
    """Different salts draw different Gumbel noise — the selection is a
    sample from the importance distribution, so two salts must not pick
    identical sets when weights are near-uniform (all docs share one
    vocabulary)."""
    rows = [(i, "common words shared by every single document here") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = docs.where("doc_id < 50")
    s1 = {r["doc_id"] for r in sampling.importance_resample(docs, tgt, 20, salt="dsir").collect()}
    s2 = {r["doc_id"] for r in sampling.importance_resample(docs, tgt, 20, salt="other").collect()}
    assert s1 != s2


def test_curate_corpus_dsir_stage(spark):
    """curate_corpus(dsir_target=, dsir_k=): the pipeline's stage-6
    selection keeps exactly k target-like survivors, audit mode
    attributes the dropped docs to 'dsir_sampled_out', and combining
    DSIR with domain mixing is rejected."""
    import random

    import pytest as _pytest

    from tern_ep_data_pipeline_spark.plans.curation import curate_corpus

    # per-doc UNIQUE texts (the pipeline's exact/near-dup stages run
    # before DSIR — identical topic texts would collapse to one doc each)
    rng = random.Random(5)
    sci = "atom quark lepton boson photon gluon meson hadron spin flux".split()
    web = "click banner cookie popup tracker advert widget layout theme font".split()
    rows = []
    for i in range(60):
        rows.append((2 * i, " ".join(rng.choice(sci) for _ in range(40)), "sci"))
        rows.append((2 * i + 1, " ".join(rng.choice(web) for _ in range(40)), "web"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, topic string")
    target = docs.where("topic = 'sci'").select("doc_id", "text")
    out = curate_corpus(
        docs.select("doc_id", "text"),
        dsir_target=target,
        dsir_k=10,
        memory_guard=False,
    )
    assert out.count() == 10

    audit = curate_corpus(
        docs.select("doc_id", "text"),
        dsir_target=target,
        dsir_k=10,
        audit=True,
        memory_guard=False,
    )
    stages = {r["stage"] for r in audit.select("stage").distinct().collect()}
    assert "dsir_sampled_out" in stages and "kept" in stages

    with _pytest.raises(ValueError, match="mutually exclusive"):
        curate_corpus(
            docs.select("doc_id", "text"),
            dsir_target=target,
            dsir_k=10,
            domain_col="source",
            domain_fractions={"a": 1.0},
            memory_guard=False,
        )


def test_curate_corpus_dsir_half_specified_rejected(spark):
    from tern_ep_data_pipeline_spark.plans.curation import curate_corpus

    docs = spark.createDataFrame(
        [(1, "some text here"), (2, "other text there")],
        "doc_id long, text string",
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="together"):
        curate_corpus(docs, dsir_k=5, memory_guard=False)
    with _pytest.raises(ValueError, match="together"):
        curate_corpus(docs, dsir_target=docs, memory_guard=False)

    # ADVICE r12 #3: the validation is hoisted to the TOP of
    # curate_corpus — a mis-paired call fails before stages 0-5 do any
    # work. The bogus quality_model below would raise at stage 5 if
    # execution got that far; the ValueError proves it never does.
    with _pytest.raises(ValueError, match="together"):
        curate_corpus(
            docs, dsir_k=5, quality_model=object(), memory_guard=False
        )


def test_dsir_subset_fast_path_identical(spark):
    """target_subset_of_raw=True derives the target marginals from the
    pool's staged per-doc counts (no second text pass) — bit-identical
    output whenever the target really is a pool subset."""
    docs = _two_topic_corpus(spark).select("doc_id", "text")
    target = docs.where("doc_id % 3 = 0")
    slow = sorted(
        tuple(r) for r in sampling.importance_resample(docs, target, 25).collect()
    )
    fast = sorted(
        tuple(r)
        for r in sampling.importance_resample(
            docs, target, 25, target_subset_of_raw=True
        ).collect()
    )
    assert slow == fast
