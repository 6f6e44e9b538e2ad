"""End-to-end training-corpus curation plan.

The user-facing composition of the curation operators — what a 100 TB
corpus run actually executes, in dependency order:

1. exact dedup (hash-groupBy; removes the bulk cheaply);
2. near-dup pairs (MinHash LSH, degenerate buckets capped) ->
   connected components -> keep only canonical (min-id) cluster members;
3. quality gate (pure predicates) + optional PII scrub;
4. deterministic per-domain sampling and/or token-budget mixing.

Stage order is the cost order: each stage shrinks the corpus the next
(more expensive) stage scans. Every decision is reproducible — hash
sampling, min-id canonicals, seeded signatures — so a rerun (or a
backfill on a different cluster) selects the identical corpus.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup as dedup_ops
from ..operators import sampling, text
from ..operators.graph import dedup_clusters


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 20,
    max_chars: int = 1_000_000,
    minhash_threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    scrub: bool = False,
    domain_col: str | None = None,
    domain_fractions: Mapping[str, float] | None = None,
    sample_salt: str = "smp",
    bpe_merges: list[tuple[str, str]] | None = None,
    token_budget: float | None = None,
) -> DataFrame:
    """Curated corpus: the input schema plus ``n_chars_clean`` (and
    ``n_tokens``/``cum_weight`` when token budgeting is on); one row per
    surviving document. See module docstring for the stage order.

    With ``bpe_merges`` + ``token_budget``, each domain keeps documents in
    (quality, id) order until the budget — measured in REAL tokens under
    the trained tokenizer, not characters — is exhausted. Data mixes are
    specified in tokens; a character proxy misallocates across domains
    with different token densities (code vs prose).
    """
    # 1. exact dedup first — near-exact copies would otherwise flood the
    # LSH band buckets (the degenerate case the bucket cap guards).
    deduped = dedup_ops.exact_dedup(docs, id_col, text_col)

    # 2. near-dup clusters -> keep canonical members only. The anti-join
    # keys on ids, so only the (tiny) non-canonical id set shuffles.
    pairs = dedup_ops.minhash_dedup_pairs(
        deduped,
        id_col,
        text_col,
        num_hashes=num_hashes,
        bands=bands,
        threshold=minhash_threshold,
    )
    clusters = dedup_clusters(pairs)
    losers = clusters.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    kept = deduped.join(losers, on=id_col, how="left_anti")

    # 3. quality gate (+ scrub) — pure projections, fused into the scan.
    n = F.length(F.trim(F.col(text_col)))
    kept = kept.withColumn("n_chars_clean", n).where(
        (F.col("n_chars_clean") >= min_chars)
        & (F.col("n_chars_clean") <= max_chars)
    )
    if scrub:
        kept = kept.withColumn(text_col, text.scrub_pii(F.col(text_col)))

    # 4. deterministic domain mixing.
    if domain_col and domain_fractions:
        kept = sampling.stratified_hash_sample(
            kept, id_col, domain_col, domain_fractions, salt=sample_salt
        )

    # 5. token budgeting under the real tokenizer.
    if bpe_merges is not None and token_budget is not None:
        if not domain_col:
            raise ValueError("token_budget requires domain_col")
        from ..operators.bpe import bpe_encode

        counts = bpe_encode(kept, bpe_merges, id_col, text_col).select(
            id_col, "n_tokens"
        )
        kept = sampling.budget_select(
            kept.join(counts, on=id_col),
            domain_col,
            [F.col("n_chars_clean").desc(), F.col(id_col)],
            "n_tokens",
            token_budget,
        )
    return kept
