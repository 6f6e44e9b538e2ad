"""Byte-pair-encoding tokenizer: distributed training + Arrow encoding.

Training-data pipelines need token counts under the TARGET tokenizer, not
a whitespace proxy — data mixes are specified in tokens, budget selection
(`sampling.budget_select`) weights by tokens, and dedup thresholds shift
with tokenisation. This module trains a real BPE vocabulary and encodes
documents with it.

The split of work follows how production trainers (the original Sennrich
implementation, HuggingFace tokenizers) actually operate:

- **corpus-scale, distributed**: the word-frequency table. One
  explode + groupBy over the whole corpus; the result is Zipf-bounded
  (capped at ``max_words`` distinct words), thousands of times smaller
  than the corpus.
- **vocabulary-scale, driver**: the merge loop. Each iteration counts
  adjacent symbol pairs over the *word-frequency table* (not the
  corpus) and merges the argmax pair — pure Python over a dict that
  fits in L2 cache. Running this distributed would shuffle the same
  tiny table ``num_merges`` times.
- **corpus-scale, distributed**: encoding. mapInPandas with a
  rank-greedy merge encoder and a per-batch word memo (Zipf again:
  a batch of documents repeats a small set of words).

Determinism: ties in pair counts break lexicographically, so the merge
list — and therefore every token count downstream — is identical across
runs, partitionings, and cluster sizes.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: End-of-word marker (classic Sennrich convention) so merges cannot
#: cross word boundaries and whole-word tokens stay distinct from
#: prefixes ("low</w>" vs "low" inside "lower</w>").
EOW = "</w>"


def word_frequencies(
    df: DataFrame, text_col: str, max_words: int = 1_000_000
) -> DataFrame:
    """Distributed word-frequency table: ``(word, freq)``, highest-freq
    first, capped at ``max_words`` rows (orderBy+limit compiles to
    TakeOrderedAndProject — per-partition top-n, no full sort)."""
    return (
        df.select(F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(max_words)
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Train BPE merges; returns the ordered merge list (rank = index).

    Stops early when no pair occurs twice (merging singletons is noise).
    """
    freqs = {
        r["word"]: r["freq"] for r in word_frequencies(df, text_col, max_words).collect()
    }
    # word -> symbol tuple, seeded with chars + end-of-word marker
    words: dict[tuple[str, ...], int] = {}
    for w, f in freqs.items():
        words[tuple(list(w) + [EOW])] = words.get(tuple(list(w) + [EOW]), 0) + f

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, f in words.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += f
        if not pairs:
            break
        # deterministic argmax: count desc, then lexicographic pair
        best, best_n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best_n < 2:
            break
        merges.append(best)
        merged = "".join(best)
        new_words: dict[tuple[str, ...], int] = {}
        for sym, f in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_words[t] = new_words.get(t, 0) + f
        words = new_words
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge of one word (standard BPE apply)."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenise each document with a trained merge list.

    Output: ``(id, n_tokens, tokens array<string>)``. The merge ranks
    broadcast inside the Arrow closure; a per-batch word memo exploits
    Zipf repetition so each distinct word in a batch is encoded once.

    Word boundaries are :func:`dedup.py_tokens` — the same ASCII-whitespace
    equality classes as the JVM ``split`` the trainer's word counts use
    (``bpe_train``), so a word containing NBSP encodes against the merges
    that were actually trained for it; empty boundary tokens are skipped
    (they carry no symbols).
    """
    from .dedup import py_tokens

    ranks = {pair: i for i, pair in enumerate(merges)}

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        memo: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col = []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in filter(None, py_tokens(text)):
                    enc = memo.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        memo[w] = enc
                    toks.extend(enc)
                toks_col.append(toks)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_tokens": [len(t) for t in toks_col],
                    "tokens": toks_col,
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} long, n_tokens long, tokens array<string>"
    )
