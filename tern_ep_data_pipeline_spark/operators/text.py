"""Text analysis operators: token stats, quality scoring, language ID,
fingerprinting.

Beyond-reference operators for the training-data pipeline (driver mandate).
Everything is built-in string/array expressions (JVM-side, codegen-friendly);
regexes are kept to the POSIX-ish subset shared by Spark and ANSI engines so
oracle parity holds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language marker lexicons for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "de", "que", "los"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}

STOPWORDS_EN = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count (0 for empty text)."""
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(F.size(tokens(col)))


def count_in_set(col: Column, words: tuple[str, ...]) -> Column:
    """How many tokens fall in a fixed word set (array filter, no UDF)."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(arr, t)))


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token statistics."""
    t = F.col(text_col)
    n_tok = token_count(t)
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round(
            F.when(n_tok > 0, (F.length(F.regexp_replace(F.trim(t), r"\s+", "")) / n_tok)),
            6,
        ).alias("avg_token_len"),
    )


def quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality features: length, stopword ratio, punctuation ratio,
    digit ratio, uppercase ratio — the standard pretraining-filter features."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tok = token_count(t)
    n_stop = count_in_set(t, STOPWORDS_EN)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[.,;:!?'\"()]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round(F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0)), 6).alias("stopword_ratio"),
        F.round(F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)), 6).alias("punct_ratio"),
        F.round(F.when(n_chars > 0, n_digit / n_chars).otherwise(F.lit(0.0)), 6).alias("digit_ratio"),
        F.round(F.when(n_chars > 0, n_upper / n_chars).otherwise(F.lit(0.0)), 6).alias("upper_ratio"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word language ID with deterministic tie-break (first language
    in LANG_MARKERS order wins ties)."""
    t = F.col(text_col)
    counts = {lang: count_in_set(t, words) for lang, words in LANG_MARKERS.items()}
    best = F.greatest(*counts.values())
    pred = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):  # earlier langs overwrite later on ties
        pred = F.when(counts[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    cols = [F.col(id_col)]
    cols += [counts[lang].alias(f"n_{lang}") for lang in LANG_MARKERS]
    cols.append(pred.alias("pred_lang"))
    return df.select(*cols)


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document fingerprint: md5 of the normalised text (exact-dup key) plus
    a 64-bit content hash for compact storage."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fingerprint_md5"),
        F.xxhash64(norm).alias("fingerprint64"),
    )
