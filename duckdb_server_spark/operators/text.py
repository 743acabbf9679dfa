"""Text-analysis operators for training-data pipelines (beyond-reference):
language-ID, quality scoring, token counting, document fingerprinting.

All pure Column expressions (codegen, no Python UDFs) so they run at scan
speed over a 100 TB documents table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
# (Real deployments plug in fastText etc. via a pandas_udf; this heuristic
# is the dependency-free default and is fully JVM-side.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "de", "et", "un"),
    "de": ("der", "die", "und", "das", "ist"),
}


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish subword proxy: word-boundary pieces + digit runs +
    punctuation, via regex split — the cheap token estimator."""
    return F.size(
        F.filter(
            F.split(text, r"(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"),
            lambda s: F.trim(s) != "",
        )
    )


def avg_word_length(text: Column) -> Column:
    words = F.split(F.trim(text), r"\s+")
    return F.aggregate(
        words, F.lit(0.0), lambda acc, w: acc + F.length(w)
    ) / F.nullif(F.size(words), F.lit(0))


def stopword_ratio(text: Column, stopwords: tuple[str, ...]) -> Column:
    words = F.split(F.lower(F.trim(text)), r"\s+")
    hits = F.size(F.filter(words, lambda w: w.isin(*stopwords)))
    return hits / F.nullif(F.size(words), F.lit(0))


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are a-z/A-Z or space."""
    return F.length(F.regexp_replace(text, "[^a-zA-Z ]", "")) / F.nullif(
        F.length(text), F.lit(0)
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: long-enough, wordy, mostly-alpha.
    Weights follow the C4/Gopher-style cheap filters."""
    length_ok = F.when(F.length(text).between(20, 100000), 1.0).otherwise(0.3)
    wl = avg_word_length(text)
    wl_ok = F.when(wl.between(2.0, 12.0), 1.0).otherwise(0.4)
    return F.round(0.4 * length_ok + 0.3 * wl_ok + 0.3 * alpha_ratio(text), 6)


def lang_id(text: Column) -> Column:
    """Heuristic language ID: highest stopword-hit count wins; 'und' if no
    marker hits."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang, markers in LANG_MARKERS.items():
        hits = F.size(F.filter(words, lambda w: w.isin(*markers)))
        improved = hits > best_hits
        best_lang = F.when(improved, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(improved, hits).otherwise(best_hits)
    return best_lang


def fingerprint(text: Column) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token set — stable under token reordering (the cheap canonicalizer;
    rolling/simhash variants live in operators/dedup.py)."""
    return F.md5(
        F.concat_ws(" ", F.sort_array(F.array_distinct(F.split(F.lower(F.trim(text)), r"\s+"))))
    )


def text_profile(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One-pass text profile: all analysis columns in a single projection."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(text).alias("n_tokens"),
        bpe_ish_token_count(text).alias("n_subwords"),
        F.round(avg_word_length(text), 6).alias("avg_word_len"),
        F.round(alpha_ratio(text), 6).alias("alpha_ratio"),
        quality_score(text).alias("quality"),
        lang_id(text).alias("lang_guess"),
        fingerprint(text).alias("fingerprint"),
    )
