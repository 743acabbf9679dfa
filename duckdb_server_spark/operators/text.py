"""Text-analysis operators for training-data pipelines (beyond-reference):
language-ID, quality scoring, token counting, document fingerprinting.

All pure Column expressions (codegen, no Python UDFs) so they run at scan
speed over a 100 TB documents table.
"""

from __future__ import annotations

import pandas as pd
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


# Frozen weights of the linear quality model: bias, then coefficients for
# [ln(1+n_words), avg_word_len, alpha_ratio, distinct_ratio,
#  stopword_ratio]. Train offline (the CCNet/LLaMA recipe trains a linear
# fastText head against a reference corpus) and ship as literals, exactly
# like the frozen ANN quantizers.
QUALITY_LOGREG_WEIGHTS: tuple[float, ...] = (-5.5, 0.45, 0.25, 2.0, 1.5, 3.5)


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
    """Mean whitespace-token length.

    r17 (guide §4.1, VERDICT r16 item 3): the sum of token lengths has
    a CLOSED FORM — it is the length of the text with all whitespace
    stripped — so the interpreted ``aggregate()`` fold (higher-order
    functions never reach codegen; this fold was the measured reason
    b20 moved to an Arrow variant in r5) is gone entirely. Values are
    identical: token lengths are exact ints either way, and the final
    division is the same IEEE op. The [''] edge (blank text) still
    yields 0.0/1."""
    words = F.split(F.trim(text), r"\s+")
    total = F.length(F.regexp_replace(text, r"\s+", "")).cast("double")
    return total / F.nullif(F.size(words), F.lit(0))


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


def _words(text: Column) -> Column:
    """Lowercased whitespace tokens with empties dropped (the shared
    tokenizer of the repetition / TF-IDF passes; mirrors the oracle's
    ``list_filter(string_split_regex(lower(text),'\\s+'), x -> x <> '')``)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")


def repetition_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher-style repetition signals per document: distinct-word ratio
    and the fraction of bigram occurrences taken by the single most
    frequent bigram (high = boilerplate/listing loops; Rae et al. 2021
    use these as hard filters).

    Scale shape: word stats are pure Column exprs at scan speed; the
    bigram pass explodes scan-side (a Generate node, like b43's
    tokenizer), shuffles compact ``(doc_id, bigram)`` keys once with
    map-side combine, reduces to one row per doc, and broadcast-joins
    back — nothing materializes per group and no window is involved, so
    a skewed giant document costs one hash-agg chain, not a sort."""
    text = F.col(text_col)
    words = _words(text)
    base = df.select(
        F.col(id_col),
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
        words.alias("__words"),
    )
    bigrams = base.filter(F.col("n_words") >= 2).select(
        id_col,
        F.explode(
            F.transform(
                F.slice(F.col("__words"), 1, F.col("n_words") - 1),
                lambda w, i: F.concat_ws(
                    " ", w, F.element_at(F.col("__words"), i + 2)
                ),
            )
        ).alias("bigram"),
    )
    top = (
        bigrams.groupBy(id_col, "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy(id_col)
        .agg(F.max("n").alias("top_n"), F.sum("n").alias("total_n"))
    )
    out = base.drop("__words").join(top, on=id_col, how="left")
    distinct_ratio = F.round(
        F.when(
            F.col("n_words") > 0,
            F.col("n_distinct").cast("double") / F.col("n_words"),
        ).otherwise(F.lit(0.0)),
        4,
    )
    top_bigram_frac = F.round(
        F.coalesce(
            F.col("top_n").cast("double") / F.col("total_n"), F.lit(0.0)
        ),
        4,
    )
    return out.select(
        F.col(id_col),
        "n_words",
        distinct_ratio.alias("distinct_ratio"),
        top_bigram_frac.alias("top_bigram_frac"),
        # thresholds compare the ROUNDED values so both engines decide the
        # boundary cases identically
        ((distinct_ratio >= 0.2) & (top_bigram_frac <= 0.18)).alias("keep"),
    )


def _round_half_up(x: float, digits: int) -> float:
    """Spark-faithful double rounding: Spark's round() converts the
    double via its shortest decimal representation and rounds HALF_UP
    (BigDecimal.valueOf → setScale). Python's builtin round() is
    banker's, which flips exact ties (e.g. 2/64 at 4 digits: Spark
    0.0313, banker's 0.0312) — Arrow variants must match the JVM."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def repetition_stats_arrow(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Arrow-vectorized :func:`repetition_stats` — identical values.

    The repetition signals are per-document (no cross-doc state), so the
    whole computation — tokens, distinct ratio, bigram Counter — fits in
    one pandas_udf pass, removing both the interpreted HOF bigram
    construction AND the (doc_id, bigram) shuffle + join-back entirely:
    the operator becomes a shuffle-free projection. Equality-tested
    against the JVM form in tests/test_r5_ops.py; prefer the JVM form
    only where Python workers are unavailable."""
    import re as _re
    from collections import Counter

    from pyspark.sql.functions import pandas_udf

    tok_re = _re.compile(r"\S+")

    @pandas_udf(
        "n_words int, distinct_ratio double, top_bigram_frac double, keep boolean"
    )
    def _stats(texts: pd.Series) -> pd.DataFrame:
        n_out, d_out, t_out, k_out = [], [], [], []
        for s in texts:
            ws = tok_re.findall(s.lower()) if s is not None else []
            nw = len(ws)
            dr = _round_half_up(len(set(ws)) / nw, 4) if nw > 0 else 0.0
            if nw >= 2:
                counts = Counter(zip(ws, ws[1:]))
                tb = _round_half_up(max(counts.values()) / (nw - 1), 4)
            else:
                tb = 0.0
            n_out.append(nw); d_out.append(dr); t_out.append(tb)
            k_out.append(dr >= 0.2 and tb <= 0.18)
        return pd.DataFrame(
            {"n_words": n_out, "distinct_ratio": d_out,
             "top_bigram_frac": t_out, "keep": k_out}
        )

    feat = _stats(F.col(text_col)).alias("__f")
    return df.select(F.col(id_col), feat).select(
        F.col(id_col),
        F.col("__f.n_words").alias("n_words"),
        F.col("__f.distinct_ratio").alias("distinct_ratio"),
        F.col("__f.top_bigram_frac").alias("top_bigram_frac"),
        F.col("__f.keep").alias("keep"),
    )


def text_quality_cols(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """b20's feature set as ONE codegen JVM projection — no Python
    stage, no interpreted HOF (r17, VERDICT r16 item 3).

    The Arrow variant existed because ``avg_word_length`` used an
    interpreted ``aggregate()`` fold; with the closed form (total
    non-whitespace length / token count) every feature is plain codegen
    expressions, so the ArrowEvalPython node — a serialization boundary
    and a per-task Python worker at 100 TB scan scale — disappears.
    Values are identical to the Arrow variant (equality-tested in
    tests/test_r17_opt.py) and to the oracle's replay."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(text).alias("n_tokens"),
        F.round(avg_word_length(text), 6).alias("avg_word_len"),
        F.round(alpha_ratio(text), 6).alias("alpha_ratio"),
        quality_score(text).alias("quality"),
    )


def quality_logreg_cols(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: tuple[float, ...] = QUALITY_LOGREG_WEIGHTS,
) -> DataFrame:
    """b57's frozen-weight logistic classifier as ONE codegen JVM
    projection — no Python stage, no interpreted HOF (r17, VERDICT r16
    item 3).

    The original pure-Catalyst form (:func:`quality_logreg`) interprets
    per-token lambdas (~11k docs/s — SCALING.md), which is why the
    Arrow variant existed. Every token feature has a lambda-free
    spelling:

    - n_words: ``regexp_count(text, '\\S+')`` (count of maximal
      non-whitespace runs — lowercasing never changes tokenization);
    - Σ token length: ``length(regexp_replace(lower(text),'\\s+',''))``
      (the closed form — token lengths over the LOWERED text, matching
      the tokenizer);
    - distinct ratio: ``array_distinct`` over the split array (a native
      collection op, not a lambda);
    - stopword hits: one pass of ``regexp_count`` with zero-width
      lookarounds ``(?<=^|\\s)(?:the|and|of|to|in)(?=\\s|$)`` — exactly
      the tokens string-equal to a marker (zero-width, so consecutive
      hits sharing one space are all counted).

    Feature math keeps the same operand shapes/order as the Arrow
    variant, so values agree (equality-tested in tests/test_r17_opt.py;
    the oracle replays the chain at the 6-decimal rounding)."""
    w0, w1, w2, w3, w4, w5 = (float(w) for w in weights)
    text = F.col(text_col)
    low = F.lower(text)
    nw = F.regexp_count(text, F.lit(r"\S+"))
    avg_wl = F.length(F.regexp_replace(low, r"\s+", "")).cast(
        "double"
    ) / F.nullif(nw, F.lit(0))
    alpha = F.length(
        F.regexp_replace(text, "[^a-zA-Z ]", "")
    ) / F.nullif(F.length(text), F.lit(0))
    distinct_ratio = F.size(
        F.array_distinct(F.split(F.trim(low), r"\s+"))
    ) / F.nullif(nw, F.lit(0))
    stop_hits = F.regexp_count(
        low, F.lit(r"(?<=^|\s)(?:the|and|of|to|in)(?=\s|$)")
    )
    stop_ratio = stop_hits / F.nullif(nw, F.lit(0))
    logit = (
        F.lit(w0)
        + F.lit(w1) * F.log(F.lit(1.0) + nw)
        + F.lit(w2) * avg_wl
        + F.lit(w3) * alpha
        + F.lit(w4) * distinct_ratio
        + F.lit(w5) * stop_ratio
    )
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6)
    return df.select(
        F.col(id_col),
        nw.cast("long").alias("n_words"),
        prob.alias("quality_prob"),
        (prob >= 0.5).alias("keep"),
    )


def text_quality_arrow(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Arrow-vectorized b20 feature set (token_count / avg_word_length /
    alpha_ratio / quality_score) — identical values to the Column-expr
    forms, computed in one pandas pass per document. The Column forms are
    codegen but the avg-word-length fold is an interpreted HOF; at the
    100× tier the family saturates ~36k docs/s (SCALING.md) and this
    variant removes the per-element overhead. Edge parity: Spark's
    ``split(trim(''), '\\s+')`` yields [''] (count 1, avg 0.0) — mirrored
    explicitly."""
    import re as _re

    from pyspark.sql.functions import pandas_udf

    tok_re = _re.compile(r"\S+")
    alpha_re = _re.compile(r"[a-zA-Z ]")

    @pandas_udf(
        "n_tokens int, avg_word_len double, alpha_ratio double, quality double"
    )
    def _feats(texts: pd.Series) -> pd.DataFrame:
        nt_o, awl_o, ar_o, q_o = [], [], [], []
        for s in texts:
            if s is None:
                nt_o.append(None); awl_o.append(None)
                ar_o.append(None); q_o.append(None)
                continue
            ws = tok_re.findall(s)
            nt = len(ws) if ws else 1  # split(trim('')) = ['']
            awl = sum(map(len, ws)) / nt
            ar = (len(alpha_re.findall(s)) / len(s)) if len(s) else None
            length_ok = 1.0 if 20 <= len(s) <= 100000 else 0.3
            wl_ok = 1.0 if 2.0 <= awl <= 12.0 else 0.4
            q = (
                _round_half_up(0.4 * length_ok + 0.3 * wl_ok + 0.3 * ar, 6)
                if ar is not None
                else None
            )
            nt_o.append(nt)
            awl_o.append(_round_half_up(awl, 6))
            ar_o.append(_round_half_up(ar, 6) if ar is not None else None)
            q_o.append(q)
        return pd.DataFrame(
            {"n_tokens": nt_o, "avg_word_len": awl_o,
             "alpha_ratio": ar_o, "quality": q_o}
        )

    feat = _feats(F.col(text_col)).alias("__f")
    return df.select(F.col(id_col), feat).select(
        F.col(id_col),
        F.col("__f.n_tokens").alias("n_tokens"),
        F.col("__f.avg_word_len").alias("avg_word_len"),
        F.col("__f.alpha_ratio").alias("alpha_ratio"),
        F.col("__f.quality").alias("quality"),
    )


def tfidf_topk(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document (keyword extraction / routing
    signal): tf from one ``(doc, term)`` hash-agg, document frequency
    from a second agg over the first (no re-scan of text), corpus size
    as a one-row broadcast, final per-doc top-k via a window partitioned
    by doc — every shuffle carries compact keys and the skew unit is one
    document's vocabulary, not the corpus'."""
    text = F.col(text_col)
    toks = df.select(F.col(id_col), F.explode(_words(text)).alias("term"))
    # tf feeds BOTH the document-frequency aggregate and the scoring
    # join; without a shared materialization the token explode and the
    # (doc, term) hash-agg execute twice (r16, guide §2.4 — branched
    # lineage gets no exchange reuse above the agg).
    tf = (
        toks.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf")
            * F.log(F.col("n_docs").cast("double") / F.col("df")),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc_nulls_last(), F.col("term").asc_nulls_last()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(id_col),
            "term",
            "tf",
            F.round("score", 6).alias("tfidf"),
            "rank",
        )
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


def quality_logreg(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: tuple[float, ...] = QUALITY_LOGREG_WEIGHTS,
) -> DataFrame:
    """Model-based quality scoring: a frozen-weight logistic regression
    over the cheap scan-side features — the production step above the
    hard heuristic gates (quality_score / repetition_stats): pipelines
    keep the heuristics as hard filters and rank/sample by a trained
    linear classifier's probability (CCNet's fastText stage, LLaMA's
    Wikipedia-reference classifier).

    Everything is one projection of codegen Column expressions — zero
    shuffle, zero UDF — so it runs at scan speed over 100 TB and
    composes with any downstream sampler. Deterministic (fixed weights,
    closed-form features), so a SQL oracle reproduces it bit-for-bit up
    to the 6-decimal rounding."""
    w0, w1, w2, w3, w4, w5 = (float(w) for w in weights)
    # Materialize the token array ONCE: four features reference it, and
    # Spark's CSE does not cover higher-order functions — inlining
    # re-tokenizes every document per feature (measured 4× at 500k docs).
    base = df.select(
        F.col(id_col),
        F.col(text_col).alias("__text"),
        _words(F.col(text_col)).alias("__w"),
    )
    words = F.col("__w")
    nw = F.size(words)
    avg_wl = F.aggregate(
        words, F.lit(0.0), lambda acc, w: acc + F.length(w)
    ) / F.nullif(nw, F.lit(0))
    alpha = F.length(
        F.regexp_replace(F.col("__text"), "[^a-zA-Z ]", "")
    ) / F.nullif(F.length(F.col("__text")), F.lit(0))
    distinct_ratio = F.size(F.array_distinct(words)) / F.nullif(nw, F.lit(0))
    stop_hits = F.size(
        F.filter(words, lambda w: w.isin("the", "and", "of", "to", "in"))
    )
    stop_ratio = stop_hits / F.nullif(nw, F.lit(0))
    logit = (
        F.lit(w0)
        + F.lit(w1) * F.log(F.lit(1.0) + nw)
        + F.lit(w2) * avg_wl
        + F.lit(w3) * alpha
        + F.lit(w4) * distinct_ratio
        + F.lit(w5) * stop_ratio
    )
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6)
    return base.select(
        F.col(id_col),
        nw.alias("n_words"),
        prob.alias("quality_prob"),
        # compare the ROUNDED probability so both engines decide the
        # boundary identically (the b49 convention)
        (prob >= 0.5).alias("keep"),
    )


def quality_logreg_arrow(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: tuple[float, ...] = QUALITY_LOGREG_WEIGHTS,
) -> DataFrame:
    """Arrow-vectorized spelling of :func:`quality_logreg` — identical
    values, different execution tier.

    The HOF form is pure Catalyst, but higher-order functions
    (aggregate/filter over the token array) run INTERPRETED per element:
    SCALING.md measures the family saturating at ~11k docs/s per core at
    the 100× tier. This variant computes all four token features in one
    pass inside a pandas_udf: tokenization is a single C-regex findall
    per document and the feature math is a handful of numpy ops per Arrow
    batch — the per-element interpreter overhead disappears. Still one
    shuffle-free projection; Python workers scale with cores, Arrow
    transfer is columnar. Use the HOF form when a cluster forbids Python
    workers; use this when throughput matters."""
    import re as _re

    from pyspark.sql.functions import pandas_udf

    w0, w1, w2, w3, w4, w5 = (float(w) for w in weights)
    tok_re = _re.compile(r"\S+")
    alpha_re = _re.compile(r"[a-zA-Z ]")
    stops = frozenset(("the", "and", "of", "to", "in"))

    @pandas_udf("n_words long, quality_prob double, keep boolean")
    def _features(texts: pd.Series) -> pd.DataFrame:
        import math

        n_out, p_out, k_out = [], [], []
        for s in texts:
            if s is None:
                n_out.append(None); p_out.append(None); k_out.append(None)
                continue
            ws = tok_re.findall(s.lower())
            nw = len(ws)
            n_out.append(nw)
            if nw == 0 or len(s) == 0:
                p_out.append(None); k_out.append(None)
                continue
            avg_wl = sum(map(len, ws)) / nw
            alpha = len(alpha_re.findall(s)) / len(s)
            distinct_ratio = len(set(ws)) / nw
            stop_ratio = sum(1 for w in ws if w in stops) / nw
            logit = (
                w0
                + w1 * math.log(1.0 + nw)
                + w2 * avg_wl
                + w3 * alpha
                + w4 * distinct_ratio
                + w5 * stop_ratio
            )
            prob = _round_half_up(1.0 / (1.0 + math.exp(-logit)), 6)
            p_out.append(prob); k_out.append(prob >= 0.5)
        return pd.DataFrame(
            {"n_words": n_out, "quality_prob": p_out, "keep": k_out}
        )

    feat = _features(F.col(text_col)).alias("__f")
    return df.select(F.col(id_col), feat).select(
        F.col(id_col),
        F.col("__f.n_words").alias("n_words"),
        F.col("__f.quality_prob").alias("quality_prob"),
        F.col("__f.keep").alias("keep"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    chunking pass every RAG/embedding pipeline runs before encoding
    (window ``chunk_tokens``, step ``stride`` < window → overlap keeps
    boundary context). Output: (id, chunk_id, n_tokens, chunk_text),
    provenance preserved for joining scores/embeddings back.

    Pure scan-side: one ``sequence``+``posexplode`` Generate per doc (no
    shuffle at all — chunking is embarrassingly parallel), windows
    sliced from the single tokenized array. A 100 TB corpus chunks at
    scan speed and writes straight to the encoder's input shards."""
    words = _words(F.col(text_col))
    return (
        df.select(F.col(id_col), words.alias("__w"))
        .select(
            F.col(id_col),
            F.posexplode(
                F.sequence(
                    F.lit(1),
                    F.greatest(
                        F.size("__w") - chunk_tokens + 1, F.lit(1)
                    ),
                    F.lit(stride),
                )
            ).alias("chunk_id", "__start"),
            F.col("__w"),
        )
        .select(
            F.col(id_col),
            "chunk_id",
            F.size(F.slice(F.col("__w"), F.col("__start"), chunk_tokens)).alias(
                "n_tokens"
            ),
            F.array_join(
                F.slice(F.col("__w"), F.col("__start"), chunk_tokens), " "
            ).alias("chunk_text"),
        )
    )
