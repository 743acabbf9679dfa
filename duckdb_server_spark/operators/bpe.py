"""Distributed BPE merge training — the tokenizer-training step of an
LLM data pipeline, run as Spark aggregations (beyond-reference
capability; the reference trains nothing).

Classic byte-pair encoding over a word-frequency table (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units" —
public algorithm): start from characters, repeatedly merge the most
frequent adjacent symbol pair. Each round is

1. adjacent-pair explode over the (distinct-word, freq) table — map-side,
   weighted by word frequency;
2. one hash-aggregate on the pair (map-side combine; the shuffle carries
   (pair, partial-count) rows bounded by the vocabulary, never the
   corpus);
3. an argmax collect of EXACTLY ONE row (count DESC, pair ASC — a total,
   engine-portable tie-break), the bounded driver checkpoint every
   trainer needs to emit its merge table (the kmeans-quantizer pattern,
   similarity.py);
4. merge application as a guarded string replace on the symbol string
   (' a b ' → ' ab ' on the space-padded form) — left-to-right
   non-overlapping, the exact semantics of SQL replace() in Spark AND
   DuckDB, which is what makes the whole computation replayable by a
   differential oracle.

Scale shape: the iterated state is the DISTINCT-WORD table (vocabulary-
sized, not corpus-sized — the classic trick; 100 TB of text still has a
bounded vocabulary), localCheckpoint'ed per round so round N never
replays rounds 1..N-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["bpe_train", "bpe_encode", "bpe_oracle_sql", "bpe_encode_oracle_sql"]


def _char_symbols(col: F.Column) -> F.Column:
    """' '-joined character symbols of a word — the round-0 corpus form,
    spelled identically to the oracle (substr per position)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.substring(col, i, 1),
    )
    return F.array_join(chars, " ")


def _adjacent_pairs(sym_col: F.Column) -> F.Column:
    """Adjacent symbol pairs 'a b' of a symbol string (guarded: a
    single-symbol word has none — sequence() would run DESCENDING on an
    empty range, so the empty case is explicit)."""
    toks = F.split(sym_col, " ")
    n = F.size(toks)
    return F.when(
        n > 1,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bpe_train(
    df: DataFrame,
    text_col: str,
    rounds: int = 6,
) -> DataFrame:
    """Learn ``rounds`` BPE merges; returns one row per merge:
    (merge_rank, pair, merged, pair_count)."""
    spark = df.sparkSession
    words = (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    corpus = words.select(
        "freq", _char_symbols(F.col("w")).alias("s")
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, int]] = []
    for r in range(rounds):
        top = (
            corpus.select(
                "freq", F.explode(_adjacent_pairs(F.col("s"))).alias("p")
            )
            .groupBy("p")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("p").asc())
            .limit(1)
            .collect()  # bounded: exactly one (pair, count) row per round
        )
        if not top:
            break
        pair, cnt = top[0]["p"], int(top[0]["cnt"])
        merged = pair.replace(" ", "")
        merges.append((r + 1, pair, merged, cnt))
        corpus = corpus.select(
            "freq",
            F.trim(
                F.replace(
                    F.concat(F.lit(" "), F.col("s"), F.lit(" ")),
                    F.lit(f" {pair} "),
                    F.lit(f" {merged} "),
                )
            ).alias("s"),
        ).localCheckpoint(eager=True)

    return spark.createDataFrame(
        merges, "merge_rank int, pair string, merged string, pair_count bigint"
    )


def bpe_oracle_sql(rounds: int = 6, source: str = "documents") -> str:
    """The DuckDB replay of :func:`bpe_train` — ``rounds`` chained rounds
    of pair-count → argmax → guarded replace, generated mechanically so
    the oracle and the operator can never drift in round count."""
    # The word column is named wd, NOT w: a bare len(w) in a CTE has no
    # catalog schema for the rewriter's type dispatch to resolve, and
    # the name-heuristic fallback treats `w` as array-conventional.
    # (No SQL comments here — oracles are whitespace-collapsed to one
    # line, which would turn `--` into swallow-the-statement.)
    ctes = [
        f"""w0 AS (
      SELECT wd, count(*) AS freq FROM (
        SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                                  x -> x <> '')) AS wd
        FROM {source}) GROUP BY wd
    ),
    c0 AS (
      SELECT freq,
             array_to_string(list_transform(range(1, len(wd) + 1),
                 i -> substr(wd, CAST(i AS INT), 1)), ' ') AS s
      FROM w0
    )"""
    ]
    for r in range(rounds):
        ctes.append(f"""p{r} AS (
      SELECT p, sum(freq) AS cnt FROM (
        SELECT freq,
               unnest(CASE WHEN len(string_split(s, ' ')) > 1
                 THEN list_transform(range(1, len(string_split(s, ' '))),
                      i -> string_split(s, ' ')[i] || ' '
                           || string_split(s, ' ')[i + 1])
                 ELSE [] END) AS p
        FROM c{r}) GROUP BY p
    ),
    m{r} AS (SELECT p, cnt FROM p{r} ORDER BY cnt DESC, p ASC LIMIT 1),
    c{r + 1} AS (
      SELECT freq,
             trim(replace(' ' || s || ' ',
                          ' ' || (SELECT p FROM m{r}) || ' ',
                          ' ' || replace((SELECT p FROM m{r}), ' ', '')
                              || ' ')) AS s
      FROM c{r}
    )""")
    rows = "\n    UNION ALL ".join(
        f"SELECT {r + 1} AS merge_rank, (SELECT p FROM m{r}) AS pair, "
        f"replace((SELECT p FROM m{r}), ' ', '') AS merged, "
        f"CAST((SELECT cnt FROM m{r}) AS BIGINT) AS pair_count"
        for r in range(rounds)
    )
    return (
        "WITH " + ",\n    ".join(ctes)
        + "\n    " + rows
        + "\n    ORDER BY merge_rank ASC NULLS LAST"
    )


def bpe_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Apply learned merges (in rank order — standard BPE encoding) to
    every document and count subword tokens: per doc, each word becomes
    its character-symbol string, the k merges apply as k chained guarded
    replaces (scan-side codegen, ZERO shuffle — the merge table is part
    of the expression tree, the 100 TB path for tokenization), and the
    output is (id, n_words, n_tokens, n_chars)."""
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    sym = F.concat(F.lit(" "), _char_symbols(F.col("w")), F.lit(" "))
    for pair, merged in merges:
        sym = F.replace(sym, F.lit(f" {pair} "), F.lit(f" {merged} "))
    return (
        words.select(
            F.col(id_col),
            F.size(F.split(F.trim(sym), " ")).alias("__nt"),
            F.length("w").alias("__nc"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("__nt").alias("n_tokens"),
            F.sum("__nc").alias("n_chars"),
        )
    )


def bpe_encode_oracle_sql(rounds: int = 6, source: str = "documents") -> str:
    """DuckDB replay of train-then-encode: the training CTE chain from
    :func:`bpe_oracle_sql` re-derives the merges, then every document's
    words encode through the same ``rounds`` chained guarded replaces."""
    train = bpe_oracle_sql(rounds, source)
    ctes = train[len("WITH "): train.index("\n    SELECT 1 AS merge_rank")]
    enc = "' ' || array_to_string(list_transform(range(1, len(wd) + 1), i -> substr(wd, CAST(i AS INT), 1)), ' ') || ' '"
    for r in range(rounds):
        enc = (
            f"replace({enc}, ' ' || (SELECT p FROM m{r}) || ' ', "
            f"' ' || replace((SELECT p FROM m{r}), ' ', '') || ' ')"
        )
    return f"""WITH {ctes},
    tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '\\s+'),
                                x -> x <> '')) AS wd
      FROM {source}
    ),
    enc AS (
      SELECT doc_id, len(string_split(trim({enc}), ' ')) AS nt,
             len(wd) AS nc
      FROM tok
    )
    SELECT doc_id, count(*) AS n_words,
           CAST(sum(nt) AS BIGINT) AS n_tokens,
           CAST(sum(nc) AS BIGINT) AS n_chars
    FROM enc GROUP BY doc_id
    ORDER BY doc_id ASC NULLS LAST
    """
