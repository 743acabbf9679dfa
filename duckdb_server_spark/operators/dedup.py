"""Deduplication operators for large-scale training-data pipelines.

Beyond-reference capability (the reference dedupes nothing; these are the
operators a 100 TB document pipeline needs). All variants are pure
DataFrame compositions — JVM-side hashing (xxhash64/murmur3), no Python in
the hot path.

Scale design:
- exact: one hash-groupBy shuffle on a 64-bit content hash (not the full
  text), so the shuffle carries 8-byte keys.
- minhash-LSH: per-doc signature computed scan-side (no shuffle), then one
  shuffle per band on (band_id, band_hash) — candidate pairs only ever
  materialize within a bucket, never the full N² cross join.
- simhash: 64 per-bit votes aggregated scan-side; near-dup candidates via
  band buckets on the fingerprint's 16-bit chunks.
- ngram-jaccard: verification step for candidate pairs (array_intersect /
  array_union on tokenized shingles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact text; one 8-byte-key shuffle."""
    return (
        df.withColumn("__h", F.xxhash64(F.col(text_col)))
        .groupBy("__h")
        .agg(F.min(F.col(id_col)).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .drop("__h")
    )


def with_words(df: DataFrame, text_col: str) -> DataFrame:
    """Append a ``__words`` column with the split computed EXACTLY ONCE.

    A plain ``withColumn("w", split(...))`` is useless as a sharing point:
    CollapseProject inlines the split into every downstream reference, so
    an expression referencing the word array k times re-splits the text k
    times (measured 8× slowdown at sf0.1 for shingling). Routing the split
    through ``explode(array(...))`` puts it in a Generate node, which is
    not collapsed — downstream projections see an attribute, not the
    expression. Zero shuffle, one extra row-identity generator."""
    return df.select("*", F.explode(F.array(F.split(F.col(text_col), r"\s+"))).alias("__words"))


def shingles_from_words(words: F.Column, text_col: str, n: int = 3) -> F.Column:
    """Word n-gram shingles from a pre-split word array: zip_with over
    ``n`` shifted slices (k-independent cost). Short texts (< n words)
    fall back to the whole raw text as the single shingle."""
    k = F.size(words) - (n - 1)
    acc = F.slice(words, 1, F.greatest(k, F.lit(0)))
    for i in range(1, n):
        shifted = F.slice(words, 1 + i, F.greatest(k, F.lit(0)))
        acc = F.zip_with(acc, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(k <= 0, F.array(F.col(text_col))).otherwise(F.array_distinct(acc))


def shingles(text_col: str, n: int = 3) -> F.Column:
    """Word n-gram shingles as a standalone Column expression.

    Prefer :func:`with_words` + :func:`shingles_from_words` in pipelines —
    this form recomputes the split wherever Catalyst inlines it."""
    return shingles_from_words(F.split(F.col(text_col), r"\s+"), text_col, n)


def _md5_60(col: F.Column) -> F.Column:
    """Portable 60-bit hash: first 15 hex digits of md5 — replayable by
    any engine (DuckDB: ``CAST('0x'||substr(md5(x),1,15) AS BIGINT)``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    shingle_n: int = 3,
    portable: bool = False,
) -> DataFrame:
    """MinHash signature per doc as an ``array<bigint>`` column ``__sig``.

    Scale path: explode shingles (map-side, no shuffle), hash each shingle
    string ONCE to a 64-bit int, then derive all ``num_hashes``
    permutations as cheap integer re-hashes ``xxhash64(h, seed)`` inside
    one hash-aggregate on the doc id — a single shuffle whose agg state is
    ``num_hashes`` longs per doc. The naive formulation (min over
    ``xxhash64(shingle || seed)`` per seed) re-hashes every shingle string
    ``num_hashes`` times and is ~100× slower at sf0.1.

    ``portable=True`` swaps xxhash64 for the md5-derived 60-bit hash
    (same permutation scheme: re-hash of ``h || ',i'``) so a differential
    oracle can replay the identical signatures — the simhash precedent.
    Same plan shape; md5 costs more per shingle, so the default stays
    xxhash64 for pure-Spark pipelines.
    """
    exploded = (
        with_words(df, text_col)
        .select(
            F.col(id_col),
            F.explode(
                shingles_from_words(F.col("__words"), text_col, shingle_n)
            ).alias("__s"),
        )
        .withColumn(
            "__h", _md5_60(F.col("__s")) if portable else F.xxhash64("__s")
        )
    )
    if portable:
        mins = [
            F.min(
                _md5_60(F.concat(F.col("__h").cast("string"), F.lit(f",{i}")))
            ).alias(f"__m{i}")
            for i in range(num_hashes)
        ]
    else:
        mins = [
            F.min(F.xxhash64(F.col("__h"), F.lit(i))).alias(f"__m{i}")
            for i in range(num_hashes)
        ]
    per_doc = exploded.groupBy(id_col).agg(*mins)
    return per_doc.select(
        F.col(id_col),
        F.array(*[F.col(f"__m{i}") for i in range(num_hashes)]).alias("__sig"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    truncate_lineage: bool = True,
    portable: bool = False,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    Signature → split into ``bands`` bands of ``num_hashes/bands`` rows;
    docs colliding on any full band become a candidate pair. Returns
    (id_a, id_b) with id_a < id_b, distinct across bands. Pairs only ever
    materialize within a (band_id, band_hash) bucket — never the N² cross
    join.

    ``portable=True`` uses the md5-derived signature hash family and the
    raw concatenated-minima string as the band key (equality is all a
    bucket needs) so a DuckDB oracle can replay the exact pair set.
    """
    rows = num_hashes // bands

    def band_key(b):
        joined = F.concat_ws(
            ",",
            F.transform(
                F.slice("__sig", b * rows + 1, rows), lambda v: v.cast("string")
            ),
        )
        return joined if portable else F.xxhash64(joined)

    sig = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_n, portable=portable
    )
    banded = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        band_key(b).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "band.band_id", "band.band_hash")
    # Both sides of the bucket self-join consume the banded signatures;
    # truncating lineage runs shingling + minhashing once, not twice
    # (fresh-call 1.82 s → 1.49 s at sf0.1). Callers that need the scan
    # visible in the plan (pushdown asserts on trivially small inputs,
    # e.g. b03's 2-doc guard branch) opt out.
    if truncate_lineage:
        banded = banded.localCheckpoint(eager=False)
    left = banded.select(
        F.col("band_id"), F.col("band_hash"), F.col(id_col).alias("id_a")
    )
    right = banded.select(
        F.col("band_id"), F.col("band_hash"), F.col(id_col).alias("id_b")
    )
    return (
        left.join(right, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard(
    df_pairs: DataFrame, texts: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """Verify candidate pairs with exact n-gram Jaccard similarity."""
    sh = with_words(texts, text_col).select(
        F.col(id_col),
        F.array_distinct(shingles_from_words(F.col("__words"), text_col, n)).alias(
            "__sh"
        ),
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("sh_b"))
    return (
        df_pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )


def simhash_fingerprint(
    df: DataFrame, text_col: str, id_col: str, bits: int = 32,
    portable: bool = False,
) -> DataFrame:
    """SimHash: per-bit majority vote over token hashes → one integer
    fingerprint per doc. Computed as explode → per-bit votes → re-agg;
    the explode stays within a map stage (no extra shuffle beyond the
    final groupBy on the doc id).

    ``portable=True`` hashes tokens as the first 32 bits of md5 (via
    ``conv``) instead of ``xxhash64`` — a hash any engine can replay
    (DuckDB: ``CAST('0x'||substr(md5(t),1,8) AS BIGINT)``), which lets the
    fingerprints be verified by a full differential oracle instead of a
    rows-only check. Same plan shape; md5 costs a little more per token,
    so the default stays xxhash64 for pure-Spark pipelines. Empty tokens
    are dropped in portable mode (regex-split edge semantics are the one
    place engines disagree)."""
    tok = F.explode(F.split(F.col(text_col), r"\s+")).alias("__tok")
    if portable:
        toks = (
            df.select(F.col(id_col), tok)
            .filter(F.col("__tok") != "")
            .withColumn(
                "__h",
                F.conv(F.substring(F.md5("__tok"), 1, 8), 16, 10).cast("long"),
            )
        )
    else:
        toks = df.select(F.col(id_col), tok).withColumn("__h", F.xxhash64("__tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("__h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    per_doc = toks.groupBy(id_col).agg(*votes)
    fp = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(2**i)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return per_doc.select(F.col(id_col), fp.cast("long").alias("simhash"))


def shingle_dup_stats(
    df: DataFrame, text_col: str, id_col: str, n: int = 5
) -> DataFrame:
    """Substring-level duplication stats: for every document, how many of
    its distinct word n-gram spans also occur in another document
    (the span-level signal behind exact-substring training-data dedup,
    Lee et al. 2022 — a suffix-array workalike restricted to word
    n-grams, which distributes as plain hash shuffles).

    Scale shape: the split happens once (``with_words`` Generate-node
    sharing), every shuffle after shingling carries the 8-byte
    ``xxhash64`` of the span — never the span text (the b01 rule); the
    frequency aggregate and the join shuffle on that same key, so AQE
    reuses the exchange. No collect, no N² stage anywhere; boilerplate
    spans shared by thousands of docs cost one hot reduce key, handled
    by AQE skew split."""
    docs = df.select(id_col, text_col)
    w = with_words(docs, text_col).filter(F.size("__words") >= n)
    sh = w.select(
        id_col,
        F.explode(
            shingles_from_words(F.col("__words"), text_col, n)
        ).alias("__shingle"),
    )
    # hashed feeds both the frequency aggregate and the join back —
    # branched lineage gets no exchange reuse, so without truncation the
    # corpus is shingled twice. Lazy localCheckpoint materializes the
    # 8-byte span hashes once (fresh-call A/B: 1.80 s → 1.32 s at sf0.1;
    # the win is specific to this op's expensive recomputed branch —
    # cheaper branches measured faster WITHOUT truncation, so this is
    # deliberately not applied engine-wide).
    hashed = sh.select(
        id_col, F.xxhash64("__shingle").alias("__sh")
    ).localCheckpoint(eager=False)
    # (id, span) pairs are unique by construction (shingles_from_words
    # array_distincts per doc), so plain count(*) equals
    # count_distinct(id) — and unlike the distinct aggregate it gets
    # map-side partial aggregation and one exchange instead of two
    # (guide §2.3 "aggregate before you shuffle"; r16).
    freq = hashed.groupBy("__sh").agg(F.count(F.lit(1)).alias("__ndocs"))
    return (
        hashed.join(freq, "__sh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("__ndocs") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup"),
        )
        .withColumn(
            "dup_ratio", F.round(F.col("n_dup") / F.col("n_shingles"), 4)
        )
    )


def span_hashes_arrow(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
    carry: tuple[tuple[str, str], ...] = (),
) -> DataFrame:
    """Arrow-vectorized distinct word n-gram span hashing: one
    mapInPandas pass per document splits, shingles, dedupes, and hashes
    (blake2b-64). Documents with fewer than ``n`` words emit nothing.

    The hash is internal grouping/join state only — every consumer
    compares spans by hash EQUALITY between rows of this same generator
    and outputs hash-free counts, so any deterministic 64-bit hash
    yields identical results up to the same negligible collision odds
    as xxhash64. ``carry`` = extra (column, sql_type) pairs passed
    through per span row (e.g. a split label).

    The JVM zip_with-fold spelling of shingling is the family's measured
    scan-stage bottleneck (SCALING.md; interpreted HOFs — guide §4.2);
    this generator is shared by the substring-dedup stats and the bloom
    decontamination chain (r16)."""
    import hashlib
    import re as _re

    ws_re = _re.compile(r"\s+")
    carry_names = [c for c, _ in carry]

    def gen(pdf_iter):
        import pandas as _pd

        for pdf in pdf_iter:
            ids, hashes = [], []
            extras: list[list] = [[] for _ in carry_names]
            for row in zip(pdf[id_col], pdf[text_col],
                           *[pdf[c] for c in carry_names]):
                doc_id, s = row[0], row[1]
                if s is None:
                    continue
                ws = ws_re.split(s)
                if len(ws) < n:
                    continue
                spans = {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}
                for sp in spans:
                    ids.append(doc_id)
                    for acc, v in zip(extras, row[2:]):
                        acc.append(v)
                    hashes.append(
                        int.from_bytes(
                            hashlib.blake2b(
                                sp.encode("utf-8"), digest_size=8
                            ).digest(),
                            "big",
                            signed=True,
                        )
                    )
            yield _pd.DataFrame(
                {id_col: _pd.Series(ids, dtype="int64"),
                 **{c: _pd.Series(vals)
                    for c, vals in zip(carry_names, extras)},
                 "__sh": _pd.Series(hashes, dtype="int64")}
            )

    schema = ", ".join(
        [f"{id_col} long", *[f"{c} {t}" for c, t in carry], "__sh long"]
    )
    from duckdb_server_spark.operators import spread_small_scan

    src = spread_small_scan(df.select(id_col, *carry_names, text_col))
    return src.mapInPandas(gen, schema)


def shingle_dup_stats_arrow(
    df: DataFrame, text_col: str, id_col: str, n: int = 5
) -> DataFrame:
    """Arrow-vectorized :func:`shingle_dup_stats`: same output, same
    shuffle shape, different scan stage (span_hashes_arrow — see its
    docstring for the hash-equivalence argument). Everything after the
    generator is unchanged: one shuffle of 8-byte span hashes for the
    frequency aggregate, join back, per-doc reduce."""
    hashed = span_hashes_arrow(df, text_col, id_col, n).localCheckpoint(
        eager=False
    )
    # (id, span) pairs are unique by construction (the generator emits a
    # per-doc SET of spans), so count(*) equals count_distinct(id) and
    # skips the distinct aggregate's second exchange (guide §2.3; r16).
    freq = hashed.groupBy("__sh").agg(F.count(F.lit(1)).alias("__ndocs"))
    return (
        hashed.join(freq, "__sh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("__ndocs") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup"),
        )
        .withColumn(
            "dup_ratio", F.round(F.col("n_dup") / F.col("n_shingles"), 4)
        )
    )


def cluster_keep_best(
    df: DataFrame, text_col: str, id_col: str, length_col: str
) -> DataFrame:
    """Duplicate-cluster resolution — the "resolve" half of exact dedup:
    cluster by order-insensitive content fingerprint (md5 of the sorted
    distinct token set, operators/text.py::fingerprint) and keep ONE
    document per cluster: the longest, ties broken by highest id.

    Output: one row per cluster — fingerprint, cluster_size, keep_doc_id,
    n_dropped.

    Scale shape: the fingerprint is a scan-side codegen expression; the
    single shuffle carries (32-byte fingerprint, id, length) — never the
    document body — and ``max_by`` over a (length, id) struct reduces
    map-side, so a cluster of a million boilerplate copies costs one
    combine-heavy reduce key, not a window sort."""
    from duckdb_server_spark.operators.text import fingerprint

    fp = df.select(
        F.col(id_col),
        F.col(length_col),
        fingerprint(F.col(text_col)).alias("fingerprint"),
    )
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.max_by(
                F.col(id_col),
                F.struct(
                    F.col(length_col).alias("l"), F.col(id_col).alias("i")
                ),
            ).alias("keep_doc_id"),
        )
        .withColumn("n_dropped", F.col("cluster_size") - F.lit(1))
    )
