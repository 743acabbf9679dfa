"""Round-5 operator tests: Arrow text classifier parity, bucketed range
frames (plan side in test_plans.py), dialect integration edges."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_server_spark import catalog
from duckdb_server_spark.session import load_table

catalog.load_all()


def test_quality_logreg_arrow_matches_hof(spark, sf_dir):
    """The Arrow-vectorized classifier must agree with the pure-Catalyst
    HOF implementation row-for-row — same tokens, features, rounding —
    so swapping execution tiers can never change results."""
    from duckdb_server_spark.operators.text import (
        quality_logreg,
        quality_logreg_arrow,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    hof = quality_logreg(docs, "text", "doc_id")
    arrow = quality_logreg_arrow(docs, "text", "doc_id")
    joined = hof.alias("h").join(arrow.alias("a"), "doc_id")
    diff = joined.filter(
        (F.col("h.n_words") != F.col("a.n_words"))
        | (F.abs(F.col("h.quality_prob") - F.col("a.quality_prob")) > 1e-9)
        | (F.col("h.keep") != F.col("a.keep"))
    ).count()
    assert diff == 0
    assert joined.count() == docs.count()


def test_quality_logreg_arrow_null_and_empty(spark):
    """NULL text → NULL features; whitespace-only text → 0 words, NULL
    probability — mirroring the HOF version's null propagation."""
    from duckdb_server_spark.operators.text import quality_logreg_arrow

    df = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "the quick brown fox")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in quality_logreg_arrow(df, "text", "doc_id").collect()}
    assert rows[1].n_words is None or rows[1].n_words == 0
    assert rows[1].quality_prob is None
    assert rows[2].n_words == 0 and rows[2].quality_prob is None
    assert rows[3].n_words == 4 and rows[3].quality_prob is not None


def test_png_roundtrip_all_filters_and_colortypes():
    """Every scanline filter (None/Sub/Up/Average/Paeth) and color type
    (gray/RGB/RGBA) must roundtrip losslessly through the stdlib codec."""
    from duckdb_server_spark.operators.png import decode_png, encode_png

    for color_type, ch in ((0, 1), (2, 3), (6, 4)):
        w, h = 7, 5  # non-square, odd stride
        pixels = bytes((i * 37 + j * 11) % 256 for i in range(h) for j in range(w * ch))
        for ftype in range(5):
            payload = encode_png(pixels, w, h, color_type, filter_type=ftype)
            img = decode_png(payload)
            assert (img["width"], img["height"], img["channels"]) == (w, h, ch)
            assert img["pixels"] == pixels, (color_type, ftype)


def test_png_decode_rejects_garbage():
    import pytest as _pytest

    from duckdb_server_spark.operators.multimodal import decode_image
    from duckdb_server_spark.operators.png import decode_png

    with _pytest.raises(ValueError):
        decode_png(b"not a png at all........")
    # JPEG is a REAL codec as of round 6: a truncated header now fails
    # the parser (not NotImplementedError); unimplemented formats still
    # refuse cleanly.
    with _pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 fake jpeg header")
    # WebP is a REAL codec as of round 7: a truncated container is a
    # parse error; only the lossy VP8 bitstream remains a plug point
    # (tests/test_r7_codecs.py::test_webp_rejects_lossy).
    with _pytest.raises(ValueError):
        decode_image(b"RIFF....WEBPVP8 ")


def test_png_decode_detects_corruption():
    """A flipped IDAT byte must fail the CRC check, not yield pixels."""
    import pytest as _pytest

    from duckdb_server_spark.operators.png import decode_png, encode_png

    payload = bytearray(encode_png(bytes(range(64)), 8, 8))
    idat_at = payload.index(b"IDAT")
    payload[idat_at + 6] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_repetition_stats_arrow_matches_jvm(spark, sf_dir):
    """The Arrow repetition filter must agree with the JVM hash-agg form
    row-for-row (tokens, bigram counts, rounding, keep threshold)."""
    from duckdb_server_spark.operators.text import (
        repetition_stats,
        repetition_stats_arrow,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    jvm = repetition_stats(docs, "text", "doc_id")
    arrow = repetition_stats_arrow(docs, "text", "doc_id")
    joined = jvm.alias("j").join(arrow.alias("a"), "doc_id")
    diff = joined.filter(
        (F.col("j.n_words") != F.col("a.n_words"))
        | (F.abs(F.col("j.distinct_ratio") - F.col("a.distinct_ratio")) > 1e-9)
        | (F.abs(F.col("j.top_bigram_frac") - F.col("a.top_bigram_frac")) > 1e-9)
        | (F.col("j.keep") != F.col("a.keep"))
    ).count()
    assert diff == 0
    assert joined.count() == docs.count()


def test_text_quality_arrow_matches_column_forms(spark, sf_dir):
    """The Arrow b20 features must agree with the Column-expression
    implementations row-for-row, including the rounded columns."""
    from duckdb_server_spark.operators import text as T

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    col = F.col("text")
    jvm = docs.select(
        "doc_id",
        T.token_count(col).alias("n_tokens"),
        F.round(T.avg_word_length(col), 6).alias("avg_word_len"),
        F.round(T.alpha_ratio(col), 6).alias("alpha_ratio"),
        T.quality_score(col).alias("quality"),
    )
    arrow = T.text_quality_arrow(docs, "text", "doc_id")
    joined = jvm.alias("j").join(arrow.alias("a"), "doc_id")
    diff = joined.filter(
        (F.col("j.n_tokens") != F.col("a.n_tokens"))
        | (F.abs(F.col("j.avg_word_len") - F.col("a.avg_word_len")) > 1e-9)
        | (F.abs(F.col("j.alpha_ratio") - F.col("a.alpha_ratio")) > 1e-9)
        | (F.abs(F.col("j.quality") - F.col("a.quality")) > 1e-9)
    ).count()
    assert diff == 0
    assert joined.count() == docs.count()


def test_shingle_dup_stats_arrow_matches_jvm(spark, sf_dir):
    """The Arrow span generator must reproduce the JVM pipeline's output
    exactly — the hash is internal, the counts are the contract."""
    from duckdb_server_spark.operators.dedup import (
        shingle_dup_stats,
        shingle_dup_stats_arrow,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    jvm = shingle_dup_stats(docs, "text", "doc_id", n=5)
    arrow = shingle_dup_stats_arrow(docs, "text", "doc_id", n=5)
    joined = jvm.alias("j").join(arrow.alias("a"), "doc_id", "full")
    diff = joined.filter(
        (F.col("j.n_shingles") != F.col("a.n_shingles"))
        | (F.col("j.n_dup") != F.col("a.n_dup"))
        | (F.abs(F.col("j.dup_ratio") - F.col("a.dup_ratio")) > 1e-9)
    ).count()
    assert diff == 0
    assert joined.count() == jvm.count() == arrow.count()
