"""Round-6 operator tests: baseline JPEG codec (operators/jpeg.py),
portable MinHash family, and serving-dialect default plumbing."""

from __future__ import annotations

import random

import pytest

from duckdb_server_spark.operators.jpeg import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg_from_coeffs,
    encode_jpeg_gray,
    idct_block,
)


def test_jpeg_coeff_roundtrip_exact():
    """Entropy coding is lossless: coefficient blocks in → identical
    dequantized blocks out, across random sparse patterns."""
    rng = random.Random(7)
    for _ in range(25):
        blocks = []
        for _ in range(4):
            blk = [0] * 64
            blk[0] = rng.randint(-1016, 1016)
            for _ in range(rng.randint(0, 12)):
                blk[rng.randint(0, 63)] = rng.randint(-500, 500)
            blocks.append(blk)
        dec = decode_jpeg(encode_jpeg_from_coeffs(blocks, 16, 16))
        assert dec["coeff_blocks"] == blocks
        assert (dec["width"], dec["height"]) == (16, 16)


def test_jpeg_edge_blocks():
    """ZRL escapes, end-at-63 (no EOB), all-zero block, byte stuffing."""
    blk = [0] * 64
    blk[63] = 7  # last AC position: block ends without EOB
    assert decode_jpeg(encode_jpeg_from_coeffs([blk], 8, 8))["coeff_blocks"] == [blk]
    blk = [0] * 64  # DC=0, immediate EOB
    assert decode_jpeg(encode_jpeg_from_coeffs([blk], 8, 8))["coeff_blocks"] == [blk]
    blk = [0] * 64
    blk[ZIGZAG[1]] = 3
    blk[ZIGZAG[40]] = -9  # 38-zero gap: two ZRL escapes + run 6
    assert decode_jpeg(encode_jpeg_from_coeffs([blk], 8, 8))["coeff_blocks"] == [blk]
    blk = [255] + [0] * 63  # entropy bytes contain 0xFF → stuffing path
    assert decode_jpeg(encode_jpeg_from_coeffs([blk], 8, 8))["coeff_blocks"] == [blk]


def test_jpeg_constant_tiles_lossless_all_values():
    """A constant 8×8 block survives the REAL pipeline exactly for every
    byte value: quantized DC is exactly 8·(v-128), ACs exactly zero, and
    the reconstruction returns v — the exactness the b31b oracle relies
    on."""
    for v in (0, 1, 31, 32, 96, 126, 127, 128, 129, 200, 254, 255):
        enc = encode_jpeg_gray(bytes([v] * 64), 8, 8)
        dec = decode_jpeg(enc)
        blk = dec["coeff_blocks"][0]
        assert blk[0] == 8 * (v - 128)
        assert not any(blk[1:])
        assert dec["pixels"] == bytes([v] * 64)


def test_jpeg_idct_matches_independent_matrix_form():
    """IDCT vs an independent numpy matrix implementation."""
    np = pytest.importorskip("numpy")
    M = np.zeros((8, 8))
    for u in range(8):
        for x in range(8):
            c = (1 / np.sqrt(2)) if u == 0 else 1.0
            M[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
    rng = np.random.RandomState(11)
    for _ in range(5):
        C = rng.randint(-300, 300, (8, 8)).astype(float)
        ref = 0.25 * (M.T @ C @ M)
        mine = np.array(idct_block(list(C.flatten()))).reshape(8, 8)
        assert np.allclose(ref, mine, atol=1e-9)


def test_jpeg_lossy_error_bounded():
    """Random pixels through the real pipeline with a unit quant table:
    reconstruction error is the DCT rounding loss only (≤ ~2 levels)."""
    rng = random.Random(3)
    px = bytes(rng.randint(0, 255) for _ in range(32 * 16))
    dec = decode_jpeg(encode_jpeg_gray(px, 32, 16))
    assert max(abs(a - b) for a, b in zip(px, dec["pixels"])) <= 3


def test_jpeg_quant_table_roundtrip():
    """A non-unit quant table dequantizes coefficients by the DQT values
    the decoder read from the stream."""
    q = [1 + (i % 7) for i in range(64)]
    coeffs = [((i * 13) % 21) - 10 for i in range(64)]
    dec = decode_jpeg(encode_jpeg_from_coeffs([coeffs], 8, 8, quant=q))
    assert dec["coeff_blocks"][0] == [coeffs[i] * q[i] for i in range(64)]


def test_decode_image_dispatches_jpeg():
    from duckdb_server_spark.operators.multimodal import decode_image

    enc = encode_jpeg_gray(bytes([42] * 64), 8, 8)
    img = decode_image(enc)
    assert img["pixels"] == bytes([42] * 64)
    # WebP is a REAL codec as of round 7: a truncated container is a
    # parse error, not a plug point
    with pytest.raises(ValueError):
        decode_image(b"RIFF....WEBP")


def test_portable_minhash_matches_duckdb_signatures(spark):
    """The portable md5 signature family replays exactly in DuckDB."""
    import duckdb

    from duckdb_server_spark.operators.dedup import minhash_signatures

    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {
        r["doc_id"]: r["__sig"]
        for r in minhash_signatures(
            df, "text", "doc_id", num_hashes=8, portable=True
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, '{s}')" for i, s in rows)
                + ") v(doc_id, text)")
    mins = ", ".join(
        f"min(CAST(('0x' || substr(md5(CAST(h AS VARCHAR) || ',{i}'), 1, 15)) "
        f"AS BIGINT)) AS m{i}"
        for i in range(8)
    )
    drows = con.execute(f"""
        WITH sh AS (
          SELECT doc_id,
                 CASE WHEN len(string_split_regex(text, '\\s+')) - 2 <= 0
                   THEN [text]
                   ELSE list_transform(
                     range(1, len(string_split_regex(text, '\\s+')) - 1),
                     i -> array_to_string(
                       array_slice(string_split_regex(text, '\\s+'), i, i + 2),
                       ' '))
                 END AS sh
          FROM t
        ),
        hashed AS (
          SELECT doc_id, CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h
          FROM (SELECT doc_id, unnest(sh) AS s FROM sh)
        )
        SELECT doc_id, {mins} FROM hashed GROUP BY doc_id
    """).fetchall()
    for row in drows:
        assert sig[row[0]] == list(row[1:]), row[0]


def test_semdedup_exact_prepass_identity(spark):
    """exact_prepass=True (default) must produce EXACTLY the no-prepass
    drop list on a clone-dense corpus — witnesses, cells, and rounded
    cosines included (the argument in semdedup_drop_list's docstring)."""
    from pyspark.sql import functions as F

    from duckdb_server_spark.operators.similarity import semdedup_drop_list
    from duckdb_server_spark.session import load_table as t

    emb = t(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    clones = emb.filter(F.col("vec_id") < 40).select(
        (F.col("vec_id") + 500_000).alias("vec_id"), "embedding"
    )
    clones2 = emb.filter(F.col("vec_id") < 15).select(
        (F.col("vec_id") + 900_000).alias("vec_id"), "embedding"
    )
    staged = emb.unionByName(clones).unionByName(clones2)
    cents = [
        [float(v) for v in r.embedding]
        for r in emb.orderBy("vec_id").limit(16).collect()
    ]

    def canon(df):
        return sorted(
            (r.vec_id, r.cell, r.witness_id, round(r.max_cos, 6))
            for r in df.collect()
        )

    with_pre = canon(
        semdedup_drop_list(staged, cents, threshold=0.99, exact_prepass=True)
    )
    without = canon(
        semdedup_drop_list(staged, cents, threshold=0.99, exact_prepass=False)
    )
    assert with_pre == without
    assert len(with_pre) >= 55  # every clone is dropped


def test_wav_roundtrip_and_rejection():
    from duckdb_server_spark.operators.multimodal import decode_audio
    from duckdb_server_spark.operators.wav import decode_wav, encode_wav

    samples = [((i * 37) % 4096) - 2048 for i in range(200)]
    d = decode_wav(encode_wav(samples, 8000, 1, 16))
    assert d["samples"] == samples and d["sample_rate"] == 8000
    # 8-bit with odd data length exercises the word-alignment pad
    d8 = decode_wav(encode_wav([i % 256 for i in range(55)], 44100, 1, 8))
    assert d8["samples"] == [i % 256 for i in range(55)] and d8["bits"] == 8
    assert decode_audio(encode_wav([1, -1], 8000))["samples"] == [1, -1]
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x03 mp3-ish")


def test_avi_mjpeg_roundtrip_and_sampling():
    from duckdb_server_spark.operators.avi import decode_avi, encode_avi_mjpeg
    from duckdb_server_spark.operators.multimodal import decode_video_frames

    frames = [encode_jpeg_gray(bytes([v] * 64), 8, 8) for v in (10, 200, 99, 7)]
    avi = encode_avi_mjpeg(frames, 8, 8, fps=5)
    dec = decode_avi(avi)
    assert dec["frames"] == frames
    assert (dec["width"], dec["height"], dec["us_per_frame"]) == (8, 8, 200000)
    # container-level sampling: stride 2 decodes frames 0 and 2 only
    sampled = decode_video_frames(avi, stride=2)
    assert [s["frame_idx"] for s in sampled] == [0, 2]
    assert sampled[0]["pixels"] == bytes([10] * 64)
    assert sampled[1]["pixels"] == bytes([99] * 64)
    with pytest.raises(ValueError):
        decode_avi(b"RIFF????AVI!")
    # MP4 is a REAL demuxer as of round 7: a malformed container is a
    # parse error, not a plug point
    with pytest.raises(ValueError):
        decode_video_frames(b"\x00\x00\x00\x18ftypmp42 fake mp4", stride=2)


def test_avi_frame_count_mismatch_detected():
    import struct

    from duckdb_server_spark.operators.avi import decode_avi, encode_avi_mjpeg

    frames = [encode_jpeg_gray(bytes([1] * 64), 8, 8)]
    avi = bytearray(encode_avi_mjpeg(frames, 8, 8))
    # corrupt the avih declared-frame count (offset: find 'avih' + 8 + 16)
    i = avi.index(b"avih") + 8 + 16
    avi[i : i + 4] = struct.pack("<I", 99)
    with pytest.raises(ValueError, match="frame count mismatch"):
        decode_avi(bytes(avi))


def test_bpe_train_known_corpus(spark):
    """BPE on a hand-checkable corpus: 'low' ×5 and 'lower' ×2 → the
    most frequent pair is (l,o) with weight 7, then (lo,w) with 7 —
    the vocabulary-weighted counting and chained merge application."""
    from duckdb_server_spark.operators.bpe import bpe_train

    df = spark.createDataFrame(
        [("low low low low low",), ("lower lower",)], "text string"
    )
    rows = [tuple(r) for r in bpe_train(df, "text", rounds=3).collect()]
    assert rows[0] == (1, "l o", "lo", 7)
    assert rows[1] == (2, "lo w", "low", 7)
    # round 3: 'low e' appears twice (from the two 'lower's); ties on
    # count 2 ('e r' also 2) break pair-ASC → 'e r' sorts first
    assert rows[2][3] == 2 and rows[2][1] == min(rows[2][1], "e r") or rows[2][1] == "e r"


def test_bpe_oracle_matches_duckdb_small(spark):
    """Operator vs mechanically generated oracle on an inline corpus."""
    import duckdb

    from duckdb_server_spark.operators.bpe import bpe_oracle_sql, bpe_train

    texts = ["the cat sat on the mat", "the bat and the rat", "cats sit"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    srows = [tuple(r) for r in bpe_train(df, "text", rounds=4).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"('{t}')" for t in texts)
        + ") v(text)"
    )
    drows = con.execute(bpe_oracle_sql(4, source="docs")).fetchall()
    assert srows == drows


def test_bpe_encode_token_counts(spark):
    """Encoding with the learned merges compresses token counts: after
    merging (l,o) and (lo,w), 'low' is ONE token; unmerged text stays at
    character count."""
    from duckdb_server_spark.operators.bpe import bpe_encode, bpe_train

    df = spark.createDataFrame(
        [(1, "low low low low low"), (2, "lower lower"), (3, "xyz")],
        "doc_id long, text string",
    )
    merges = [
        (r["pair"], r["merged"])
        for r in bpe_train(df, "text", rounds=2).collect()
    ]
    assert [m[1] for m in merges] == ["lo", "low"]
    out = {r["doc_id"]: r for r in bpe_encode(df, "text", "doc_id", merges).collect()}
    assert out[1]["n_tokens"] == 5      # 'low' ×5 → one token each
    assert out[2]["n_tokens"] == 2 * 3  # 'low'+'e'+'r' per word
    assert out[3]["n_tokens"] == 3      # no merges apply → chars
    assert out[1]["n_chars"] == 15 and out[1]["n_words"] == 5


def test_pagerank_star_graph(spark):
    """Hand-checkable structure: a 4-spoke star (all edges into the hub)
    — the hub must out-rank every spoke, spokes are symmetric, and total
    mass is bounded by the scale (leaks only via truncation and the
    hub's dangling mass)."""
    from duckdb_server_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 0)], "src long, dst long"
    )
    out = {r["node"]: r["rank"] for r in pagerank(edges, iters=5).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    assert len({out[i] for i in (1, 2, 3, 4)}) == 1  # spokes symmetric
    assert out[0] > out[1]  # hub dominates
    assert sum(out.values()) <= 1_000_000_000_000


def test_pagerank_oracle_matches_duckdb_small(spark):
    """Operator vs generated chained-CTE oracle on an inline graph with
    asymmetric degrees."""
    import duckdb

    from duckdb_server_spark.operators.pagerank import (
        pagerank,
        pagerank_oracle_ctes,
    )

    pairs = [(1, 2), (2, 3), (3, 1), (4, 1), (5, 1), (5, 2)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    srows = sorted(
        (r["node"], r["rank"]) for r in pagerank(df, iters=6).collect()
    )
    con = duckdb.connect()
    edges_sql = "SELECT * FROM (VALUES " + ", ".join(
        f"({a}, {b})" for a, b in pairs
    ) + ") v(s, d)"
    drows = con.execute(
        f"WITH {pagerank_oracle_ctes(edges_sql, 6)} "
        f"SELECT node, CAST(rank AS BIGINT) FROM r6 ORDER BY node"
    ).fetchall()
    assert srows == [tuple(r) for r in drows]


def test_avi_random_access_frame_via_index(spark):
    """idx1-based O(1) frame seek returns the identical payload the
    sequential movi walk yields, for every frame."""
    from duckdb_server_spark.operators.avi import (
        decode_avi,
        decode_avi_frame,
        encode_avi_mjpeg,
    )

    frames = [encode_jpeg_gray(bytes([v] * 64), 8, 8) for v in (3, 77, 201, 8, 50)]
    avi = encode_avi_mjpeg(frames, 8, 8)
    walked = decode_avi(avi)["frames"]
    for i in range(5):
        assert decode_avi_frame(avi, i) == walked[i] == frames[i]
    with pytest.raises(ValueError, match="not in index"):
        decode_avi_frame(avi, 5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_jpeg_fuzz_random_quant_and_dims(seed):
    """Coefficient roundtrips stay exact across random quant tables,
    dimensions, and sparse patterns (entropy coding is lossless by
    construction — this pins it against regressions in the bit plumbing)."""
    rng = random.Random(seed)
    for _ in range(10):
        bw, bh = rng.randint(1, 4), rng.randint(1, 3)
        q = [rng.randint(1, 32) for _ in range(64)]
        blocks = []
        for _ in range(bw * bh):
            blk = [0] * 64
            blk[0] = rng.randint(-127, 127)
            for _ in range(rng.randint(0, 20)):
                blk[rng.randint(0, 63)] = rng.randint(-255, 255)
            blocks.append(blk)
        dec = decode_jpeg(
            encode_jpeg_from_coeffs(blocks, bw * 8, bh * 8, quant=q)
        )
        want = [[blk[i] * q[i] for i in range(64)] for blk in blocks]
        assert dec["coeff_blocks"] == want


def test_video_features_fallback_without_index(spark):
    """An index-less AVI (idx1 stripped) routes through the sequential
    movi walk and yields identical statistics."""
    import struct

    from duckdb_server_spark.operators.avi import encode_avi_mjpeg
    from duckdb_server_spark.operators.multimodal import video_frame_features

    frames = [encode_jpeg_gray(bytes([v] * 64), 8, 8) for v in (5, 6, 7, 8)]
    avi = encode_avi_mjpeg(frames, 8, 8)
    i = avi.index(b"idx1")
    stripped = avi[:i]
    stripped = b"RIFF" + struct.pack("<I", len(stripped) - 8) + stripped[8:]
    df = spark.createDataFrame(
        [(1, avi), (2, stripped)], "doc_id long, payload binary"
    )
    rows = {r.doc_id: r for r in video_frame_features(df, stride=2).collect()}
    for d in (1, 2):  # idx1 path and fallback agree exactly
        assert (rows[d].n_frames, rows[d].n_sampled) == (4, 2)
        assert (rows[d].px_min, rows[d].px_max) == (5, 7)
        assert rows[d].px_sum == 64 * (5 + 7)
