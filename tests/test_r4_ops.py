"""Round-4 operator tests: bloom filter semantics, Z-order key math,
dup-cluster keep-policy, and the scale-shape plan asserts for the new
pipeline queries (oracle equivalence itself is covered for every one of
them by test_oracle.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_server_spark import catalog
from duckdb_server_spark.operators import bloom, layout
from duckdb_server_spark.plans import inspect as plans

catalog.load_all()


# ---------------------------------------------------------------------------
# Bloom filter module
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_sane_fp_rate(spark):
    members = spark.range(0, 500).select(F.xxhash64("id").alias("h"))
    filt = bloom.bloom_build(members, "h")
    probe = spark.range(0, 5000).select(
        F.col("id"), F.xxhash64("id").alias("h")
    )
    hits = (
        probe.crossJoin(F.broadcast(filt))
        .filter(bloom.bloom_might_contain(F.col("bloom"), F.col("h")))
        .select("id")
        .collect()
    )
    hit_ids = {r.id for r in hits}
    missing = set(range(500)) - hit_ids
    assert not missing, f"bloom false negatives: {sorted(missing)[:5]}"
    # 500 keys in 2^18 bits with k=3 → theoretical FP ≈ 1e-7; allow slack.
    false_pos = {i for i in hit_ids if i >= 500}
    assert len(false_pos) <= 45, f"FP rate too high: {len(false_pos)}/4500"


def test_bloom_build_is_single_bounded_row(spark):
    members = spark.range(0, 100).select(F.xxhash64("id").alias("h"))
    rows = bloom.bloom_build(members, "h").collect()
    assert len(rows) == 1
    assert 0 < len(rows[0].bloom) <= bloom.DEFAULT_BITS // 64


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------


def _morton_ref(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 256).alias("x"), ((F.col("id") * 7) % 256).alias("y")
    )
    rows = df.withColumn(
        "z", layout.zorder_key(F.col("x"), F.col("y"), 8)
    ).collect()
    for r in rows:
        assert r.z == _morton_ref(r.x, r.y), (r.x, r.y, r.z)


def test_zorder_buckets_are_small_rectangles(spark, sf_dir):
    """bits=8, bucket_shift=8 → every bucket covers a 16×16 rectangle of
    the 256×256 key space: that bound IS the file-skipping guarantee."""
    rows = catalog.QUERIES["b56_zorder_layout"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.x_max - r.x_min <= 15, r
        assert r.y_max - r.y_min <= 15, r


def test_write_zordered_roundtrip(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(2000)
    out = str(tmp_path / "zordered")
    layout.write_zordered(
        ev,
        out,
        F.pmod(F.col("user_id"), F.lit(256)),
        F.pmod(F.col("event_id"), F.lit(256)),
        num_files=4,
    )
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert sorted(back.columns) == sorted(ev.columns)


# ---------------------------------------------------------------------------
# Dedup resolution / bloom decontamination / ANN compositions
# ---------------------------------------------------------------------------


def test_b52_has_nontrivial_cluster(spark, sf_dir):
    """The planted dup guarantees at least one multi-doc cluster (the
    word-soup corpus may merge more docs — fingerprints are token SETS)."""
    rows = catalog.QUERIES["b52_dup_cluster_keep_best"](spark, sf_dir).collect()
    assert any(r.cluster_size >= 2 for r in rows)
    assert all(r.n_dropped == r.cluster_size - 1 for r in rows)


def test_cluster_keep_best_policy(spark):
    """Keep the longest; ties break to the HIGHEST id (newest wins) —
    exercised directly on a synthetic corpus."""
    from duckdb_server_spark.operators import dedup

    df = spark.createDataFrame(
        [
            (1, "a b c", 5),
            (2, "c b a", 5),  # same token set, same length → tie
            (3, "a b c d", 7),  # different set → own cluster
        ],
        "doc_id long, text string, n_chars long",
    )
    rows = {
        r.keep_doc_id: r
        for r in dedup.cluster_keep_best(df, "text", "doc_id", "n_chars").collect()
    }
    assert set(rows) == {2, 3}
    assert rows[2].cluster_size == 2 and rows[2].n_dropped == 1
    assert rows[3].cluster_size == 1


def test_b53_bloom_prunes_before_exact_verify(spark, sf_dir):
    """The bloom must actually prune: candidate spans surviving the bloom
    are a strict subset of the test spans but a superset of the exact
    hits (no false negatives)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "split",
        F.when(F.col("doc_id") % 100 < 80, "train")
        .when(F.col("doc_id") % 100 < 90, "val")
        .otherwise("test"),
    )
    from duckdb_server_spark.operators import dedup

    w = dedup.with_words(docs.select("doc_id", "split", "text"), "text").filter(
        F.size("__words") >= 5
    )
    sh = w.select(
        "doc_id",
        "split",
        F.explode(
            dedup.shingles_from_words(F.col("__words"), "text", 5)
        ).alias("__shingle"),
    ).select("doc_id", "split", F.xxhash64("__shingle").alias("__sh"))
    train = sh.filter(F.col("split") == "train").select("__sh").distinct()
    test = sh.filter(F.col("split") == "test")
    filt = bloom.bloom_build(train, "__sh")
    n_test = test.count()
    n_cand = (
        test.crossJoin(F.broadcast(filt))
        .filter(bloom.bloom_might_contain(F.col("bloom"), F.col("__sh")))
        .count()
    )
    n_exact = test.join(train, "__sh", "semi").count()
    assert n_exact <= n_cand <= n_test
    assert n_cand < n_test, "bloom pruned nothing"


def test_b54_probe_join_is_broadcast(spark, sf_dir):
    """IVF+PQ: the probe side (queries × probe cells + distance tables)
    must broadcast — the corpus side never shuffles on the cell join."""
    df = catalog.QUERIES["b54_ivfpq_topk"](spark, sf_dir)
    text = plans.explain_string(df)
    assert "BroadcastHashJoin" in text


def test_b55_semdedup_catches_planted_clones(spark, sf_dir):
    rows = catalog.QUERIES["b55_semdedup"](spark, sf_dir).collect()
    dropped = {r.vec_id for r in rows}
    planted = {i + 1_000_000 for i in range(25)}
    assert planted <= dropped, f"missing clones: {sorted(planted - dropped)[:5]}"
    for r in rows:
        assert r.witness_id < r.vec_id


def test_b58_fuzzy_dedup_finds_planted_family(spark, sf_dir):
    """The composed LSH→Jaccard→components→resolve pipeline must recover
    the planted clone family: ≥10 clusters flagged has_planted, and the
    doc-0 cluster ({0, -1 near-clone, -11 exact clone}) resolves to
    keep_doc_id=-11 with 3 members."""
    rows = catalog.QUERIES["b58_fuzzy_dedup_e2e"](spark, sf_dir).collect()
    planted = [r for r in rows if r.has_planted == 1]
    assert len(planted) >= 10
    c0 = [r for r in rows if r.keep_doc_id == -11]
    # ≥3: {0, -1 near-clone, -11 exact clone}; natural near-dups of doc 0
    # may merge into the same component
    assert c0 and c0[0].n_members >= 3
    assert all(r.n_dropped == r.n_members - 1 for r in rows)
