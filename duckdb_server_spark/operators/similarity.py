"""Approximate-nearest-neighbor search over embedding columns.

Beyond-reference capability: brute-force cosine top-k as the exactness
baseline, and a random-hyperplane LSH-bucketed variant as the scale path.

Scale design:
- brute force: queries are broadcast (small side); similarity is a
  zip_with/aggregate codegen expression over the corpus scan; top-k per
  query via window row_number — total cost one corpus scan per batch of
  queries, no N² shuffle.
- LSH: each vector gets a compact bucket signature scan-side; probing
  joins bucket-to-bucket (equi-join, shuffle on bucket id), so each query
  only scores its bucket — the 100 TB path. Recall is tunable via number
  of hyperplanes / multi-probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from duckdb_server_spark.functions.vector import cosine_similarity


def _as_double(col) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus scan → window top-k.

    Ties broken by corpus id so results are deterministic.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id), F.col(vec_col).alias("__qvec")
        )
    )
    scored = corpus.select(
        F.col(corpus_id), F.col(vec_col).alias("__cvec")
    ).crossJoin(q).select(
        query_id,
        corpus_id,
        cosine_similarity(_as_double(F.col("__qvec")), _as_double(F.col("__cvec"))).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc_nulls_last(), F.col(corpus_id).asc_nulls_last()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(query_id, corpus_id, "cos_sim", F.col("__rn").alias("rank"))
    )


def hyperplane_signature(vec_col, hyperplanes: list[list[float]]) -> F.Column:
    """Random-hyperplane LSH bucket id: sign bit per hyperplane, packed to
    an integer. Hyperplanes are literal arrays (fixed seed upstream), so
    the signature is a pure codegen expression."""
    bucket = F.lit(0).cast("long")
    for i, hp in enumerate(hyperplanes):
        hp_col = F.array(*[F.lit(float(v)) for v in hp])
        dot = F.aggregate(
            F.zip_with(_as_double(vec_col), hp_col, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(2**i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    hyperplanes: list[list[float]],
    k: int = 5,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k probing only the query's LSH bucket (single-probe).

    Trades recall for a bucket-equi-join instead of a full scan per query
    — the plan that survives a 100 TB corpus.
    """
    c = corpus.select(
        F.col(corpus_id),
        F.col(vec_col).alias("__cvec"),
        hyperplane_signature(F.col(vec_col), hyperplanes).alias("__bucket"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id),
            F.col(vec_col).alias("__qvec"),
            hyperplane_signature(F.col(vec_col), hyperplanes).alias("__bucket"),
        )
    )
    scored = c.join(q, "__bucket").select(
        query_id,
        corpus_id,
        cosine_similarity(_as_double(F.col("__qvec")), _as_double(F.col("__cvec"))).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc_nulls_last(), F.col(corpus_id).asc_nulls_last()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(query_id, corpus_id, "cos_sim", F.col("__rn").alias("rank"))
    )


def l2_distance_to(vec_col, centroid: list[float]) -> F.Column:
    """Squared L2 distance from a vector column to a literal centroid."""
    c = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(_as_double(vec_col), c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    n_probe: int = 2,
    k: int = 5,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) ANN top-k: a coarse quantizer assigns every
    corpus vector to its nearest centroid scan-side; each query probes its
    ``n_probe`` nearest cells only.

    ``centroids`` arrive as literals (train them offline — e.g. MLlib
    KMeans on a sample — exactly how a 100 TB deployment would ship a
    frozen coarse quantizer to the scan). Cell assignment is a pure
    codegen expression; the probe is a cell-id equi-join, so cost scales
    with cells probed, not corpus size."""
    dists = lambda col: F.array(  # noqa: E731
        *[l2_distance_to(col, c) for c in centroids]
    )
    cell = lambda col: (  # noqa: E731 — argmin over the distance array
        F.array_position(dists(col), F.array_min(dists(col))) - 1
    ).cast("int")

    c = corpus.select(
        F.col(corpus_id), F.col(vec_col).alias("__cvec"), cell(F.col(vec_col)).alias("__cell")
    )
    # Query probes: indices of the n_probe smallest centroid distances.
    probe_cells = F.slice(
        F.transform(
            F.array_sort(
                F.zip_with(
                    dists(F.col(vec_col)),
                    F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                    lambda d, i: F.struct(d.alias("d"), i.alias("i")),
                )
            ),
            lambda s: s.getField("i"),
        ),
        1,
        n_probe,
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id),
            F.col(vec_col).alias("__qvec"),
            F.explode(probe_cells).alias("__cell"),
        )
    )
    scored = c.join(q, "__cell").select(
        query_id,
        corpus_id,
        cosine_similarity(_as_double(F.col("__qvec")), _as_double(F.col("__cvec"))).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc_nulls_last(), F.col(corpus_id).asc_nulls_last()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(query_id, corpus_id, "cos_sim", F.col("__rn").alias("rank"))
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    hyperplanes: list[list[float]],
    threshold: float = 0.95,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing: pairs are
    only scored within a bucket, then filtered by cosine ≥ threshold."""
    sig = corpus.select(
        F.col(corpus_id),
        F.col(vec_col),
        hyperplane_signature(F.col(vec_col), hyperplanes).alias("__bucket"),
    )
    a = sig.select(
        F.col("__bucket"),
        F.col(corpus_id).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
    )
    b = sig.select(
        F.col("__bucket"),
        F.col(corpus_id).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
    )
    return (
        a.join(b, "__bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_similarity(_as_double(F.col("vec_a")), _as_double(F.col("vec_b"))).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def lsh_topk_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    hyperplanes: list[list[float]],
    k: int = 5,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe LSH top-k: each query probes its own bucket AND every
    1-bit-flip neighbor (vectors near a hyperplane land on either side,
    so flipping one sign bit recovers most of the recall single-probe
    loses — Lv et al., "Multi-Probe LSH", VLDB'07). Still a bucket
    equi-join: the query side explodes to ``1 + n_planes`` probe rows
    (tiny — queries are the broadcast side), the corpus side is
    unchanged. Recall rises without touching corpus layout; cost scales
    with probes × bucket size, never corpus size."""
    n = len(hyperplanes)
    c = corpus.select(
        F.col(corpus_id),
        F.col(vec_col).alias("__cvec"),
        hyperplane_signature(F.col(vec_col), hyperplanes).alias("__bucket"),
    )
    own = hyperplane_signature(F.col(vec_col), hyperplanes)
    probe_buckets = F.array(own, *[own.bitwiseXOR(F.lit(2**i)) for i in range(n)])
    q = F.broadcast(
        queries.select(
            F.col(query_id),
            F.col(vec_col).alias("__qvec"),
            F.explode(probe_buckets).alias("__bucket"),
        )
    )
    scored = c.join(q, "__bucket").select(
        query_id,
        corpus_id,
        cosine_similarity(
            _as_double(F.col("__qvec")), _as_double(F.col("__cvec"))
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc_nulls_last(), F.col(corpus_id).asc_nulls_last()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(query_id, corpus_id, "cos_sim", F.col("__rn").alias("rank"))
    )


def _l2_slice_to(vec_col, start: int, codeword: list[float]) -> F.Column:
    """Squared L2 distance between a 1-based slice of ``vec_col`` (length
    ``len(codeword)``, starting at ``start``) and a literal codeword."""
    sub = F.slice(vec_col, start, len(codeword))
    c = F.array(*[F.lit(float(v)) for v in codeword])
    return F.aggregate(
        F.zip_with(_as_double(sub), c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization top-k with asymmetric distance computation
    (ADC — Jégou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011).

    ``codebooks[j]`` holds the codewords of subspace ``j`` (equal widths,
    concatenated covering the vector; train offline — e.g. k-means per
    subspace on a sample — and ship as literals, like ivf_topk's coarse
    quantizer). Corpus vectors compress scan-side to one small code per
    subspace (argmin over the subspace codebook, a pure codegen
    expression; ties take the lowest code id, matching the oracle's
    ``row_number`` tie-break). A query precomputes per-subspace distance
    tables to every codeword (on the tiny broadcast side), and the
    approximate distance to a corpus vector is m table lookups summed in
    fixed subspace order — the scan never touches full corpus vectors,
    which is the 100 TB point: m bytes per vector stream through the
    top-k instead of 4·dim. Re-rank the k survivors with exact distance
    if exactness matters (compose with brute_force_topk on the result)."""
    m = len(codebooks)
    widths = [len(cb[0]) for cb in codebooks]
    starts = [1 + sum(widths[:j]) for j in range(m)]

    def dist_table(col, j: int) -> F.Column:
        return F.array(
            *[_l2_slice_to(col, starts[j], cw) for cw in codebooks[j]]
        )

    def code(col, j: int) -> F.Column:
        d = dist_table(col, j)
        return F.array_position(d, F.array_min(d)).cast("int")

    c = corpus.select(
        F.col(corpus_id),
        *[code(F.col(vec_col), j).alias(f"__code_{j}") for j in range(m)],
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id),
            *[dist_table(F.col(vec_col), j).alias(f"__dt_{j}") for j in range(m)],
        )
    )
    approx = sum(
        F.element_at(F.col(f"__dt_{j}"), F.col(f"__code_{j}")) for j in range(m)
    )
    scored = c.crossJoin(q).select(
        query_id, corpus_id, approx.alias("approx_d")
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("approx_d").asc_nulls_last(), F.col(corpus_id).asc_nulls_last()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(query_id, corpus_id, "approx_d", F.col("__rn").alias("rank"))
    )
