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
    """Exact cosine top-k: broadcast queries × corpus scan → two-phase
    window top-k. Ties broken by corpus id so results are deterministic.

    The naive spelling windows directly on ``PARTITION BY query_id``,
    which funnels the ENTIRE scored corpus of each query onto one task —
    a corpus-sized sort per query at scale. Phase 1 therefore pre-prunes
    with a salted local top-k (the b43/salted_group_topk pattern): rank
    within (query, salt-of-corpus-id) so each query's candidates spread
    over ``salt_buckets`` tasks, keep each salt's top-k; phase 2 ranks
    only the ≤ k·salt_buckets survivors per query. The global top-k is
    always contained in the union of per-salt top-k, so results are
    identical — same oracle, plan now shows the pre-aggregating Window
    before the final one (plan-asserted in tests/test_plans.py)."""
    salt_buckets = 16
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
    order = (F.col("cos_sim").desc_nulls_last(), F.col(corpus_id).asc_nulls_last())
    # Deterministic salt (never rand(): phase 1 evaluates inside a
    # recomputable shuffle) spreads each query's corpus over many tasks.
    w1 = Window.partitionBy(
        query_id, F.pmod(F.xxhash64(corpus_id), F.lit(salt_buckets))
    ).orderBy(*order)
    survivors = (
        scored.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= k)
        .drop("__rn1")
    )
    w = Window.partitionBy(query_id).orderBy(*order)
    return (
        survivors.withColumn("__rn", F.row_number().over(w))
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
    # Corpus cell assignment via the Arrow/numpy kernel (r16, guide
    # §4.2): the HOF spelling evaluated the k-distance array TWICE per
    # row (array_position(d, array_min(d)) — HOFs escape CSE) in
    # interpreted lambdas. Integer argmin output → result-exact swap;
    # the probe-side distances below stay JVM (tiny query side).
    c = quantize_arrow(corpus, corpus_id, vec_col, centroids, keep_vec=True).select(
        F.col(corpus_id), F.col(vec_col).alias("__cvec"), F.col("__cell")
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
    ).localCheckpoint(eager=False)  # both join sides consume the signatures
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

    # Corpus side: Arrow/numpy kernel (quantize_arrow — r16, guide §4.2).
    # The old JVM spelling additionally evaluated each subspace distance
    # table TWICE per row (array_position(d, array_min(d)) inlines d —
    # HOFs are outside Spark's CSE). Codes are integer argmins, so the
    # swap is result-exact; the query-side distance tables stay JVM
    # because their float values feed the output sum.
    c = quantize_arrow(corpus, corpus_id, vec_col, codebooks=codebooks)
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


def _matrix_lit(df: DataFrame, col_name: str, matrix) -> DataFrame:
    """Attach a frozen float matrix (list of rows) to every row of ``df``
    as ONE array<array<double>> column via a single-row broadcast cross
    join. Unlike per-element ``F.lit`` literals, the expression tree stays
    O(1) in the matrix size — with k in the hundreds the literal spelling
    makes Catalyst analysis/codegen the dominant cost (seconds of driver
    time), and at the k≈10⁴ of real IVF/SemDeDup deployments it's the
    only spelling that works at all. Row order is preserved, so
    argmin-by-position semantics match the literal form exactly."""
    return _matrices_lit(df, {col_name: matrix})


def _matrices_lit(df: DataFrame, matrices: dict) -> DataFrame:
    """Attach several frozen matrices in ONE single-row broadcast join —
    one broadcast stage total, not one per matrix.

    r17: the one-row frame is parallelized into a SINGLE slice.
    ``createDataFrame`` over local data defaults to defaultParallelism
    slices, so the broadcast build was a 32-task job (31 empty) inside
    every consumer's timed region — measured 0.66 → 0.33 s on b54's
    query side."""
    spark = df.sparkSession
    names = list(matrices)
    row = [tuple([[float(v) for v in r] for r in matrices[n]] for n in names)]
    schema = ", ".join(f"{n} array<array<double>>" for n in names)
    one_rdd = spark.sparkContext.parallelize(row, 1)
    one = spark.createDataFrame(one_rdd, schema)
    return df.crossJoin(F.broadcast(one))


def _l2_array(vecd, mat) -> F.Column:
    """Squared-L2 distances from a double-array column to every row of a
    matrix column: array<double> of len(mat)."""
    return F.transform(
        mat,
        lambda cv: F.aggregate(
            F.zip_with(vecd, cv, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )


def _argmin_pos(arr) -> F.Column:
    """1-based position of the minimum (lowest position on ties)."""
    return F.array_position(arr, F.array_min(arr))


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    n_probe: int = 2,
    k: int = 5,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF+PQ ANN top-k — the composition production ANN indexes
    (FAISS ``IVFx,PQy``) actually ship: an IVF coarse quantizer prunes
    the corpus to the queries' ``n_probe`` nearest cells, and within the
    probed cells distance is PQ-ADC (Jégou et al. 2011) over m-byte
    codes instead of full vectors.

    Both quantizers arrive as literals (train offline, ship frozen —
    same contract as ``ivf_topk`` / ``pq_adc_topk``). Corpus vectors
    reduce scan-side to (cell, m codes); queries broadcast (probe cells
    + per-subspace distance tables); the only join is the cell equi-join,
    so the scan streams m bytes per vector and the scored set scales
    with cells probed — neither full vectors nor the unprobed corpus
    ever reach the join. This is the 100 TB shape: ivf_topk still
    touches full vectors inside probed cells, pq_adc_topk scans every
    code; IVF+PQ does neither."""
    m = len(codebooks)
    widths = [len(cb[0]) for cb in codebooks]
    starts = [1 + sum(widths[:j]) for j in range(m)]

    def with_quantizers(df):
        mats = {"__cent": centroids}
        mats.update({f"__cb_{j}": codebooks[j] for j in range(m)})
        return _matrices_lit(df, mats)

    def sub(vecd, j: int):
        return F.slice(vecd, starts[j], widths[j])

    # Corpus side: Arrow/numpy kernel (quantize_arrow — r16, guide §4.2;
    # the HOF-fold spelling cost 0.9 s of b54's 1.7 s at sf0.1). Integer
    # argmin outputs only, so the swap is result-exact (see the kernel's
    # parity note); the query side stays JVM — its float distance TABLES
    # feed the output sum and must keep the fold's summation order.
    c = quantize_arrow(corpus, corpus_id, vec_col, centroids, codebooks)
    probe_cells = F.slice(
        F.transform(
            F.array_sort(
                F.zip_with(
                    F.col("__qd"),
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
        with_quantizers(queries.select(F.col(query_id), F.col(vec_col)))
        .withColumn("__qvecd", _as_double(F.col(vec_col)))
        .withColumn("__qd", _l2_array(F.col("__qvecd"), F.col("__cent")))
        .select(
            F.col(query_id),
            F.explode(probe_cells).alias("__cell"),
            *[
                _l2_array(sub(F.col("__qvecd"), j), F.col(f"__cb_{j}")).alias(
                    f"__dt_{j}"
                )
                for j in range(m)
            ],
        )
    )
    approx = sum(
        F.element_at(F.col(f"__dt_{j}"), F.col(f"__code_{j}")) for j in range(m)
    )
    scored = c.join(q, "__cell").select(
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


def quantize_arrow(
    df: DataFrame,
    corpus_id: str,
    vec_col: str,
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    keep_vec: bool = False,
) -> DataFrame:
    """Arrow-vectorized corpus-side quantization: nearest-centroid cell
    (``__cell``, 0-based) and/or per-subspace PQ codes (``__code_j``,
    1-based — ``element_at`` lookups are 1-based downstream).

    r16 (guide §4.2): the JVM spelling evaluates one interpreted
    zip_with/aggregate fold per (row × centroid/codeword) — higher-order
    functions never reach codegen, and ``array_position(d, array_min(d))``
    shapes evaluate the distance array twice. Measured on b54's corpus
    pass at sf0.1: 0.9 s of the query's 1.7 s. Here one numpy broadcast
    per Arrow batch does all distances ((V-C)² matrix sum) in BLAS-class
    code.

    Result parity: outputs are ARGMIN INDICES, never float distances —
    numpy's summation order differs from the fold's left-to-right order
    only in final ulps, which cannot flip an argmin unless two distances
    tie to ~1e-16 relative (distinct random vectors never do; exact
    duplicates give exact equality in BOTH orders and both sides then
    take the lowest index — numpy argmin and the oracle's row_number
    tie-break agree). Vectors must be non-null (corpus contract).

    r17 (ADVICE r16): that no-near-ties precondition is now ENFORCED —
    a batch where the two smallest distances differ by a nonzero amount
    below 1e-12 relative raises instead of silently risking a
    cross-engine argmin flip on a structured/symmetric corpus. Exact
    ties (gap == 0) stay allowed: both engines then take the lowest
    index, deterministically.
    """
    import numpy as np

    cbs = [np.asarray(cb, dtype=np.float64) for cb in (codebooks or [])]
    m = len(cbs)
    widths = [cb.shape[1] for cb in cbs]
    starts = [sum(widths[:j]) for j in range(m)]
    cent = np.asarray(centroids, dtype=np.float64) if centroids is not None else None

    fields = [f"{corpus_id} long"]
    if cent is not None:
        fields.append("__cell int")
    fields += [f"__code_{j} int" for j in range(m)]
    if keep_vec:
        fields.append(f"{vec_col} {df.schema[vec_col].dataType.simpleString()}")
    schema = ", ".join(fields)

    def gen(pdf_iter):
        import numpy as _np
        import pandas as _pd

        def _argmin_guarded(dm):
            """argmin per row, raising on a nonzero sub-1e-12-relative
            gap between the two smallest distances (near-tie — the one
            case where summation order could flip the index)."""
            if dm.shape[1] >= 2:
                two = _np.partition(dm, 1, axis=1)
                gap = two[:, 1] - two[:, 0]
                risky = (gap > 0) & (
                    gap < 1e-12 * _np.maximum(two[:, 1], 1e-30)
                )
                if risky.any():
                    raise ValueError(
                        "quantize_arrow: near-tied distances (< 1e-12 "
                        "relative) — argmin is summation-order-sensitive "
                        "on this corpus; use the JVM fold spelling"
                    )
            return dm.argmin(axis=1)

        for pdf in pdf_iter:
            cols = {corpus_id: pdf[corpus_id]}
            if len(pdf):
                v = _np.stack(pdf[vec_col].to_numpy()).astype(_np.float64)
                if cent is not None:
                    d = ((v[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
                    cols["__cell"] = _pd.Series(
                        _argmin_guarded(d).astype("int32")
                    )
                for j in range(m):
                    sub = v[:, starts[j] : starts[j] + widths[j]]
                    dj = ((sub[:, None, :] - cbs[j][None, :, :]) ** 2).sum(axis=2)
                    cols[f"__code_{j}"] = _pd.Series(
                        (_argmin_guarded(dj) + 1).astype("int32")
                    )
            else:  # empty tail batch
                if cent is not None:
                    cols["__cell"] = _pd.Series([], dtype="int32")
                for j in range(m):
                    cols[f"__code_{j}"] = _pd.Series([], dtype="int32")
            if keep_vec:
                cols[vec_col] = pdf[vec_col]
            yield _pd.DataFrame(cols)

    return df.select(corpus_id, vec_col).mapInPandas(gen, schema)


def _cell_of(
    df: DataFrame, centroids: list[list[float]], corpus_id: str, vec_col: str
) -> DataFrame:
    """Scan-side coarse-quantizer cell assignment (argmin against the
    broadcast centroid matrix) — the same expressions the pairwise stage
    uses; shared by semdedup's exact-prepass expansion."""
    with_cd = (
        _matrix_lit(
            df.select(F.col(corpus_id), F.col(vec_col)), "__cent", centroids
        )
        .withColumn("__vecd", _as_double(F.col(vec_col)))
        .select(
            F.col(corpus_id),
            _l2_array(F.col("__vecd"), F.col("__cent")).alias("__cd"),
        )
    )
    return with_cd.select(
        F.col(corpus_id),
        (F.array_position(F.col("__cd"), F.array_min("__cd")) - 1)
        .cast("int")
        .alias("__cell"),
    )


def semdedup_drop_list(
    corpus: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    exact_prepass: bool = True,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, "SemDeDup:
    Data-efficient learning at web-scale through semantic
    deduplication"): cluster embeddings with a frozen coarse quantizer,
    compare pairs ONLY within a cluster, and drop every vector that has
    a lower-id cluster-mate above the cosine threshold (the kept
    representative is the lowest id of each near-dup group).

    Returns the drop list: one row per dropped vector — vec_id, the
    cell, the witness (lowest-id neighbor that condemned it) and its
    cosine.

    Scale shape: cell assignment is scan-side codegen; the only shuffle
    is the cell equi-join, and pair cost is Σ |cell|² — bounded by the
    quantizer's cluster granularity (train k so cells fit memory; the
    paper uses k in the tens of thousands at web scale), never the
    corpus N².

    ``exact_prepass`` (default on — the b58 recipe's mitigation, VERDICT
    r5 item 8) first collapses byte-identical vectors to their lowest-id
    representative, runs the pairwise stage over DISTINCT vectors only,
    and expands members back afterwards — neutralizing the quadratic
    blow-up a clone-dense cell otherwise causes. The output is provably
    identical to the no-prepass result: a clone shares its rep's cell
    and cosines, its witness is min(rep's witness, rep) = the rep's
    witness when the rep is itself dropped (that witness is lower) else
    the rep, and its max cosine is 1 (its clone-mate), all of which the
    expansion emits; conversely collapsing can't change any survivor's
    witness because a non-rep candidate's rep is a lower-id candidate
    with the same cosine."""
    if exact_prepass:
        fp = corpus.select(
            F.col(corpus_id),
            F.col(vec_col),
            F.xxhash64(F.col(vec_col)).alias("__fp"),
        )
        # r16 (guide §2.3/§2.4): rep selection used to be
        # groupBy(__fp).agg(min(id), first(vec)) — the array-typed
        # first() forced a SortAggregate that SORTED AND SHUFFLED every
        # vector, and the plan then recomputed it per consumer. Now only
        # (fp, id) pairs aggregate (map-side partial, 16-byte rows); the
        # reps' vectors ride in via one join, shared by every consumer
        # through a lazy localCheckpoint, and the reps' cells come from
        # the SAME signature pass the pairwise stage uses instead of a
        # second _cell_of scan. Plan: SortAggregate gone, one corpus
        # vector shuffle instead of two, one cell-assignment pass
        # instead of two.
        rep_ids = fp.groupBy("__fp").agg(F.min(corpus_id).alias("__rep"))
        tagged = fp.join(rep_ids, "__fp").localCheckpoint(eager=False)
        reps = tagged.filter(F.col(corpus_id) == F.col("__rep")).select(
            corpus_id, vec_col
        )
        sig = _semdedup_sig(reps, centroids, corpus_id, vec_col)
        # The drop list feeds BOTH the output union and the member
        # expansion (rep_drops); without a shared materialization the
        # within-cell pairwise stage — the operator's dominant cost —
        # executes twice (AQE reuses its input shuffles, not the
        # post-shuffle pair compute). The list is ≤ |corpus| tiny rows.
        base = _semdedup_pairs_drop(sig, threshold, corpus_id).localCheckpoint(
            eager=False
        )
        # Every non-rep member is dropped: witness = rep's witness if the
        # rep was dropped too (it is lower), else the rep itself; its
        # max cosine is its clone-mate's 1.0 (or the rep's higher-ulp
        # raw max — both round identically). The rep's cell rides in
        # from the shared signature pass over the (already distinct) reps.
        members = tagged.filter(F.col(corpus_id) != F.col("__rep")).select(
            F.col(corpus_id), F.col("__rep")
        )
        rep_cells = sig.select(
            F.col(corpus_id).alias("__rep"), F.col("__cell").alias("__rep_cell")
        )
        rep_drops = base.select(
            F.col(corpus_id).alias("__rep"),
            F.col("witness_id").alias("__rw"),
            F.col("max_cos").alias("__rm"),
        )
        member_rows = (
            members.join(rep_cells, "__rep")
            .join(rep_drops, "__rep", "left")
            .select(
                F.col(corpus_id),
                F.col("__rep_cell").alias("cell"),
                F.coalesce("__rw", F.col("__rep")).alias("witness_id"),
                F.greatest(F.lit(1.0), F.coalesce("__rm", F.lit(0.0))).alias(
                    "max_cos"
                ),
            )
        )
        return base.unionByName(member_rows)
    sig = _semdedup_sig(corpus, centroids, corpus_id, vec_col)
    return _semdedup_pairs_drop(sig, threshold, corpus_id)


def _semdedup_sig(
    corpus: DataFrame,
    centroids: list[list[float]],
    corpus_id: str,
    vec_col: str,
) -> DataFrame:
    """One scan-side signature pass: double-cast vector, its norm, and
    the quantizer cell — centroids ride along as a broadcast matrix
    column (_matrix_lit, so k scales without blowing up the expression
    tree), the distance array materializes as a column so the argmin
    doesn't evaluate it twice (HOFs are outside Spark's CSE), and norms
    are computed once per VECTOR, not once per pair. Lazily
    localCheckpointed: both self-join sides (and, under the exact
    prepass, the member-expansion cell lookup) consume it."""
    return (
        (
            _matrix_lit(
                corpus.select(F.col(corpus_id), F.col(vec_col)),
                "__cent",
                centroids,
            )
            .withColumn("__vecd", _as_double(F.col(vec_col)))
            .select(
                F.col(corpus_id),
                F.col("__vecd"),
                _l2_array(F.col("__vecd"), F.col("__cent")).alias("__cd"),
            )
        )
        .select(
            F.col(corpus_id),
            F.col("__vecd"),
            F.sqrt(
                F.aggregate(
                    F.col("__vecd"), F.lit(0.0), lambda acc, x: acc + x * x
                )
            ).alias("__norm"),
            (F.array_position(F.col("__cd"), F.array_min("__cd")) - 1)
            .cast("int")
            .alias("__cell"),
        )
        .localCheckpoint(eager=False)
    )


def _semdedup_pairs_drop(
    sig: DataFrame, threshold: float, corpus_id: str
) -> DataFrame:
    """Within-cell pairwise stage over a signature frame: self-join on
    the cell, cosine from the precomputed norms, drop-list reduce."""
    a = sig.select(
        F.col("__cell"),
        F.col(corpus_id).alias("id_a"),
        F.col("__vecd").alias("__vec_a"),
        F.col("__norm").alias("__norm_a"),
    )
    b = sig.select(
        F.col("__cell"),
        F.col(corpus_id).alias("id_b"),
        F.col("__vecd").alias("__vec_b"),
        F.col("__norm").alias("__norm_b"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("__vec_a"), F.col("__vec_b"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    pairs = (
        a.join(b, "__cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "__cell",
            "id_a",
            "id_b",
            (dot / (F.col("__norm_a") * F.col("__norm_b"))).alias("__cs"),
        )
        .filter(F.col("__cs") >= threshold)
    )
    return (
        pairs.groupBy("id_b")
        .agg(
            F.first("__cell").alias("cell"),
            F.min("id_a").alias("witness_id"),
            F.max("__cs").alias("max_cos"),
        )
        .select(
            F.col("id_b").alias(corpus_id),
            "cell",
            "witness_id",
            "max_cos",
        )
    )


def kmeans_refine(
    corpus: DataFrame,
    init_centroids: list[list[float]],
    iters: int = 2,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd's k-means refinement — the TRAINING step that
    produces the frozen quantizers every ANN operator here consumes
    (ivf_topk / ivfpq_topk / semdedup ship centroids as literals; this
    is where those literals come from). Fixed iteration count and a
    deterministic init (caller passes it — e.g. the first k vectors)
    keep the whole computation replayable by a SQL oracle.

    Per iteration: cell assignment is the usual scan-side argmin against
    the broadcast centroid matrix (one pass, no shuffle), and the update
    is a ``posexplode`` + (cell, dim) hash-agg mean — per-dimension
    partial sums with map-side combine, so no whole-vector groups ever
    materialize (same shape as the label-centroid op, beyond.py). The
    driver collects exactly k×dim refined values between iterations
    (bounded — 8×64 here), mirroring how a production run checkpoints
    its quantizer artifact each round.

    Returns the FINAL iteration's means as (cid, dim, value) — the
    trained codebook in long form, ready to reshape and ship."""
    cents = [[float(v) for v in c] for c in init_centroids]
    out = None
    for _ in range(iters):
        # Cell assignment via the Arrow/numpy kernel (r16, guide §4.2 —
        # integer argmins, result-exact; see quantize_arrow's parity
        # note). The per-dimension averaging stays JVM: its float merge
        # order is the value the oracle replays.
        assigned = quantize_arrow(
            corpus, corpus_id, vec_col, cents, keep_vec=True
        ).select(
            F.col(corpus_id),
            F.col("__cell").alias("cid"),
            _as_double(F.col(vec_col)).alias("__vecd"),
        )
        out = (
            assigned.select("cid", F.posexplode("__vecd").alias("dim", "__v"))
            .groupBy("cid", "dim")
            .agg(F.avg("__v").alias("value"))
        )
        rows = out.collect()
        by_cid: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cid.setdefault(r.cid, {})[r.dim] = r.value
        if len(by_cid) != len(cents):
            raise ValueError(
                f"k-means cell emptied ({len(by_cid)}/{len(cents)} alive): "
                "centroid ordinals would shift; re-init or lower k"
            )
        cents = [
            [by_cid[c][d] for d in sorted(by_cid[c])]
            for c in sorted(by_cid)
        ]
    # Return the COLLECTED final iteration, not the lazy plan: re-executing
    # `out` at action time would recompute assignment+aggregation, and
    # float avg() merge order across partials is run-order dependent — the
    # caller must see the exact values convergence used.
    return corpus.sparkSession.createDataFrame(rows, schema=out.schema)
