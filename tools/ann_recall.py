"""Measure ANN recall@k against the exact brute-force top-k.

The declared ANN queries (b10/b11/b11b/b13/b15/b54) are oracle-checked
for CORRECTNESS of their own contract (each method returns exactly what
that method defines), but recall — how much of the TRUE top-k the
approximate plan retrieves — is a measured property, not a correctness
one. This harness quantifies it at sf0.1 with the same frozen
quantizers the declared queries ship, plus one better-trained
configuration per family to show the knob that buys recall back.

Usage: python tools/ann_recall.py  (prints one line per config; the
round's numbers are recorded in SCALING.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_QUERIES = 50
K = 10


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from duckdb_server_spark.catalog.beyond import _make_hyperplanes
    from duckdb_server_spark.operators import similarity

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    print(f"corpus {n} vectors, {N_QUERIES} queries, recall@{K}", flush=True)

    truth_df = similarity.brute_force_topk(emb, queries, k=K)
    truth: dict[int, set[int]] = {}
    for r in truth_df.collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall(df, label: str, t0: float) -> None:
        got: dict[int, set[int]] = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        rec = sum(
            len(got.get(q, set()) & ids) / len(ids) for q, ids in truth.items()
        ) / len(truth)
        print(f"{label:42s} recall@{K} = {rec:.3f}  ({time.time() - t0:.1f}s)",
              flush=True)

    first8 = [
        [float(v) for v in row.embedding]
        for row in emb.orderBy("vec_id").limit(8).collect()
    ]
    m, width = 4, 16
    books8 = [[v[j * width : (j + 1) * width] for v in first8] for j in range(m)]

    t0 = time.time()
    planes8 = _make_hyperplanes(8)
    recall(similarity.lsh_topk(emb, queries, planes8, k=K), "lsh single-probe (8 planes)", t0)
    t0 = time.time()
    recall(
        similarity.lsh_topk_multiprobe(emb, queries, planes8, k=K),
        "lsh multi-probe (8 planes, 1-bit flips)",
        t0,
    )
    t0 = time.time()
    planes4 = _make_hyperplanes(4)
    recall(
        similarity.lsh_topk_multiprobe(emb, queries, planes4, k=K),
        "lsh multi-probe (4 planes — bigger buckets)",
        t0,
    )
    t0 = time.time()
    recall(
        similarity.ivf_topk(emb, queries, first8, n_probe=2, k=K),
        "ivf first-8 centroids, n_probe=2 (b13)",
        t0,
    )
    t0 = time.time()
    # kmeans_refine returns (cid, dim, value) rows — reshape to vectors
    km = similarity.kmeans_refine(emb, first8, iters=3).collect()
    trained_map: dict[int, dict[int, float]] = {}
    for r in km:
        trained_map.setdefault(r["cid"], {})[r["dim"]] = r["value"]
    trained = [
        [trained_map[c][d] for d in sorted(trained_map[c])]
        for c in sorted(trained_map)
    ]
    recall(
        similarity.ivf_topk(emb, queries, trained, n_probe=4, k=K),
        "ivf kmeans(3-iter) centroids, n_probe=4",
        t0,
    )
    t0 = time.time()
    recall(
        similarity.pq_adc_topk(emb, queries, books8, k=K),
        "pq-adc 4x16, first-8 codebooks (b15)",
        t0,
    )
    t0 = time.time()
    recall(
        similarity.ivfpq_topk(emb, queries, first8, books8, n_probe=2, k=K),
        "ivf+pq first-8, n_probe=2 (b54)",
        t0,
    )
    t0 = time.time()
    recall(
        similarity.ivfpq_topk(emb, queries, trained, books8, n_probe=4, k=K),
        "ivf+pq kmeans centroids, n_probe=4",
        t0,
    )
    # trained PQ codebooks: per-subspace k-means over the sub-slices —
    # the production knob (the declared queries freeze first-8 codewords
    # for oracle determinism; training is where recall comes from)
    t0 = time.time()
    books_tr = []
    for j in range(m):
        sub = emb.select(
            "vec_id",
            F.slice("embedding", j * width + 1, width).alias("embedding"),
        )
        init_j = books8[j]
        kmj = similarity.kmeans_refine(sub, init_j, iters=3).collect()
        mp: dict[int, dict[int, float]] = {}
        for r in kmj:
            mp.setdefault(r["cid"], {})[r["dim"]] = r["value"]
        books_tr.append(
            [[mp[c][d] for d in sorted(mp[c])] for c in sorted(mp)]
        )
    recall(
        similarity.pq_adc_topk(emb, queries, books_tr, k=K),
        "pq-adc 4x16, kmeans(3-iter) codebooks",
        t0,
    )
    t0 = time.time()
    recall(
        similarity.ivfpq_topk(emb, queries, trained, books_tr, n_probe=4, k=K),
        "ivf+pq kmeans centroids+codebooks, n_probe=4",
        t0,
    )
    # code-budget scaling: 8 subspaces x 16 trained codewords = 32-bit
    # codes (vs the 12-bit declared config) — recall is code-size-bound
    t0 = time.time()
    m2, w2 = 8, 8
    first16 = [
        [float(v) for v in row.embedding]
        for row in emb.orderBy("vec_id").limit(16).collect()
    ]
    books_big = []
    for j in range(m2):
        sub = emb.select(
            "vec_id",
            F.slice("embedding", j * w2 + 1, w2).alias("embedding"),
        )
        init_j = [v[j * w2 : (j + 1) * w2] for v in first16]
        kmj = similarity.kmeans_refine(sub, init_j, iters=3).collect()
        mp = {}
        for r in kmj:
            mp.setdefault(r["cid"], {})[r["dim"]] = r["value"]
        books_big.append(
            [[mp[c][d] for d in sorted(mp[c])] for c in sorted(mp)]
        )
    recall(
        similarity.pq_adc_topk(emb, queries, books_big, k=K),
        "pq-adc 8x8, 16 kmeans codewords (32-bit)",
        t0,
    )


if __name__ == "__main__":
    main()
