"""Round-16 optimization pins: every change that touched an operator's
internals keeps its exact semantics.

Each test compares the optimized path against an independent reference
computation (not against a recorded value), so a regression in the
optimization shows up as a semantic diff, not a timing blip. The oracle
differentials cover the end-to-end queries; these pin the operator
internals directly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_server_spark.session import load_table


def test_with_global_index_matches_window_rank_with_ties(spark, sf_dir):
    """The mono-id arithmetic rank (r16: replaced the window over
    spark_partition_id) must equal the single-partition window rank on
    the KEY PREFIX even with duplicate keys: ranks within a tie are
    interchangeable, so compare the sorted (key, rank-set) shape."""
    from duckdb_server_spark.operators.rank import with_global_index

    df = spark.range(0, 1000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    ranked = with_global_index(df, ["k", "v"], out="rn", num_partitions=8)
    rows = ranked.select("k", "v", "rn").collect()
    # ranks are a permutation of 1..N
    rns = sorted(r.rn for r in rows)
    assert rns == list(range(1, 1001))
    # and ordered by (k, v): sorting rows by rn must yield (k, v) sorted
    by_rank = [(r.k, r.v) for r in sorted(rows, key=lambda r: r.rn)]
    assert by_rank == sorted((r.k, r.v) for r in rows)


def test_quantize_arrow_matches_jvm_argmin(spark, sf_dir):
    """The numpy quantization kernel (r16) must reproduce the JVM
    HOF-fold argmin cells and 1-based PQ codes exactly."""
    from duckdb_server_spark.operators.similarity import (
        _argmin_pos,
        _as_double,
        _l2_array,
        _matrices_lit,
        quantize_arrow,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    first4 = [
        [float(v) for v in r.embedding]
        for r in emb.orderBy("vec_id").limit(4).collect()
    ]
    m, width = 4, 16
    codebooks = [
        [vec[j * width : (j + 1) * width] for vec in first4] for j in range(m)
    ]
    got = {
        r["vec_id"]: (r["__cell"], r["__code_0"], r["__code_1"], r["__code_2"], r["__code_3"])
        for r in quantize_arrow(
            emb, "vec_id", "embedding", first4, codebooks
        ).collect()
    }

    mats = {"__cent": first4}
    mats.update({f"__cb_{j}": codebooks[j] for j in range(m)})
    starts = [1 + width * j for j in range(m)]
    jvm = (
        _matrices_lit(emb, mats)
        .withColumn("__vecd", _as_double(F.col("embedding")))
        .select(
            "vec_id",
            _l2_array(F.col("__vecd"), F.col("__cent")).alias("__cd"),
            *[
                _l2_array(
                    F.slice(F.col("__vecd"), starts[j], width),
                    F.col(f"__cb_{j}"),
                ).alias(f"__dtc_{j}")
                for j in range(m)
            ],
        )
        .select(
            "vec_id",
            (_argmin_pos(F.col("__cd")) - 1).cast("int").alias("cell"),
            *[
                _argmin_pos(F.col(f"__dtc_{j}")).cast("int").alias(f"c{j}")
                for j in range(m)
            ],
        )
    )
    want = {r.vec_id: (r.cell, r.c0, r.c1, r.c2, r.c3) for r in jvm.collect()}
    assert got == want


def test_span_hashes_arrow_carry_column(spark, sf_dir):
    """The generalized span generator (r16) must pass carry columns
    through per span row and keep per-doc span sets distinct."""
    from duckdb_server_spark.operators.dedup import span_hashes_arrow

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "tag", F.concat(F.lit("t"), (F.col("doc_id") % 3).cast("string"))
    )
    out = span_hashes_arrow(
        docs.select("doc_id", "tag", "text"),
        "text",
        "doc_id",
        n=5,
        carry=(("tag", "string"),),
    )
    rows = out.collect()
    assert rows, "generator emitted nothing"
    # carry column is consistent with its doc
    assert all(r.tag == f"t{r.doc_id % 3}" for r in rows)
    # per-doc spans are distinct
    seen = set()
    for r in rows:
        assert (r.doc_id, r["__sh"]) not in seen
        seen.add((r.doc_id, r["__sh"]))


def test_shingle_freq_count_equals_count_distinct(spark, sf_dir):
    """r16 replaced count_distinct(doc) with count(*) per span hash —
    valid because (doc, span) pairs are distinct by construction. Pin
    the equivalence on the real generator output."""
    from duckdb_server_spark.operators.dedup import span_hashes_arrow

    docs = load_table(spark, sf_dir, "documents")
    hashed = span_hashes_arrow(docs, "text", "doc_id", n=5)
    both = (
        hashed.groupBy("__sh")
        .agg(
            F.count(F.lit(1)).alias("plain"),
            F.count_distinct("doc_id").alias("distinct_docs"),
        )
        .filter(F.col("plain") != F.col("distinct_docs"))
    )
    assert both.count() == 0


def test_t21_aggregate_form_matches_correlated_form(spark, sf_dir):
    """The r16 per-order aggregate rewrite of t21 must emit exactly the
    correlated semi/anti form's rows (the pre-r16 spelling, rebuilt here
    as the reference)."""
    from duckdb_server_spark.catalog import QUERIES, load_all

    load_all()
    got = sorted(
        tuple(r) for r in QUERIES["t21_waiting_supplier"](spark, sf_dir).collect()
    )

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
        )
        .select("l_orderkey", "l_suppkey")
    )
    other = li.select(
        F.col("l_orderkey").alias("o2_ok"), F.col("l_suppkey").alias("o2_sk")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o3_ok"), F.col("l_suppkey").alias("o3_sk")
    )
    l1 = late.join(
        other,
        (F.col("o2_ok") == F.col("l_orderkey"))
        & (F.col("o2_sk") != F.col("l_suppkey")),
        "leftsemi",
    ).join(
        other_late,
        (F.col("o3_ok") == F.col("l_orderkey"))
        & (F.col("o3_sk") != F.col("l_suppkey")),
        "leftanti",
    )
    sup = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    want = sorted(
        tuple(r)
        for r in (
            l1.join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(
                F.col("numwait").desc_nulls_last(),
                F.col("s_name").asc_nulls_last(),
            )
            .limit(20)
        ).collect()
    )
    assert got == want


def test_semdedup_prepass_matches_no_prepass(spark, sf_dir):
    """The r16 prepass restructure (min-id agg + shared signature pass +
    checkpointed drop list) must still be output-identical to the
    no-prepass pairwise form."""
    from duckdb_server_spark.operators.similarity import semdedup_drop_list

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # plant exact clones so the prepass path is exercised
    clones = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(clones)
    cents = [
        [float(v) for v in r.embedding]
        for r in emb.orderBy("vec_id").limit(4).collect()
    ]
    a = semdedup_drop_list(corpus, cents, threshold=0.99, exact_prepass=True)
    b = semdedup_drop_list(corpus, cents, threshold=0.99, exact_prepass=False)
    ga = sorted(
        (r.vec_id, r.cell, r.witness_id, round(r.max_cos, 6)) for r in a.collect()
    )
    gb = sorted(
        (r.vec_id, r.cell, r.witness_id, round(r.max_cos, 6)) for r in b.collect()
    )
    assert ga == gb
