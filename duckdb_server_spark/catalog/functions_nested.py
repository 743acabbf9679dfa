"""Array / struct / map functions (SURVEY.md §2.9 nested rows) over the
``embeddings.embedding: array<float>`` fixture. The reference proves nested
Arrow transport (list + map builders, main.go:299-300,329-348); the
function surface itself is DuckDB-core via passthrough.

1-based indexing matches between DuckDB list_extract and Spark element_at.
Float accumulation runs left-to-right on both engines after casting
elements to double, so even sums are bit-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_server_spark.catalog import query
from duckdb_server_spark.functions.vector import cosine_similarity, l2_distance
from duckdb_server_spark.session import load_table as t


@query(
    "fn_array_core",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           round(CAST(embedding[64] AS DOUBLE), 6) AS last_elem,
           len(embedding[1:8]) AS slice_len,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                'sum'), 6) AS sum_elems,
           round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS max_elem
    FROM embeddings
    ORDER BY vec_id ASC NULLS LAST
    """,
)
def fn_array_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.round(F.element_at(emb, 1).cast("double"), 6).alias("first_elem"),
        F.round(F.element_at(emb, 64).cast("double"), 6).alias("last_elem"),
        F.size(F.slice(emb, 1, 8)).alias("slice_len"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
        F.round(
            F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x.cast("double")), 6
        ).alias("sum_elems"),
        F.round(F.array_max(emb).cast("double"), 6).alias("max_elem"),
    ).orderBy(F.col("vec_id").asc_nulls_last())


@query(
    "fn_array_transform",
    oracle="""
    SELECT vec_id,
           round(CAST(list_transform(embedding, x -> x * 2)[1] AS DOUBLE), 6)
             AS doubled_first,
           array_to_string(list_sort(list_transform(embedding[1:4],
                                    x -> CAST(round(CAST(x AS DOUBLE) * 100) AS BIGINT))), ',')
             AS sorted_scaled_head,
           list_contains(list_transform(embedding, x -> x > 0.5), true) AS any_gt_half
    FROM embeddings
    ORDER BY vec_id ASC NULLS LAST
    """,
)
def fn_array_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.round(F.element_at(F.transform(emb, lambda x: x * 2), 1).cast("double"), 6).alias(
            "doubled_first"
        ),
        # Serialized with a ',' join (not raw array) so the driver's pandas
        # canonicalizer can sort the result cells.
        F.concat_ws(
            ",",
            F.sort_array(
                F.transform(
                    F.slice(emb, 1, 4),
                    lambda x: F.round(x.cast("double") * 100).cast("bigint"),
                )
            ).cast("array<string>"),
        ).alias("sorted_scaled_head"),
        F.array_contains(F.transform(emb, lambda x: x > 0.5), True).alias("any_gt_half"),
    ).orderBy(F.col("vec_id").asc_nulls_last())


@query(
    "fn_vector_ops",
    oracle="""
    SELECT e1.vec_id,
           round(list_aggregate(list_transform(list_zip(e1.embedding, e2.embedding),
                            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
                 / (sqrt(list_aggregate(list_transform(e1.embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                    * sqrt(list_aggregate(list_transform(e2.embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 6)
             AS cos_sim,
           round(sqrt(list_aggregate(
             list_transform(list_zip(e1.embedding, e2.embedding),
                            p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                                 * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
             'sum')), 6) AS l2_dist
    FROM embeddings e1 JOIN embeddings e2 ON e2.vec_id = e1.vec_id + 1
    WHERE e1.vec_id < 100
    ORDER BY e1.vec_id ASC NULLS LAST
    """,
)
def fn_vector_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB 1.4 vector ops (array_cosine_similarity/array_distance) re-
    expressed with zip_with+aggregate (functions/vector.py) — JVM codegen,
    no Python. Adjacent-vector pairs keep the declared pair cheap.
    (The oracle spells out the double-precision dot/norm sums rather than
    using list_cosine_similarity, which accumulates in float32.)"""
    e = t(spark, sf_dir, "embeddings")
    e1 = e.select(F.col("vec_id"), F.col("embedding").alias("emb1")).filter(
        F.col("vec_id") < 100
    )
    e2 = e.select((F.col("vec_id") - 1).alias("vec_id"), F.col("embedding").alias("emb2"))
    j = e1.join(e2, "vec_id")
    a = F.transform(F.col("emb1"), lambda x: x.cast("double"))
    b = F.transform(F.col("emb2"), lambda x: x.cast("double"))
    return j.select(
        "vec_id",
        F.round(cosine_similarity(a, b), 6).alias("cos_sim"),
        F.round(l2_distance(a, b), 6).alias("l2_dist"),
    ).orderBy(F.col("vec_id").asc_nulls_last())


@query(
    "fn_struct_map",
    oracle="""
    SELECT n_nationkey,
           struct_pack(name := n_name, region := n_regionkey).name AS s_name,
           struct_pack(name := n_name, region := n_regionkey).region AS s_region,
           map_extract(map([n_nationkey], [n_name]), n_nationkey)[1] AS m_value
    FROM nation
    ORDER BY n_nationkey ASC NULLS LAST
    """,
)
def fn_struct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = t(spark, sf_dir, "nation")
    s = F.struct(F.col("n_name").alias("name"), F.col("n_regionkey").alias("region"))
    m = F.create_map(F.col("n_nationkey"), F.col("n_name"))
    return n.select(
        "n_nationkey",
        s.getField("name").alias("s_name"),
        s.getField("region").alias("s_region"),
        F.element_at(m, F.col("n_nationkey")).alias("m_value"),
    ).orderBy(F.col("n_nationkey").asc_nulls_last())
