"""TPC-H-style multi-join headline queries over the star schema
(FIXTURES.md join graph: lineitem → orders → customer → nation → region;
lineitem → supplier → nation).

These are the queries whose PLANS matter at 100 TB: join order, broadcast
choice for the dimension chain, partial aggregation before the shuffle,
top-k short-circuit. All reachable in the reference via SQL passthrough
(main.go:229); here each is a DataFrame composition Catalyst optimizes —
`tests/test_plans.py` asserts the scale properties hold.

Determinism: money columns are double (FIXTURES.md) → decimal(18,2) sums
(exact on both engines) cast to double at the end; revenue = extendedprice
* (1 - discount) computed in decimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_server_spark.catalog import query
from duckdb_server_spark.session import load_table as t


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


def _revenue() -> F.Column:
    """extendedprice * (1 - discount) in exact decimal arithmetic."""
    return _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))


_REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


@query(
    "t03_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(sum({_REVENUE_SQL}) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC NULLS LAST, o_orderdate ASC NULLS LAST,
             l_orderkey ASC NULLS LAST
    LIMIT 10
    """,
)
def t03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: segment filter → 3-way join → revenue top-10.

    Scale shape: customer (filtered) joins orders on the small side;
    lineitem's shipdate filter pushes to the scan; the final ORDER BY +
    LIMIT plans as TakeOrderedAndProject (no full sort)."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(
            F.col("revenue").desc_nulls_last(),
            F.col("o_orderdate").asc_nulls_last(),
            F.col("l_orderkey").asc_nulls_last(),
        )
        .limit(10)
    )


@query(
    "t05_region_supplier_volume",
    oracle=f"""
    SELECT n_name, CAST(sum({_REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM region JOIN nation ON n_regionkey = r_regionkey
                JOIN supplier ON s_nationkey = n_nationkey
                JOIN lineitem ON l_suppkey = s_suppkey
                JOIN orders ON o_orderkey = l_orderkey
    WHERE r_name = (SELECT min(r_name) FROM region)
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC NULLS LAST, n_name ASC NULLS LAST
    """,
)
def t05_region_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog: the full dimension chain region→nation→supplier
    joins broadcast (each side is tiny relative to lineitem); only the
    lineitem⋈orders join shuffles — the plan shape that survives 1000
    executors."""
    region = t(spark, sf_dir, "region")
    min_region = region.agg(F.min("r_name").alias("m"))
    region = F.broadcast(
        region.join(min_region, region.r_name == F.col("m")).select(
            "r_regionkey", "r_name"
        )
    )
    nation = F.broadcast(t(spark, sf_dir, "nation"))
    supplier = F.broadcast(t(spark, sf_dir, "supplier"))
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        region.join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(supplier, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(li, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc_nulls_last(), F.col("n_name").asc_nulls_last())
    )


@query(
    "t10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(sum({_REVENUE_SQL}) AS DOUBLE) AS revenue,
           n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC NULLS LAST, c_custkey ASC NULLS LAST
    LIMIT 20
    """,
)
def t10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analog: returned-item revenue ranking. The returnflag
    filter pushes to the lineitem scan; nation broadcasts."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = F.broadcast(t(spark, sf_dir, "nation"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc_nulls_last(), F.col("c_custkey").asc_nulls_last())
        .limit(20)
    )


@query(
    "b40_training_data_pipeline",
    oracle="""
    WITH profiled AS (
      SELECT doc_id, lang, source,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             md5(array_to_string(list_sort(list_distinct(
               string_split_regex(lower(trim(text)), '\\s+'))), ' ')) AS fp
      FROM documents
      WHERE len(text) >= 20
        AND CAST(len(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE)
            / len(text) >= 0.8),
    deduped AS (
      SELECT fp, min(doc_id) AS doc_id, min(lang) AS lang,
             min(source) AS source, min(n_tokens) AS n_tokens
      FROM profiled GROUP BY fp)
    SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM deduped GROUP BY lang
    ORDER BY lang ASC NULLS LAST
    """,
)
def b40_training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline: quality filter → fingerprint
    dedup → per-language token budget. The composition a 100 TB corpus
    actually runs nightly: every stage is scan-side except the two
    hash-groupBy shuffles (fingerprint, lang) whose keys are 16-byte
    hashes and 2-char codes."""
    from duckdb_server_spark.operators import text as text_ops

    docs = t(spark, sf_dir, "documents")
    col = F.col("text")
    profiled = docs.filter(
        (F.length(col) >= 20) & (text_ops.alpha_ratio(col) >= 0.8)
    ).select(
        "doc_id",
        "lang",
        "source",
        text_ops.token_count(col).alias("n_tokens"),
        text_ops.fingerprint(col).alias("fp"),
    )
    deduped = profiled.groupBy("fp").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("lang").alias("lang"),
        F.min("source").alias("source"),
        F.min("n_tokens").alias("n_tokens"),
    )
    return (
        deduped.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("total_tokens"))
        .orderBy(F.col("lang").asc_nulls_last())
    )
