"""Sorts / limits / top-k / set ops (SURVEY.md §2.6 O1-O7, §2.7 U1-U3).

Scale notes: ORDER BY+LIMIT plans as TakeOrderedAndProject (per-partition
top-k, then a k-row merge on the driver — no global sort); full sorts are
range-partitioned sample-based exchanges. Set ops are hash shuffles on the
full row; EXCEPT/INTERSECT use the same machinery as joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_server_spark.catalog import query
from duckdb_server_spark.session import load_table as t


# --- O1+O2: multi-key sort with explicit null placement ---
@query(
    "o01_multi_key_sort",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
    ORDER BY c_mktsegment ASC NULLS LAST, c_acctbal DESC NULLS LAST,
             c_custkey ASC NULLS LAST
    """,
)
def o01_multi_key_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .orderBy(
            F.col("c_mktsegment").asc_nulls_last(),
            F.col("c_acctbal").desc_nulls_last(),
            F.col("c_custkey").asc_nulls_last(),
        )
    )


# --- O3+O4+O5: top-k with offset ---
@query(
    "o03_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS LAST
    LIMIT 20 OFFSET 5
    """,
)
def o03_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(
            F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc_nulls_last()
        )
        .offset(5)
        .limit(20)
    )


# --- O6: WITH TIES → rank() rewrite ---
@query(
    "o06_with_ties",
    oracle="""
    SELECT p_size, p_partkey FROM (
      SELECT p_size, p_partkey,
             rank() OVER (ORDER BY p_size ASC NULLS LAST) AS rnk
      FROM part
    ) WHERE rnk <= 10
    ORDER BY p_size ASC NULLS LAST, p_partkey ASC NULLS LAST
    """,
)
def o06_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``FETCH FIRST 10 ROWS WITH TIES`` ≡ rank() <= 10 (keeps all peers of
    the 10th row) — the rewrite from SURVEY.md O6; both sides expressed as
    the rank form so the oracle pins identical semantics.

    Scale note: the global ORDER BY makes this an unpartitioned window —
    one task, semantically forced (DuckDB serializes identically), bounded
    here by the ``part`` dimension table. At 100 TB use the two-phase form
    in operators/rank.py: per-partition local top-(k + ties) prune first,
    then the serial rank over the ≤ k·P survivors."""
    w = Window.orderBy(F.col("p_size").asc_nulls_last())
    return (
        t(spark, sf_dir, "part")
        .withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 10)
        .select("p_size", "p_partkey")
        .orderBy(F.col("p_size").asc_nulls_last(), F.col("p_partkey").asc_nulls_last())
    )


# --- O7: COLLATE — case-insensitive ordering via normalized key ---
@query(
    "o07_collate_ci",
    oracle="""
    SELECT p_brand, count(*) AS n FROM part
    GROUP BY p_brand
    ORDER BY lower(p_brand) ASC NULLS LAST, p_brand ASC NULLS LAST
    """,
)
def o07_collate_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLLATE NOCASE analog: normalize-key ordering (lower()) — the
    portable strategy from SURVEY.md O7 (Spark 4 collations exist but the
    normalized key keeps the oracle comparable)."""
    return (
        t(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.lower(F.col("p_brand")).asc_nulls_last(), F.col("p_brand").asc_nulls_last())
    )


# --- U1: UNION / UNION ALL ---
@query(
    "u01_union",
    oracle="""
    SELECT k FROM (
      SELECT c_nationkey AS k FROM customer
      UNION
      SELECT s_nationkey AS k FROM supplier
    ) ORDER BY k ASC NULLS LAST
    """,
)
def u01_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.union(s).distinct().orderBy(F.col("k").asc_nulls_last())


@query(
    "u01_union_all",
    oracle="""
    SELECT k, count(*) AS n FROM (
      SELECT c_nationkey AS k FROM customer
      UNION ALL
      SELECT s_nationkey AS k FROM supplier
    ) GROUP BY k ORDER BY k ASC NULLS LAST
    """,
)
def u01_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return (
        c.union(s)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("k").asc_nulls_last())
    )


# --- U2: INTERSECT [ALL] ---
@query(
    "u02_intersect",
    oracle="""
    SELECT k FROM (
      SELECT c_nationkey AS k FROM customer
      INTERSECT
      SELECT s_nationkey AS k FROM supplier
    ) ORDER BY k ASC NULLS LAST
    """,
)
def u02_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersect(s).orderBy(F.col("k").asc_nulls_last())


# --- U3: EXCEPT [ALL] ---
@query(
    "u03_except",
    oracle="""
    SELECT k FROM (
      SELECT c_nationkey AS k FROM customer
      EXCEPT
      SELECT s_nationkey AS k FROM supplier
    ) ORDER BY k ASC NULLS LAST
    """,
)
def u03_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.subtract(s).orderBy(F.col("k").asc_nulls_last())


@query(
    "o08_deterministic_sample",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    ORDER BY o_orderkey ASC NULLS LAST
    """,
)
def o08_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~12.5% sample (DuckDB `USING SAMPLE`, reachable via
    passthrough main.go:229, made reproducible): filter on a hash of the
    key instead of an engine RNG, so both engines select the identical
    rows. md5 is the one hash both engines share bit-for-bit (Spark
    `hash`/xxhash64 and DuckDB `hash` are different algorithms). At
    100 TB this is the right sampling primitive anyway — stable under
    retries, partition-local (no shuffle), and composable with pushed
    filters. `df.sample(fraction, seed)` covers the engine-RNG form
    (rows-only; see o08b)."""
    return (
        t(spark, sf_dir, "orders")
        .filter(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin("0", "1")
        )
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_orderkey").asc_nulls_last())
    )


@query("o08b_tablesample")
def o08b_tablesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-RNG TABLESAMPLE (`df.sample`): Bernoulli per row, seeded —
    deterministic within Spark but not across engines, so rows-only.
    Scale note: sample() is a partition-local filter, no shuffle."""
    return (
        t(spark, sf_dir, "orders")
        .sample(fraction=0.1, seed=42)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "u02b_intersect_all",
    oracle="""
    SELECT k FROM (
      SELECT c_nationkey AS k FROM customer
      INTERSECT ALL
      SELECT s_nationkey AS k FROM supplier
    ) ORDER BY k ASC NULLS LAST
    """,
)
def u02b_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — min multiplicity per value):
    `intersectAll` plans one aggregate per side + a join, no distinct."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersectAll(s).orderBy(F.col("k").asc_nulls_last())


@query(
    "u03b_except_all",
    oracle="""
    SELECT k FROM (
      SELECT c_nationkey AS k FROM customer
      EXCEPT ALL
      SELECT s_nationkey AS k FROM supplier
    ) ORDER BY k ASC NULLS LAST
    """,
)
def u03b_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference — multiplicities subtract):
    `exceptAll`, vs `subtract` which is the DISTINCT form (u03)."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.exceptAll(s).orderBy(F.col("k").asc_nulls_last())


# --- O9: ORDER BY ALL (DuckDB dialect, supported verbatim by Spark SQL) ---
@query(
    "o09_order_by_all",
    oracle="""
    SELECT n_regionkey, n_name FROM nation ORDER BY ALL
    """,
)
def o09_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ORDER BY ALL`` (DuckDB dialect, reachable in the reference via
    the SQL passthrough, main.go:229; ALL keyword main.go:377) — identical
    SQL text runs on both engines (no
    NULLs in these columns, so the default null-order divergence is
    moot)."""
    t(spark, sf_dir, "nation").createOrReplaceTempView("nation_oba")
    return spark.sql("SELECT n_regionkey, n_name FROM nation_oba ORDER BY ALL")


# --- U4: UNION BY NAME (DuckDB SQL dialect ↔ Spark unionByName API) ---
@query(
    "u04_union_by_name",
    oracle="""
    SELECT * FROM (
      SELECT n_name AS name, n_nationkey AS key FROM nation
      UNION ALL BY NAME
      SELECT r_regionkey AS key, r_name AS name FROM region)
    ORDER BY key ASC NULLS LAST, name ASC NULLS LAST
    """,
)
def u04_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB's ``UNION ALL BY NAME`` (passthrough main.go:229; UNION
    keyword main.go:502) aligns columns by name, not
    position; Spark's equivalent is the ``unionByName`` DataFrame op
    (the SQL keyword does not parse in Spark)."""
    a = t(spark, sf_dir, "nation").select(
        F.col("n_name").alias("name"), F.col("n_nationkey").alias("key")
    )
    b = t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("key"), F.col("r_name").alias("name")
    )
    return a.unionByName(b).orderBy(
        F.col("key").asc_nulls_last(), F.col("name").asc_nulls_last()
    )
