"""CTEs / subqueries (SURVEY.md §2.8 Q1-Q5). WITH declared main.go:513,
RECURSIVE main.go:477, MATERIALIZED main.go:453.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_server_spark.catalog import query
from duckdb_server_spark.operators.recursive import recursive_fixpoint
from duckdb_server_spark.session import load_table as t


# --- Q1: WITH CTE (multi-reference) ---
@query(
    "q1_cte",
    oracle="""
    WITH nation_stats AS (
      SELECT c_nationkey, count(*) AS n_cust,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / count(*) AS avg_bal
      FROM customer GROUP BY c_nationkey
    )
    SELECT n_name, n_cust, avg_bal
    FROM nation_stats JOIN nation ON c_nationkey = n_nationkey
    WHERE n_cust > 2
    ORDER BY n_name ASC NULLS LAST
    """,
)
def q1_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE = intermediate DataFrame variable (Catalyst inlines either way).

    avg is computed as exact decimal sum ÷ count (double division last):
    double summation order differs across partitions, and a money avg can
    land exactly on a round() boundary — decimal summation is exact on both
    engines, so the divided double is bit-identical (determinism rule,
    SURVEY.md §5)."""
    nation_stats = (
        t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal"),
        )
        .filter(F.col("n_cust") > 2)
    )
    n = F.broadcast(t(spark, sf_dir, "nation"))
    return (
        nation_stats.join(n, nation_stats.c_nationkey == n.n_nationkey)
        .select("n_name", "n_cust", "avg_bal")
        .orderBy(F.col("n_name").asc_nulls_last())
    )


# --- Q2: WITH RECURSIVE → driver-side fixpoint (operators/recursive.py) ---
@query(
    "q2_recursive_cte",
    oracle="""
    WITH RECURSIVE series(n, total) AS (
      SELECT 1 AS n, 1 AS total
      UNION ALL
      SELECT n + 1, total + n + 1 FROM series WHERE n < 15
    )
    SELECT n, total FROM series ORDER BY n ASC NULLS LAST
    """,
)
def q2_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-sum series 1..15: seed row + recursive step, iterated to
    fixpoint. UNION ALL semantics (rows are distinct by construction).
    The seed is a SQL VALUES LocalRelation, NOT createDataFrame: a
    python-parallelized seed pickles onto defaultParallelism slices and
    every localCheckpoint in the loop pays a python-worker launch per
    slice (~4 s measured); the LocalRelation stays JVM-side (~0.2 s)."""
    seed = spark.sql("SELECT CAST(1 AS INT) AS n, CAST(1 AS INT) AS total")

    def step(frontier: DataFrame) -> DataFrame:
        return frontier.filter(F.col("n") < 15).select(
            (F.col("n") + 1).alias("n"), (F.col("total") + F.col("n") + 1).alias("total")
        )

    # Shuffle-free step (pure projection) → checkpoint every 5 rounds:
    # the per-iteration emptiness probe replays ≤4 narrow stages instead
    # of paying a materialization job each round (see recursive_fixpoint).
    return recursive_fixpoint(
        seed, step, distinct=False, max_iterations=20, checkpoint_interval=5
    ).orderBy(F.col("n").asc_nulls_last())


# --- Q2b: recursive transitive closure over a real self-referencing edge set ---
@query(
    "q2_transitive_closure",
    oracle="""
    WITH RECURSIVE reach(src, dst) AS (
      SELECT n_regionkey AS src, n_nationkey AS dst FROM nation WHERE n_nationkey < 5
      UNION
      SELECT r.src, e.n_nationkey AS dst
      FROM reach r JOIN nation e ON e.n_regionkey = r.dst
      WHERE e.n_nationkey <> r.dst
    )
    SELECT src, dst FROM reach ORDER BY src ASC NULLS LAST, dst ASC NULLS LAST
    """,
)
def q2_transitive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-reachability flavor of WITH RECURSIVE (UNION dedup semantics)
    over nation's (regionkey → nationkey) edges."""
    nation = t(spark, sf_dir, "nation")
    edges = nation.select(
        F.col("n_regionkey").alias("e_src"), F.col("n_nationkey").alias("e_dst")
    )
    seed = (
        nation.filter(F.col("n_nationkey") < 5)
        .select(F.col("n_regionkey").alias("src"), F.col("n_nationkey").alias("dst"))
        .coalesce(1)
    )

    def step(frontier: DataFrame) -> DataFrame:
        return (
            frontier.join(edges, frontier.dst == edges.e_src)
            .filter(F.col("e_dst") != F.col("dst"))
            .select(F.col("src"), F.col("e_dst").alias("dst"))
        )

    return recursive_fixpoint(seed, step, distinct=True).orderBy(
        F.col("src").asc_nulls_last(), F.col("dst").asc_nulls_last()
    )


# --- Q4: scalar subquery ---
@query(
    "q4_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) * 2 FROM orders)
    ORDER BY o_orderkey ASC NULLS LAST
    """,
)
def q4_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery via Spark SQL so Catalyst plans the decorrelated
    form (a one-row broadcast), not a driver-side collect."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("dss_orders_q4")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM dss_orders_q4
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 2 FROM dss_orders_q4)
        ORDER BY o_orderkey ASC NULLS LAST
        """
    )


# --- Q5: derived tables / nested SELECT ---
@query(
    "q5_derived_table",
    oracle="""
    SELECT band, count(*) AS n,
           CAST(sum(CAST(total_spent AS DECIMAL(18,2))) AS DOUBLE) / count(*)
             AS avg_spent
    FROM (
      SELECT o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
             CASE WHEN sum(CAST(o_totalprice AS DECIMAL(18,2))) > 1500000
                  THEN 'big' ELSE 'small' END AS band
      FROM orders GROUP BY o_custkey
    )
    GROUP BY band
    ORDER BY band ASC NULLS LAST
    """,
)
def q5_derived_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    inner = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total_spent_dec"))
        .withColumn(
            "band", F.when(F.col("total_spent_dec") > 1500000, "big").otherwise("small")
        )
        .withColumn("total_spent", F.col("total_spent_dec").cast("double"))
    )
    return (
        inner.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("total_spent").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_spent"),
        )
        .orderBy(F.col("band").asc_nulls_last())
    )
