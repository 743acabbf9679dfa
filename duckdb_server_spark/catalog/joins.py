"""Joins (SURVEY.md §2.3 J1-J9). All reachable in the reference via SQL
passthrough (main.go:229); keyword anchors per row in SURVEY.md.

Scale notes: dimension tables (region/nation/supplier/part/customer) are
broadcast-joined — explicitly hinted where Spark's size estimate might not
trigger it — so the fact-table side never shuffles for those joins. The
only shuffling joins are fact-to-fact (orders⨝lineitem), which hash-
partition on the join key exactly as a 1000-executor cluster would want.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_server_spark.catalog import query
from duckdb_server_spark.operators.asof import asof_join
from duckdb_server_spark.session import load_table as t


# --- J1: inner equi-join chain through the star schema ---
@query(
    "j01_inner_join",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
           count(*) AS n_cust
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
    GROUP BY n_name
    ORDER BY n_name ASC NULLS LAST
    """,
)
def j01_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⨝ nation ⨝ region with broadcast dims: zero fact shuffles
    before the aggregation."""
    c = t(spark, sf_dir, "customer")
    n = F.broadcast(t(spark, sf_dir, "nation"))
    r = F.broadcast(t(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE")))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_bal"),
            F.count(F.lit(1)).alias("n_cust"),
        )
        .orderBy(F.col("n_name").asc_nulls_last())
    )


# --- J2: left / full outer ---
@query(
    "j02_left_outer",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    ORDER BY c_custkey ASC NULLS LAST
    """,
)
def j02_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy(F.col("c_custkey").asc_nulls_last())
    )


@query(
    "j02_full_outer",
    oracle="""
    WITH a AS (SELECT c_nationkey AS k, count(*) AS n_cust
               FROM customer GROUP BY c_nationkey),
         b AS (SELECT s_nationkey AS k, count(*) AS n_supp
               FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(a.k, b.k) AS nationkey,
           coalesce(n_cust, 0) AS n_cust,
           coalesce(n_supp, 0) AS n_supp
    FROM a FULL OUTER JOIN b ON a.k = b.k
    ORDER BY nationkey ASC NULLS LAST
    """,
)
def j02_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    b = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        a.join(b, a.k == b.k, "full")
        .select(
            F.coalesce(a.k, b.k).alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy(F.col("nationkey").asc_nulls_last())
    )


@query(
    "j02b_right_outer",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey
    ORDER BY c_custkey ASC NULLS LAST
    """,
)
def j02b_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER (the `RIGHT` keyword surface, main.go:486): preserves
    order-less customers with n_orders = 0. Same shuffle shape as the left
    form — Spark plans it as the mirrored hash join, so the big (orders)
    side still streams."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy(F.col("c_custkey").asc_nulls_last())
    )


# --- J3: cross join (main.go:395) ---
@query(
    "j03_cross_join",
    oracle="""
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey <> r2.r_regionkey
    ORDER BY from_region ASC NULLS LAST, to_region ASC NULLS LAST
    """,
)
def j03_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r1 = t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k1"), F.col("r_name").alias("from_region")
    )
    r2 = t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("k2"), F.col("r_name").alias("to_region")
    )
    return (
        r1.crossJoin(r2)
        .filter(F.col("k1") != F.col("k2"))
        .select("from_region", "to_region")
        .orderBy(
            F.col("from_region").asc_nulls_last(), F.col("to_region").asc_nulls_last()
        )
    )


# --- J4: natural join (main.go:454) — join on all common column names ---
@query(
    "j04_natural_join",
    oracle="""
    SELECT n_name, r_name
    FROM (SELECT n_name, n_regionkey AS regionkey FROM nation)
    NATURAL JOIN (SELECT r_name, r_regionkey AS regionkey FROM region)
    ORDER BY n_name ASC NULLS LAST
    """,
)
def j04_natural_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATURAL JOIN = equi-join on the intersection of column names,
    computed here explicitly (Spark has no NATURAL in the DataFrame API)."""
    n = t(spark, sf_dir, "nation").select("n_name", F.col("n_regionkey").alias("regionkey"))
    r = t(spark, sf_dir, "region").select("r_name", F.col("r_regionkey").alias("regionkey"))
    common = sorted(set(n.columns) & set(r.columns))
    return (
        n.join(F.broadcast(r), common)
        .select("n_name", "r_name")
        .orderBy(F.col("n_name").asc_nulls_last())
    )


# --- J5: semi join ---
@query(
    "j05_semi_join",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem WHERE l_quantity > 45
    )
    ORDER BY s_suppkey ASC NULLS LAST
    """,
)
def j05_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        s.join(li, s.s_suppkey == li.l_suppkey, "leftsemi")
        .select("s_suppkey", "s_name")
        .orderBy(F.col("s_suppkey").asc_nulls_last())
    )


# --- J6: anti join (NOT IN / NOT EXISTS; null-guard semantics) ---
@query(
    "j06_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders WHERE o_custkey = c_custkey
    )
    ORDER BY c_custkey ASC NULLS LAST
    """,
)
def j06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti. (NOT IN differs when the subquery side has
    nulls — it yields no rows; generated plans must null-guard first. The
    declared pair uses NOT EXISTS semantics, which anti-join matches.)"""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "leftanti")
        .select("c_custkey", "c_name")
        .orderBy(F.col("c_custkey").asc_nulls_last())
    )


# --- J7: theta join (equi key + inequality predicate) ---
@query(
    "j07_theta_join",
    oracle="""
    SELECT s_suppkey, count(*) AS n_richer_cust
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND c_acctbal > s_acctbal
    GROUP BY s_suppkey
    ORDER BY s_suppkey ASC NULLS LAST
    """,
)
def j07_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-key hash join carrying the range predicate as a post-condition —
    Catalyst evaluates the inequality inside the join, no cartesian."""
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    return (
        s.join(
            c,
            (s.s_nationkey == c.c_nationkey) & (c.c_acctbal > s.s_acctbal),
        )
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_richer_cust"))
        .orderBy(F.col("s_suppkey").asc_nulls_last())
    )


# --- J8: as-of join (custom operator, operators/asof.py) ---
@query(
    "j08_asof_join",
    oracle="""
    WITH clicks AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                    FROM events WHERE event_type = 'click'),
         purchases AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
                       FROM events WHERE event_type = 'purchase')
    SELECT c.event_id, round(p.value, 2) AS last_purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    ORDER BY c.event_id ASC NULLS LAST
    """,
)
def j08_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of: each click gets the latest preceding purchase value
    for the same user. DuckDB: ASOF JOIN; Spark: union + ordered-window
    last(ignorenulls) rewrite (operators/asof.py)."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    joined = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["purchase_value"],
    )
    return joined.select(
        "event_id", F.round("purchase_value", 2).alias("last_purchase_value")
    ).orderBy(F.col("event_id").asc_nulls_last())


# --- J9: lateral (LATERAL VIEW explode ≈ unnest) ---
@query(
    "j09_lateral_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id < 20
    ORDER BY doc_id ASC NULLS LAST, word ASC NULLS LAST
    """,
)
def j09_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .orderBy(F.col("doc_id").asc_nulls_last(), F.col("word").asc_nulls_last())
    )


@query(
    "j10_positional_join",
    oracle="""
    WITH a AS (SELECT doc_id, n_chars,
                      row_number() OVER (ORDER BY doc_id ASC NULLS LAST) AS rn
               FROM documents),
         b AS (SELECT label,
                      row_number() OVER (ORDER BY vec_id ASC NULLS LAST) AS rn
               FROM embeddings)
    SELECT a.doc_id, a.n_chars, b.label
    FROM a JOIN b USING (rn)
    ORDER BY a.doc_id ASC NULLS LAST
    """,
)
def j10_positional_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSITIONAL JOIN (DuckDB-specific row-order join, reachable via
    passthrough main.go:229), in its deterministic form: both relations
    are given an explicit total order and paired by rank — raw file
    order is not a contract either engine preserves under parallel scan.

    Scale shape: `operators.rank.positional_join` avoids the naive
    single-partition `Window.orderBy` rank — each side range-partitions
    and sorts in parallel, per-partition counts prefix-sum into offsets
    (a #partitions-row window), and the global rank is offset + local
    row_number. The rank join itself is a plain equi-join on rn."""
    from duckdb_server_spark.operators.rank import positional_join

    a = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    b = t(spark, sf_dir, "embeddings").select("vec_id", "label")
    return (
        positional_join(a, b, ["doc_id"], ["vec_id"])
        .select("doc_id", "n_chars", "label")
        .orderBy(F.col("doc_id").asc_nulls_last())
    )


@query(
    "j09b_lateral_topk",
    oracle="""
    SELECT n_name, c_name, c_acctbal
    FROM nation, LATERAL (
      SELECT c_name, c_acctbal FROM customer
      WHERE c_nationkey = n_nationkey
      ORDER BY c_acctbal DESC NULLS LAST, c_custkey ASC NULLS LAST
      LIMIT 2) top2
    ORDER BY n_name ASC NULLS LAST, c_acctbal DESC NULLS LAST,
             c_name ASC NULLS LAST
    """,
)
def j09b_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (J9 beyond LATERAL VIEW explode):
    top-2 customers per nation via a per-row dependent subquery with
    ORDER BY + LIMIT. Spark SQL ≥3.2 decorrelates this into a
    ranked-window join rather than re-executing the inner query per
    outer row — the identical plan a hand-written
    row_number-over-partition rewrite (a14) would give."""
    t(spark, sf_dir, "nation").createOrReplaceTempView("dss_nation_j9")
    t(spark, sf_dir, "customer").createOrReplaceTempView("dss_customer_j9")
    return spark.sql(
        """
        SELECT n_name, c_name, c_acctbal
        FROM dss_nation_j9, LATERAL (
          SELECT c_name, c_acctbal FROM dss_customer_j9
          WHERE c_nationkey = n_nationkey
          ORDER BY c_acctbal DESC NULLS LAST, c_custkey ASC NULLS LAST
          LIMIT 2) top2
        ORDER BY n_name ASC NULLS LAST, c_acctbal DESC NULLS LAST,
                 c_name ASC NULLS LAST
        """
    )


@query(
    "j08b_asof_forward",
    oracle="""
    WITH clicks AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                    FROM events WHERE event_type = 'click'),
         purchases AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
                       FROM events WHERE event_type = 'purchase')
    SELECT c.event_id, round(p.value, 2) AS next_purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    ORDER BY c.event_id ASC NULLS LAST
    """,
)
def j08b_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of (DuckDB ``ASOF ... ON l.ts <= r.ts``): each click
    gets the EARLIEST following purchase value for the same user — the
    attribution direction. Same union + ordered-window plan as the
    backward form (operators/asof.py), with the time axis reversed; one
    shuffle on the join key either way."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    joined = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["purchase_value"],
        direction="forward",
    )
    return joined.select(
        "event_id", F.round("purchase_value", 2).alias("next_purchase_value")
    ).orderBy(F.col("event_id").asc_nulls_last())
