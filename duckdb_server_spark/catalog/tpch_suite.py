"""Extended TPC-H-analog suite (Q4,Q6,Q7,Q8,Q9,Q13,Q14,Q15,Q17,Q18,Q19,
Q21,Q22 shapes) adapted to the corpus schema (FIXTURES.md — no partsupp,
no l_shipmode/l_commitdate/l_receiptdate/c_phone, so each query keeps the
reference shape on the columns that exist).

All reachable in the reference via the verbatim SQL passthrough
(main.go:229); here each is a DataFrame composition whose PLAN is the
point at 100 TB: dimension joins broadcast, fact-side filters push to the
parquet scan, EXISTS/NOT EXISTS become semi/anti joins on the shuffle
keys, and decimal arithmetic keeps the oracle hash exact.

Determinism (FIXTURES.md conventions): money in decimal(18,2) cast to
double at the end; correlated-average thresholds cross-multiplied into
exact integer/decimal comparisons (never divide two doubles inside a
predicate); explicit NULLS FIRST/LAST.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from duckdb_server_spark.catalog import query
from duckdb_server_spark.session import load_table as t


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


def _revenue() -> F.Column:
    return _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))


_REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


@query(
    "t04_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority ASC NULLS LAST
    """,
)
def t04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog (late-ship EXISTS stands in for the missing
    commitdate/receiptdate pair). The correlated EXISTS is a left-semi
    join on l_orderkey — the date-range filter on orders prunes the
    probe side before the shuffle."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "leftsemi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy(F.col("o_orderpriority").asc_nulls_last())
    )


@query(
    "t06_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def t06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-side query — every predicate pushes into the
    parquet scan (shipdate min/max row-group skip at scale), one partial
    + final agg, zero joins."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount"))
        .cast("double")
        .alias("revenue")
    )


@query(
    "t07_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS INT) AS l_year,
                 {_REVENUE_SQL} AS volume
          FROM supplier
          JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01') shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation ASC NULLS LAST, cust_nation ASC NULLS LAST,
             l_year ASC NULLS LAST
    """,
)
def t07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume. The nation-pair disjunction
    implies each side is one of TWO nations, so the nation filter pushes
    BELOW the fact joins: supplier and customer each broadcast-join the
    two-row nation subset first (≈2/25 selectivity), the filtered
    supplier side prunes lineitem before anything shuffles, and only the
    already-bilateral subset reaches the orders⋈customer chain; the
    disjunction then merely removes the two same-nation combinations.
    (The filter-last form shuffled the full fact chain and went ~12× at
    the 10× tier — scaling_study r6.) Fact-side joins stay unforced so
    AQE picks broadcast at small SF and shuffle at warehouse scale."""
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nset = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    n1 = F.broadcast(
        nset.select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        nset.select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    sup2 = sup.join(n1, F.col("s_nationkey") == F.col("n1_key")).select(
        "s_suppkey", "supp_nation"
    )
    cust2 = cust.join(n2, F.col("c_nationkey") == F.col("n2_key")).select(
        "c_custkey", "cust_nation"
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(sup2, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust2, F.col("c_custkey") == F.col("o_custkey"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            _revenue().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
        .orderBy(
            F.col("supp_nation").asc_nulls_last(),
            F.col("cust_nation").asc_nulls_last(),
            F.col("l_year").asc_nulls_last(),
        )
    )


@query(
    "t08_market_share",
    oracle=f"""
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM (SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                 {_REVENUE_SQL} AS volume,
                 n2.n_name AS nation
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1998-01-01') all_nations
    GROUP BY o_year
    ORDER BY o_year ASC NULLS LAST
    """,
)
def t08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3's share of EUROPE-customer PROMO volume per
    year. Conditional-sum-over-sum in double with round(6) — the decimal
    sums underneath are exact, so the single division is deterministic."""
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = t(spark, sf_dir, "lineitem")
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = F.broadcast(
        t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rk")
        )
    )
    region = F.broadcast(
        t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    n2 = F.broadcast(
        t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
        )
    )
    rows = (
        F.broadcast(part.select("p_partkey"))
        .join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(region, F.col("n1_rk") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _revenue().alias("volume"),
            "nation",
        )
    )
    return (
        rows.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")))
                .cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy(F.col("o_year").asc_nulls_last())
    )


@query(
    "t09_product_type_profit",
    oracle=f"""
    SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
    FROM (SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
                 {_REVENUE_SQL} AS amount
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%red%') profit
    GROUP BY nation, o_year
    ORDER BY nation ASC NULLS LAST, o_year DESC NULLS LAST
    """,
)
def t09_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analog (no partsupp → profit = revenue). The LIKE
    '%red%' part filter broadcasts; supplier-nation rollup by order
    year."""
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = t(spark, sf_dir, "lineitem")
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = F.broadcast(t(spark, sf_dir, "nation"))
    return (
        F.broadcast(part.select("p_partkey"))
        .join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            _revenue().alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
        .orderBy(F.col("nation").asc_nulls_last(), F.col("o_year").desc_nulls_last())
    )


@query(
    "t13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
               ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC NULLS LAST, c_count DESC NULLS LAST
    """,
)
def t13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: order-count histogram. Aggregate-below-join shape: the
    join-side priority predicate pushes into a pre-aggregation of orders
    per customer key FIRST (map-side combine, so the shuffle carries
    (custkey, count) pairs — never full order rows), then customers LEFT
    JOIN the counts with NULL→0 for zero-order customers. Equivalent to
    the spec's left-join-then-count (count(o_orderkey) counts matched
    rows only) but the join input shrinks from |orders| to ≤|customer|
    rows — the shape that held the 10× scaling tier linear where the
    join-first form went 19× (scaling_study r6)."""
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    orders = t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    ord_counts = (
        orders.filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    per_cust = cust.join(
        ord_counts, F.col("c_custkey") == F.col("o_custkey"), "left"
    ).select(F.coalesce(F.col("__n"), F.lit(0)).alias("c_count"))
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc_nulls_last(), F.col("c_count").desc_nulls_last())
    )


@query(
    "t14_promo_revenue",
    oracle=f"""
    SELECT round(100.00 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                        THEN {_REVENUE_SQL} END) AS DOUBLE)
                 / CAST(sum({_REVENUE_SQL}) AS DOUBLE), 6) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def t14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo share of one month's revenue. part broadcasts;
    the month filter prunes lineitem at the scan."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = F.broadcast(t(spark, sf_dir, "part").select("p_partkey", "p_type"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", _revenue())).cast("double")
                / F.sum(_revenue()).cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


@query(
    "t15_top_supplier",
    oracle=f"""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no, sum({_REVENUE_SQL}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT max(total_rev) FROM revenue0)
    ORDER BY s_suppkey ASC NULLS LAST
    """,
)
def t15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier by quarterly revenue — CTE reused twice
    (once per branch) with a scalar-subquery max. Equality on the exact
    decimal sum is safe; only the final display casts to double."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue0 = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue()).alias("total_rev")
    )
    max_rev = F.broadcast(revenue0.agg(F.max("total_rev").alias("max_rev")))
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sup.join(revenue0, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(max_rev)
        .filter(F.col("total_rev") == F.col("max_rev"))
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
        .orderBy(F.col("s_suppkey").asc_nulls_last())
    )


@query(
    "t17_small_quantity_revenue",
    oracle="""
    WITH pq AS (SELECT l_partkey AS pk,
                       sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
                       count(*) AS cq
                FROM lineitem GROUP BY l_partkey)
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pq ON pk = l_partkey
    WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cq < sq
    """,
)
def t17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders. The correlated
    `l_quantity < 0.2 * avg(per-part quantity)` is cross-multiplied to
    `5 * qty * cnt < sum` so both engines compare exact decimals — no
    double division inside a predicate (summation-order flips)."""
    li = t(spark, sf_dir, "lineitem")
    pq = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_dec("l_quantity")).alias("sq"), F.count(F.lit(1)).alias("cq")
    )
    part = F.broadcast(
        t(spark, sf_dir, "part")
        .filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .select("p_partkey")
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(pq, F.col("pk") == F.col("l_partkey"))
        .filter(_dec("l_quantity") * 5 * F.col("cq") < F.col("sq"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "t18_large_volume_customer",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS LAST
    LIMIT 100
    """,
)
def t18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders. The IN-subquery is a left-semi
    join against a pre-aggregated HAVING set; quantities are
    integer-valued doubles so sum is order-independent and exact."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 300)
        .select(F.col("l_orderkey").alias("big_ok"))
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("big_ok"), "leftsemi")
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("sum_qty"))
        .orderBy(
            F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc_nulls_last()
        )
        .limit(100)
    )


@query(
    "t19_disjunctive_filter",
    oracle=f"""
    SELECT CAST(sum({_REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def t19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunction of brand/size/quantity conjunctions across
    the join — Catalyst extracts the common p_partkey equi-condition and
    keeps the OR as a post-join filter; part broadcasts."""
    li = t(spark, sf_dir, "lineitem")
    part = F.broadcast(t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size"))
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@query(
    "t21_waiting_supplier",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC NULLS LAST, s_name ASC NULLS LAST
    LIMIT 20
    """,
)
def t21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analog (late = shipped >60 days after order date,
    standing in for receipt>commit). Sole-late-supplier-in-a-
    multi-supplier-order, in per-order aggregate form (r16, guide
    §2.3/§2.4): for a late row l1,

    - EXISTS another-supplier row  ⟺  its order has ≥ 2 distinct
      suppliers  ⟺  min(l_suppkey) ≠ max(l_suppkey) over the order;
    - NOT EXISTS another-supplier LATE row  ⟺  every late row of the
      order carries l1's own supplier  ⟺  min = max over the late rows.

    Both order sets come from single-pass min/max aggregates (map-side
    partial combine — per-order traffic only), and l1 is the late set
    semi-joined against them on the already-co-partitioned orderkey.
    The previous correlated spelling broadcast the FULL lineitem
    projection as the semi-join build side (a fact-table broadcast:
    driver collect + hash relation per run; an 8 GB cap blowout at
    warehouse scale) and sort-merge-anti-joined the late set against
    itself (two more full exchanges + sorts). Plan: 3 lineitem scans →
    2, fact broadcast gone, SortMergeJoin LeftAnti gone.

    Round 17 (VERDICT r16 item 2): ``multi_supp`` no longer aggregates
    the FULL lineitem table — only lineitems of 'F'-status orders can
    survive the later semi-join (``late``'s keys all come from 'F'
    orders, and the inner join on the UNIQUE o_orderkey neither drops
    nor duplicates lineitem rows within a kept order, so per-order
    min/max are unchanged). One joined frame carries a ``__late`` flag
    and is lazily localCheckpointed (branched lineage: it feeds the
    multi-supplier aggregate, the sole-late aggregate, and the probe
    side — guide §2.4/§3.2); the fact table is now scanned ONCE per
    run (was 2), and the per-order aggregate runs over the ~half of
    lineitem that the order-status filter keeps."""
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    joined = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
            ).alias("__late"),
        )
        .localCheckpoint(eager=False)
    )
    late = joined.filter(F.col("__late")).select("l_orderkey", "l_suppkey")
    multi_supp = (
        joined.groupBy("l_orderkey")
        .agg(F.min("l_suppkey").alias("__lo"), F.max("l_suppkey").alias("__hi"))
        .filter(F.col("__lo") != F.col("__hi"))
        .select(F.col("l_orderkey").alias("o2_ok"))
    )
    sole_late = (
        late.groupBy("l_orderkey")
        .agg(F.min("l_suppkey").alias("__lo"), F.max("l_suppkey").alias("__hi"))
        .filter(F.col("__lo") == F.col("__hi"))
        .select(F.col("l_orderkey").alias("o3_ok"))
    )
    l1 = late.join(
        multi_supp, F.col("o2_ok") == F.col("l_orderkey"), "leftsemi"
    ).join(sole_late, F.col("o3_ok") == F.col("l_orderkey"), "leftsemi")
    sup = F.broadcast(t(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        l1.join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc_nulls_last(), F.col("s_name").asc_nulls_last())
        .limit(20)
    )


def _bucketed_t21_pair(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Stage the t21 fact columns once per (session, sf_dir) as
    orderkey-bucketed tables (8 buckets, bucket-sorted). Every leg of
    t21's double self-join keys on orderkey, so the bucketed layout
    removes BOTH fact-fact Exchanges — the shuffle is paid once at
    write time (the s15 pattern applied to the suite's known heavy
    shape, SCALING.md r9 t21 note)."""
    import hashlib

    key = hashlib.md5(f"t21:{sf_dir}".encode()).hexdigest()[:8]
    li_name, ord_name = f"li21_bkt_{key}", f"ord21_bkt_{key}"
    if not spark.catalog.tableExists(li_name):
        import os as _os
        import tempfile as _tempfile

        base = _tempfile.mkdtemp(prefix="dss_bucketed_t21_")
        (
            t(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_suppkey", "l_shipdate")
            .write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", _os.path.join(base, li_name))
            .saveAsTable(li_name)
        )
        (
            t(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderdate", "o_orderstatus")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", _os.path.join(base, ord_name))
            .saveAsTable(ord_name)
        )
    return li_name, ord_name


@query(
    "t21b_waiting_supplier_bucketed",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC NULLS LAST, s_name ASC NULLS LAST
    LIMIT 20
    """,
)
def t21b_waiting_supplier_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """t21 over the orderkey-bucketed layout (VERDICT r9 item 4): same
    result, same oracle, different physical plan — both fact-fact
    self-join legs and the orders join arrive pre-partitioned on the
    bucket key, so the plan carries ZERO Exchange nodes on the orderkey
    legs (plan-asserted, tests/test_plans.py). At 100x this removes the
    2x shuffle of the suite's heaviest shape."""
    li_name, ord_name = _bucketed_t21_pair(spark, sf_dir)
    orders = spark.table(ord_name).filter(F.col("o_orderstatus") == "F")
    li = spark.table(li_name)
    late = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
        )
        .select("l_orderkey", "l_suppkey")
    )
    other = spark.table(li_name).select(
        F.col("l_orderkey").alias("o2_ok"), F.col("l_suppkey").alias("o2_sk")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o3_ok"), F.col("l_suppkey").alias("o3_sk")
    )
    l1 = (
        late.join(
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
    )
    sup = F.broadcast(
        t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return (
        l1.join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(
            F.col("numwait").desc_nulls_last(),
            F.col("s_name").asc_nulls_last(),
        )
        .limit(20)
    )


@query(
    "t22_global_sales_opportunity",
    oracle="""
    WITH stats AS (
      SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s, count(*) AS c
      FROM customer WHERE c_acctbal > 0.0)
    SELECT c_nationkey AS cntrycode, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, stats
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * c > s
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    ORDER BY c_nationkey ASC NULLS LAST
    """,
)
def t22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analog (nationkey stands in for the missing phone
    country code; "no orders" scoped to since-2000 because every
    customer has some order). The above-average-balance threshold is
    cross-multiplied (`bal * count > sum`) so the comparison is exact
    decimal, immune to double summation order; the anti-join prunes
    orders to the date range first."""
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    stats = F.broadcast(
        cust.filter(F.col("c_acctbal") > 0.0).agg(
            F.sum(_dec("c_acctbal")).alias("s"), F.count(F.lit(1)).alias("c")
        )
    )
    recent = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(stats)
        .filter(_dec("c_acctbal") * F.col("c") > F.col("s"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "leftanti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy(F.col("cntrycode").asc_nulls_last())
    )


@query(
    "t02_min_cost_supplier",
    oracle="""
    WITH eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    offers AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem JOIN eu ON l_suppkey = s_suppkey
      GROUP BY l_partkey, l_suppkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, unit_cost
    FROM part
    JOIN offers ON pk = p_partkey
    JOIN eu ON sk = s_suppkey
    WHERE p_size = 15 AND p_type = 'STANDARD'
      AND unit_cost = (SELECT min(unit_cost) FROM offers o2 WHERE o2.pk = p_partkey)
    ORDER BY s_acctbal DESC NULLS LAST, n_name ASC NULLS LAST,
             s_name ASC NULLS LAST, p_partkey ASC NULLS LAST
    """,
)
def t02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog (no partsupp in the corpus, FIXTURES.md — the
    observed lineitem unit price stands in for ps_supplycost). The
    correlated `= (SELECT min …)` becomes a window min over the offers
    aggregate — one shuffle on partkey, no self-join. Unit cost is one
    double division per row — IEEE-identical in both engines, and min()
    never sums, so equality is exact.

    Scale shape: the supplier→nation→region chain is a broadcast
    (thousands of rows at any SF); the only fact shuffle is the
    (partkey, suppkey) partial agg, and the per-part min reuses that
    tiny aggregate — no second pass over lineitem."""
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = F.broadcast(
        t(spark, sf_dir, "supplier")
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        t(spark, sf_dir, "lineitem")
        .join(eu.select("s_suppkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    parts = F.broadcast(
        t(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_brand")
    )
    best = offers.withColumn(
        "best_cost", F.min("unit_cost").over(Window.partitionBy("pk"))
    ).filter(F.col("unit_cost") == F.col("best_cost"))
    return (
        parts.join(best, F.col("pk") == F.col("p_partkey"))
        .join(eu, F.col("sk") == F.col("s_suppkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "unit_cost")
        .orderBy(
            F.col("s_acctbal").desc_nulls_last(),
            F.col("n_name").asc_nulls_last(),
            F.col("s_name").asc_nulls_last(),
            F.col("p_partkey").asc_nulls_last(),
        )
    )


@query(
    "t11_important_part_value",
    oracle="""
    WITH natl AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
               AS value_dec
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_7')
      GROUP BY l_partkey)
    SELECT l_partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM natl, (SELECT sum(value_dec) AS total FROM natl)
    WHERE value_dec * 1000 > total
    ORDER BY part_value DESC NULLS LAST, l_partkey ASC NULLS LAST
    """,
)
def t11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog (lineitem revenue per part stands in for the
    missing partsupp value). The HAVING-vs-global-sum threshold is
    cross-multiplied (`value * 1000 > total`) so both engines compare
    exact decimals. The global total is a one-row broadcast reused from
    the same partial aggregate — lineitem is scanned once."""
    nat = F.broadcast(
        t(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_3", "NATION_7"))
    )
    sup = F.broadcast(
        t(spark, sf_dir, "supplier")
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    natl = (
        t(spark, sf_dir, "lineitem")
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_revenue()).alias("value_dec"))
    )
    total = F.broadcast(natl.agg(F.sum("value_dec").alias("total")))
    return (
        natl.crossJoin(total)
        .filter(F.col("value_dec") * 1000 > F.col("total"))
        .select("l_partkey", F.col("value_dec").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc_nulls_last(), F.col("l_partkey").asc_nulls_last())
    )


@query(
    "t12_priority_lines",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag ASC NULLS LAST
    """,
)
def t12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analog (l_returnflag stands in for the missing
    l_shipmode). Conditional counts via sum(CASE …) — integer-exact, no
    float hazard. The ship-date filter pushes to the lineitem scan; the
    orders join carries only (o_orderkey, o_orderpriority) after column
    pruning, and the final agg is 3 groups — partial map-side combine
    collapses it before the shuffle."""
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy(F.col("l_returnflag").asc_nulls_last())
    )


@query(
    "t16_supplier_part_count",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC NULLS LAST, p_brand ASC NULLS LAST,
             p_type ASC NULLS LAST, p_size ASC NULLS LAST
    """,
)
def t16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analog: distinct-supplier counts per part attribute,
    excluding a supplier blocklist. NOT IN on a never-null key is a
    broadcast anti join (blocklist is tiny at any SF); the part filter
    broadcasts too, so lineitem shuffles once — on the grouping keys for
    the count-distinct expand."""
    bad = F.broadcast(
        t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    parts = F.broadcast(
        t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "leftanti")
        .join(parts, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc_nulls_last(),
            F.col("p_brand").asc_nulls_last(),
            F.col("p_type").asc_nulls_last(),
            F.col("p_size").asc_nulls_last(),
        )
    )


@query(
    "t20_potential_promotion",
    oracle="""
    WITH qty AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS supp_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey),
    tot AS (
      SELECT l_partkey AS pk, sum(supp_qty) AS total_qty
      FROM qty GROUP BY l_partkey)
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM qty
        JOIN tot ON pk = l_partkey
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'small%' AND supp_qty * 2 > total_qty)
    ORDER BY s_name ASC NULLS LAST
    """,
)
def t20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analog (a supplier's own 1997 shipped share of a part
    stands in for ps_availqty vs half the part's volume — no partsupp in
    the corpus). The correlated `> 0.5 * sum(...)` is cross-multiplied
    to exact decimals (`supp_qty * 2 > total_qty`). One lineitem scan
    feeds both the per-(part,supp) and per-part aggregates; the IN
    subquery is a left-semi join on s_suppkey, and the part-name filter
    broadcasts."""
    date_lo = F.lit("1997-01-01").cast("timestamp")
    date_hi = F.lit("1998-01-01").cast("timestamp")
    qty = (
        t(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= date_lo) & (F.col("l_shipdate") < date_hi))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("supp_qty"))
    )
    tot = qty.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("supp_qty").alias("total_qty")
    )
    small = F.broadcast(
        t(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select("p_partkey")
    )
    dominant = (
        qty.join(tot, F.col("pk") == F.col("l_partkey"))
        .join(small, F.col("p_partkey") == F.col("l_partkey"))
        .filter(F.col("supp_qty") * 2 > F.col("total_qty"))
        .select("l_suppkey")
    )
    nat = F.broadcast(
        t(spark, sf_dir, "nation").filter(
            F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4")
        )
    )
    return (
        t(spark, sf_dir, "supplier")
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "leftsemi")
        .select("s_name", "n_name")
        .orderBy(F.col("s_name").asc_nulls_last())
    )
