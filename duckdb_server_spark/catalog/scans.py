"""Scans + projections/filters/predicates (SURVEY.md §2.1 S1-S7, §2.2 P1-P14).

Every capability here is reachable in the reference via the verbatim SQL
passthrough (main.go:229); anchors per row are cited in SURVEY.md. Spark
side is pure DataFrame API so Catalyst gets full pushdown/pruning freedom —
``plans.assert_pushdown`` checks the parquet scans actually receive the
filters at bench time.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_server_spark.catalog import query
from duckdb_server_spark.functions.scalar import glob_match
from duckdb_server_spark.session import load_table as t


# --- flagship (S1 + P1-P3 + A1 + A3 + O1): TPC-H-Q1-style pricing summary ---
@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS sum_disc_price,
           sum(l_quantity) / count(*) AS avg_qty,
           CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*)
             AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: filter → hash agg → sort on the fact table.

    At scale: the shipdate filter is pushed to the parquet scan (row-group
    skip), aggregation is partial+final over 2×~4 groups (tiny shuffle),
    sort is on the aggregated handful of rows — the plan survives 100×.

    Money columns are summed as DECIMAL(18,2) (exact, partition-order-
    independent) and cast back to double — Spark's parallel double
    summation is order-dependent and round() tie behavior differs between
    engines (determinism rules, SURVEY.md §5). Quantities are
    integer-valued doubles, exact under any summation order.
    """
    li = t(spark, sf_dir, "lineitem")
    price_dec = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_dec = F.col("l_discount").cast("decimal(18,2)")
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(price_dec).cast("double").alias("sum_base_price"),
            F.sum(price_dec * (F.lit(1) - disc_dec)).cast("double").alias("sum_disc_price"),
            (F.sum("l_quantity") / n).alias("avg_qty"),
            (F.sum(disc_dec).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy(F.col("l_returnflag").asc_nulls_last(), F.col("l_linestatus").asc_nulls_last())
    )


# --- S2: CSV scan with header+inference (DuckDB read_csv_auto analog) ---
@query(
    "s02_csv_scan",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    ORDER BY n_nationkey ASC NULLS LAST
    """,
)
def s02_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip an integer/string table through CSV to exercise the
    inferring CSV reader (S2). Int/string only — lossless through text."""
    out = os.path.join(tempfile.gettempdir(), "dss_csv_nation")
    t(spark, sf_dir, "nation").coalesce(1).write.mode("overwrite").option(
        "header", True
    ).csv(out)
    return (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .csv(out)
        .select(
            F.col("n_nationkey").cast("int"),
            "n_name",
            F.col("n_regionkey").cast("int"),
        )
        .orderBy(F.col("n_nationkey").asc_nulls_last())
    )


# --- S3: JSON scan (read_json_auto analog) ---
@query(
    "s03_json_scan",
    oracle="""
    SELECT r_regionkey, r_name FROM region
    ORDER BY r_regionkey ASC NULLS LAST
    """,
)
def s03_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = os.path.join(tempfile.gettempdir(), "dss_json_region")
    t(spark, sf_dir, "region").coalesce(1).write.mode("overwrite").json(out)
    return (
        spark.read.json(out)
        .select(F.col("r_regionkey").cast("int"), "r_name")
        .orderBy(F.col("r_regionkey").asc_nulls_last())
    )


# --- S5: views (CREATE VIEW analog, k8s/main.yaml:133) ---
@query(
    "s05_view",
    oracle="""
    WITH big_orders AS (SELECT * FROM orders WHERE o_totalprice > 100000)
    SELECT o_orderpriority, count(*) AS n FROM big_orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority ASC NULLS LAST
    """,
)
def s05_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 100000
    ).createOrReplaceTempView("dss_big_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n FROM dss_big_orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority ASC NULLS LAST
        """
    )


# --- S6: inline rows (VALUES, main.go:507; smoke query client/main.py:11) ---
@query(
    "s06_inline_values",
    oracle="""
    SELECT a, b FROM (VALUES (1, 'x'), (2, 'y'), (3, 'z')) AS v(a, b)
    ORDER BY a ASC NULLS LAST
    """,
)
def s06_inline_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        "SELECT a, b FROM VALUES (1, 'x'), (2, 'y'), (3, 'z') AS v(a, b) "
        "ORDER BY a ASC NULLS LAST"
    )


# --- S7: metadata-as-a-table (duckdb_extensions() analog, main.go:77) ---
@query(
    "s07_capability_registry",
    oracle="""
    SELECT extension_name, description FROM (VALUES
      ('core_sql', 'projection/filter/join/agg/window/setops/CTE'),
      ('csv', 'csv scan with inference (S2)'),
      ('dedup', 'exact/minhash/simhash dedup'),
      ('httpfs', 's3a object-store access (S8)'),
      ('json', 'json scan + json functions (S3)'),
      ('parquet', 'parquet scan + pushdown (S1)'),
      ('similarity', 'embedding cosine/L2 top-k'),
      ('streaming', 'structured streaming windows (§2.10)'),
      ('text', 'lang-id/quality/tokens/fingerprint')
    ) AS t(extension_name, description)
    ORDER BY extension_name ASC NULLS LAST
    """,
)
def s07_capability_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capability registry contents are part of the engine's declared
    surface (the duckdb_extensions() analog) — so the oracle pins them as
    a literal VALUES table (upgraded from rows-only in r1; keep in sync
    with session.register_capabilities)."""
    from duckdb_server_spark.session import register_capabilities

    return register_capabilities(spark).filter(F.col("installed")).select(
        "extension_name", "description"
    ).orderBy("extension_name")


# --- P1/P2: projection with alias + computed expressions ---
@query(
    "p01_projection_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_quantity * 2 AS double_qty,
           (l_quantity > 25 AND l_discount < 0.05) AS bulk_cheap
    FROM lineitem
    WHERE l_linenumber <= 2
    ORDER BY l_orderkey ASC NULLS LAST, l_linenumber ASC NULLS LAST
    """,
)
def p01_projection_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_linenumber") <= 2)
        .select(
            "l_orderkey",
            "l_linenumber",
            # raw IEEE result — same expression tree evaluates bit-identically
            # on both engines; round() tie behavior diverges, so don't round
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("charge"),
            (F.col("l_quantity") * 2).alias("double_qty"),
            ((F.col("l_quantity") > 25) & (F.col("l_discount") < 0.05)).alias("bulk_cheap"),
        )
        .orderBy(F.col("l_orderkey").asc_nulls_last(), F.col("l_linenumber").asc_nulls_last())
    )


# --- P3: filter ---
@query(
    "p03_filter",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice >= 50000
    ORDER BY o_orderkey ASC NULLS LAST
    """,
)
def p03_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") >= 50000))
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy(F.col("o_orderkey").asc_nulls_last())
    )


# --- P4: DISTINCT ---
@query(
    "p04_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST
    """,
)
def p04_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy(F.col("l_returnflag").asc_nulls_last(), F.col("l_linestatus").asc_nulls_last())
    )


# --- P5: IN (list) and IN (subquery) ---
@query(
    "p05_in_list",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
    ORDER BY c_custkey ASC NULLS LAST
    """,
)
def p05_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY", "AUTOMOBILE"))
        .select("c_custkey", "c_mktsegment")
        .orderBy(F.col("c_custkey").asc_nulls_last())
    )


@query(
    "p05_in_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    ORDER BY o_orderkey ASC NULLS LAST
    """,
)
def p05_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) → left-semi join (what Catalyst plans for IN anyway).
    The rich-customer side is small → Spark broadcast-converts it via AQE."""
    orders = t(spark, sf_dir, "orders")
    rich = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return (
        orders.join(rich, orders.o_custkey == rich.c_custkey, "leftsemi")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_orderkey").asc_nulls_last())
    )


# --- P6: BETWEEN ---
@query(
    "p06_between",
    oracle="""
    SELECT p_partkey, p_size FROM part
    WHERE p_size BETWEEN 10 AND 20
    ORDER BY p_partkey ASC NULLS LAST
    """,
)
def p06_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "part")
        .filter(F.col("p_size").between(10, 20))
        .select("p_partkey", "p_size")
        .orderBy(F.col("p_partkey").asc_nulls_last())
    )


# --- P7: LIKE ---
@query(
    "p07_like",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_name LIKE '%gold%' OR p_name LIKE 'sm_ll%'
    ORDER BY p_partkey ASC NULLS LAST
    """,
)
def p07_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").like("%gold%") | F.col("p_name").like("sm_ll%"))
        .select("p_partkey", "p_name")
        .orderBy(F.col("p_partkey").asc_nulls_last())
    )


# --- P8: GLOB (main.go:428) via glob→regex translation ---
@query(
    "p08_glob",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_name GLOB '*re*'
    ORDER BY p_partkey ASC NULLS LAST
    """,
)
def p08_glob(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "part")
        .filter(glob_match(F.col("p_name"), "*re*"))
        .select("p_partkey", "p_name")
        .orderBy(F.col("p_partkey").asc_nulls_last())
    )


# --- P9: REGEXP (main.go:479) ---
@query(
    "p09_regexp",
    oracle="""
    SELECT p_partkey, p_type FROM part
    WHERE regexp_matches(p_type, '^(STANDARD|SMALL).*BRASS$')
    ORDER BY p_partkey ASC NULLS LAST
    """,
)
def p09_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "part")
        .filter(F.col("p_type").rlike("^(STANDARD|SMALL).*BRASS$"))
        .select("p_partkey", "p_type")
        .orderBy(F.col("p_partkey").asc_nulls_last())
    )


# --- P10: IS [NOT] NULL ---
@query(
    "p10_null_checks",
    oracle="""
    SELECT
      count(*) FILTER (WHERE c_acctbal IS NOT NULL) AS n_notnull,
      count(*) FILTER (WHERE c_acctbal IS NULL) AS n_null
    FROM customer
    """,
)
def p10_null_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.agg(
        F.count(F.when(F.col("c_acctbal").isNotNull(), 1)).alias("n_notnull"),
        F.count(F.when(F.col("c_acctbal").isNull(), 1)).alias("n_null"),
    )


# --- P11: EXISTS / correlated subquery (main.go:417) ---
@query(
    "p11_exists",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000
    )
    ORDER BY c_custkey ASC NULLS LAST
    """,
)
def p11_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS decorrelates to a left-semi join on the correlation key."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "leftsemi")
        .select("c_custkey", "c_name")
        .orderBy(F.col("c_custkey").asc_nulls_last())
    )


# --- P12: CASE WHEN ---
@query(
    "p12_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 150000 THEN 'high'
                WHEN o_totalprice >= 50000 THEN 'mid'
                ELSE 'low' END AS price_band
    FROM orders
    ORDER BY o_orderkey ASC NULLS LAST
    """,
)
def p12_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.when(F.col("o_totalprice") >= 150000, "high")
            .when(F.col("o_totalprice") >= 50000, "mid")
            .otherwise("low")
            .alias("price_band"),
        )
        .orderBy(F.col("o_orderkey").asc_nulls_last())
    )


# --- P13: CAST (main.go:387, declared BIGINT→INTEGER main.go:522-524) ---
@query(
    "p13_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(floor(o_totalprice) AS BIGINT) AS price_int,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_day
    FROM orders
    ORDER BY o_orderkey ASC NULLS LAST
    """,
)
def p13_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Note: double→int casts diverge (DuckDB rounds, Spark truncates), so
    the declared query floors first — deterministic on both engines. The
    date cast round-trips back to TIMESTAMP at output: DuckDB's pandas
    bridge renders DATE as datetime64 while Spark yields datetime.date
    objects, which the driver's value hash treats as different."""
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.floor("o_totalprice").cast("bigint").alias("price_int"),
            F.col("o_orderkey").cast("string").alias("key_str"),
            F.col("o_orderdate").cast("date").cast("timestamp").alias("order_day"),
        )
        .orderBy(F.col("o_orderkey").asc_nulls_last())
    )


# --- P14: star EXCLUDE (main.go:415) → drop ---
@query(
    "p14_exclude",
    oracle="""
    SELECT * EXCLUDE (n_regionkey) FROM nation
    ORDER BY n_nationkey ASC NULLS LAST
    """,
)
def p14_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "nation")
        .drop("n_regionkey")
        .orderBy(F.col("n_nationkey").asc_nulls_last())
    )


@query(
    "s07b_range_series",
    oracle="""
    SELECT CAST(range AS BIGINT) AS n,
           CAST(range * range AS BIGINT) AS n_sq
    FROM range(0, 1000)
    ORDER BY n ASC NULLS LAST
    """,
)
def s07b_range_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series-generating table function (DuckDB `range()` /
    `generate_series`, reachable via passthrough main.go:229; SURVEY.md
    S7) → `spark.range`, which distributes the series across partitions
    with no data movement — the generator itself is the source."""
    return (
        spark.range(0, 1000)
        .select(
            F.col("id").alias("n"),
            (F.col("id") * F.col("id")).alias("n_sq"),
        )
        .orderBy(F.col("n").asc_nulls_last())
    )


@query(
    "p07b_ilike",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE lang ILIKE 'E%' OR text ILIKE '%THE FAST%'
    ORDER BY doc_id ASC NULLS LAST
    """,
)
def p07b_ilike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive LIKE (DuckDB ILIKE, reachable via passthrough
    main.go:229) → Column.ilike (Spark ≥3.3); stays a codegen'd string
    predicate, pushable like any LIKE."""
    d = t(spark, sf_dir, "documents")
    return (
        d.filter(F.col("lang").ilike("E%") | F.col("text").ilike("%THE FAST%"))
        .select("doc_id", "lang")
        .orderBy(F.col("doc_id").asc_nulls_last())
    )


@query(
    "p15_columns_regex",
    oracle="""
    SELECT COLUMNS('l_.*key'), l_linenumber FROM lineitem
    WHERE l_orderkey < 100
    ORDER BY l_orderkey ASC NULLS LAST, l_linenumber ASC NULLS LAST
    """,
)
def p15_columns_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB `COLUMNS('regex')` star-expansion → `df.colRegex`. Column
    pruning still reaches the scan: the regex resolves at analysis time
    to a concrete projection list."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(li.colRegex("`l_.*key`"), "l_linenumber").orderBy(
        F.col("l_orderkey").asc_nulls_last(), F.col("l_linenumber").asc_nulls_last()
    )


# --- P16: TRY_CAST (error-free casting, same keyword on both engines) ---
@query(
    "p16_try_cast",
    oracle="""
    SELECT p_partkey,
           try_cast(CASE WHEN p_partkey % 3 = 0 THEN 'not-a-number'
                         ELSE CAST(p_size AS VARCHAR) END AS INT) AS maybe_size,
           try_cast(p_name AS DOUBLE) AS name_num
    FROM part
    ORDER BY p_partkey ASC NULLS LAST
    """,
)
def p16_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``TRY_CAST`` (passthrough main.go:229; CAST keyword main.go:387)
    — NULL instead of error on bad input, on BOTH
    engines (under ANSI mode plain CAST raises in Spark, so this is the
    dialect feature users reach for)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr(
            "try_cast(CASE WHEN p_partkey % 3 = 0 THEN 'not-a-number' "
            "ELSE CAST(p_size AS STRING) END AS INT)"
        ).alias("maybe_size"),
        F.expr("try_cast(p_name AS DOUBLE)").alias("name_num"),
    ).orderBy(F.col("p_partkey").asc_nulls_last())


# --- P17: SELECT * REPLACE (DuckDB star-modifier dialect) ---
@query(
    "p17_star_replace",
    oracle="""
    SELECT * REPLACE (upper(n_name) AS n_name,
                      n_regionkey * 10 AS n_regionkey)
    FROM nation
    ORDER BY n_nationkey ASC NULLS LAST
    """,
)
def p17_star_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB ``SELECT * REPLACE (expr AS col)`` star modifier
    (reachable through the reference's SQL passthrough, main.go:229) —
    Spark has no ``* REPLACE`` syntax, so the equivalent is
    ``withColumn``, which substitutes the expression **in place**,
    preserving the star's column order exactly like the modifier does.
    Pure projection: column pruning and codegen are unaffected."""
    n = t(spark, sf_dir, "nation")
    return (
        n.withColumn("n_name", F.upper("n_name"))
        .withColumn("n_regionkey", F.col("n_regionkey") * F.lit(10))
        .orderBy(F.col("n_nationkey").asc_nulls_last())
    )


# --- S15: bucketed co-located join (storage layout eliminates the shuffle) ---
def _bucketed_pair(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Stage lineitem/orders once per (session, sf_dir) as bucketed tables
    (8 buckets on the join key, bucket-sorted). Bucketing metadata lives
    in the session catalog, so both sides of an equi-join on the bucket
    key arrive pre-partitioned and pre-sorted — Catalyst plans the join
    with NO Exchange and no per-query Sort (asserted in
    tests/test_plans.py). This is the 100 TB co-located-join pattern: pay
    the shuffle once at write time, never again per query."""
    import hashlib

    key = hashlib.md5(f"{sf_dir}".encode()).hexdigest()[:8]
    li_name, ord_name = f"li_bkt_{key}", f"ord_bkt_{key}"
    if not spark.catalog.tableExists(li_name):
        base = tempfile.mkdtemp(prefix="dss_bucketed_")
        (
            t(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_extendedprice", "l_discount")
            .write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", os.path.join(base, li_name))
            .saveAsTable(li_name)
        )
        (
            t(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderpriority")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", os.path.join(base, ord_name))
            .saveAsTable(ord_name)
        )
    return li_name, ord_name


@query(
    "s15_bucketed_join",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2))
                       - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority ASC NULLS LAST
    """,
)
def s15_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join two bucket-co-located tables on the bucket key (DuckDB gets
    the same effect from its single-node hash join; the reference serves
    it via passthrough main.go:229 — bucketing is the *distributed*
    re-expression of 'no data movement at query time'). Results are
    identical to the plain parquet join; the plan differs: zero Exchange
    nodes under a disabled broadcast threshold. Revenue summed in
    decimal(18,2) for order-independent exactness."""
    li_name, ord_name = _bucketed_pair(spark, sf_dir)
    li, od = spark.table(li_name), spark.table(ord_name)
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.col("o_orderpriority").asc_nulls_last())
    )


# --- S16: partition-pruned scan (hive-partitioned layout + pruning) ---
def _partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Stage events once per sf_dir as a hive-partitioned parquet layout
    (one directory per event_date). Stable on-disk key so concurrent
    sessions reuse the same staging."""
    import hashlib

    key = hashlib.md5(f"{sf_dir}".encode()).hexdigest()[:8]
    pdir = os.path.join(tempfile.gettempdir(), f"dss_part_events_{key}")
    if not os.path.exists(pdir):
        tmp = pdir + ".tmp"
        (
            t(spark, sf_dir, "events")
            .withColumn("event_date", F.to_date("ts"))
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(tmp)
        )
        os.replace(tmp, pdir)
    return pdir


@query(
    "s16_partition_pruning",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS sum_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-11'
    GROUP BY event_type
    ORDER BY event_type ASC NULLS LAST
    """,
)
def s16_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan a date-partitioned layout with a filter on the partition
    column: Catalyst prunes to the 7 matching directories at planning
    time — the scan never opens the other 23 days' files
    (PartitionFilters asserted in tests/test_plans.py). At 100 TB,
    date-partitioned ingest + partition pruning is the difference
    between scanning a week and scanning three years. DuckDB reaches the
    same rows via its own zone-map/row-group pruning on ts (the
    single-file analog)."""
    pdir = _partitioned_events(spark, sf_dir)
    ev = spark.read.parquet(pdir)
    return (
        ev.filter(
            F.col("event_date").between(F.lit("2024-01-05"), F.lit("2024-01-11"))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy(F.col("event_type").asc_nulls_last())
    )


# --- S17: time-dimension gap fill (dense calendar × sparse facts) ---
@query(
    "s17_time_series_gapfill",
    oracle="""
    WITH slots AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                    TIMESTAMP '2024-01-03 23:00:00',
                                    INTERVAL 1 HOUR)) AS slot
    ),
    hourly AS (
      SELECT date_trunc('hour', ts) AS slot,
             count(*) AS n_events,
             round(sum(value), 4) AS sum_value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-04'
      GROUP BY 1
    )
    SELECT s.slot,
           COALESCE(h.n_events, 0) AS n_events,
           COALESCE(h.sum_value, 0.0) AS sum_value
    FROM slots s LEFT JOIN hourly h USING (slot)
    ORDER BY slot ASC NULLS LAST
    """,
)
def s17_time_series_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series: a generated dense time dimension
    LEFT-joined to sparse facts, empty slots zero-filled — the standard
    time-series densification DuckDB spells as generate_series +
    LEFT JOIN (passthrough main.go:229) and Spark spells as
    sequence()+explode. Scale shape: the calendar side is tiny
    (hours, not rows) and broadcast; facts aggregate BEFORE the join,
    so the shuffle carries one row per non-empty slot."""
    slots = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-01-03 23:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("slot")
    )
    hourly = (
        t(spark, sf_dir, "events")
        .filter(
            (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-04").cast("timestamp"))
        )
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("slot"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    return (
        slots.join(hourly, "slot", "left")
        .select(
            "slot",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.coalesce(F.col("sum_value"), F.lit(0.0)).alias("sum_value"),
        )
        .orderBy(F.col("slot").asc_nulls_last())
    )
