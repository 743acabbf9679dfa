"""Declared queries for the UDF surface (§2.11) and file sinks (S12),
plus the named-window clause (W8, main.go:512).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_server_spark.catalog import query
from duckdb_server_spark.functions.udfs import register_udfs, sigmoid
from duckdb_server_spark.session import load_table as t
from duckdb_server_spark.sources import write_parquet

# ---------------------------------------------------------------------------
# §2.11 — UDF / UDAF / UDTF
# ---------------------------------------------------------------------------


@query(
    "fn_pandas_udf_scalar",
    oracle="""
    SELECT event_id, round(1.0 / (1.0 + exp(-CAST(value AS DOUBLE))), 6) AS score
    FROM events WHERE event_id < 500
    """,
)
def fn_pandas_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar Pandas UDF (Arrow batches): the sanctioned Python
    escape hatch — deterministic, so it gets a full oracle."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return ev.select(
        "event_id", F.round(sigmoid(F.col("value").cast("double")), 6).alias("score")
    )


@query(
    "fn_pandas_udaf",
    oracle="""
    SELECT l_returnflag,
           round(exp(avg(ln(CAST(l_quantity AS DOUBLE)))), 6) AS geo_mean_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def fn_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg Pandas UDF (UDAF surface). The oracle uses the algebraic
    identity exp(avg(ln x)); ln/avg/exp in double on both sides, rounded."""
    from duckdb_server_spark.functions.udfs import geometric_mean

    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(geometric_mean(F.col("l_quantity").cast("double")), 6).alias(
            "geo_mean_qty"
        )
    )


@query(
    "fn_udtf_lateral",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS words
      FROM documents WHERE doc_id < 100)
    SELECT doc_id, i.range AS pos, words[i.range] AS tok
    FROM w, range(1, 6) i
    WHERE i.range <= len(words)
    """,
)
def fn_udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via LATERAL — the table-function analog of
    ``duckdb_extensions()`` (main.go:77): each doc row expands to ≤5
    (pos, tok) rows."""
    register_udfs(spark)
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    docs.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, tks.pos, tks.tok
        FROM __udtf_docs d, LATERAL first_tokens(d.text) tks
        """
    )


# ---------------------------------------------------------------------------
# S12 — persistent file sink (COPY … TO analog; init/ETL phase)
# ---------------------------------------------------------------------------


@query(
    "s12_parquet_sink_roundtrip",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def s12_parquet_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write a filtered table to a partitioned parquet layout, read it
    back, aggregate — proves the sink path (S12) and that the hive
    partition columns survive the roundtrip. Partitioning by the low-
    cardinality priority column is the layout that prunes at read time."""
    out = os.path.join(
        tempfile.gettempdir(), f"dss_sink_orders_{abs(hash(sf_dir))}"
    )
    src = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    write_parquet(src, out, partition_by=("o_orderpriority",))
    back = spark.read.parquet(out)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
    )


@query(
    "s12_csv_sink_roundtrip",
    oracle="""
    SELECT n_regionkey, count(*) AS n_nations
    FROM nation GROUP BY n_regionkey
    """,
)
def s12_csv_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + schema-inferred re-scan (S12 + S2)."""
    out = os.path.join(tempfile.gettempdir(), f"dss_sink_nation_{abs(hash(sf_dir))}")
    t(spark, sf_dir, "nation").write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.option("header", True).option("inferSchema", True).csv(out)
    return back.groupBy("n_regionkey").agg(F.count(F.lit(1)).alias("n_nations"))


# ---------------------------------------------------------------------------
# W8 — named WINDOW clause reuse (main.go:512)
# ---------------------------------------------------------------------------


@query(
    "w08_named_window",
    oracle="""
    SELECT event_id,
           row_number() OVER w AS rn,
           round(sum(value) OVER w, 2) AS running_value
    FROM events
    WHERE user_id = 1
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id ASC NULLS LAST)
    """,
)
def w08_named_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named ``WINDOW w AS (…)`` reused by two expressions — Spark SQL
    supports the clause natively; same SQL text runs on both engines."""
    t(spark, sf_dir, "events").createOrReplaceTempView("__w08_events")
    return spark.sql(
        """
        SELECT event_id,
               row_number() OVER w AS rn,
               round(sum(value) OVER w, 2) AS running_value
        FROM __w08_events
        WHERE user_id = 1
        WINDOW w AS (PARTITION BY user_id ORDER BY event_id ASC NULLS LAST)
        """
    )


@query(
    "s13_merge_upsert",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS new_price
      FROM orders WHERE o_orderkey % 100 = 0
      UNION ALL
      SELECT -(range + 1) AS o_orderkey,
             CAST(1000 AS DECIMAL(18,2)) AS new_price
      FROM range(50))
    SELECT coalesce(o.o_orderkey, u.o_orderkey) AS o_orderkey,
           CAST(coalesce(u.new_price, CAST(o.o_totalprice AS DECIMAL(18,2)))
                AS DOUBLE) AS merged_price,
           CAST(CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                     WHEN u.o_orderkey IS NULL THEN 'keep'
                     ELSE 'update' END AS VARCHAR) AS action
    FROM orders o FULL JOIN updates u ON o.o_orderkey = u.o_orderkey
    ORDER BY o_orderkey ASC NULLS LAST
    """,
)
def s13_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE / upsert analog. The reference declares INSERT/UPDATE/DELETE
    (main.go:440,504,404) but serves read-only (main.go:61) — mutation is
    an init-phase concern. On immutable parquet the idiomatic Spark form
    is copy-on-write, decomposed to keep every join broadcastable — a
    naive FULL OUTER join forbids broadcast (Spark rejects the hint:
    "build right for full outer join") and forces a sort-merge shuffle of
    the whole target:

    - WHEN MATCHED / NOT MATCHED BY SOURCE → target LEFT JOIN broadcast
      (updates): a map-side join over the target scan, zero shuffle;
    - NOT MATCHED BY TARGET → updates ANTI JOIN target on the key: the
      target side is column-pruned to the key alone before the shuffle.

    At real scale a lakehouse table format turns this into file-level
    copy-on-write; the join core is identical."""
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    updates = (
        orders.filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            (F.col("o_totalprice").cast("decimal(18,2)") * 2).alias("new_price"),
        )
        .unionByName(
            spark.range(0, 50).select(
                (-(F.col("id") + 1)).alias("o_orderkey"),
                F.lit(1000).cast("decimal(18,2)").alias("new_price"),
            )
        )
    )
    o, u = orders.alias("o"), F.broadcast(updates.alias("u"))
    merged = o.join(u, F.col("o.o_orderkey") == F.col("u.o_orderkey"), "left").select(
        F.col("o.o_orderkey").alias("o_orderkey"),
        F.coalesce(
            F.col("u.new_price"), F.col("o.o_totalprice").cast("decimal(18,2)")
        )
        .cast("double")
        .alias("merged_price"),
        F.when(F.col("u.o_orderkey").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
    )
    inserts = updates.join(
        orders.select("o_orderkey"), "o_orderkey", "leftanti"
    ).select(
        "o_orderkey",
        F.col("new_price").cast("double").alias("merged_price"),
        F.lit("insert").alias("action"),
    )
    return merged.unionByName(inserts).orderBy(F.col("o_orderkey").asc_nulls_last())


@query(
    "s12_orc_sink_roundtrip",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_customers,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS balance
    FROM customer GROUP BY c_mktsegment
    """,
)
def s12_orc_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + re-scan (S12 on Spark's second columnar format): same
    predicate-pushdown/column-pruning machinery as parquet, exercised so
    a user migrating ORC warehouses keeps their layout. The oracle runs
    on the parquet view — the roundtrip must be lossless."""
    out = os.path.join(tempfile.gettempdir(), f"dss_sink_cust_orc_{abs(hash(sf_dir))}")
    t(spark, sf_dir, "customer").write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("balance"),
    )


@query(
    "s12_json_sink_roundtrip",
    oracle="""
    SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey
    """,
)
def s12_json_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + schema-inferred re-scan (S12 + S3) — the
    interchange format path; completes the sink matrix (parquet, CSV,
    ORC, JSON)."""
    out = os.path.join(tempfile.gettempdir(), f"dss_sink_region_json_{abs(hash(sf_dir))}")
    t(spark, sf_dir, "region").select("r_regionkey", "r_name").write.mode(
        "overwrite"
    ).json(out)
    back = spark.read.json(out)
    return back.select("r_regionkey", "r_name").orderBy(
        F.col("r_regionkey").asc_nulls_last()
    )
