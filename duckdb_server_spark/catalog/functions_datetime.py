"""Date/time functions (SURVEY.md §2.9): extract fields, date_trunc,
strftime↔date_format, make_date, interval arithmetic, date_diff, epoch.
CURRENT_DATE/TIME/TIMESTAMP are declared in the reference (main.go:397-399)
but nondeterministic → covered by the deterministic field/arithmetic surface
here. Session timezone is UTC on both engines (FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_server_spark.catalog import query
from duckdb_server_spark.session import load_table as t


@query(
    "fn_datetime_extract",
    oracle="""
    SELECT event_id,
           CAST(year(ts) AS INT) AS y,
           CAST(month(ts) AS INT) AS mo,
           CAST(day(ts) AS INT) AS d,
           CAST(hour(ts) AS INT) AS h,
           CAST(minute(ts) AS INT) AS mi,
           CAST(second(ts) AS INT) AS s,
           CAST(quarter(ts) AS INT) AS q,
           CAST(dayofyear(ts) AS INT) AS doy,
           CAST(week(ts) AS INT) AS wk
    FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
    ORDER BY event_id ASC NULLS LAST
    """,
)
def fn_datetime_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    ts = F.col("ts")
    return ev.select(
        "event_id",
        F.year(ts).alias("y"),
        F.month(ts).alias("mo"),
        F.dayofmonth(ts).alias("d"),
        F.hour(ts).alias("h"),
        F.minute(ts).alias("mi"),
        F.second(ts).alias("s"),
        F.quarter(ts).alias("q"),
        F.dayofyear(ts).alias("doy"),
        F.weekofyear(ts).alias("wk"),
    ).orderBy(F.col("event_id").asc_nulls_last())


@query(
    "fn_datetime_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS order_day,
           o_orderdate + INTERVAL 7 DAY AS plus_week,
           o_orderdate - INTERVAL 90 DAY AS minus_90d,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
           strftime(o_orderdate, '%Y|%m') AS year_month,
           CAST(make_date(2024, CAST(month(o_orderdate) AS INT), 1) AS TIMESTAMP)
             AS month_2024,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders
    ORDER BY o_orderkey ASC NULLS LAST
    """,
)
def fn_datetime_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", od).alias("order_month"),
        F.date_trunc("day", od).alias("order_day"),
        (od + F.expr("INTERVAL 7 DAY")).alias("plus_week"),
        (od - F.expr("INTERVAL 90 DAY")).alias("minus_90d"),
        F.datediff(od.cast("date"), F.lit("1995-01-01").cast("date")).cast("bigint").alias(
            "days_since_95"
        ),
        F.date_format(od, "yyyy-MM-dd").alias("iso_day"),
        F.date_format(od, "yyyy|MM").alias("year_month"),
        # DATE outputs become TIMESTAMP: DuckDB's pandas bridge renders DATE
        # as datetime64 while Spark yields datetime.date — a driver-hash
        # mismatch even when the dates are equal.
        F.make_date(F.lit(2024), F.month(od), F.lit(1)).cast("timestamp").alias("month_2024"),
        F.unix_timestamp(od).alias("epoch_s"),
    ).orderBy(F.col("o_orderkey").asc_nulls_last())


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           json_extract_string(props, '$.missing') AS missing_key
    FROM events
    ORDER BY event_id ASC NULLS LAST
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON access on the events.props JSON-string column (the DuckDB json
    extension analog, autoloaded in the reference via main.go:77-105)."""
    ev = t(spark, sf_dir, "events")
    props = F.col("props")
    return ev.select(
        "event_id",
        F.get_json_object(props, "$.k").alias("k_str"),
        F.get_json_object(props, "$.k").cast("int").alias("k_int"),
        F.get_json_object(props, "$.missing").alias("missing_key"),
    ).orderBy(F.col("event_id").asc_nulls_last())
