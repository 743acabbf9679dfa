"""Numeric scalar functions — the reference's declared list (main.go:515-519):
ACOS..TANH, CEIL/FLOOR, DEGREES/RADIANS, EXP/LN/LOG*, MOD, PI, POW, SQRT,
TRUNC. Spark names via functions/scalar.py; numeric TRUNC is the custom
helper (Spark trunc is date-only).

Transcendentals are rounded to 6 decimals: JVM Math and C libm may differ
in the last ulp (values are irrational, so a rounding tie is measure-zero).
sqrt/floor/ceil/mod/pow-of-integers are IEEE-exact → unrounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_server_spark.catalog import query
from duckdb_server_spark.functions.scalar import trunc_numeric
from duckdb_server_spark.session import load_table as t


@query(
    "fn_trig",
    oracle="""
    SELECT p_partkey,
           round(sin(x), 6) AS sin_x, round(cos(x), 6) AS cos_x,
           round(tan(x), 6) AS tan_x,
           round(asin(x), 6) AS asin_x, round(acos(x), 6) AS acos_x,
           round(atan(x), 6) AS atan_x,
           round(atan2(x, 0.5), 6) AS atan2_x,
           round((exp(x) - exp(-x)) / 2, 6) AS sinh_x,
           round((exp(x) + exp(-x)) / 2, 6) AS cosh_x,
           round((exp(x) - exp(-x)) / (exp(x) + exp(-x)), 6) AS tanh_x,
           round(ln(x + sqrt(x * x + 1)), 6) AS asinh_x,
           round(0.5 * ln((1 + x * 0.9) / (1 - x * 0.9)), 6) AS atanh_x,
           round(ln((1 + x) + sqrt((1 + x) * (1 + x) - 1)), 6) AS acosh_x
    FROM (SELECT p_partkey, p_size / 51.0 AS x FROM part)
    ORDER BY p_partkey ASC NULLS LAST
    """,
)
def fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_size") / 51.0).alias("x")
    )
    x = F.col("x")
    return p.select(
        "p_partkey",
        F.round(F.sin(x), 6).alias("sin_x"),
        F.round(F.cos(x), 6).alias("cos_x"),
        F.round(F.tan(x), 6).alias("tan_x"),
        F.round(F.asin(x), 6).alias("asin_x"),
        F.round(F.acos(x), 6).alias("acos_x"),
        F.round(F.atan(x), 6).alias("atan_x"),
        F.round(F.atan2(x, F.lit(0.5)), 6).alias("atan2_x"),
        F.round(F.sinh(x), 6).alias("sinh_x"),
        F.round(F.cosh(x), 6).alias("cosh_x"),
        F.round(F.tanh(x), 6).alias("tanh_x"),
        F.round(F.asinh(x), 6).alias("asinh_x"),
        F.round(F.atanh(x * 0.9), 6).alias("atanh_x"),
        F.round(F.acosh(1 + x), 6).alias("acosh_x"),
    ).orderBy(F.col("p_partkey").asc_nulls_last())


@query(
    "fn_numeric_core",
    oracle="""
    SELECT p_partkey,
           ceil(p_retailprice) AS ceil_price,
           floor(p_retailprice) AS floor_price,
           round(exp(p_size / 25.0), 6) AS exp_x,
           round(ln(p_retailprice), 6) AS ln_price,
           round(log10(p_retailprice), 6) AS log10_price,
           round(log2(p_retailprice), 6) AS log2_price,
           mod(p_size, 7) AS mod_size,
           round(pi(), 6) AS pi_val,
           pow(p_size, 2) AS size_sq,
           sqrt(p_size) AS sqrt_size,
           round(degrees(p_size / 51.0), 6) AS deg_x,
           round(radians(p_size), 6) AS rad_size,
           trunc(p_retailprice * 10) / 10 AS trunc1_price,
           CAST(trunc(p_retailprice) AS DOUBLE) AS trunc0_price
    FROM part
    ORDER BY p_partkey ASC NULLS LAST
    """,
)
def fn_numeric_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    size = F.col("p_size")
    price = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        F.ceil(price).cast("double").alias("ceil_price"),
        F.floor(price).cast("double").alias("floor_price"),
        F.round(F.exp(size / 25.0), 6).alias("exp_x"),
        F.round(F.log(price), 6).alias("ln_price"),
        F.round(F.log10(price), 6).alias("log10_price"),
        F.round(F.log2(price), 6).alias("log2_price"),
        F.pmod(size, F.lit(7)).alias("mod_size"),
        F.round(F.lit(3.14159265358979), 6).alias("pi_val"),
        F.pow(size, 2).alias("size_sq"),
        F.sqrt(size.cast("double")).alias("sqrt_size"),
        F.round(F.degrees(size / 51.0), 6).alias("deg_x"),
        F.round(F.radians(size), 6).alias("rad_size"),
        (trunc_numeric(price, 1)).alias("trunc1_price"),
        trunc_numeric(price, 0).alias("trunc0_price"),
    ).orderBy(F.col("p_partkey").asc_nulls_last())


@query(
    "fn_conditional",
    oracle="""
    SELECT c_custkey,
           coalesce(NULL, c_mktsegment, 'UNKNOWN') AS seg,
           nullif(c_mktsegment, 'BUILDING') AS seg_nb,
           ifnull(nullif(c_mktsegment, 'BUILDING'), 'WAS_BUILDING') AS seg_label,
           greatest(c_acctbal, 0.0) AS bal_floor0,
           least(c_acctbal, 5000.0) AS bal_cap5k,
           md5(c_name) AS name_md5
    FROM customer
    ORDER BY c_custkey ASC NULLS LAST
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.lit(None), F.col("c_mktsegment"), F.lit("UNKNOWN")).alias("seg"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_nb"),
        F.ifnull(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("WAS_BUILDING")
        ).alias("seg_label"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("c_acctbal"), F.lit(5000.0)).alias("bal_cap5k"),
        F.md5(F.col("c_name")).alias("name_md5"),
    ).orderBy(F.col("c_custkey").asc_nulls_last())
