"""Scale-machinery queries: skew-salted aggregation and the custom
stateful streaming operator. Salting is a physical rewrite with identical
semantics, so it oracle-checks against plain SQL; the stateful operator
runs the REAL Structured Streaming path (availableNow, single batch) and
still hash-matches its batch oracle because state accumulates in exact
integer cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_server_spark.catalog import query
from duckdb_server_spark.operators.skew import salted_agg
from duckdb_server_spark.session import load_table as t


@query(
    "k01_salted_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           count(*) AS n_rows,
           CAST(min(l_quantity) AS DOUBLE) AS min_qty,
           CAST(max(l_quantity) AS DOUBLE) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def k01_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over a deliberately hot key
    (l_returnflag has 3 values — every row of a 100 TB fact table lands on
    3 reducers without the salt). Stage 1 spreads each key over 16 salt
    buckets; stage 2 merges partials. Same result as the plain GROUP BY."""
    li = t(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "total_price": F.sum(F.col("l_extendedprice").cast("decimal(18,2)")),
            "n_rows": F.count(F.lit(1)),
            "min_qty": F.min("l_quantity"),
            "max_qty": F.max("l_quantity"),
        },
        salt_buckets=16,
    )
    return out.select(
        "l_returnflag",
        F.col("total_price").cast("double").alias("total_price"),
        "n_rows",
        F.col("min_qty").cast("double").alias("min_qty"),
        F.col("max_qty").cast("double").alias("max_qty"),
    )


@query(
    "st_stateful_totals",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY user_id
    """,
)
def st_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState) on the REAL
    streaming path: per-user running (count, sum) state, drained with an
    availableNow trigger over a single staged file (one micro-batch ⇒ the
    update-mode emission equals the batch aggregate)."""
    from duckdb_server_spark import streaming as st
    from duckdb_server_spark.streaming.stateful import running_totals

    stream = st.read_events_stream(
        spark, sf_dir, with_watermark=None, single_file=True
    )
    return st.run_stream_to_memory(running_totals(stream), output_mode="update")


@query(
    "j07b_banded_range_join",
    oracle="""
    SELECT s_suppkey, count(*) AS n_matches
    FROM supplier s JOIN customer c
      ON c.c_acctbal BETWEEN s.s_acctbal - 50.0 AND s.s_acctbal + 50.0
    GROUP BY s_suppkey
    """,
)
def j07b_banded_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 at scale: the banded rewrite of an inequality join — band-id
    equi-join + exact post-filter instead of the O(N*M) nested loop Spark
    would otherwise plan. Identical semantics to the BETWEEN oracle."""
    from duckdb_server_spark.operators.rangejoin import banded_range_join

    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    supp = (
        t(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_acctbal")
        .withColumn("lo", F.col("s_acctbal") - 50.0)
        .withColumn("hi", F.col("s_acctbal") + 50.0)
    )
    joined = banded_range_join(
        cust, supp, left_point="c_acctbal", right_lo="lo", right_hi="hi",
        band_width=100.0,
    )
    return joined.groupBy("s_suppkey").agg(F.count(F.lit(1)).alias("n_matches"))


@query(
    "fn_map_in_arrow",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(sqrt(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 6) AS l2_norm
    FROM embeddings WHERE vec_id < 200
    """,
)
def fn_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the closest analog of how the reference moves data
    (raw Arrow record batches, main.go:241-243): the Python function
    receives pyarrow.RecordBatch objects directly, zero pandas
    conversion. Used here for batch-level vector math."""
    import math

    import pyarrow as pa

    def batch_norms(batches):
        for batch in batches:
            ids = batch.column("vec_id")
            embs = batch.column("embedding")
            dims, norms = [], []
            for emb in embs:
                vals = [float(v.as_py()) for v in emb]
                dims.append(len(vals))
                norms.append(round(math.sqrt(sum(v * v for v in vals)), 6))
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(dims, pa.int32()), pa.array(norms, pa.float64())],
                names=["vec_id", "dim", "l2_norm"],
            )

    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return emb.select("vec_id", "embedding").mapInArrow(
        batch_norms, "vec_id long, dim int, l2_norm double"
    )
