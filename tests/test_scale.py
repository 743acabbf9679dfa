"""Scale-machinery tests: bucketed co-located joins elide shuffles,
salted operators preserve semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_server_spark.operators.skew import salted_join
from duckdb_server_spark.session import load_table
from duckdb_server_spark.sources.bucketing import colocated_join, write_bucketed


def _final_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_elides_shuffle(spark, sf_dir):
    """Both sides bucketed by the join key with equal bucket counts →
    sort-merge join with NO Exchange (the 100 TB fact⋈fact layout)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "b_lineitem", "l_orderkey", num_buckets=8)
    write_bucketed(orders, "b_orders", "l_orderkey", num_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "b_lineitem", "b_orders", "l_orderkey")
        plan = _final_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    """Control: the same join over raw parquet shuffles both sides."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _final_plan(li.join(orders, "l_orderkey"))
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_matches_plain_join(spark, sf_dir):
    """salted_join is a physical rewrite: result must equal the plain join."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    supp = supp.withColumnRenamed("s_suppkey", "l_suppkey")
    plain = li.join(supp, "l_suppkey").groupBy("s_name").count()
    salted = salted_join(li, supp, "l_suppkey", salt_buckets=8).groupBy(
        "s_name"
    ).count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_partition_pruning_static_and_dynamic(spark, sf_dir):
    """Hive-partitioned layout (S12) must prune at read time: static
    filters become PartitionFilters, and a join against a filtered dim
    triggers Dynamic Partition Pruning — at 100 TB this is the difference
    between scanning one date partition and the whole table."""
    import os
    import tempfile

    from duckdb_server_spark.sources import write_parquet

    out = os.path.join(tempfile.gettempdir(), "dss_dpp_orders")
    orders = load_table(spark, sf_dir, "orders")
    write_parquet(orders, out, partition_by=("o_orderpriority",))
    fact = spark.read.parquet(out)

    # Static pruning: the partition predicate must NOT appear as a data
    # filter — it prunes directories before the scan.
    pruned = fact.filter(F.col("o_orderpriority") == "1-URGENT")
    text = pruned._jdf.queryExecution().executedPlan().toString()
    pruned.collect()
    assert "PartitionFilters: [isnotnull(o_orderpriority" in text or (
        "o_orderpriority" in text.split("PartitionFilters")[1].split("]")[0]
    ), "partition predicate must reach PartitionFilters"

    # Dynamic pruning: the dim filters on a NON-join column (so the
    # partition predicate cannot be inferred statically) — the planner
    # must inject a dynamicpruning subquery into the fact scan.
    dim = spark.createDataFrame(
        [("1-URGENT", 1), ("5-LOW", 0)], "o_orderpriority string, wanted int"
    ).filter(F.col("wanted") == 1)
    joined = fact.join(dim, "o_orderpriority").select("o_orderkey", "wanted")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), "DPP must be planned"


def test_global_index_is_parallel_and_exact(spark):
    """with_global_index must equal the single-partition rank without
    planning an unpartitioned window over the data."""
    from duckdb_server_spark.operators.rank import with_global_index

    df = spark.range(0, 10_000).select(
        (F.col("id") * 37 % 10_007).alias("k"), F.col("id").alias("payload")
    )
    ranked = with_global_index(df, ["k"], out="rn", num_partitions=8)
    rows = ranked.orderBy("rn").collect()
    assert [r.rn for r in rows] == list(range(1, 10_001))
    ks = [r.k for r in rows]
    assert ks == sorted(ks), "rank order must follow the key order"

    # The only unpartitioned window allowed is the #partitions-row
    # offset prefix-sum, never one over the input relation.
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "partitionBy=[__pid" in plan.replace(" ", "") or "__pid" in plan


def test_connected_components_topologies(spark):
    """Min-label CC on star + long chain + cycle: the 60-node chain
    converges only because of the pointer-jump step (plain one-hop
    propagation would need 60 rounds, > max_iter)."""
    from duckdb_server_spark.operators.components import connected_components

    edges = (
        [(100, k) for k in (1, 2, 3)]                    # star
        + [(10 + i, 11 + i) for i in range(60)]          # chain 10..70
        + [(200, 201), (201, 202), (202, 200)]           # cycle
    )
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.component for r in connected_components(df, max_iter=12).collect()}
    assert {got[k] for k in (100, 1, 2, 3)} == {1}
    assert {got[10 + i] for i in range(61)} == {10}
    assert {got[k] for k in (200, 201, 202)} == {200}


def test_aqe_splits_skewed_join(spark):
    """A 95%-one-key fact joined without broadcast must trigger AQE's
    skew-join split (SortMergeJoin(skew=true)): at 100 TB this is the
    difference between one straggler task owning half the shuffle and
    the runtime re-planning it into parallel chunks. Thresholds are
    lowered to make a 2M-row local shuffle legible to the detector."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.range(0, 2_000_000).select(
            F.when(F.col("id") % 100 < 95, 7).otherwise(F.col("id") % 1000).alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = fact.join(dim, "k").select(F.sum(F.col("v") + F.col("w")).alias("s"))
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE skew-join split must engage"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_group_topk_matches_plain_window(spark):
    """salted_group_topk must equal the unsalted per-group top-k, and its
    phase-1 window must partition by (group, salt) — no single-partition
    window over a skewed group. 90% of rows share one group."""
    from pyspark.sql import Window

    from duckdb_server_spark.operators.skew import salted_group_topk

    df = spark.range(0, 100_000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise("cold").alias("g"),
        F.col("id").alias("v"),
    )
    order = [F.md5(F.col("v").cast("string")).asc(), F.col("v").asc()]
    got = salted_group_topk(
        df, ["g"], order, k=25,
        salt_col=F.pmod(F.xxhash64("v"), F.lit(16)), salt_buckets=16,
    )
    w = Window.partitionBy("g").orderBy(*order)
    want = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 25)
        .drop("rn")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    plan = got._jdf.queryExecution().executedPlan().toString().replace(" ", "")
    assert "__salt" in plan, "phase-1 window must be salted"


def test_distributed_quantiles_no_group_materialization(spark):
    """exact_group_quantiles must match numpy's exact quantile_cont and
    plan neither a per-group pandas kernel (FlatMapGroupsInPandas) nor a
    single-partition window over the input relation — the two shapes
    that OOM on a huge group."""
    import numpy as np

    from duckdb_server_spark.operators.percentile import exact_group_quantiles

    df = spark.range(0, 200_000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise("cold").alias("g"),
        (F.sin(F.col("id").cast("double")) * 1000).alias("v"),
    )
    got = exact_group_quantiles(df, "g", "v", {"p50": 0.5, "p95": 0.95})
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    # every window in the plan must be partitioned (by __pid); no
    # unpartitioned window over the data relation
    for line in plan.splitlines():
        if "Window " in line and "partitionBy" not in line.replace(
            "PartitionBy", "partitionBy"
        ):
            assert "windowspecdefinition(__pid" in line or "__pid" in line, line

    rows = {r.g: (r.p50, r.p95) for r in got.collect()}
    pdf = df.toPandas()
    for g, grp in pdf.groupby("g"):
        v = np.sort(grp["v"].to_numpy())
        for i, p in enumerate((0.5, 0.95)):
            pos = p * (len(v) - 1)
            lo, hi = int(np.floor(pos)), int(np.ceil(pos))
            want = v[lo] + (pos - lo) * (v[hi] - v[lo])
            assert abs(rows[g][i] - want) < 1e-9, (g, p, rows[g][i], want)
