"""Aggregations (SURVEY.md §2.4 A1-A14). All reachable in the reference via
SQL passthrough (main.go:229); GROUP BY/HAVING/FILTER/DISTINCT keyword
anchors main.go:429,384,431,420,407.

Scale notes: every groupBy here is partial+final hash aggregation (map-side
combine before the shuffle) — Spark's default physical plan; grouping keys
are low-cardinality so the shuffle moves only partial aggregates.
count(DISTINCT) expands to a two-phase plan automatically. The rollup/cube
queries shuffle once per grouping-set pass over pre-aggregated data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_server_spark.catalog import query
from duckdb_server_spark.session import load_table as t


# --- A1+A2+A3: group-by + HAVING + core aggregates ---
@query(
    "a01_groupby_having",
    oracle="""
    SELECT o_custkey,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 12
    ORDER BY o_custkey ASC NULLS LAST
    """,
)
def a01_groupby_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_spent"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .filter(F.col("n_orders") >= 12)
        .orderBy(F.col("o_custkey").asc_nulls_last())
    )


# --- A4: count(DISTINCT), sum(DISTINCT) ---
@query(
    "a04_distinct_aggs",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part,
           round(sum(DISTINCT l_quantity), 2) AS sum_uq
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag ASC NULLS LAST
    """,
)
def a04_distinct_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.round(F.sum_distinct(F.col("l_quantity")), 2).alias("sum_uq"),
        )
        .orderBy(F.col("l_returnflag").asc_nulls_last())
    )


# --- A5: aggregate FILTER (WHERE …) clause (main.go:420) ---
@query(
    "a05_agg_filter",
    oracle="""
    SELECT l_linestatus,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                FILTER (WHERE l_returnflag = 'R') AS DOUBLE) AS returned_value
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus ASC NULLS LAST
    """,
)
def a05_agg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice")).cast(
                    "decimal(18,2)"
                )
            ).cast("double").alias("returned_value"),
        )
        .orderBy(F.col("l_linestatus").asc_nulls_last())
    )


# --- A6: ROLLUP / CUBE / GROUPING() ---
@query(
    "a06_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) AS g_flag,
           grouping(l_linestatus) AS g_status,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY g_flag ASC NULLS LAST, g_status ASC NULLS LAST,
             l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST
    """,
)
def a06_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n")
        .orderBy(
            F.col("g_flag").asc_nulls_last(),
            F.col("g_status").asc_nulls_last(),
            F.col("l_returnflag").asc_nulls_last(),
            F.col("l_linestatus").asc_nulls_last(),
        )
    )


@query(
    "a06_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus ASC NULLS LAST, o_orderpriority ASC NULLS LAST
    """,
)
def a06_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_last(),
            F.col("o_orderpriority").asc_nulls_last(),
        )
    )


@query(
    "a06_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS INT) AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_prio,
           count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY g_status ASC NULLS LAST, g_prio ASC NULLS LAST,
             o_orderstatus ASC NULLS LAST, o_orderpriority ASC NULLS LAST
    """,
)
def a06_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (A6) with grouping() indicators — the
    DataFrame `groupingSets` API (Spark 4.x) plans one Expand + one hash
    aggregate, not N unioned scans; grouping() disambiguates real NULLs
    from superaggregate rows."""
    return (
        t(spark, sf_dir, "orders")
        .groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("o_orderstatus", "o_orderpriority", "g_status", "g_prio", "n")
        .orderBy(
            F.col("g_status").asc_nulls_last(),
            F.col("g_prio").asc_nulls_last(),
            F.col("o_orderstatus").asc_nulls_last(),
            F.col("o_orderpriority").asc_nulls_last(),
        )
    )


# --- A7: approximate count-distinct (HLL) — tolerance-style oracle ---
@query(
    "a07_approx_count_distinct",
    oracle="""
    SELECT l_returnflag, true AS within_rsd
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag ASC NULLS LAST
    """,
)
def a07_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch, rsd=5%. The sketch value itself is engine-specific, so
    the checkable output is the tolerance claim: the HLL estimate lies
    within 4×rsd of the exact distinct count (true for every group with
    overwhelming probability; the oracle asserts the same rows of `true`).
    Exactness of plain count(DISTINCT) is a04. At 100 TB the sketch is the
    right default for ad-hoc cardinality — no shuffle of distinct values,
    just mergeable sketch state."""
    est = F.approx_count_distinct("l_partkey", 0.05)
    exact = F.count_distinct(F.col("l_partkey"))
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            (
                F.abs(est.cast("double") - exact.cast("double"))
                <= 0.2 * exact.cast("double")
            ).alias("within_rsd")
        )
        .orderBy(F.col("l_returnflag").asc_nulls_last())
    )


# --- A8: statistical aggregates ---
@query(
    "a08_stats_aggs",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag ASC NULLS LAST
    """,
)
def a08_stats_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "covar_qty_price"
            ),
        )
        .orderBy(F.col("l_returnflag").asc_nulls_last())
    )


# --- A9: ordered-set aggregates: median / percentile / mode ---
@query(
    "a09_median_percentile",
    oracle="""
    SELECT l_linestatus,
           round(median(l_quantity), 4) AS med_qty,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus ASC NULLS LAST
    """,
)
def a09_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median/percentile (continuous interpolation — matches DuckDB
    quantile_cont). At 100 TB prefer approx_percentile; exactness is the
    declared contract here."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
            F.round(F.median("l_quantity"), 4).alias("med_qty"),
            F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_price"),
        )
        .orderBy(F.col("l_linestatus").asc_nulls_last())
    )


# --- A10: string_agg / array_agg (sorted for determinism) ---
@query(
    "a10_collect_aggs",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), '|') AS nations,
           string_agg(n_name, ',' ORDER BY n_name) AS nation_csv
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey ASC NULLS LAST
    """,
)
def a10_collect_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 list/string_agg. The ``list(...)`` aggregate stays in the plan
    (ObjectHashAggregate over collect_list); the array is serialized with a
    '|' join at output on BOTH sides because the driver's pandas
    canonicalizer cannot sort raw list cells (unhashable type)."""
    return (
        t(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.concat_ws("|", F.sort_array(F.collect_list("n_name"))).alias("nations"),
            F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nation_csv"),
        )
        .orderBy(F.col("n_regionkey").asc_nulls_last())
    )


# --- A11: arg_max / arg_min (max_by / min_by) ---
@query(
    "a11_arg_max_min",
    oracle="""
    SELECT o_orderpriority,
           arg_max(o_orderkey, o_totalprice) AS biggest_order,
           arg_min(o_orderkey, o_totalprice) AS smallest_order
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority ASC NULLS LAST
    """,
)
def a11_arg_max_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg_max/arg_min are deterministic here because o_totalprice values
    are distinct per group at the test scale (doubles from a continuous
    distribution)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
            F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        )
        .orderBy(F.col("o_orderpriority").asc_nulls_last())
    )


# --- A12: first/last/any_value — nondeterministic → pinned with ordering ---
@query(
    "a12_first_last",
    oracle="""
    SELECT user_id,
           arg_min(event_type, event_id) AS first_event,
           arg_max(event_type, event_id) AS last_event
    FROM events
    GROUP BY user_id
    ORDER BY user_id ASC NULLS LAST
    """,
)
def a12_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last pinned to a deterministic order key (event_id) — expressed
    as min_by/max_by so the result is partition-order-independent (the
    determinism rule from SURVEY.md §5)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min_by("event_type", "event_id").alias("first_event"),
            F.max_by("event_type", "event_id").alias("last_event"),
        )
        .orderBy(F.col("user_id").asc_nulls_last())
    )


# --- A13: bool_and / bool_or ---
@query(
    "a13_bool_aggs",
    oracle="""
    SELECT c_mktsegment,
           bool_and(c_acctbal > 0) AS all_positive,
           bool_or(c_acctbal > 9000) AS any_rich
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment ASC NULLS LAST
    """,
)
def a13_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.bool_and(F.col("c_acctbal") > 0).alias("all_positive"),
            F.bool_or(F.col("c_acctbal") > 9000).alias("any_rich"),
        )
        .orderBy(F.col("c_mktsegment").asc_nulls_last())
    )


# --- A14: DISTINCT ON → window row_number rewrite ---
@query(
    "a14_distinct_on",
    oracle="""
    SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_custkey ASC NULLS LAST, o_totalprice DESC NULLS LAST,
             o_orderkey ASC NULLS LAST
    """,
)
def a14_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB DISTINCT ON (keep first row per key under ORDER BY) →
    row_number over a window, filter rn=1. The o_orderkey tiebreak makes
    the pair deterministic."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc_nulls_last()
    )
    return (
        t(spark, sf_dir, "orders")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy(F.col("o_custkey").asc_nulls_last())
    )


@query(
    "a15_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN o_orderstatus = 'F'
                    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS f,
           CAST(sum(CASE WHEN o_orderstatus = 'O'
                    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS o,
           CAST(sum(CASE WHEN o_orderstatus = 'P'
                    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority ASC NULLS LAST
    """,
)
def a15_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (DuckDB `PIVOT … ON … USING`, reachable via the reference's
    SQL passthrough main.go:229) → `groupBy().pivot(col, values)`. The
    explicit value list matters at scale: without it Spark runs an extra
    distinct-collect job over the fact table to discover the columns.
    One hash aggregate, no shuffle beyond the groupBy; sums in
    decimal(18,2), displayed as double."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")))
        .select(
            "o_orderpriority",
            F.col("F").cast("double").alias("f"),
            F.col("O").cast("double").alias("o"),
            F.col("P").cast("double").alias("p"),
        )
        .orderBy(F.col("o_orderpriority").asc_nulls_last())
    )


@query(
    "a16_unpivot",
    oracle="""
    SELECT o_orderkey, metric, value FROM (
      SELECT o_orderkey, 'o_totalprice' AS metric, o_totalprice AS value
      FROM orders
      UNION ALL
      SELECT o_orderkey, 'o_custkey' AS metric, CAST(o_custkey AS DOUBLE) AS value
      FROM orders)
    ORDER BY o_orderkey ASC NULLS LAST, metric ASC NULLS LAST
    """,
)
def a16_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (DuckDB `UNPIVOT`, reachable via passthrough main.go:229)
    → `DataFrame.unpivot` (Spark ≥3.4), which plans a single Expand node
    — one scan, no union of N subqueries (the oracle's UNION ALL form
    would scan the table once per measure at 100 TB)."""
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_totalprice",
            F.col("o_custkey").cast("double").alias("o_custkey"),
        )
        .unpivot("o_orderkey", ["o_totalprice", "o_custkey"], "metric", "value")
        .orderBy(F.col("o_orderkey").asc_nulls_last(), F.col("metric").asc_nulls_last())
    )


@query(
    "a09b_median_percentile_vectorized",
    oracle="""
    SELECT l_linestatus,
           round(median(l_quantity), 4) AS med_qty,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus ASC NULLS LAST
    """,
)
def a09b_median_percentile_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median/quantile_cont via an Arrow-batched numpy kernel
    (same oracle as a09). Spark's built-in exact `percentile` buffers a
    value→count map with per-row updates — on a near-unique double
    column (583k distinct / 600k rows at sf0.1) the map degenerates and
    the final single-threaded sort dominates (~1.8s). The shuffle shape
    here is identical (all rows of a group to one task — exact
    per-group quantiles require it), but the kernel selects the two
    needed order statistics per column with one O(n) ``np.partition``
    instead of a full O(n log n) sort (r17; measured 1.202 → 0.983 s
    best-of-5 at sf0.1 — and a sort-based window rewrite lost at 3.3 s,
    a split built-in-median + price-kernel form lost at 1.32 s). The
    selected elements are exact order statistics, so the interpolated
    values are byte-identical to the sorted spelling (pinned in
    tests/test_r17_opt.py). Group count bounds memory; for huge groups
    or sketch-tolerant users, approx_percentile is the 100 TB path."""
    import numpy as np
    import pandas as pd

    def q(pdf: pd.DataFrame) -> pd.DataFrame:
        def interp(col: str, p: float) -> float:
            x = pdf[col].to_numpy()
            pos = p * (len(x) - 1)
            lo, hi = int(np.floor(pos)), int(np.ceil(pos))
            part = np.partition(x, [lo, hi])
            return float(part[lo] + (pos - lo) * (part[hi] - part[lo]))

        return pd.DataFrame(
            {
                "l_linestatus": [pdf["l_linestatus"].iloc[0]],
                "med_qty": [round(interp("l_quantity", 0.5), 4)],
                "p90_price": [round(interp("l_extendedprice", 0.9), 4)],
            }
        )

    return (
        t(spark, sf_dir, "lineitem")
        .select("l_linestatus", "l_quantity", "l_extendedprice")
        .groupBy("l_linestatus")
        .applyInPandas(q, "l_linestatus string, med_qty double, p90_price double")
        # r17 shield exchange: the final orderBy's RangePartitioning
        # sample pass re-executes its child, which here is the WHOLE
        # per-group kernel (the group shuffle below it is reused, the
        # FlatMapGroupsInPandas above it is not) — the query paid the
        # 600k-row quantile kernel twice. One hash repartition of the
        # THREE output rows pins a reusable shuffle boundary between
        # kernel and sort; the sample pass replays that shuffle read
        # instead of the kernel. Rows/values unchanged.
        .repartition("l_linestatus")
        .orderBy(F.col("l_linestatus").asc_nulls_last())
    )


@query(
    "a09c_distributed_quantiles",
    oracle="""
    SELECT l_linestatus,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus ASC NULLS LAST
    """,
)
def a09c_distributed_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantile_cont with NO per-group materialization anywhere —
    the 100 TB percentile path (operators/percentile.py). a09b's Arrow
    kernel (and Spark's built-in exact percentile) put each whole group
    in one task's memory; this form global-sorts (group, value), selects
    the two needed ranks per (group, prob) via broadcast join, and
    interpolates — skewed/huge groups just span more range partitions.
    Exactness checked against the same quantile_cont oracle."""
    from duckdb_server_spark.operators.percentile import exact_group_quantiles

    q = exact_group_quantiles(
        t(spark, sf_dir, "lineitem"),
        "l_linestatus",
        "l_extendedprice",
        {"p50_price": 0.5, "p90_price": 0.9, "p99_price": 0.99},
    )
    return q.select(
        "l_linestatus",
        F.round("p50_price", 4).alias("p50_price"),
        F.round("p90_price", 4).alias("p90_price"),
        F.round("p99_price", 4).alias("p99_price"),
    ).orderBy(F.col("l_linestatus").asc_nulls_last())


# --- A17: GROUP BY ALL (DuckDB dialect, supported verbatim by Spark SQL) ---
@query(
    "a17_group_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ALL
    ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST
    """,
)
def a17_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` (every non-aggregate select item becomes a group
    key; passthrough main.go:229, GROUP keyword main.go:429, ALL
    main.go:377) — identical SQL text runs on both engines; money sum through
    decimal for order-independent exactness."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gba")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               count(*) AS n
        FROM lineitem_gba
        GROUP BY ALL
        ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST
        """
    )


# --- A18: dynamic PIVOT (no explicit value list — DuckDB `PIVOT … ON`) ---
@query(
    "a18_pivot_dynamic",
    oracle="""
    SELECT l_returnflag,
           round(COALESCE("F", 0), 4) AS F,
           round(COALESCE("O", 0), 4) AS O
    FROM (PIVOT (SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem)
          ON l_linestatus USING sum(l_quantity))
    ORDER BY l_returnflag ASC NULLS LAST
    """,
)
def a18_pivot_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic PIVOT — DuckDB's ``PIVOT … ON col`` discovers the output
    columns from the data (main.go:229 passthrough); Spark's equivalent
    is ``pivot(col)`` with NO value list, which runs an eager distinct
    job over the pivot column to discover them. That extra full pass is
    the documented scale cost of dynamic pivoting (a15 shows the
    explicit-list form that avoids it); the distinct is on one low-NDV
    dictionary-encoded column, so the pass is scan-bound, not
    shuffle-bound. Sums coalesced to 0 and rounded on both sides."""
    pivoted = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 4))
    )
    # A (group, value) combo with no rows pivots to NULL — zero-fill the
    # discovered columns to mirror the oracle's COALESCE.
    zeroed = [
        F.coalesce(F.col(f"`{c}`"), F.lit(0.0)).alias(c)
        for c in pivoted.columns
        if c != "l_returnflag"
    ]
    return pivoted.select("l_returnflag", *zeroed).orderBy(
        F.col("l_returnflag").asc_nulls_last()
    )


# --- A19: approx_percentile tolerance (t-digest-style sketch vs exact) ---
@query(
    "a19_approx_quantile_tolerance",
    oracle="""
    SELECT l_linestatus, true AS within_tol
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus ASC NULLS LAST
    """,
)
def a19_approx_quantile_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_percentile`` (mergeable quantile sketch, single pass, no
    per-group materialization) is the documented cutover from the exact
    paths (a09b kernel / a09c distributed sort) when error tolerance is
    acceptable at 100 TB. Sketch values are engine-specific, so the
    checkable claim is the accuracy contract: with accuracy=10000 the
    p50/p99 estimates land within 1% relative error of the exact
    quantile — emitted as a boolean the oracle matches row-for-row."""
    est = F.percentile_approx("l_extendedprice", [0.5, 0.99], 10000)
    exact = F.expr("percentile(l_extendedprice, array(0.5D, 0.99D))")
    ok = (
        (
            F.abs(est[0].cast("double") - exact[0].cast("double"))
            <= 0.01 * exact[0].cast("double")
        )
        & (
            F.abs(est[1].cast("double") - exact[1].cast("double"))
            <= 0.01 * exact[1].cast("double")
        )
    ).alias("within_tol")
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(ok)
        .orderBy(F.col("l_linestatus").asc_nulls_last())
    )


# --- A20: bitwise aggregates ---
@query(
    "a20_bit_aggs",
    oracle="""
    SELECT l_returnflag,
           CAST(bit_and(l_linenumber) AS BIGINT) AS band,
           CAST(bit_or(l_linenumber) AS BIGINT) AS bor,
           CAST(bit_xor(l_linenumber) AS BIGINT) AS bxor
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag ASC NULLS LAST
    """,
)
def a20_bit_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates (identical names in both engines;
    passthrough main.go:229). Mergeable single-value state — the cheapest
    possible shuffle payload."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.bit_and("l_linenumber").cast("bigint").alias("band"),
            F.bit_or("l_linenumber").cast("bigint").alias("bor"),
            F.bit_xor("l_linenumber").cast("bigint").alias("bxor"),
        )
        .orderBy(F.col("l_returnflag").asc_nulls_last())
    )


# --- A21: bucketed histogram (width_bucket emulation) ---
@query(
    "a21_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           count(*) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders
    GROUP BY bucket
    ORDER BY bucket ASC NULLS LAST
    """,
)
def a21_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via floor bucketing (DuckDB 1.0 has no
    width_bucket; the arithmetic form is engine-portable and stays in
    codegen). One hash aggregate over a derived key — histogram
    construction at 100 TB is a single partial+final pass."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy(F.col("bucket").asc_nulls_last())
    )


# --- Round-4 event-analytics additions: funnel + retention cohorts ---
@query(
    "a20_funnel_analysis",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS t_signup FROM events
      WHERE event_type = 'signup' GROUP BY user_id),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN s ON s.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s.t_signup
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM s) AS n_signup,
           (SELECT count(*) FROM c) AS n_click,
           (SELECT count(*) FROM p) AS n_purchase,
           round((SELECT count(*) FROM c)
                 / CAST((SELECT count(*) FROM s) AS DOUBLE), 4) AS click_rate,
           round((SELECT count(*) FROM p)
                 / CAST((SELECT count(*) FROM s) AS DOUBLE), 4) AS purchase_rate
    """,
)
def a20_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup → later click → later purchase): each stage
    is a per-user min-timestamp aggregate constrained to events strictly
    after the previous stage's first completion. Three hash-aggs + two
    user-key equi-joins — at 100 TB every shuffle carries (user_id,
    timestamp) pairs, never event payloads, and the user-key partitioning
    is reused across stages (AQE exchange reuse)."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    counts = (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase")))
    )
    return counts.select(
        "n_signup",
        "n_click",
        "n_purchase",
        F.round(F.col("n_click") / F.col("n_signup").cast("double"), 4).alias(
            "click_rate"
        ),
        F.round(
            F.col("n_purchase") / F.col("n_signup").cast("double"), 4
        ).alias("purchase_rate"),
    )


@query(
    "a21_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cw
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS aw
      FROM events)
    SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week,
           CAST(datediff('day', f.cw, a.aw) / 7 AS INT) AS week_offset,
           count(*) AS n_users
    FROM firsts f JOIN activity a USING (user_id)
    GROUP BY cohort_week, week_offset
    ORDER BY cohort_week ASC NULLS LAST, week_offset ASC NULLS LAST
    """,
)
def a21_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention-cohort matrix: cohort = Monday-truncated week of
    a user's first event; one row per (cohort, week offset) counting the
    cohort's users active that week. Two hash-aggs sharing the user_id
    shuffle plus a distinct on (user, week) — cohort analysis at 100 TB
    is exactly this shape, with the (user, week) distinct as the only
    wide stage (both engines truncate weeks to Monday, so the day
    difference is an exact multiple of 7). The cohort week is emitted as
    a 'yyyy-MM-dd' STRING: Spark's date_trunc yields TIMESTAMP while
    DuckDB's yields DATE, and the two leak different python/pandas types
    into the driver's dtype-sensitive hash — a formatted string is
    identical under every comparison path."""
    ev = t(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("aw")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .select(
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("aw"), F.col("cw")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(
            F.col("cohort_week").asc_nulls_last(),
            F.col("week_offset").asc_nulls_last(),
        )
    )
