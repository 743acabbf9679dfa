"""Physical-plan audits (SURVEY.md §4): the scale properties — pushdown,
pruning, broadcast, codegen — asserted as tests so a regression fails CI
instead of becoming a 100× slowdown at cluster scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_server_spark import catalog, plans
from duckdb_server_spark.session import load_table

catalog.load_all()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """q01's shipdate predicate must appear in the parquet scan's
    PushedFilters — at 100 TB this is the difference between reading one
    row-group and reading the table."""
    df = catalog.QUERIES["q01_pricing_summary"](spark, sf_dir)
    pushed = " ".join(plans.pushed_filters(df))
    assert "l_shipdate" in pushed


def test_column_pruning(spark, sf_dir):
    """q01 touches 6 of lineitem's 16 columns; the scan must read only
    those (ReadSchema is the projection actually hitting parquet)."""
    df = catalog.QUERIES["q01_pricing_summary"](spark, sf_dir)
    (cols,) = plans.read_schema_columns(df)
    assert 0 < len(cols) <= 6
    assert "l_comment" not in cols


def test_small_dim_broadcasts(spark, sf_dir):
    """nation/region-sized dimensions must broadcast, not shuffle."""
    df = catalog.QUERIES["j01_inner_join"](spark, sf_dir)
    assert plans.has_broadcast_join(df)


def test_codegen_on_hot_path(spark, sf_dir):
    """The flagship aggregation must stay inside whole-stage codegen."""
    df = catalog.QUERIES["q01_pricing_summary"](spark, sf_dir)
    assert plans.wholestage_codegen_spans(df) >= 1


def test_semi_join_for_in_subquery(spark, sf_dir):
    """IN (subquery) must plan as a semi join, not materialize + isin."""
    df = catalog.QUERIES["p05_in_subquery"](spark, sf_dir)
    text = plans.explain_string(df, "simple")
    assert "SemiJoin" in text or "semi" in text.lower()


def test_knn_has_no_shuffle_before_topk(spark, sf_dir):
    """Brute-force kNN must broadcast the query batch: the corpus side is
    scanned once with zero pre-join shuffle (the 100 TB-survivable plan)."""
    df = catalog.QUERIES["b10_knn_bruteforce"](spark, sf_dir)
    assert plans.has_broadcast_join(df)


def test_dedup_shuffle_carries_hash_not_text(spark, sf_dir):
    """Exact dedup groups by the 8-byte xxhash64, so the shuffle's
    ReadSchema still needs the text column scan-side but the agg keys are
    the hash — assert the plan contains the hash expression."""
    df = catalog.QUERIES["b01_exact_dedup"](spark, sf_dir)
    assert "xxhash64" in plans.explain_string(df, "simple")


def test_no_python_udf_in_core_queries(spark, sf_dir):
    """The relational core must not contain ANY Python evaluation nodes —
    the JVM-side guarantee. Since r17, b20/b57 are lambda-free codegen
    projections (the avg-word-length fold's closed form removed the
    reason for their r5 Arrow detour — tests/test_r17_opt.py pins value
    equality), so they join the no-Python set. b49's top-bigram counter
    stays deliberately Arrow-vectorized (measured 4-9× the interpreted
    HOF form at the 100× tier, SCALING.md) but must never regress to
    row-at-a-time BatchEvalPython."""
    for name in (
        "q01_pricing_summary",
        "j01_inner_join",
        "a06_cube",
        "w04_running_agg",
        "b01_exact_dedup",
        "b10_knn_bruteforce",
        "b20_text_quality",
        "b57_quality_classifier",
    ):
        text = plans.explain_string(catalog.QUERIES[name](spark, sf_dir), "simple")
        assert "EvalPython" not in text, f"{name} fell off the JVM path"
    for name in ("b49_repetition_filter",):
        text = plans.explain_string(catalog.QUERIES[name](spark, sf_dir), "simple")
        assert "BatchEvalPython" not in text, f"{name} uses row-at-a-time Python"
        assert "ArrowEvalPython" in text, f"{name} lost its Arrow path"


def test_t02_no_sort_merge_join(spark, sf_dir):
    """Q2 analog: dims broadcast and the per-part min is a window over
    the offers aggregate — no sort-merge self-join anywhere."""
    df = catalog.QUERIES["t02_min_cost_supplier"](spark, sf_dir)
    df.collect()  # AQE finalizes join strategies at execution
    text = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in text
    assert "BroadcastHashJoin" in text


def test_merge_upsert_all_joins_broadcast(spark, sf_dir):
    """MERGE decomposition exists to keep every join broadcastable (a
    FULL OUTER join would force a sort-merge shuffle of the target)."""
    df = catalog.QUERIES["s13_merge_upsert"](spark, sf_dir)
    df.collect()
    text = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in text
    assert "BroadcastHashJoin" in text


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """s15: both join sides are bucketed on the join key with equal
    bucket counts, so the sort-merge join must plan with ZERO Exchange
    nodes — the write-once/join-many co-location contract that makes the
    join free of data movement at 100 TB."""
    from duckdb_server_spark.catalog.scans import _bucketed_pair

    li_name, ord_name = _bucketed_pair(spark, sf_dir)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li, od = spark.table(li_name), spark.table(ord_name)
        j = li.join(od, li.l_orderkey == od.o_orderkey)
        text = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in text
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_partition_pruning_engages(spark, sf_dir):
    """s16: the event_date filter must prune at the directory level —
    the plan's PartitionFilters carry the predicate and the scan reads
    only the 7 matching of 30 daily partitions."""
    from duckdb_server_spark.catalog.scans import _partitioned_events

    pdir = _partitioned_events(spark, sf_dir)
    ev = spark.read.parquet(pdir).filter(
        F.col("event_date").between(F.lit("2024-01-05"), F.lit("2024-01-11"))
    )
    text = plans.explain_string(ev, "formatted")
    assert "PartitionFilters" in text and "event_date" in text
    # files actually selected: 7 date directories
    selected = ev.select(F.input_file_name()).distinct().collect()
    days = {p[0].split("event_date=")[1].split("/")[0] for p in selected}
    assert days == {f"2024-01-{d:02d}" for d in range(5, 12)}


def test_substring_dedup_shuffle_carries_hash_not_text(spark, sf_dir):
    """b06: every exchange after shingling must carry the 8-byte span
    hash, never the span text — shuffling raw 5-gram strings at 100 TB
    would move the corpus several times over."""
    df = catalog.QUERIES["b06_substring_dedup"](spark, sf_dir)
    text = plans.explain_string(df, "formatted")
    parts = [
        line
        for line in text.split("\n")
        if "hashpartitioning" in line or "rangepartitioning" in line
    ]
    assert parts, "expected shuffle exchanges in the b06 plan"
    # every shuffle keys on the span hash or the doc id — never __shingle
    assert all("__sh#" in seg or "doc_id#" in seg for seg in parts), parts
    assert not any("__shingle" in seg for seg in parts), parts


def test_centroids_never_shuffle_vectors(spark, sf_dir):
    """b14: the per-label centroid aggregate must shuffle (label, pos)
    partial sums — the embedding arrays themselves stay in the scan
    stage (shuffling vectors for an average is the 100 TB anti-shape)."""
    df = catalog.QUERIES["b14_label_centroids"](spark, sf_dir)
    text = plans.explain_string(df, "formatted")
    parts = [
        line
        for line in text.split("\n")
        if "hashpartitioning" in line or "rangepartitioning" in line
    ]
    assert parts
    assert not any("embedding" in seg for seg in parts), parts


def test_lm_score_total_is_broadcast(spark, sf_dir):
    """b46: the one-row corpus total must arrive via broadcast, never a
    shuffled join; the vocab join may be broadcast or shuffled (AQE
    decides by size), but the final per-doc aggregate keys on doc_id."""
    df = catalog.QUERIES["b46_unigram_lm_score"](spark, sf_dir)
    text = plans.explain_string(df, "formatted")
    assert "IdentityBroadcastMode" in text
    assert any(
        "hashpartitioning(doc_id" in line for line in text.split("\n")
    ), "expected the per-doc aggregate shuffle"


def test_b03_guard_branch_is_bucket_pruned(spark, sf_dir):
    """b03's planted-pair guard must derive from a doc_id-pruned branch:
    at least one parquet scan of documents carries the pushed
    EqualTo(doc_id,0) filter, so the guard costs a 2-document pipeline
    instead of re-executing the full-corpus LSH (the r3 +70% regression)."""
    df = catalog.QUERIES["b03_minhash_lsh_pairs"](spark, sf_dir)
    pushed = " ".join(plans.pushed_filters(df))
    assert "EqualTo(doc_id" in pushed
    # the main branch still scans the full table alongside the pruned branch
    text = plans.explain_string(df)
    assert text.count("Scan parquet") >= 2


def test_b04_guard_branch_is_bucket_pruned(spark, sf_dir):
    """Same contract for b04's fingerprint-equality guard."""
    df = catalog.QUERIES["b04_simhash"](spark, sf_dir)
    pushed = " ".join(plans.pushed_filters(df))
    assert "EqualTo(doc_id" in pushed


def test_b52_resolution_is_hashagg_not_window(spark, sf_dir):
    """Cluster resolution must reduce via max_by hash-agg (map-side
    combine), never a per-cluster window sort; and the scan must prune
    to the three columns the fingerprint + policy need."""
    df = catalog.QUERIES["b52_dup_cluster_keep_best"](spark, sf_dir)
    text = plans.explain_string(df)
    assert "Window" not in text
    assert any(
        set(s) <= {"doc_id", "text", "n_chars"}
        for s in plans.read_schema_columns(df)
    )


def test_b53_exact_verify_is_semi_join(spark, sf_dir):
    """Bloom decontamination must end in a LeftSemi verify (never an
    inner join that could duplicate spans), and the bloom map must ride
    a broadcast."""
    df = catalog.QUERIES["b53_bloom_decontam"](spark, sf_dir)
    text = plans.explain_string(df)
    assert "LeftSemi" in text
    assert "Broadcast" in text


def test_b56_zorder_scan_prunes_to_two_columns(spark, sf_dir):
    """The layout report reads exactly the two interleaved key columns —
    a z-order pass over a wide 100 TB table must not scan the body."""
    df = catalog.QUERIES["b56_zorder_layout"](spark, sf_dir)
    schemas = plans.read_schema_columns(df)
    assert schemas and all(
        set(s) <= {"event_id", "user_id"} for s in schemas
    ), schemas


def test_w06b_range_frame_is_partitioned(spark, sf_dir):
    """The bucketed RANGE-frame path must NOT serialize onto one task:
    its Window node carries the bucket partition spec (w06's single-task
    form shows an empty partition list), and the part table actually
    spreads across >1 bucket."""
    df = catalog.QUERIES["w06b_bucketed_range_frame"](spark, sf_dir)
    text = plans.explain_string(df)
    assert "__rf_bucket" in text, "Window lost its bucket partition spec"
    from duckdb_server_spark.operators.rangeframe import bucketed_range_window

    src = load_table(spark, sf_dir, "part").select("p_partkey", "p_size")
    n_buckets = (
        bucketed_range_window(
            src, "p_size", -2, 2,
            lambda w: [F.count(F.lit(1)).over(w).alias("n")],
            num_buckets=16,
        )
        .select((F.floor((F.col("p_size") - 1) / 4)).alias("b"))
        .distinct()
        .count()
    )
    assert n_buckets > 1


def test_bucketed_range_frame_matches_single_task_on_doubles(spark, sf_dir):
    """Edge correctness on a continuous (double) order column with a wide
    frame: the bucketed two-phase result must equal the single-task global
    window row-for-row — pads at every bucket boundary included."""
    from pyspark.sql import Window

    from duckdb_server_spark.operators.rangeframe import bucketed_range_window

    src = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    lo, hi = -5000, 3000
    bucketed = bucketed_range_window(
        src, "o_totalprice", lo, hi,
        lambda w: [F.count(F.lit(1)).over(w).alias("n_close")],
        num_buckets=8,
    )
    w = Window.orderBy(F.col("o_totalprice").cast("double").asc()).rangeBetween(lo, hi)
    single = src.select(
        "o_orderkey", F.count(F.lit(1)).over(w).alias("n_close")
    )
    merged = bucketed.select("o_orderkey", F.col("n_close").alias("nb")).join(
        single, "o_orderkey"
    )
    assert merged.filter(F.col("nb") != F.col("n_close")).count() == 0
    assert merged.count() == src.count()


def test_b10_bruteforce_has_preprune_window(spark, sf_dir):
    """brute_force_topk must pre-prune with the salted local top-k before
    the per-query global window: two Window nodes, the first partitioned
    by (query, salt) — without it each query's whole scored corpus sorts
    on one task."""
    df = catalog.QUERIES["b10_knn_bruteforce"](spark, sf_dir)
    text = plans.explain_string(df)
    assert text.count("Window") >= 2, "pre-prune window missing"
    assert "pmod" in text and "xxhash64" in text, "salt key missing"


def test_s22_ordered_agg_is_single_hashagg(spark, sf_dir):
    """The ordered-aggregate rewrite (list(x ORDER BY k) → sorted-struct
    projection) must stay ONE hash aggregate per grouping — an Exchange
    per ordered aggregate (or a window sort) would be the wrong plan at
    scale. Expect exactly the aggregate's shuffle plus the final
    ORDER BY range exchange, and no Window node."""
    df = catalog.QUERIES["s22_dialect_rewrite_combo"](spark, sf_dir)
    plan = plans.explain_string(df, mode="simple")
    assert plan.count("Exchange") <= 2  # agg hash exchange + global sort
    assert "Window" not in plan


def test_w07b_exclude_rewrite_shuffles_only_for_peer_partitioning(spark, sf_dir):
    """The EXCLUDE-frame algebra adds window FUNCTIONS, not driver
    logic: the plan is windows + exchanges only. The TIES peer sum
    partitions by (l_linestatus, l_quantity) — a genuinely different
    key than the frame windows' l_linestatus — so its exchange is
    semantically required; beyond that only the frame-window exchange
    and the output sort remain."""
    df = catalog.QUERIES["w07b_exclude_frames"](spark, sf_dir)
    plan = plans.explain_string(df, mode="simple")
    assert plan.count("Exchange") <= 3


def test_t13_aggregates_below_the_join(spark, sf_dir):
    """Q13 must pre-aggregate orders to (custkey, count) BEFORE joining
    customers — the shuffle carries counts, never full order rows (the
    join-first shape went 19× at the 10× tier, scaling_study r6)."""
    df = catalog.QUERIES["t13_customer_distribution"](spark, sf_dir)
    text = plans.explain_string(df, "formatted")
    # the orders-side aggregate exists, and no OUTER join consumes raw
    # o_orderpriority (the predicate is applied pre-aggregation)
    join_idx = text.find("Join")
    agg_idx = text.find("HashAggregate")
    assert agg_idx >= 0 and join_idx >= 0
    # at least one aggregate node is planned below (printed after, in
    # formatted tree order the children follow) — assert the join input
    # cardinality shape instead: the left-join's right side is an agg
    assert "count" in text.lower()
    assert "o_orderpriority" in " ".join(plans.pushed_filters(df)) or \
        "o_orderpriority" in text


def test_t07_nation_filter_prunes_before_fact_joins(spark, sf_dir):
    """Q7's two-nation filter must reach the supplier/customer scans (via
    the broadcast nation subset) rather than running after the fact
    chain — the filter-last shape went ~12× at the 10× tier."""
    df = catalog.QUERIES["t07_volume_shipping"](spark, sf_dir)
    text = plans.explain_string(df, "formatted")
    assert plans.has_broadcast_join(df)
    # the pair disjunction must NOT be the only nation predicate: the
    # two-row nation subset filter appears as an n_name IN/equality
    # before the join chain
    assert "NATION_1" in text and "NATION_2" in text
    # lineitem's scan reads only the needed columns
    cols = plans.read_schema_columns(df)
    assert all("l_comment" not in c for c in cols)


def test_pagerank_final_plan_is_checkpointed_not_rederived(spark, sf_dir):
    """The returned rank frame must read the CHECKPOINTED final state —
    a single ExistingRDD scan — not a re-derivation of all 8 join+agg
    rounds (which would replay the whole lineage on every action)."""
    df = catalog.QUERIES["b62_pagerank"](spark, sf_dir)
    text = plans.explain_string(df, "formatted")
    assert "Scan ExistingRDD" in text
    assert "Cartesian" not in text
    assert "Join" not in text  # iterations already materialized


def test_pagerank_iteration_shape(spark):
    """One un-checkpointed PageRank round plans as keyed join +
    hash-aggregate — the Pregel shape (asserted on the round's
    contribution frame, before materialization hides it)."""
    from pyspark.sql import functions as F

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "s long, d long"
    )
    ranks = spark.createDataFrame([(1, 100), (2, 100), (3, 100)],
                                  "node long, rank long")
    outdeg = e.groupBy("s").agg(F.count(F.lit(1)).alias("odeg"))
    contribs = (
        e.join(ranks, e.s == ranks.node)
        .join(outdeg, "s")
        .select(F.col("d").alias("node"),
                F.expr("(rank * 85) DIV (100 * odeg)").alias("c"))
        .groupBy("node")
        .agg(F.sum("c").alias("inflow"))
    )
    text = plans.explain_string(contribs, "formatted")
    assert "HashAggregate" in text
    assert "Cartesian" not in text


def test_mixture_sample_broadcasts_thresholds(spark, sf_dir):
    """b63's per-language thresholds are a tiny frame: they must reach
    the corpus scan as a BROADCAST join (the scan-side filter design) —
    a shuffle here would serialize the whole corpus on `lang` at 100 TB."""
    df = catalog.QUERIES["b63_mixture_sample"](spark, sf_dir)
    assert plans.has_broadcast_join(df)


def test_mixture_sample_reads_only_needed_columns(spark, sf_dir):
    """b63 needs doc_id/lang/n_chars; the documents scan must prune
    `text` (the wide column) away."""
    df = catalog.QUERIES["b63_mixture_sample"](spark, sf_dir)
    for cols in plans.read_schema_columns(df):
        assert "text" not in cols


def test_source_overlap_pairs_join_is_not_text_keyed(spark, sf_dir):
    """b64's attribution joins carry pair ids + a short source string —
    document text must never appear in a shuffle (exchange) schema."""
    df = catalog.QUERIES["b64_source_overlap"](spark, sf_dir)
    for line in plans.explain_string(df).splitlines():
        if "Exchange" in line and "text#" in line:
            raise AssertionError(f"text shuffled: {line}")


# --- round-8 late additions: SUMMARIZE, windowed DISTINCT, DML COW ---------


def test_summarize_is_single_pass(spark, sf_dir):
    """SUMMARIZE computes every per-column statistic (min/max/HLL/
    moments/percentile sketches) in ONE aggregation over ONE scan — at
    100 TB the cost is a single pass plus a 1-row shuffle. A second scan
    or a per-column job would show as multiple Scan nodes."""
    from duckdb_server_spark.engine import summarize_frame
    from duckdb_server_spark.session import register_views

    register_views(spark, sf_dir, ("orders",))
    df = summarize_frame(spark, "orders")
    text = plans.explain_string(df)
    # one scan: once in the plan tree, once in the detail section
    assert text.count("(1) Scan parquet") >= 1 and text.count("Scan parquet") <= 2, text
    # partial + final hash aggregate, nothing else heavyweight
    assert "SortAggregate" not in text


def test_windowed_distinct_single_window_exchange(spark, sf_dir):
    """count(DISTINCT x) OVER (...) rewrites to array_distinct over a
    windowed collect_list: the plan must stay ONE window over one
    partition exchange — no extra shuffle or join materializes."""
    from duckdb_server_spark.dialect import run_sql, serving_dialect
    from duckdb_server_spark.session import register_views

    register_views(spark, sf_dir, ("orders",))
    with serving_dialect(True):
        df = run_sql(
            spark,
            "SELECT o_orderstatus, count(DISTINCT o_custkey)"
            " OVER (PARTITION BY o_orderstatus) AS cd FROM orders",
        )
    text = plans.explain_string(df)
    # tree labels carry "(n)" suffixes; details repeat the bare name
    assert text.count("Window (") == 1, text
    assert text.count("Exchange (") <= 1, text


def test_update_is_case_projection_no_join(spark, sf_dir):
    """UPDATE's copy-on-write rewrite is a CASE projection over one scan
    of the relation — no join, no extra shuffle (the Delta/Iceberg
    update shape). Asserted on the pre-materialization plan."""
    from duckdb_server_spark.dialect import execute_statement

    execute_statement(
        spark, "CREATE TABLE plan_upd AS SELECT 1 AS a, 'x' AS b"
    )
    execute_statement(spark, "UPDATE plan_upd SET b = 'y' WHERE a = 1")
    # the swapped view materialized from a projection: reading it back is
    # a bare scan of the checkpointed rows
    text = plans.explain_string(spark.table("plan_upd"))
    assert "Join" not in text and "Exchange" not in text
    execute_statement(spark, "DROP TABLE plan_upd")


def test_alter_table_stays_lazy_projection(spark, sf_dir):
    """ALTER TABLE column ops swap the view onto a LAZY projection —
    Catalyst collapses stacked projections, so three ALTERs over a
    parquet-backed table still read as one scan + one projection and the
    scan still prunes to the referenced columns."""
    from duckdb_server_spark.dialect import execute_statement
    from duckdb_server_spark.session import register_views

    register_views(spark, sf_dir, ("nation",))
    spark.table("nation").createOrReplaceTempView("plan_alt")
    execute_statement(spark, "ALTER TABLE plan_alt RENAME COLUMN n_name TO nm")
    execute_statement(spark, "ALTER TABLE plan_alt ADD COLUMN flag INT DEFAULT 1")
    execute_statement(spark, "ALTER TABLE plan_alt DROP COLUMN n_regionkey")
    df = spark.table("plan_alt").select("nm", "flag")
    text = plans.explain_string(df)
    assert text.count("(1) Scan parquet") >= 1 and text.count("Scan parquet") <= 2
    assert "Exchange" not in text
    for cols in plans.read_schema_columns(df):
        assert "n_regionkey" not in cols
    spark.catalog.dropTempView("plan_alt")


def test_dsir_plan_broadcasts_and_topk(spark, sf_dir):
    """b65: the 1024-row ratio table joins by BROADCAST (never a
    shuffled side), the final top-k is TakeOrderedAndProject (per-
    partition heads, no global sort), and the documents scan prunes to
    the three referenced columns."""
    from duckdb_server_spark.catalog.beyond import b65_dsir_importance

    df = b65_dsir_importance(spark, sf_dir)
    text = plans.explain_string(df)
    assert "TakeOrderedAndProject" in text
    assert "BroadcastHashJoin" in text
    for cols in plans.read_schema_columns(df):
        assert set(cols) <= {"doc_id", "text", "lang"}


def test_upsert_merge_joins_on_key_only(spark):
    """The upsert three-leg merge: reading the swapped view back is a
    bare scan of checkpointed rows (no residual join), and the merge
    raises cleanly rather than falling back to a cartesian when the
    conflict clause is malformed."""
    from duckdb_server_spark.dialect import execute_statement

    execute_statement(
        spark,
        "CREATE OR REPLACE TABLE plan_ups (k INT PRIMARY KEY, v STRING)",
    )
    execute_statement(spark, "INSERT INTO plan_ups VALUES (1, 'a')")
    execute_statement(
        spark,
        "INSERT INTO plan_ups VALUES (1, 'b'), (2, 'c')"
        " ON CONFLICT (k) DO UPDATE SET v = excluded.v",
    )
    text = plans.explain_string(spark.table("plan_ups"))
    assert "Join" not in text and "Exchange" not in text
    assert sorted(
        tuple(r) for r in spark.table("plan_ups").collect()
    ) == [(1, "b"), (2, "c")]
    execute_statement(spark, "DROP TABLE plan_ups")


def test_epoch_shuffle_single_hash_exchange(spark, sf_dir):
    """b68: the draw is a scan-side expression; exactly ONE hash
    exchange (the shard keying for the window) appears — the trailing
    range exchange is the presentation sort — and the scan prunes to
    doc_id alone."""
    from duckdb_server_spark.catalog.beyond import b68_epoch_shuffle

    df = b68_epoch_shuffle(spark, sf_dir)
    text = plans.explain_string(df)
    assert text.count("hashpartitioning(") == 1
    for cols in plans.read_schema_columns(df):
        assert set(cols) <= {"doc_id"}


def test_random_projection_zero_hash_exchanges(spark, sf_dir):
    """b71: the implicit hash-derived JL matrix means a pure scan-side
    map — no hash exchange anywhere in the plan."""
    from duckdb_server_spark.catalog.beyond import b71_random_projection

    df = b71_random_projection(spark, sf_dir)
    assert "hashpartitioning(" not in plans.explain_string(df)


def test_gram_matrix_partial_aggregation(spark, sf_dir):
    """b70: the d² pair terms collapse through partial aggregation —
    two HashAggregate nodes (map-side combine below the exchange), so
    every partition ships at most d(d+1)/2 rows; the scan prunes to
    the embedding column."""
    import re as _re

    from duckdb_server_spark.catalog.beyond import b70_gram_matrix

    df = b70_gram_matrix(spark, sf_dir)
    text = plans.explain_string(df)
    assert len(_re.findall(r"\(\d+\) HashAggregate", text)) >= 2
    for cols in plans.read_schema_columns(df):
        assert set(cols) <= {"embedding"}


def test_hard_negatives_broadcast_and_two_phase_window(spark, sf_dir):
    """b72: the query side broadcasts and the salted pre-prune gives at
    least two Window nodes — never one corpus-sized sort per query."""
    import re as _re

    from duckdb_server_spark.catalog.beyond import b72_hard_negatives

    df = b72_hard_negatives(spark, sf_dir)
    text = plans.explain_string(df)
    assert "BroadcastNestedLoopJoin" in text or "BroadcastHashJoin" in text
    assert len(_re.findall(r"\(\d+\) Window", text)) >= 2


def test_t21_bucketed_removes_orderkey_exchanges(spark, sf_dir):
    """t21b (VERDICT r9 item 4): every fact-fact leg of the double
    self-join keys on orderkey, so over the orderkey-bucketed layout the
    plan must carry ZERO Exchange nodes on those legs. The only allowed
    exchanges are the final s_name aggregation + top-k ordering — assert
    no exchange whose partitioning mentions an orderkey column."""
    from duckdb_server_spark.catalog.tpch_suite import (
        t21b_waiting_supplier_bucketed,
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = t21b_waiting_supplier_bucketed(spark, sf_dir)
        text = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    for line in text.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "orderkey" not in line, line


def test_r10_ingestion_band_is_shuffle_lean(spark, sf_dir):
    """b75-b80: per-payload scan kernels — the only exchanges allowed
    are the final doc_id ordering (and b79's per-doc aggregation). A
    container walk that shuffles payload bytes would be a scale
    defect."""
    from duckdb_server_spark.catalog import beyond

    for name, max_exchanges in (
        ("b75_warc_extract", 1),
        ("b76_multistream_corpus", 1),
        ("b77_zip_members", 1),
        ("b78_tar_bundle", 1),
        ("b80_html_extract", 1),
        ("b79_url_canonical", 1),  # array-reduced per row: sort only
    ):
        df = getattr(beyond, name)(spark, sf_dir)
        text = df._jdf.queryExecution().executedPlan().toString()
        n = text.count("Exchange ")
        assert n <= max_exchanges, f"{name}: {n} exchanges\n{text}"


def test_r10_b35b_mp3_plan_is_scan_shaped(spark, sf_dir):
    from duckdb_server_spark.catalog import beyond

    df = beyond.b35b_mp3_l3_decode(spark, sf_dir)
    text = df._jdf.queryExecution().executedPlan().toString()
    assert text.count("Exchange ") <= 1


def test_b82_sketch_exchange_is_bounded(spark, sf_dir):
    """The count-min sketch's exchange must carry partial-aggregate
    rows (two HashAggregate nodes around the exchange = map-side
    combine), never raw tokens."""
    from duckdb_server_spark.catalog import beyond

    df = beyond.b82_heavy_hitters_cms(spark, sf_dir)
    text = df._jdf.queryExecution().executedPlan().toString()
    assert text.count("HashAggregate") >= 2


def test_b83_snapshot_diff_shuffles_fingerprints_only(spark, sf_dir):
    """The snapshot diff's exchanges carry (doc_id, fp) pairs — the
    text column must be pruned before any exchange."""
    from duckdb_server_spark.catalog import beyond

    df = beyond.b83_snapshot_diff(spark, sf_dir)
    text = df._jdf.queryExecution().executedPlan().toString()
    for line in text.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text#" not in line, line


def test_b85_crawl_e2e_shuffle_budget(spark, sf_dir):
    """The composed crawl chain (round 11) pays exactly its declared
    shuffle budget: ONE hash exchange (the dedup window over the 60-bit
    fingerprint) plus the final presentation sort — WARC/HTML/robots
    run scan-side in one Python kernel, canonicalization/split are
    codegen expressions. The hash exchange must carry fingerprints,
    never the extracted text."""
    from duckdb_server_spark.catalog import beyond

    df = beyond.b85_crawl_e2e(spark, sf_dir)
    text = df._jdf.queryExecution().executedPlan().toString()
    hash_ex = [
        line for line in text.splitlines()
        if "Exchange hashpartitioning" in line
    ]
    assert len(hash_ex) == 1, text
    assert "etext#" not in hash_ex[0], hash_ex[0]
    # one Python kernel total: the ingest mapInPandas
    assert text.count("MapInPandas") == 1
