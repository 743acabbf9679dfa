"""Declared query catalog — the judged contract.

Every implemented operator from SURVEY.md §2 registers here as a
``(PySpark builder, DuckDB oracle SQL)`` pair. ``__spark_entry__.py``
re-exports this registry; the driver runs both sides on identical parquet
at sf0.01 and compares row-count + schema + order-insensitive value hash.

Conventions (FIXTURES.md):
- alias every computed column identically on both sides;
- explicit NULLS FIRST/LAST (Spark default ASC=NULLS FIRST, DuckDB=NULLS LAST);
- round float aggregates (partition-parallel summation order differs);
- sort collect_list/array_agg output;
- session timezone UTC.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query. ``oracle=None`` → rows-only check
    (approximate / nondeterministic / non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = " ".join(oracle.split())
        return fn

    return deco


# Driver-check priority. The driver verifies queries in registration order
# under a wall-clock budget (each round covers ~50 queries), so order is
# part of the contract surface: queries whose driver evidence is stale or
# missing go first, already-green rows re-verify last. Names listed here
# are re-inserted first (in this order); everything else keeps module
# import order behind them.
#
# Round 5 (per VERDICT r4 item 1): exactly 7 declared queries have never
# had a CORRECTNESS row — the r4 driver budget ran out before reaching
# them. They go first, cheapest-first. Behind them: the queries ADDED in
# round 5 (j02b right-outer, the s18 dialect-passthrough family, the w06
# scale-path variant, …), then the rows whose code changed this round
# (b04 oracle upgrade, b57 Arrow rewrite, b58 pre-pass composition,
# brute-force top-k pre-prune consumers) so their green evidence
# refreshes, then module order.
# Round 6: the new JPEG decode query and every query whose code or
# oracle changed this round (b58 moved to a full differential oracle via
# the portable MinHash family; the band construction in
# minhash_lsh_candidates was reshaped for it, so its non-portable
# consumers re-verify too).
# Round 8 (VERDICT r7 item 2): rotate the driver budget to the OLDEST
# evidence. ~80 §2-core rows carry latest-green stamps from r1-r5 while
# the serving path gained thousands of dialect lines; the driver budget
# (~50/round) goes: first the queries ADDED this round (never checked),
# then the rows whose code changed this round (gif/webp/flac guards),
# then every r1-stamped row, then the r2-stamped rows up to budget.
# Round 9 (VERDICT r8 item 1): close the evidence ledger. The rows
# ADDED this round go first (never checked), then the LAST 41 rows whose
# driver stamp predates r3 — the 6 r1-stamped scalar batteries, then the
# 35 r2-stamped rows cheapest-first (scalar/projection/setop singles,
# aggregate family, source family, beyond family, streaming last).
# 41 stale + the new rows fits the ~50/round driver budget, so after
# this round no declared query's stamp predates r3.
# Round 10 (VERDICT r9 item 1): close the ledger. The 6 remaining
# r2-stamped rows go FIRST (they are the only rows whose stamp still
# predates r3 — after this round the r7 goal holds: no declared query's
# evidence predates r3), then the queries ADDED this round (never
# checked), then the rows whose code or oracle changed this round.
# Round 11 (VERDICT r10 item 8): steady-state rotation — oldest stamps
# head the budget. The new r11 queries go first (never checked), then
# the 42 remaining r3-stamped rows (the oldest evidence left; every
# other row is r4+) cheapest-first, then rows whose code or serving
# path changed this round (xz preset, printf casts, window-FILTER
# semantics). 7 new + 42 stale + 5 changed slightly overfills the
# ~50/round budget (the p/o/u singles are sub-second); after this
# round no declared query's stamp predates r4.
# Round 12 (VERDICT r11 item 6): steady-state rotation, second turn —
# oldest stamps head the budget. The new r12 queries go first (never
# checked), then the 45 r4-stamped rows (the oldest evidence left after
# the r11 rotation re-stamped the r3 band; histogram at rotation time:
# 45×r4, 18×r5, 46×r7, 47×r8, 25×r9, 49×r10, 50×r11) cheapest families
# first — fn/source singles, joins/TPC-H, beyond, streaming last — then
# rows whose serving path changed this round (the format()/{:.N},
# list_reverse_sort and TIME-arithmetic rewrites all live in
# dialect_rewrites/breadth.py). 6 new + 45 stale slightly overfills the
# ~50/round budget like r11 did (the fn/s singles are sub-second);
# after this round no declared query's stamp predates r5.
# Round 13 (VERDICT r12 item 6): steady-state rotation, third turn —
# oldest stamps head the budget. The new r13 queries go first (never
# checked), then the 19 rows whose stamps still predate r6 (the r4/r5
# band left after the r12 rotation: the join family, windows, and
# st_stream_tws_rollup), then the oldest r7-stamped rows cheapest-first
# up to the ~50/round budget, then the dialect statements whose serving
# path changed this round (battery F touched COLLATE, //, map_concat,
# date_part — the sNN dialect rows traverse those rewrites).
# Round 14 (VERDICT r13 item 6): steady-state rotation, fourth turn —
# oldest stamps head the budget. The new r14 queries go first (never
# checked), then ALL 20 remaining r7-stamped rows (the oldest evidence
# left; histogram at rotation time: 20×r7, 47×r8, 25×r9, 49×r10,
# 50×r11, 50×r12, 50×r13), then the r8-stamped aggregate/function/
# beyond singles cheapest-first up to the ~50/round budget (the rest of
# the r8 band — codec rows, streaming rows, s08/s10b/s24, b65-b67 —
# rotates in r15), then the rows whose serving path changed this round
# (the Vorbis decode refactor behind b34e/b34f; the COLLATE-IN and
# int-div rewrites behind the sNN dialect rows).
# Round 16 (VERDICT r15 item 4): the r15 round shipped no priority
# rotation, so the driver re-sampled r14's exact 50-row head — this list
# restores the steady-state rotation. Head: ALL 22 remaining r8-stamped
# rows (the oldest evidence; histogram at rotation time: 22×r8, 25×r9,
# 49×r10, 50×r11/r12/r13, 50×r15), then the 25 r9-stamped rows
# cheapest-first. 47 stale rows fit the ~50/round budget; after this
# round no declared query's stamp predates r10.
_PRIORITY_R17: tuple[str, ...] = (
    # Round 17 (optimization round 2: no queries added or changed) —
    # pure oldest-evidence rotation, continuing VERDICT r16 item 8.
    # Head: ALL 49 r10-stamped rows (the oldest evidence after r16
    # retired the r8/r9 bands; histogram at rotation time: 49×r10,
    # 50×r11/r12/r13, 47×r15, 50×r16), cheapest families first. 49 rows
    # fit the ~50/round budget; after this round no declared query's
    # stamp predates r11.
    # --- scalar/function batteries (sub-second each) ---
    "fn_array_transform",
    "fn_datetime_extract",
    "fn_levenshtein",
    "fn_numeric_core",
    "fn_regexp_extract_all",
    "fn_string_accents",
    "fn_string_declared",
    "fn_string_extended",
    "fn_struct_map",
    "fn_trig",
    "fn_vector_ops",
    # --- dialect statement rows ---
    "s25_dialect_aggregate_tails",
    "s26_dialect_scalar_tails",
    "s31_dialect_prepare",
    "s32_dialect_hash_ops",
    "s33_dialect_nested",
    "s34_dialect_datetime_string",
    "s35_dialect_agg_corners",
    # --- cheap LLM-pipeline rows ---
    "b46_unigram_lm_score",
    "b47_stratified_split",
    "b48_decontamination",
    "b68_epoch_shuffle",
    "b69_length_bucket_packing",
    "b70_gram_matrix",
    "b71_random_projection",
    "b72_hard_negatives",
    "b73_paragraph_dedup",
    "b79_url_canonical",
    "b80_html_extract",
    "b81_group_split",
    "b82_heavy_hitters_cms",
    "b83_snapshot_diff",
    "b84_robots_filter",
    "t21b_waiting_supplier_bucketed",
    # --- archive/container rows ---
    "b74_gzip_corpus",
    "b75_warc_extract",
    "b77_zip_members",
    "b78_tar_bundle",
    # --- streaming rows ---
    "st_stream_file_sink",
    "st_stream_stream_join",
    "st_stream_warc_ingest",
    "st_stream_watermark_append",
    # --- codec probes, then the heavy decodes last ---
    "b36_exif_probe",
    "b34b_ogg_probe",
    "b30f_vp8_default_probs",
    "b32f_webm_default_probs",
    "b34_ogg_flac_audio",
    "b35_mp3_probe",
    "b35b_mp3_l3_decode",
)

_PRIORITY_R16: tuple[str, ...] = (
    # (r16 is an optimization round: no queries were added or changed, so
    # the head is pure oldest-evidence rotation. The mid-build b03
    # full-oracle promotion that briefly led this list was reverted — it
    # cost 24 s of bench headline, a 40× pessimization of the operator —
    # see OPTIMIZATION_r16.md "Inherited state".)
    # --- the 22 remaining r8-stamped rows, cheapest families first ---
    "s08_s3_scan",
    "s10b_attach_remote_catalog",
    "s24_attach_duckdb_file",
    "s27_dialect_dml_txn",
    "s28_dialect_upsert",
    "s29_dialect_seq_enum",
    "s30_dialect_dml_breadth",
    "b41_balanced_sample",
    "b42_token_shards",
    "b65_dsir_importance",
    "b66_ngram_novelty",
    "b67_cluster_balanced_sample",
    "b30c_gif_decode",
    "b30d_webp_decode",
    "b30e_vp8_decode",
    "b32d_webm_frames",
    "b32e_webm_vp8",
    "b33e_flac_audio",
    "st_stream_image_decode",
    "st_stream_decontam",
    "st_stream_dsir",
    "st_stream_neardup",
    # --- the 25 r9-stamped rows, cheapest families first ---
    "p16_try_cast",
    "p17_star_replace",
    "o09_order_by_all",
    "u04_union_by_name",
    "a07_approx_count_distinct",
    "a09c_distributed_quantiles",
    "a10_collect_aggs",
    "a17_group_by_all",
    "a18_pivot_dynamic",
    "a19_approx_quantile_tolerance",
    "a20_bit_aggs",
    "a21_histogram",
    "s07_capability_registry",
    "s15_bucketed_join",
    "s16_partition_pruning",
    "s17_time_series_gapfill",
    "b11_lsh_topk",
    "b11b_lsh_multiprobe",
    "b13_ivf_topk",
    "b14_label_centroids",
    "b30_multimodal_features",
    "b31_multimodal_metadata",
    "b32_frame_sample",
    "b43_token_topk",
    "b45_pii_scrub",
)

_PRIORITY_R14: tuple[str, ...] = (
    # --- new in round 14 ---
    "b34g_vorbis_switched_stereo_pcm",  # new: coupling x switching PCM
    "b86_multimodal_census",            # new: unified decode-status census
    "s41_dialect_threevl_casts_time",   # new: battery-G parity statement
    "b34h_vorbis_submaps_pcm",          # new: multi-submap 3-channel PCM
    "st_stream_media_census",           # new: census inside streaming
    # --- the 20 remaining r7-stamped rows, cheapest first ---
    "s18_dialect_passthrough",
    "s18b_dialect_init_sql",
    "s18c_dialect_asof_qualify",
    "s18d_dialect_file_reads",
    "b03_minhash_lsh_pairs",
    "b12_embedding_near_dup",
    "b59_rag_chunks",
    "b63_mixture_sample",
    "b64_source_overlap",
    "b32b_video_frames",
    "b32c_mp4_frames",
    "b33c_g711_audio",
    "b33d_adpcm_audio",
    "b61_bpe_train",
    "b61b_bpe_encode",
    "b62_pagerank",
    "b60_kmeans_train",
    "b55_semdedup",
    "b58_fuzzy_dedup_e2e",
    "b06_substring_dedup",
    # --- r8-stamped rows, cheapest families first (partial band) ---
    "fn_array_core",
    "fn_conditional",
    "fn_datetime_arith",
    "fn_json",
    "a01_groupby_having",
    "a04_distinct_aggs",
    "a05_agg_filter",
    "a06_cube",
    "a06_grouping_sets",
    "a06_rollup",
    "a08_stats_aggs",
    "a09_median_percentile",
    "a09b_median_percentile_vectorized",
    "a11_arg_max_min",
    "a12_first_last",
    "a13_bool_aggs",
    "a14_distinct_on",
    "a15_pivot",
    "a16_unpivot",
    "b01_exact_dedup",
    "b02_ngram_jaccard",
    "b05_dup_components",
    "b21_lang_id",
    "b22_fingerprint_dedup",
    "b23_token_count_bpe",
    "b41_balanced_sample",
    "b42_token_shards",
    # --- serving path changed this round ---
    "b34e_vorbis_pcm",      # vorbis decode refactor (integer-layer split)
    "b34f_vorbis_stereo_pcm",
    "s40_dialect_map_collate_time",  # COLLATE-IN + nested // rewrites
)

_PRIORITY_R13: tuple[str, ...] = (
    # --- new in round 13 ---
    "b34e_vorbis_pcm",            # new: full Ogg-Vorbis → PCM16 decode
    "b34f_vorbis_stereo_pcm",     # new: stereo + square-polar coupling
    "b35h_mp3_census",            # new: decode-status coverage census
    "b35i_mp3_joint_stereo",      # new: MS + intensity float layer
    "s40_dialect_map_collate_time",  # new: battery-F parity statement
    # --- the 19 rows with pre-r6 stamps, cheapest families first ---
    "w01_ranking",
    "w02_lag_lead",
    "w03_value_functions",
    "w04_running_agg",
    "w07_groups_frame",
    "w07b_exclude_frames",
    "w09_qualify",
    "w10_window_filter",
    "j03_cross_join",
    "j04_natural_join",
    "j05_semi_join",
    "j06_anti_join",
    "j07_theta_join",
    "j08_asof_join",
    "j08b_asof_forward",
    "j09_lateral_explode",
    "j09b_lateral_topk",
    "j10_positional_join",
    "st_stream_tws_rollup",
    # --- oldest r7-stamped rows, cheapest first (partial band; the
    # rest rotates in r14) ---
    "j01_inner_join",
    "j02_left_outer",
    "j02_full_outer",
    "j02b_right_outer",
    "s12_json_sink_roundtrip",
    "s12_orc_sink_roundtrip",
    "s19_dialect_pivot",
    "s19b_dialect_unpivot",
    "s20_dialect_describe",
    "s21_dialect_macro",
    "s22_dialect_rewrite_combo",
    "s23_dialect_list_comprehension",
    "w06_range_frame",
    "w06b_bucketed_range_frame",
    "a20_funnel_analysis",
    "a21_retention_cohorts",
    "b03b_minhash_full_oracle",
    "b04_simhash",
    "b10_knn_bruteforce",
    "b20_text_quality",
    "b30b_png_decode",
    "b31b_jpeg_decode",
    "b33b_audio_decode",
    "b49_repetition_filter",
    "b56_zorder_layout",
    "b57_quality_classifier",
    # --- serving path changed this round (battery F rewrites) ---
    "s18_dialect_passthrough",
    "s26_dialect_scalar_tails",
    "s33_dialect_nested",
    "s39_dialect_fmt_time_collate",
)

_PRIORITY_R12: tuple[str, ...] = (
    # --- new in round 12 ---
    "b35f_mp3_midamp_tables",    # new: B.7 tables 7-12 decode
    "b35g_mp3_esc_linbits",      # new: ESC/linbits engine-profile decode
    "b34d_vorbis_floor_curve",   # new: §7.2.4 floor-curve synthesis
    "s39_dialect_fmt_time_collate",  # new: battery-39 parity statement
    "b85b_crawl_fuzzy_e2e",      # new: crawl chain + MinHash-LSH stage
    "st_stream_join_timeordered",  # new: multi-batch bounded-state join
    # --- the 45 r4-stamped rows, cheapest families first ---
    "fn_pandas_udf_scalar",
    "fn_pandas_udaf",
    "fn_udtf_lateral",
    "fn_map_in_arrow",
    "s02_csv_scan",
    "s03_json_scan",
    "s05_view",
    "s06_inline_values",
    "s07b_range_series",
    "s09_http_scan",
    "s09b_python_datasource",
    "s10_federated_flight",
    "s12_csv_sink_roundtrip",
    "s12_parquet_sink_roundtrip",
    "s13_merge_upsert",
    "j07b_banded_range_join",
    "k01_salted_agg",
    "t09_product_type_profit",
    "t10_returned_items",
    "t11_important_part_value",
    "t12_priority_lines",
    "t13_customer_distribution",
    "t14_promo_revenue",
    "t15_top_supplier",
    "t16_supplier_part_count",
    "t17_small_quantity_revenue",
    "t18_large_volume_customer",
    "t19_disjunctive_filter",
    "t20_potential_promotion",
    "t21_waiting_supplier",
    "t22_global_sales_opportunity",
    "b15_pq_adc_topk",
    "b40_training_data_pipeline",
    "b51_tfidf_topk",
    "b52_dup_cluster_keep_best",
    "b53_bloom_decontam",
    "b54_ivfpq_topk",
    "st_tumbling_window",
    "st_sliding_window",
    "st_session_window",
    "st_dedup",
    "st_stateful_totals",
    "st_stream_tumbling",
    "st_stream_session",
    "st_stream_tws_rollup",
    # --- serving path changed this round (breadth.py rewrites) ---
    "s18_dialect_passthrough",
    "s26_dialect_scalar_tails",
    "s33_dialect_nested",
)

_PRIORITY_R11: tuple[str, ...] = (
    # --- new in round 11 ---
    "b35c_mp3_bigvalues",       # new: big-values Huffman decode (B.7)
    "b85_crawl_e2e",            # new: composed crawl chain, one plan
    "s37_dialect_bool_ctx",     # new: battery-37 parity statement
    "b34c_vorbis_floor_residue",  # new: Vorbis entropy-layer decode
    "s38_dialect_interval_mix",  # new: battery-38 parity statement
    "b35d_mp3_reservoir",       # new: bit-reservoir multi-frame decode
    "b35e_mp3_stereo",          # new: two-channel integer-layer decode
    # --- the 42 r3-stamped rows, cheapest families first ---
    "p01_projection_expr",
    "p03_filter",
    "p04_distinct",
    "p05_in_list",
    "p05_in_subquery",
    "p06_between",
    "p07_like",
    "p07b_ilike",
    "p08_glob",
    "p09_regexp",
    "p10_null_checks",
    "p11_exists",
    "p12_case_when",
    "p13_cast",
    "p14_exclude",
    "p15_columns_regex",
    "o01_multi_key_sort",
    "o03_limit_offset",
    "o06_with_ties",
    "o07_collate_ci",
    "o08_deterministic_sample",
    "o08b_tablesample",
    "u01_union",
    "u01_union_all",
    "u02_intersect",
    "u02b_intersect_all",
    "u03_except",
    "u03b_except_all",
    "w08_named_window",
    "q1_cte",
    "q4_scalar_subquery",
    "q5_derived_table",
    "q2_recursive_cte",
    "q2_transitive_closure",
    "q01_pricing_summary",
    "t02_min_cost_supplier",
    "t03_shipping_priority",
    "t04_order_priority",
    "t05_region_supplier_volume",
    "t06_forecast_revenue",
    "t07_volume_shipping",
    "t08_market_share",
    # --- code or serving path changed this round ---
    "b76_multistream_corpus",   # xz preset-0 fixture writer
    "s26_dialect_scalar_tails",  # printf positional casts
    "s33_dialect_nested",       # context classifier shares the scanner
    "w10_window_filter",        # window-FILTER distinct semantics
    "b35b_mp3_l3_decode",       # shared granule decoder grew big-values
)

_PRIORITY_R10: tuple[str, ...] = (
    # --- the last 6 rows with pre-r3 driver stamps ---
    "b46_unigram_lm_score",
    "b47_stratified_split",
    "b48_decontamination",
    "st_stream_file_sink",
    "st_stream_stream_join",
    "st_stream_watermark_append",
    # --- new in round 10 (registered by their modules) ---
    "s33_dialect_nested",      # new: battery-33 nested/JSON/frame parity
    "b35b_mp3_l3_decode",      # new: real Layer III granule decode
    "t21b_waiting_supplier_bucketed",  # new: t21 minus the 2x shuffle
    "b75_warc_extract",        # new: ISO 28500 WARC record extraction
    "b76_multistream_corpus",  # new: bzip2/xz multistream + dispatch
    "b77_zip_members",         # new: ZIP central-directory O(1) access
    "b78_tar_bundle",          # new: ustar-in-gzip bundle reading
    "b79_url_canonical",       # new: JVM-expression URL canonicalization
    "b80_html_extract",        # new: HTML boilerplate-stripping extract
    "s34_dialect_datetime_string",  # new: battery-34 parity statement
    "b81_group_split",         # new: leakage-safe group-aware splits
    "b82_heavy_hitters_cms",   # new: count-min sketch heavy hitters
    "b83_snapshot_diff",       # new: dataset-version delta
    "st_stream_warc_ingest",   # new: crawl ingestion inside streaming
    "s35_dialect_agg_corners",  # new: battery-35 parity statement
    "b84_robots_filter",       # new: RFC 9309 crawl-permission gate
    # --- code changed this round: refresh green evidence ---
    "s32_dialect_hash_ops",    # hash width fixes (smallint/decimal)
    "b36_exif_probe",          # ASCII codec agreement
    "b74_gzip_corpus",         # bounds-checked header walk
    "b30f_vp8_default_probs",  # vectorized token decode
    "b32f_webm_default_probs",
    "fn_levenshtein",          # byte-level shim (battery 34)
    "fn_datetime_extract",     # dayofweek/strftime rewrites (battery 34)
    "s25_dialect_aggregate_tails",  # ordered-agg regex widened (b35)
    "s26_dialect_scalar_tails",     # sign/printf/slice rewrites
    "b35_mp3_probe",           # mp3.py shared with the L3 decoder
)

_PRIORITY_R9: tuple[str, ...] = (
    # --- new in round 9 ---
    "b30f_vp8_default_probs",  # new: VP8 decode w/ RFC 6386 default tables
    "b32f_webm_default_probs",  # new: WebM keyframe using default tables
    "s31_dialect_prepare",      # new: battery-30 PREPARE/EXECUTE + tails
    "b34_ogg_flac_audio",       # new: Ogg-FLAC container end-to-end
    "b34b_ogg_probe",           # new: Ogg codec-inventory metadata probe
    "s32_dialect_hash_ops",     # new: battery-31 hash/operator parity
    "b68_epoch_shuffle",        # new: deterministic epoch shuffle
    "b69_length_bucket_packing",  # new: padding-aware batch packing
    "b35_mp3_probe",            # new: MP3 frame-walk inventory
    "b36_exif_probe",           # new: EXIF APP1/TIFF metadata
    "b70_gram_matrix",          # new: one-pass PCA-prep Gram matrix
    "b71_random_projection",    # new: implicit-matrix JL projection
    "b72_hard_negatives",       # new: contrastive-training negatives
    "b73_paragraph_dedup",      # new: sub-document boilerplate dedup
    "b74_gzip_corpus",          # new: RFC 1952 member-chain reading
    # --- r1-stamped rows (the oldest evidence left in the registry) ---
    "fn_trig",
    "fn_string_accents",
    "fn_string_declared",
    "fn_string_extended",
    "fn_struct_map",
    "fn_vector_ops",
    # --- r2-stamped rows, cheapest families first ---
    "fn_numeric_core",
    "fn_levenshtein",
    "fn_regexp_extract_all",
    "fn_array_transform",
    "p16_try_cast",
    "p17_star_replace",
    "o09_order_by_all",
    "u04_union_by_name",
    "a07_approx_count_distinct",
    "a10_collect_aggs",
    "a17_group_by_all",
    "a18_pivot_dynamic",
    "a19_approx_quantile_tolerance",
    "a20_bit_aggs",
    "a21_histogram",
    "a09c_distributed_quantiles",
    "s07_capability_registry",
    "s15_bucketed_join",
    "s16_partition_pruning",
    "s17_time_series_gapfill",
    "b11_lsh_topk",
    "b11b_lsh_multiprobe",
    "b13_ivf_topk",
    "b14_label_centroids",
    "b30_multimodal_features",
    "b31_multimodal_metadata",
    "b32_frame_sample",
    "b43_token_topk",
    "b45_pii_scrub",
    "b46_unigram_lm_score",
    "b47_stratified_split",
    "b48_decontamination",
    "st_stream_file_sink",
    "st_stream_stream_join",
    "st_stream_watermark_append",
)

_PRIORITY_R8: tuple[str, ...] = (
    # --- new in round 8 (names registered by their modules) ---
    "b30e_vp8_decode",         # new: lossy-WebP VP8 key-frame codec
    "b32e_webm_vp8",           # new: WebM carrying bare VP8 frames
    "b32d_webm_frames",        # new: EBML/Matroska container demux
    "s08_s3_scan",             # new: S3-protocol object-store scan
    "s10b_attach_remote_catalog",  # new: Flight catalog discovery
    "st_stream_decontam",      # new: Bloom decontamination in streaming
    "s24_attach_duckdb_file",  # new: ATTACH of a real .duckdb database
    "s25_dialect_aggregate_tails",  # new: battery-18 aggregate tails
    "s26_dialect_scalar_tails",     # new: battery-17 scalar tails
    "s27_dialect_dml_txn",          # new: DML + transaction script
    "s28_dialect_upsert",           # new: constraints + ON CONFLICT merge
    "s29_dialect_seq_enum",         # new: sequences + enum types
    "b65_dsir_importance",          # new: DSIR importance resampling
    "s30_dialect_dml_breadth",      # new: BY NAME / RETURNING / join-DML
    "st_stream_dsir",               # new: streaming importance scoring
    "b66_ngram_novelty",            # new: corpus-unique span scoring
    "b67_cluster_balanced_sample",  # new: per-cell quota sampling
    "st_stream_neardup",            # new: streaming incremental LSH dedup
    # --- code changed this round: refresh green evidence ---
    "b30c_gif_decode",         # color-table validation added
    "b30d_webp_decode",        # length-limited Huffman rebuilt
    "b33e_flac_audio",         # subset range guards added
    "st_stream_image_decode",  # streaming GIF decode path
    # --- r1-stamped rows (oldest evidence in the registry) ---
    "a01_groupby_having",
    "a04_distinct_aggs",
    "a05_agg_filter",
    "a06_cube",
    "a06_grouping_sets",
    "a06_rollup",
    "a08_stats_aggs",
    "a09_median_percentile",
    "a09b_median_percentile_vectorized",
    "a11_arg_max_min",
    "a12_first_last",
    "a13_bool_aggs",
    "a14_distinct_on",
    "a15_pivot",
    "a16_unpivot",
    "b01_exact_dedup",
    "b02_ngram_jaccard",
    "b05_dup_components",
    "b21_lang_id",
    "b22_fingerprint_dedup",
    "b23_token_count_bpe",
    "b41_balanced_sample",
    "b42_token_shards",
    "fn_array_core",
    "fn_conditional",
    "fn_datetime_arith",
    "fn_datetime_extract",
    "fn_json",
    "fn_string_accents",
    "fn_string_declared",
    "fn_string_extended",
    "fn_struct_map",
    "fn_trig",
    "fn_vector_ops",
    # --- r2-stamped rows, cheapest families first, to fill the budget ---
    "fn_numeric_core",
    "fn_levenshtein",
    "fn_regexp_extract_all",
    "fn_array_transform",
    "p16_try_cast",
    "p17_star_replace",
    "o09_order_by_all",
    "u04_union_by_name",
    "a17_group_by_all",
    "a07_approx_count_distinct",
    "a10_collect_aggs",
    "a19_approx_quantile_tolerance",
    "a20_bit_aggs",
    "a21_histogram",
    "a18_pivot_dynamic",
    "a09c_distributed_quantiles",
    "s07_capability_registry",
    "s15_bucketed_join",
    "s16_partition_pruning",
    "s17_time_series_gapfill",
)

# Round 7: the new codec queries (GIF, MP4 sample tables, G.711), then
# the rows whose shared decode plumbing changed (decode_image gained the
# GIF branch; video_frame_features gained the MP4 dispatch).
_PRIORITY_R7: tuple[str, ...] = (
    "b30c_gif_decode",         # new: GIF LZW codec end-to-end
    "b30d_webp_decode",        # new: VP8L lossless WebP end-to-end
    "b32c_mp4_frames",         # new: ISO BMFF sample-table demux
    "b33c_g711_audio",         # new: G.711 compressed audio
    "b33d_adpcm_audio",        # new: stateful IMA ADPCM + recursive oracle
    "b33e_flac_audio",         # new: Rice-coded lossless FLAC
    "st_stream_image_decode",  # new: codec path inside Structured Streaming
    "b63_mixture_sample",      # new: integer-exact temperature mixture
    "b64_source_overlap",      # new: cross-source near-dup matrix
    "b03b_minhash_full_oracle",  # band chain factored into shared builder
    "b30b_png_decode",         # decode_image dispatch gained GIF branch
    "b31b_jpeg_decode",
    "b32b_video_frames",       # video dispatch gained MP4 branch
    "b33b_audio_decode",       # wav.py gained format-tag dispatch
)

_PRIORITY_R6: tuple[str, ...] = (
    "b31b_jpeg_decode",        # new: baseline JPEG codec end-to-end
    "b32b_video_frames",       # new: MJPEG-AVI container + frame sampling
    "b33b_audio_decode",       # new: PCM WAV codec end-to-end
    "b61_bpe_train",           # new: distributed BPE merge training
    "b61b_bpe_encode",         # new: BPE encode with learned merges
    "b62_pagerank",            # new: integer-exact link-authority scoring
    "s23_dialect_list_comprehension",  # new: comprehension rewrite
    "b58_fuzzy_dedup_e2e",     # rows-only → full-oracle upgrade
    "b03_minhash_lsh_pairs",   # band construction reshaped
    "b03b_minhash_full_oracle",
    "b12_embedding_near_dup",
    "b30b_png_decode",         # decode_image dispatch gained JPEG branch
    "b55_semdedup",            # exact-dedup pre-pass now default-on
)

_PRIORITY_R5: tuple[str, ...] = (
    # --- the 7 never-driver-checked rows (VERDICT r4, "What's missing" 3) ---
    "s12_orc_sink_roundtrip",
    "s12_json_sink_roundtrip",
    "a20_funnel_analysis",
    "a21_retention_cohorts",
    "b59_rag_chunks",
    "b60_kmeans_train",
    "b58_fuzzy_dedup_e2e",  # rows-only by design (hash-derived ids)
    # --- round-5 additions (first-ever checks) ---
    "j02b_right_outer",
    "s18_dialect_passthrough",
    "s18b_dialect_init_sql",
    "s18c_dialect_asof_qualify",
    "s19_dialect_pivot",
    "s19b_dialect_unpivot",
    "w06b_bucketed_range_frame",
    "b30b_png_decode",
    "b03b_minhash_full_oracle",
    "s18d_dialect_file_reads",
    "s20_dialect_describe",
    "s21_dialect_macro",
    "s22_dialect_rewrite_combo",
    # --- code changed in round 5: refresh green evidence ---
    "b04_simhash",  # rows-only → full-oracle upgrade
    "b57_quality_classifier",  # Arrow-vectorized token features
    "b49_repetition_filter",  # Arrow-vectorized (shuffle deleted)
    "b20_text_quality",  # Arrow-vectorized features
    "b06_substring_dedup",  # Arrow span generator
    "b10_knn_bruteforce",  # pre-pruned top-k path
    "b12_embedding_near_dup",
    "w06_range_frame",
    "b56_zorder_layout",  # range-quantized Morton key (ADVICE r4)
)

# Round-4 priority head, kept for provenance (50/50 green in
# CORRECTNESS_r04.json); no longer used for ordering.
_PRIORITY_R4: tuple[str, ...] = (
    # §2.1 scans / sources / sinks.
    "s02_csv_scan",
    "s03_json_scan",
    "s05_view",
    "s06_inline_values",
    "s07b_range_series",
    "s12_parquet_sink_roundtrip",
    "s12_csv_sink_roundtrip",
    "s13_merge_upsert",
    "s09_http_scan",
    "s09b_python_datasource",
    "s10_federated_flight",
    # remaining join / skew variants.
    "j07b_banded_range_join",
    "j09b_lateral_topk",
    "k01_salted_agg",
    # §2.11 UDF surface (the §2.11 contract rows).
    "fn_pandas_udf_scalar",
    "fn_pandas_udaf",
    "fn_udtf_lateral",
    "fn_map_in_arrow",
    # TPC-H analogs never driver-run (t02-t08 went green in r3).
    "t09_product_type_profit",
    "t10_returned_items",
    "t11_important_part_value",
    "t12_priority_lines",
    "t13_customer_distribution",
    "t14_promo_revenue",
    "t15_top_supplier",
    "t16_supplier_part_count",
    "t17_small_quantity_revenue",
    "t18_large_volume_customer",
    "t19_disjunctive_filter",
    "t20_potential_promotion",
    "t21_waiting_supplier",
    "t22_global_sales_opportunity",
    # r3-added pipeline operators + the flagship composite.
    "b49_repetition_filter",
    "b51_tfidf_topk",
    "b15_pq_adc_topk",
    "b40_training_data_pipeline",
    # streaming — batch analogs first, then readStream rows (state-store
    # setup ~1 s each), the slowest mimic row (st_stateful_totals) last.
    "st_tumbling_window",
    "st_sliding_window",
    "st_session_window",
    "st_dedup",
    "st_stream_tumbling",
    "st_stream_session",
    "st_stream_tws_rollup",
    "st_stateful_totals",
    # --- end of the 44 never-checked rows ---
    # Round-4 additions (new code, never driver-checked) come before the
    # refresh rows: a first-ever check is stronger evidence than a
    # re-check of a query that has always been green.
    "b52_dup_cluster_keep_best",
    "b53_bloom_decontam",
    "b54_ivfpq_topk",
    "b55_semdedup",
    "b56_zorder_layout",
    "b57_quality_classifier",
    "b58_fuzzy_dedup_e2e",
    "s12_orc_sink_roundtrip",
    "s12_json_sink_roundtrip",
    "b59_rag_chunks",
    "b60_kmeans_train",
    "a20_funnel_analysis",
    "a21_retention_cohorts",
    # Code touched in round 4 (NTZ watermark fix, planted-guard pruning,
    # lineage truncation): refresh their green evidence.
    "b03_minhash_lsh_pairs",
    "b04_simhash",
    "b06_substring_dedup",
    "b12_embedding_near_dup",
    "st_stream_watermark_append",
    "st_stream_stream_join",
    "st_stream_file_sink",
)

# Round-3 priority head, kept for provenance (49/50 full-match in
# CORRECTNESS_r03.json); no longer used for ordering.
_PRIORITY_R3: tuple[str, ...] = (
    # §2.2 predicates — cheapest family, one scan each.
    "p01_projection_expr",
    "p03_filter",
    "p04_distinct",
    "p05_in_list",
    "p05_in_subquery",
    "p06_between",
    "p07_like",
    "p07b_ilike",
    "p08_glob",
    "p09_regexp",
    "p10_null_checks",
    "p11_exists",
    "p12_case_when",
    "p13_cast",
    "p14_exclude",
    "p15_columns_regex",
    # §2.6 sorts / limits.
    "o01_multi_key_sort",
    "o03_limit_offset",
    "o06_with_ties",
    "o07_collate_ci",
    "o08_deterministic_sample",
    "o08b_tablesample",
    # §2.7 set ops.
    "u01_union",
    "u01_union_all",
    "u02_intersect",
    "u02b_intersect_all",
    "u03_except",
    "u03b_except_all",
    # §2.8 query structure / CTEs.
    "q1_cte",
    "q2_recursive_cte",
    "q2_transitive_closure",
    "q4_scalar_subquery",
    "q5_derived_table",
    # §2.5 windows — the single largest evidence hole after two rounds.
    "w01_ranking",
    "w02_lag_lead",
    "w03_value_functions",
    "w04_running_agg",
    "w06_range_frame",
    "w07_groups_frame",
    "w07b_exclude_frames",
    "w08_named_window",
    "w09_qualify",
    # TPC-H suite — the reference's declared keyword surface
    # (main.go:376-513); q01 is the flagship pricing summary.
    "q01_pricing_summary",
    "t02_min_cost_supplier",
    "t03_shipping_priority",
    "t04_order_priority",
    "t05_region_supplier_volume",
    "t06_forecast_revenue",
    "t07_volume_shipping",
    "t08_market_share",
    "t09_product_type_profit",
    "t10_returned_items",
    "t11_important_part_value",
    "t12_priority_lines",
    "t13_customer_distribution",
    "t14_promo_revenue",
    "t15_top_supplier",
    "t16_supplier_part_count",
    "t17_small_quantity_revenue",
    "t18_large_volume_customer",
    "t19_disjunctive_filter",
    "t20_potential_promotion",
    "t21_waiting_supplier",
    "t22_global_sales_opportunity",
    # §2.1 scans / sources / sinks.
    "s02_csv_scan",
    "s03_json_scan",
    "s05_view",
    "s06_inline_values",
    "s07b_range_series",
    "s09_http_scan",
    "s09b_python_datasource",
    "s10_federated_flight",
    "s12_parquet_sink_roundtrip",
    "s12_csv_sink_roundtrip",
    "s13_merge_upsert",
    # §2.11 UDF surface.
    "fn_pandas_udf_scalar",
    "fn_pandas_udaf",
    "fn_udtf_lateral",
    "fn_map_in_arrow",
    # remaining join / skew variants.
    "j07b_banded_range_join",
    "j09b_lateral_topk",
    "k01_salted_agg",
    # pipeline composition.
    "b40_training_data_pipeline",
    # streaming — batch analogs first, then readStream rows (state-store
    # setup ~1 s each), the slowest mimic row (st_stateful_totals) last.
    "st_tumbling_window",
    "st_sliding_window",
    "st_session_window",
    "st_dedup",
    "st_stream_tumbling",
    "st_stream_session",
    "st_stream_tws_rollup",
    "st_stateful_totals",
)

# Round-2 priority head, kept for provenance (all 50 driver-green in
# CORRECTNESS_r02.json); no longer used for ordering.
_PRIORITY_R2: tuple[str, ...] = (
    # r1 red rows, now fixed — must flip green this round.
    "fn_numeric_core",
    "b31_multimodal_metadata",
    "a10_collect_aggs",
    "fn_array_transform",
    "b12_embedding_near_dup",
    # rows-only → full-oracle conversions and new operators this round.
    "a07_approx_count_distinct",
    "b30_multimodal_features",
    "b32_frame_sample",
    "a09c_distributed_quantiles",
    # dialect-parity queries added this round.
    "a17_group_by_all",
    "o09_order_by_all",
    "u04_union_by_name",
    "p16_try_cast",
    "p17_star_replace",
    "a18_pivot_dynamic",
    "w10_window_filter",
    # storage-layout operators added this round.
    "s15_bucketed_join",
    "s16_partition_pruning",
    # substring-level dedup added this round.
    "b06_substring_dedup",
    # streaming join + durable sink added this round.
    "st_stream_stream_join",
    "st_stream_file_sink",
    # sketch tolerance + vocabulary top-k added this round.
    "a19_approx_quantile_tolerance",
    "b43_token_topk",
    # function/agg/vector parity added this round.
    "fn_levenshtein",
    "fn_regexp_extract_all",
    "a20_bit_aggs",
    "a21_histogram",
    "b14_label_centroids",
    # rows-only → full-oracle upgrades this round.
    "s07_capability_registry",
    "st_stream_watermark_append",
    "b11_lsh_topk",
    "b12_embedding_near_dup",
    "b13_ivf_topk",
    # time-series gap fill added this round.
    "s17_time_series_gapfill",
    # multi-probe LSH added this round.
    "b11b_lsh_multiprobe",
    # PII scrub added this round.
    "b45_pii_scrub",
    # unigram LM quality scoring added this round.
    "b46_unigram_lm_score",
    # stratified split added this round.
    "b47_stratified_split",
    # decontamination audit added this round.
    "b48_decontamination",
    # forward as-of join added this round.
    "j08b_asof_forward",
)

# Module import order: never-driver-checked families first (joins resumed
# exactly where round 1's budget ran out), r1-green families last.
_MODULE_ORDER = (
    "joins",
    "windows",
    "sorts",
    "setops_cte",
    "scans",
    "dialect_queries",
    "tpch",
    "tpch_suite",
    "streaming_analog",
    "udfs_sinks",
    "remote_sources",
    "scale",
    "functions_string",
    "functions_datetime",
    "functions_nested",
    "functions_numeric",
    "aggregates",
    "beyond",
)


def load_all() -> None:
    """Import every catalog module so registration side effects run, then
    re-order the registry so driver verification hits the highest-value
    queries inside its budget (see _PRIORITY_R6; the r5 head follows so
    its still-recent evidence refreshes next)."""
    import importlib

    for mod in _MODULE_ORDER:
        importlib.import_module(f"duckdb_server_spark.catalog.{mod}")

    head = list(_PRIORITY_R17)
    for prior in (_PRIORITY_R16,
                  _PRIORITY_R14, _PRIORITY_R13, _PRIORITY_R12, _PRIORITY_R11,
                  _PRIORITY_R10, _PRIORITY_R9, _PRIORITY_R8, _PRIORITY_R7,
                  _PRIORITY_R6, _PRIORITY_R5):
        head += [n for n in prior if n not in head]
    ordered = [n for n in head if n in QUERIES]
    ordered += [n for n in QUERIES if n not in head]
    for registry in (QUERIES, ORACLE):
        snapshot = {n: registry[n] for n in ordered if n in registry}
        registry.clear()
        registry.update(snapshot)
