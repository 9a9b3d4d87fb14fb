"""Central registry: aggregates every declared operator (SURVEY §2) into the
``queries()`` / ``oracle_sql()`` dicts that ``__spark_entry__.py`` exports.

Each operator module exposes ``QUERIES: dict[name, fn(spark, sf_dir) -> DF]``
and ``ORACLE: dict[name, sql]`` (omit a name from ORACLE for rows-only ops).
Modules are imported lazily-tolerantly so one broken family never takes down
the whole surface.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULES = [
    "datafusion_test_spark.operators.relational",
    "datafusion_test_spark.operators.filters",
    "datafusion_test_spark.operators.aggregates",
    "datafusion_test_spark.operators.joins",
    "datafusion_test_spark.operators.windows",
    "datafusion_test_spark.operators.sorting",
    "datafusion_test_spark.operators.setops",
    "datafusion_test_spark.operators.subqueries",
    "datafusion_test_spark.operators.composite",
    "datafusion_test_spark.operators.composite2",
    "datafusion_test_spark.operators.udf",
    "datafusion_test_spark.operators.maintenance",
    "datafusion_test_spark.operators.analytics",
    "datafusion_test_spark.functions.scalar",
    "datafusion_test_spark.sources.generate",
    "datafusion_test_spark.sources.connectors",
    "datafusion_test_spark.streaming.batch_windows",
    "datafusion_test_spark.streaming.sinks",
    "datafusion_test_spark.pipeline.dedup",
    "datafusion_test_spark.pipeline.similarity",
    "datafusion_test_spark.pipeline.text",
    "datafusion_test_spark.pipeline.prep",
    "datafusion_test_spark.pipeline.curation",
    "datafusion_test_spark.pipeline.quality",
    "datafusion_test_spark.pipeline.multimodal",
    "datafusion_test_spark.pipeline.evals",
]

# Registry iteration order = the driver's correctness-check order, and the
# driver's per-round budget (~50 entries per round) can stop mid-list.  Round 4
# ordering (VERDICT.md r3 item 1): rotate so the 71 entries without a green
# driver row lead — the lone red (tpch_q12_shape, oracle HUGEINT artifact) first,
# then the 70 never-checked names in registry order; the 146 r1-r3 greens sort
# to the back (their rows are on record).
_PRIORITY = [
    # --- round-4 head: the one red row (q12, oracle HUGEINT cast fixed this
    # round) then every entry with NO driver row in r01/r02/r03 — the driver
    # budget (~50/round) burns down this verification debt over rounds 4-5 ---
    "tpch_q12_shape",
    "tpch_q21_shape",
    "tpch_q22_shape",
    "dedup_clusters",
    "text_tfidf",
    "embed_quantize",
    "agg_hll_merge",
    "join_bucketed",
    "dedup_editdist",
    "sim_ivf",
    "stream_join_interval",
    "udtf_python_api",
    "fn_variant",
    "merge_upsert",
    "text_contamination",
    "seq_pack",
    "layout_zonemap",
    "agg_mode_median",
    "observe_metrics",
    "fn_url",
    "domain_mix",
    "dedup_url",
    "text_ngram_lm",
    "stream_cdc_apply",
    "text_quality_gopher",
    "split_train_holdout",
    "agg_heavy_hitters",
    "scd2_build",
    "agg_incremental",
    "join_bloom",
    "fn_bitmap",
    "layout_compaction",
    "stream_join_outer",
    "rollup_gapfill",
    "agg_count_min",
    "scan_schema_evolution",
    "embed_pca",
    "fn_collation",
    "source_python_api",
    "agg_percentiles",
    "funnel_conversion",
    "agg_retention_cohort",
    "intersect_all",
    "except_all",
    "join_null_safe",
    "udf_cogrouped",
    "scan_time_travel",
    "catalog_stats",
    "agg_vector_centroid",
    "layout_zorder",
    "join_asof_forward",
    "win_time_range",
    "seq_pattern_detect",
    "agg_histogram",
    "join_partition_pruned",
    "agg_hll_intersect",
    "skyline_pareto",
    "interval_union",
    "text_chunk_overlap",
    "text_vocab_build",
    "dedup_incremental",
    "pipeline_training_shards",
    "agg_corr_matrix",
    "fn_generator_outer",
    "scan_json_corrupt",
    "agg_skew_diagnose",
    "sample_systematic",
    "graph_triangles",
    "seq_string_mine",
    "win_streaks",
    "agg_entropy",
    # --- new in round 4 (queue behind the round-3 verification debt) ---
    "dedup_chunk",
    "join_asof_tolerance",
    "feature_bucketize",
    "embed_pq",
    "lm_quality_filter",
    "join_dim_snapshot",
    "drift_ks",
    "text_repetition",
    "text_bm25_topk",
    "er_fuzzy_blocked",
    "mm_clip_filter",
    "pipeline_shuffle",
    "sim_ivfpq",
    "agg_regression",
    "anomaly_mad",
    "stream_topk_windowed",
    "ts_resample_interp",
    "sub_in_disjunct",
    "privacy_k_anonymity",
    "dedup_resolve",
    "join_asof_nearest",
    "win_ewma",
    "corpus_jaccard_sources",
    "eval_auc",
    "eval_prf",
    "eval_calibration",
    "eval_mrr",
    "eval_ndcg",
    "drift_timeline",
    "er_multipass",
    "graph_pagerank",
    "join_spatial_grid",
    "ts_changepoint",
    "embed_pq_residual",
    "embed_matryoshka_recall",
    "stream_idempotent_sink",
    "agg_weighted_median",
    "win_median_sliding",
    "stream_checkpoint_resume",
    "fn_try_safety",
    "udf_pandas_iter",
    "feature_hashing",
    "ts_autocorr",
    "layout_bucket_agg",
    "text_langid_confusion",
    "corpus_datacard",
    "graph_common_neighbors",
    "dq_audit",
    "dedup_containment",
    "win_rolling_slope",
    "privacy_l_diversity",
    "eval_pass_at_k",
    "join_positional",
    "table_diff",
    "feature_target_encode",
    "scan_binary_files",
    "text_boilerplate_strip",
    "sub_quantified",
    "win_running_distinct",
    "corpus_vocab_growth",
    "pipeline_preference_pairs",
    "pipeline_sft_transcripts",
    "ts_seasonal_index",
    "text_blocklist_filter",
    "rollup_ohlc",
    "eval_ab_ztest",
    "graph_kcore",
    "pipeline_span_corruption",
    "sim_rerank_two_stage",
    "ts_debounce",
    "dedup_threshold_sweep",
    "win_ratio_to_report",
    "sim_index_persist",
    "privacy_pseudonymize",
    "er_survivorship",
    "join_interval_relations",
    # --- driver-verified green in r01|r02|r03 — re-verify last ---
    "fn_cast",
    "stream_foreach_batch",
    "stream_stateful_run",
    "agg_listagg",
    "agg_approx_quantile",
    "text_profile",
    "text_sample_stratified",
    "mm_feature_stub",
    "mm_resize_stub",
    "sim_pairwise_lsh",
    "pipeline_prep",
    "join_range",
    "rollup_timeseries",
    "udf_arrow",
    "text_pii_scrub",
    "tablesample",
    "write_partitioned",
    "scan_csv_roundtrip",
    "scan_json_roundtrip",
    "scan_orc_roundtrip",
    "tpch_q1_shape",
    "tpch_q4_shape",
    "tpch_q6_shape",
    "tpch_q19_shape",
    "tpch_q14_shape",
    "tpch_q3_shape",
    "tpch_q5_shape",
    "tpch_q10_shape",
    "tpch_q18_shape",
    "sub_scalar",
    "sub_in",
    "sub_correlated_scalar",
    "sub_exists_correlated",
    "sub_scalar_select",
    "cte_multi",
    "cte_recursive",
    "join_lateral",
    "pivot_wide",
    "unpivot_long",
    "tpch_q2_shape",
    "tpch_q7_shape",
    "tpch_q8_shape",
    "tpch_q9_shape",
    "tpch_q11_shape",
    "tpch_q13_shape",
    "tpch_q15_shape",
    "tpch_q16_shape",
    "tpch_q17_shape",
    "tpch_q20_shape",
    "scan_parquet",
    "project",
    "distinct",
    "coalesce_partitions",
    "partitioned_exec",
    "parquet_pushdown",
    "collect_stream",
    "load_inmemory",
    "filter_compare",
    "filter_boolean",
    "filter_in_between",
    "filter_like",
    "filter_null",
    "agg_global",
    "agg_groupby",
    "agg_count_distinct",
    "agg_approx_distinct",
    "agg_having",
    "agg_filter_clause",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_collect",
    "agg_minmax_by",
    "agg_bitwise",
    "agg_product",
    "agg_stats",
    "join_inner",
    "join_skew_salted",
    "join_broadcast",
    "join_left",
    "join_right",
    "join_full",
    "join_semi",
    "join_anti",
    "join_cross",
    "join_theta",
    "join_asof",
    "win_ranking",
    "win_percent",
    "win_lag_lead",
    "win_running_sum",
    "win_moving_avg",
    "win_range_frame",
    "win_first_last",
    "sort_multi",
    "limit",
    "topk_per_group",
    "union_all",
    "union_distinct",
    "intersect",
    "except",
    "udf_python",
    "udf_pandas",
    "udaf_grouped",
    "udtf_explode",
    "fn_string",
    "fn_regex",
    "fn_date",
    "fn_math",
    "fn_trig",
    "fn_hash",
    "fn_conditional",
    "fn_array",
    "fn_map_struct",
    "fn_json",
    "generate_random_table",
    "bench_cancel_table",
    "find_or_generate",
    "write_parquet",
    "cancel_query",
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_dedup",
    "stream_stateful_count",
    "stream_watermark_late",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "dedup_near",
    "dedup_simhash",
    "dedup_embed_cosine",
    "dedup_embed_lsh",
    "sim_topk",
    "sim_pairwise_topk",
    "sim_ann_lsh",
    "text_stats",
    "text_tokens",
    "text_quality",
    "text_langid",
    "text_fingerprint",
    "text_topterms",
    "multimodal_cols",
    "mm_binary_meta",
    "mm_decode_stub",
    "mm_frame_sample",
]


def _collect() -> tuple[dict, dict]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    skipped: dict[str, str] = {}
    for modname in _MODULES:
        try:
            mod = importlib.import_module(modname)
        except Exception as exc:  # pragma: no cover - defensive
            import sys

            skipped[modname] = repr(exc)
            print(f"[registry] skipping {modname}: {exc!r}", file=sys.stderr)
            continue
        mod_q = getattr(mod, "QUERIES", {})
        dup = set(mod_q) & set(queries)
        if dup:
            # a name declared twice would silently shadow the earlier
            # operator (and its oracle could pair with the WRONG query).
            # RuntimeError, not assert: python -O must not strip the guard.
            raise RuntimeError(
                f"duplicate registry names from {modname}: {sorted(dup)}"
            )
        queries.update(mod_q)
        oracles.update(getattr(mod, "ORACLE", {}))
    # a stale/typo'd priority name must fail loudly, not silently demote the
    # entry to the back of the driver's ~50-entry correctness budget; when a
    # module failed to import, surface THAT as the cause instead of the
    # misleading pile of its missing names
    missing = [n for n in _PRIORITY if n not in queries]
    if missing:
        raise RuntimeError(
            f"_PRIORITY names not in registry: {missing}"
            + (f" (modules failed to import: {skipped})" if skipped else "")
        )
    ordered = {n: queries[n] for n in _PRIORITY}
    ordered.update({n: fn for n, fn in queries.items() if n not in ordered})
    return ordered, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _collect()[0]


def oracle_sql() -> dict[str, str]:
    q, o = _collect()
    return {k: v for k, v in o.items() if k in q}
