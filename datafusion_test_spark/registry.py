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
    "datafusion_test_spark.operators.udf",
    "datafusion_test_spark.functions.scalar",
    "datafusion_test_spark.sources.generate",
    "datafusion_test_spark.sources.connectors",
    "datafusion_test_spark.streaming.batch_windows",
    "datafusion_test_spark.streaming.sinks",
    "datafusion_test_spark.pipeline.dedup",
    "datafusion_test_spark.pipeline.similarity",
    "datafusion_test_spark.pipeline.text",
    "datafusion_test_spark.pipeline.prep",
    "datafusion_test_spark.pipeline.multimodal",
]

# Registry iteration order = the driver's correctness-check order, and the
# driver's per-round budget (~50 entries in round 1) can stop mid-list.  Names
# listed here run FIRST: the families with no driver-verified row yet (round 1
# checked exactly the first 50 names, all from the relational core) plus the
# two round-1 red rows (agg_collect, agg_approx_distinct), now fixed.  The
# already-green relational core sorts to the back — its rows are on record in
# CORRECTNESS_r01.json.
_PRIORITY = [
    # --- slots 1-50: every SURVEY §2 DECLARED name with no green row in
    # --- CORRECTNESS_r01.json, sized to exactly fill a 50-entry budget
    # round-1 red rows, fixed this round — re-verify first
    "agg_collect",
    "agg_approx_distinct",
    # scalar function families
    "fn_string",
    "fn_regex",
    "fn_date",
    "fn_math",
    "fn_trig",
    "fn_hash",
    "fn_conditional",
    "fn_cast",
    "fn_array",
    "fn_map_struct",
    "fn_json",
    # UDF surface
    "udf_python",
    "udf_pandas",
    "udaf_grouped",
    "udtf_explode",
    # LLM pipeline: dedup
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "dedup_near",
    "dedup_simhash",
    "dedup_embed_cosine",
    "dedup_embed_lsh",
    # similarity
    "sim_topk",
    "sim_pairwise_topk",
    "sim_ann_lsh",
    # text analysis
    "text_stats",
    "text_tokens",
    "text_quality",
    "text_langid",
    "text_fingerprint",
    "text_topterms",
    # multimodal
    "multimodal_cols",
    "mm_binary_meta",
    "mm_decode_stub",
    "mm_frame_sample",
    # set-op tail never reached in r01
    "intersect",
    "except",
    # streaming (batch-equivalence oracles)
    "stream_tumbling",
    "stream_session",
    "stream_watermark_late",
    "stream_dedup",
    "stream_sliding",
    "stream_stateful_count",
    # Tier A generation / bootstrap / cancellation harness
    "write_parquet",
    "generate_random_table",
    "find_or_generate",
    "cancel_query",
    "bench_cancel_table",
    # --- slots 51+: extension families (connectors, subquery/CTE/pivot) ---
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
]


def _collect() -> tuple[dict, dict]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        try:
            mod = importlib.import_module(modname)
        except Exception as exc:  # pragma: no cover - defensive
            import sys

            print(f"[registry] skipping {modname}: {exc!r}", file=sys.stderr)
            continue
        queries.update(getattr(mod, "QUERIES", {}))
        oracles.update(getattr(mod, "ORACLE", {}))
    ordered = {n: queries[n] for n in _PRIORITY if n in queries}
    ordered.update({n: fn for n, fn in queries.items() if n not in ordered})
    return ordered, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _collect()[0]


def oracle_sql() -> dict[str, str]:
    q, o = _collect()
    return {k: v for k, v in o.items() if k in q}
