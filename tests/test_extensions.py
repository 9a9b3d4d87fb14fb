"""Catalyst extension point: a compiled optimizer rule injected via
spark.sql.extensions (SURVEY §7 stretch; the Spark analog of registering an
OptimizerRule with DataFusion's SessionContext).

The rule (dfts.UnitFactorElimination) rewrites x * 1.0 -> x.  The control
assertion runs on the shared vanilla session (Multiply survives Catalyst's
builtin rules), then a fresh subprocess JVM with the jar + extensions conf
proves the custom rule removes it without changing results.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from pyspark.sql import functions as F

from datafusion_test_spark.io import table

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_vanilla_session_keeps_unit_multiply(spark, sf_dir):
    df = table(spark, sf_dir, "nation").select(
        (F.col("n_nationkey").cast("double") * F.lit(1.0)).alias("x")
    )
    assert "* 1.0" in _optimized_plan(df)  # builtin rules do NOT fold x*1.0


def test_injected_rule_eliminates_unit_multiply(sf_dir):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import build_extension

    try:
        # force=True: always recompile from the reviewed .scala source so the
        # committed jar is never trusted on mtime alone (fresh clones give the
        # source and the binary identical checkout mtimes)
        jar = build_extension.build(force=True)
    except Exception as exc:  # no bundled compiler on this machine
        pytest.skip(f"cannot build extension jar: {exc}")

    probe = f"""
import sys
sys.path.insert(0, {REPO!r})
from pyspark.sql import SparkSession, functions as F
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.extensions", "dfts.DftsExtensions")
    .config("spark.jars", {jar!r})
    .config("spark.driver.extraClassPath", {jar!r})
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from datafusion_test_spark.io import table
df = table(spark, {sf_dir!r}, "nation").select(
    "n_nationkey",
    (F.col("n_nationkey").cast("double") * F.lit(1.0)).alias("x"),
)
plan = df._jdf.queryExecution().optimizedPlan().toString()
assert "* 1.0" not in plan, "rule did not fire:\\n" + plan
rows = {{r["n_nationkey"]: r["x"] for r in df.collect()}}
assert all(v == float(k) for k, v in rows.items()), rows
print("EXTENSION_OK", len(rows))
"""
    out = subprocess.run(
        [sys.executable, "-c", probe],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "EXTENSION_OK" in out.stdout, out.stdout + out.stderr


def test_dedup_paragraph_reassembly_lossless(spark, sf_dir):
    """A document none of whose paragraphs appeared earlier must
    reassemble to ITSELF (segmentation is lossless by construction):
    n_kept == n_paras implies kept_fp == md5(text) and kept_chars ==
    length(text)."""
    from pyspark.sql import functions as F

    from datafusion_test_spark.io import table
    from datafusion_test_spark.pipeline.dedup import dedup_paragraph

    out = dedup_paragraph(spark, sf_dir)
    full = out.filter(F.col("n_kept") == F.col("n_paras"))
    assert full.count() > 0  # the corpus has non-clone documents
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5("text").alias("want_fp"),
        F.length("text").cast("bigint").alias("want_chars"),
    )
    bad = full.join(docs, "doc_id").filter(
        (F.col("kept_fp") != F.col("want_fp"))
        | (F.col("kept_chars") != F.col("want_chars"))
    )
    assert bad.count() == 0


def test_drift_psi_contributions_nonnegative(spark, sf_dir):
    """PSI per-bucket contributions are (p-q)(ln p - ln q) with ln
    monotone, so every contribution is >= 0; buckets live in [0, 10)."""
    from datafusion_test_spark.pipeline.quality import drift_psi

    rows = drift_psi(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["bucket"] <= 9
        assert r["contrib_scaled"] >= 0
        assert 1 <= r["pct_ref"] <= 100 and 1 <= r["pct_cur"] <= 100


def test_eval_bootstrap_ci_ordered_and_complete(spark, sf_dir):
    """All 200 Poisson resamples are valid on real data; the rank-selected
    CI is ordered and brackets a value near the full-sample mean."""
    from datafusion_test_spark.pipeline.evals import eval_bootstrap_ci

    row = eval_bootstrap_ci(spark, sf_dir).collect()[0]
    assert row["b_resamples"] == 200
    assert row["ci_lo"] is not None and row["ci_hi"] is not None
    assert row["ci_lo"] <= row["ci_hi"]
    assert row["ci_lo"] <= row["mean_value"] * 1.5  # sanity bracket


def test_graph_cc_partitions_edge_nodes(spark, sf_dir):
    """Component sizes must sum to the number of nodes in the thresholded
    co-purchase graph, and every component has >= 2 nodes."""
    from pyspark.sql import functions as F

    from datafusion_test_spark.io import table
    from datafusion_test_spark.operators.analytics import (
        graph_connected_components,
    )

    comps = graph_connected_components(spark, sf_dir).collect()
    assert all(c["n_nodes"] >= 2 for c in comps)
    li = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    nodes = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select(F.explode(F.array("u", "v")).alias("n"))
        .distinct()
        .count()
    )
    assert sum(c["n_nodes"] for c in comps) == nodes


def test_shard_binpack_balance_bound(spark, sf_dir):
    """Next-fit-decreasing invariant: every shard's byte fill is within
    [budget, budget + max_doc) except possibly the LAST (smallest
    shard_id order = largest docs first; only the tail shard may be
    underfull), and totals are conserved."""
    import duckdb

    from datafusion_test_spark.pipeline.curation import (
        _SHARD_BYTES, pipeline_shard_binpack,
    )

    rows = sorted(
        pipeline_shard_binpack(spark, sf_dir).collect(),
        key=lambda r: r["shard_id"],
    )
    assert rows
    total = duckdb.sql(
        f"SELECT COALESCE(SUM(COALESCE(strlen(text),0)),0) FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    assert sum(r["bytes_sum"] for r in rows) == total
    for r in rows[:-1]:
        # a non-final shard closed because the NEXT doc overflowed it:
        # >= budget - max remaining doc; and overshoot < its own max doc
        assert r["bytes_sum"] + r["max_doc_bytes"] > _SHARD_BYTES
    # sizes are packed in DESCENDING order: shard max_doc_bytes monotone
    maxes = [r["max_doc_bytes"] for r in rows]
    assert maxes == sorted(maxes, reverse=True)


def test_dsir_weights_target_scores_higher(spark, sf_dir):
    """DSIR sanity on real data: the mean importance weight of target-
    language documents must exceed the mean of non-target documents
    (the whole point of the statistic), and every weight is positive."""
    from pyspark.sql import functions as F

    from datafusion_test_spark.pipeline.text import (
        _DSIR_TARGET_LANG, text_dsir_weights,
    )

    df = text_dsir_weights(spark, sf_dir)
    agg = (
        df.groupBy(F.col("lang") == _DSIR_TARGET_LANG)
        .agg(F.avg("dsir_weight").alias("m"), F.min("dsir_weight").alias("lo"))
        .collect()
    )
    by = {bool(r[0]): r for r in agg if r[0] is not None}
    assert by[True]["m"] > by[False]["m"]
    assert all(r["lo"] > 0 for r in agg)


def test_elo_bt_gamma_orders_by_win_rate_extremes(spark, sf_dir):
    """BT sanity: every kept type has >= 1 win and >= 1 loss; gammas are
    positive; and the type with the best win RATE outranks the worst
    (BT strengths are monotone in dominance for a connected duel graph)."""
    from datafusion_test_spark.pipeline.evals import eval_elo_bt

    rows = eval_elo_bt(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_wins"] < r["n_matches"]
        assert r["bt_gamma"] > 0
    best = max(rows, key=lambda r: r["n_wins"] / r["n_matches"])
    worst = min(rows, key=lambda r: r["n_wins"] / r["n_matches"])
    if best["n_wins"] / best["n_matches"] > worst["n_wins"] / worst["n_matches"]:
        assert best["bt_gamma"] > worst["bt_gamma"]
