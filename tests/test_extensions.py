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
