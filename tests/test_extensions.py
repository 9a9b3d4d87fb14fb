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
