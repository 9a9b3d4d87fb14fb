"""Storage-layout tests: partition pruning and bucketed (shuffle-free)
joins — the two layout levers that matter most at 100 TB."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from datafusion_test_spark.io import table
from datafusion_test_spark.plans import introspect


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_part")
    o = table(spark, sf_dir, "orders")
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)

    rt = spark.read.parquet(out).filter(F.col("o_orderstatus") == "O")
    plan = introspect.plan_string(rt)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    # pruned read returns exactly the matching rows
    assert rt.count() == o.filter(F.col("o_orderstatus") == "O").count()


def test_bucketed_agg_has_no_shuffle(spark, sf_dir):
    """GROUP BY on the bucket key of a bucketed table must aggregate
    without an Exchange, and every emitted row must carry the verified
    plan property."""
    from datafusion_test_spark.operators.maintenance import layout_bucket_agg

    rows = layout_bucket_agg(spark, sf_dir).collect()
    assert rows
    assert all(r["bucketed_no_shuffle"] for r in rows)
    n_supp = (
        table(spark, sf_dir, "lineitem").select("l_suppkey").distinct().count()
    )
    assert len(rows) == n_supp


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Bucketed tables co-located on the join key join WITHOUT an Exchange —
    the pre-shuffled layout that turns every future join on that key into a
    map-side merge at 100 TB."""
    warehouse = str(tmp_path / "wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS layoutdb LOCATION '{warehouse}'")
    try:
        o = table(spark, sf_dir, "orders")
        li = table(spark, sf_dir, "lineitem")
        for df, name, key in ((o, "orders_b", "o_orderkey"), (li, "lineitem_b", "l_orderkey")):
            df.write.mode("overwrite").bucketBy(8, key).sortBy(key).option(
                "path", os.path.join(warehouse, name)
            ).saveAsTable(f"layoutdb.{name}")

        joined = (
            spark.table("layoutdb.lineitem_b")
            .join(
                # merge hint: at sf0.001 AQE would broadcast the small side,
                # which hides the property under test (bucket co-location)
                spark.table("layoutdb.orders_b").hint("merge"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = introspect.plan_string(joined)
        # join itself must not introduce a shuffle: the only Exchange allowed
        # is the post-join aggregation's
        join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # and results are correct
        got = {r["o_orderstatus"]: r["n"] for r in joined.collect()}
        want = {
            r["o_orderstatus"]: r["n"]
            for r in li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want
    finally:
        spark.sql("DROP DATABASE IF EXISTS layoutdb CASCADE")


def test_manifest_prune_nonvacuous_at_sf001(spark):
    """scan_manifest_prune's IO claim must bite at sf0.01: ~70% of orders
    exceed the 150k threshold, so with 6 range-partitioned files at least
    one lies fully above it — manifest_pruned TRUE therefore implies
    fewer files were read than written (not the vacuous branch)."""
    from datafusion_test_spark.sources.connectors import scan_manifest_prune
    from datafusion_test_spark.io import table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    rows = scan_manifest_prune(spark, sf).collect()
    assert rows and all(r["manifest_pruned"] for r in rows)
    o = table(spark, sf, "orders")
    frac_above = (
        o.filter(F.col("o_totalprice") > 150000.0).count() / o.count()
    )
    assert frac_above > 0.25  # at least one of 6 range files fully above
