"""Sort / limit / top-k operators (SURVEY §2.2 "Sort / limit / top-k").

Reference parity: SortExec / SortPreservingMergeExec / GlobalLimitExec
(reference Cargo.lock:1106-1107).

Scale notes: a global ORDER BY at 100 TB is a range-partitioned sort
(Spark samples key ranges, then sorts within partitions — no single-node
bottleneck).  ORDER BY + LIMIT n is planned as TakeOrderedAndProject: each
partition keeps a k-heap and only k rows per partition hit the driver —
DataFusion's TopK, same idea.  Top-k *per group* is the window + rn<=k
pattern, one shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import table


def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY with ASC/DESC and NULLS FIRST/LAST (nulls injected
    via NULLIF so the null paths are actually exercised)."""
    c = table(spark, sf_dir, "customer")
    return (
        c.withColumn("seg", F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")))
        .select("c_custkey", "seg", "c_acctbal")
        .orderBy(
            F.col("seg").desc_nulls_last(),
            F.col("c_acctbal").asc_nulls_first(),
            F.col("c_custkey"),
        )
    )


def limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic LIMIT after a total order (TakeOrderedAndProject plan)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by totalprice per customer (window + filter rn<=k)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


QUERIES = {
    "sort_multi": sort_multi,
    "limit": limit,
    "topk_per_group": topk_per_group,
}

ORACLE = {
    "sort_multi": """
        SELECT c_custkey, NULLIF(c_mktsegment, 'MACHINERY') AS seg, c_acctbal
        FROM customer
        ORDER BY seg DESC NULLS LAST, c_acctbal ASC NULLS FIRST, c_custkey
    """,
    "limit": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "topk_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
}
