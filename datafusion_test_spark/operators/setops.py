"""Set operations (SURVEY §2.2 "Set operations").

Reference parity: UnionExec and set-op rewrites in `datafusion-physical-plan`
(reference Cargo.lock:1106-1107).  UNION ALL is a zero-shuffle concatenation
of children in both engines; DISTINCT variants add one hash-aggregate
exchange; INTERSECT/EXCEPT lower to semi/anti joins under DISTINCT — at
100 TB these are one shuffle each on the full row as key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table


def _split(spark, sf_dir):
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    hi = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000.0).select(
        "o_orderkey", "o_orderstatus"
    )
    urgent = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey", "o_orderstatus")
    return o, hi, urgent


def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union (keeps duplicates)."""
    _, hi, urgent = _split(spark, sf_dir)
    return hi.unionAll(urgent)


def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (duplicates collapsed)."""
    _, hi, urgent = _split(spark, sf_dir)
    return hi.union(urgent).distinct()


def intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (DISTINCT semantics): custkeys having both an URGENT and a
    5-LOW order."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return a.intersect(b)


def except_(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (DISTINCT semantics): custkeys with URGENT but no 5-LOW order."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return a.subtract(b)  # subtract == EXCEPT DISTINCT


def intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — multiplicity = min of the two sides):
    custkey occurrences present in both the URGENT and the 5-LOW order
    bags.  The distinction matters for audit queries counting matched
    occurrences, not matched keys."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return a.intersectAll(b)


def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics — multiplicity = left minus right,
    floored at zero): URGENT custkey occurrences surviving removal of one
    occurrence per 5-LOW order."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return a.exceptAll(b)


QUERIES = {
    "union_all": union_all,
    "union_distinct": union_distinct,
    "intersect": intersect,
    "except": except_,
    "intersect_all": intersect_all,
    "except_all": except_all,
}

ORACLE = {
    "intersect_all": """
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    "except_all": """
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    "union_all": """
        SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 200000.0
        UNION ALL
        SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    "union_distinct": """
        SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 200000.0
        UNION
        SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    "intersect": """
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
    "except": """
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
}
