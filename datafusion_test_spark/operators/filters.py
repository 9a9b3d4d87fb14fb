"""Filter / predicate operators (SURVEY §2.2 "Filters / predicates").

Reference parity: DataFusion's physical predicate evaluation
(`datafusion-physical-expr`, reference Cargo.lock:1044) driven through the
pushdown-enabled parquet scan (/root/reference/src/main.rs:126,131).

Scale notes: every one of these predicates is a deterministic built-in Column
expression, so Catalyst pushes it into the parquet scan (PushedFilters) and
prunes row groups via footer min/max stats — at 100 TB the scan reads only
matching row groups and only referenced columns.  Verified by plan assertions
in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table


def filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """<,<=,=,>=,>,!= on numeric + date columns."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") < 10)
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_tax") <= 0.07)
        & (F.col("l_linenumber") != 3)
        & (F.col("l_shipdate") > F.lit("1997-01-01"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax", "l_shipdate")


def filter_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND / OR / NOT composition."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") | (F.col("o_totalprice") > 200000.0))
        & ~(F.col("o_orderpriority") == "5-LOW")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


def filter_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (...) and BETWEEN."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_returnflag").isin("A", "R")
        & F.col("l_quantity").between(5, 15)
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")


def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / ILIKE pattern matching."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("%PROMO%") | F.col("p_name").ilike("%a%b%")
    ).select("p_partkey", "p_name", "p_type")


def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / IS NOT NULL three-valued logic (nulls introduced via NULLIF)."""
    c = table(spark, sf_dir, "customer")
    withnull = c.withColumn("seg", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")))
    return (
        withnull.filter(F.col("seg").isNull() | (F.col("c_acctbal") < 0))
        .select("c_custkey", "seg", "c_acctbal")
    )


QUERIES = {
    "filter_compare": filter_compare,
    "filter_boolean": filter_boolean,
    "filter_in_between": filter_in_between,
    "filter_like": filter_like,
    "filter_null": filter_null,
}

ORACLE = {
    "filter_compare": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax, l_shipdate
        FROM lineitem
        WHERE l_quantity < 10 AND l_discount >= 0.05 AND l_tax <= 0.07
          AND l_linenumber != 3 AND l_shipdate > TIMESTAMP '1997-01-01'
    """,
    "filter_boolean": """
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE (o_orderstatus = 'F' OR o_totalprice > 200000.0)
          AND NOT (o_orderpriority = '5-LOW')
    """,
    "filter_in_between": """
        SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        FROM lineitem
        WHERE l_returnflag IN ('A', 'R') AND l_quantity BETWEEN 5 AND 15
    """,
    "filter_like": """
        SELECT p_partkey, p_name, p_type
        FROM part
        WHERE p_type LIKE '%PROMO%' OR p_name ILIKE '%a%b%'
    """,
    "filter_null": """
        SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg, c_acctbal
        FROM customer
        WHERE NULLIF(c_mktsegment, 'BUILDING') IS NULL OR c_acctbal < 0
    """,
}
