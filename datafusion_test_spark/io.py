"""Testdata loading — the Spark analog of the reference's listing-table
registration (/root/reference/src/main.rs:131-144: directory of parquet files
registered as a named table, schema inferred from footers).

Spark's ``spark.read.parquet`` already does multi-file listing + footer schema
merge + partition discovery; at 100 TB scale the same call reads a partitioned
lake layout (s3://.../table/dt=.../*.parquet) with partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Reader-schema memo, keyed by (applicationId, path).  spark.read.parquet
# re-infers the schema from footers on EVERY call — measured 97 ms/call
# warm vs 24 ms with an explicit schema (r14, guide §1: per-query driver
# overhead multiplies across a 200-query bench making ~600 table() calls).
# Same immutability contract as similarity._ANN_CACHE: parquet files under
# a path are immutable for the application's lifetime; a caller that
# rewrites a corpus in place must call clear_schema_cache().  This caches
# METADATA only (a StructType), never rows or results.
_SCHEMA_CACHE: dict = {}

# Finished-plan memo (same key and immutability contract): the DataFrame
# object returned by table() — a logical plan, never rows.
_DF_CACHE: dict = {}

# applicationId the caches were filled under.  A long-lived process that
# cycles sessions would otherwise accumulate entries for stopped sessions
# forever, each pinning py4j/JVM-backed objects (ADVICE r14): when table()
# sees a DIFFERENT applicationId, the previous session's entries are dead
# weight — evict them all.  Keys still carry the appId, so correctness
# never depended on this; it is purely a leak bound.
_CACHE_APP: list = [None]


def clear_schema_cache() -> None:
    """Drop all memoized reader schemas and table plans (contract above)."""
    _SCHEMA_CACHE.clear()
    _DF_CACHE.clear()


def table(
    spark: SparkSession, sf_dir: str, name: str, fresh: bool = False
) -> DataFrame:
    """Read one testdata table (schema-on-read from parquet footers).

    The finished DataFrame (a logical PLAN — no rows, no results) is also
    memoized per (applicationId, path): building it costs ~34 ms of py4j
    even with the schema cached, ~600 times per bench run.  DataFrames
    are immutable, so handing every caller the same object is safe;
    queries that self-join one table already derive both sides from a
    single table() result.

    ``fresh=True`` bypasses the plan memo (the schema memo still
    applies) and returns a relation with NEW expression ids — required
    where two sides of a cogroup must bind distinct attributes
    (udf_cogrouped's self-cogroup hazard: with shared ids the analyzer
    binds the right side's pandas arguments to the LEFT's expression
    ids; pinned by tests/test_plans.py::test_udf_cogrouped_binds_
    distinct_sides, which caught this when the r14 plan memo landed)."""
    tune(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    app = spark.sparkContext.applicationId
    if _CACHE_APP[0] != app:
        if _CACHE_APP[0] is not None:
            _SCHEMA_CACHE.clear()
            _DF_CACHE.clear()
        _CACHE_APP[0] = app
    key = (app, path)
    if not fresh:
        cached = _DF_CACHE.get(key)
        if cached is not None:
            return cached
    sch = _SCHEMA_CACHE.get(key)
    if sch is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
    else:
        df = spark.read.schema(sch).parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos-as-long (see session.RUNTIME_CONFS) -> microsecond timestamp.
        # Integer DIV, not `/`: ns epochs overflow double's 53-bit mantissa.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if name == "embeddings":
        # the finite-vector measurement contract: a vector with any
        # NaN/±Inf element (failed model forward pass) reads as NULL, so
        # every consumer reuses its proven NULL-embedding handling.  Every
        # oracle's FROM embeddings carries the same SELECT * REPLACE guard.
        # Engines genuinely disagree downstream of a NaN element (decimal
        # casts, approx quantiles, ANSI float->int), so the contract must
        # sit at the read.  See _util.finite_vec; ieee corpus, round 7.
        # Consumers that never touch `embedding` lose nothing: Catalyst
        # prunes the rewritten column and the scan skips it entirely.
        from ._util import finite_vec

        df = df.withColumn("embedding", finite_vec("embedding"))
    if not fresh:
        _DF_CACHE[key] = df
    return df


def parallel(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Repartition ONLY when the scan has fewer splits than cores.

    Single-row-group testdata files cannot be split, so a scan-heavy
    aggregate would otherwise run its whole map side on one core (measured:
    TPC-H Q1 at sf0.1 is 2.0 s single-split vs 1.45 s repartitioned).  On a
    real lake the scan already has thousands of splits and this is a no-op
    check — repartition always shuffles, so it must never run
    unconditionally (same policy as pipeline.dedup._words_of)."""
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register testdata tables as temp views for the SQL entry point —
    parity with register_listing_table (src/main.rs:137-144)."""
    tune(spark)
    for name in tables:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
