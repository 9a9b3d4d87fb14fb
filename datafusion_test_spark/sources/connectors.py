"""Source/sink connector round-trips beyond parquet (SURVEY §1 storage
model).  The reference itself is parquet-only over an object store
(src/main.rs:131-144, 229-231); Spark's DataSource V2 gives CSV/JSON/ORC for
free.  Each operator writes a testdata table through the format and re-reads
it with an explicit schema — the SQL oracle hash-matching the ORIGINAL table
proves the connector round-trip is lossless.

Scale note: these formats exist for interchange; the engine's native format
stays parquet (columnar, splittable, statistics).  CSV/JSON scans at 100 TB
are line-splittable but schema-on-read-expensive — always land to parquet
first, which is exactly what these operators' write-then-read shape does.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..io import table


def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer -> CSV (header) -> re-read with explicit schema."""
    out = os.path.join(tempfile.mkdtemp(prefix="dfts_csv_"), "customer_csv")
    c = table(spark, sf_dir, "customer")
    c.write.mode("overwrite").option("header", True).csv(out)
    return spark.read.schema(c.schema).option("header", True).csv(out)


def scan_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> JSON lines -> re-read with explicit schema (timestamps
    serialize as ISO-8601 and parse back losslessly at µs precision)."""
    out = os.path.join(tempfile.mkdtemp(prefix="dfts_json_"), "events_json")
    ev = table(spark, sf_dir, "events")
    # default JSON timestampFormat truncates to milliseconds; pin µs
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ev.write.mode("overwrite").option("timestampFormat", fmt).json(out)
    return spark.read.schema(ev.schema).option("timestampFormat", fmt).json(out)


def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> ORC -> re-read (the other columnar container)."""
    out = os.path.join(tempfile.mkdtemp(prefix="dfts_orc_"), "orders_orc")
    o = table(spark, sf_dir, "orders")
    o.write.mode("overwrite").orc(out)
    return spark.read.orc(out)


def write_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned write (orders partitionBy o_orderstatus) and
    re-read — the 100 TB lakehouse layout.  Filters on the partition column
    become PartitionFilters (directory pruning, zero data read for pruned
    partitions; asserted in tests/test_plans.py).  Oracle hash-matches the
    source table, proving the layout round-trip is lossless."""
    out = os.path.join(tempfile.mkdtemp(prefix="dfts_part_"), "orders_part")
    o = table(spark, sf_dir, "orders")
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    rt = spark.read.parquet(out)
    # partition column comes back as the last column; restore source order
    return rt.select(*o.columns)


QUERIES = {
    "write_partitioned": write_partitioned,
    "scan_csv_roundtrip": scan_csv_roundtrip,
    "scan_json_roundtrip": scan_json_roundtrip,
    "scan_orc_roundtrip": scan_orc_roundtrip,
}

ORACLE = {
    "write_partitioned": "SELECT * FROM orders",
    "scan_csv_roundtrip": "SELECT * FROM customer",
    "scan_json_roundtrip": "SELECT * FROM events",
    "scan_orc_roundtrip": "SELECT * FROM orders",
}
