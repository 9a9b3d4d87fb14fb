"""Carrier-type audit of every oracle SQL (no Spark session needed).

The driver's canonicalizer hashes the *carrier type* of each result cell, so
a DuckDB oracle column that is value-identical to the Spark side can still
hash-mismatch when DuckDB widens it: SUM over integers -> HUGEINT (int128),
decimal arithmetic -> DECIMAL, list aggregates -> LIST.  One red driver row
per round traced to this class (r1 agg_collect array, r2 fn_cast DECIMAL,
r3 tpch_q12_shape HUGEINT) before this gate existed.

Runs every ``oracle_sql()`` entry through DuckDB at sf0.001 and asserts no
result column carries a driver-unsafe type.  Mirrors the runtime gate in
tools/check_oracles.py (risky_duck_types).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from datafusion_test_spark import registry
from datafusion_test_spark.io import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TYPECHECK_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata missing: {SF_DIR}"
)

_RISKY = ("HUGEINT", "DECIMAL")


def _risky(cols, types):
    out = []
    for c, t in zip(cols, types):
        ts = str(t).upper()
        if (
            "HUGEINT" in ts
            or ts.startswith("DECIMAL")
            or "[]" in str(t)
            or "STRUCT" in ts
            or "MAP" in ts
        ):
            out.append((c, str(t)))
    return out


def test_no_oracle_emits_driver_unsafe_types():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    offenders = {}
    errors = {}
    for name, sql in registry.oracle_sql().items():
        try:
            cur = con.sql(sql)
            risky = _risky(cur.columns, cur.types)
        except Exception as exc:  # oracle must at least parse/bind
            errors[name] = repr(exc)[:200]
            continue
        if risky:
            offenders[name] = risky
    assert not errors, f"oracles failed to run on DuckDB: {errors}"
    assert not offenders, (
        "oracle result columns with driver-unsafe carrier types "
        f"(cast to BIGINT/DOUBLE/VARCHAR in the SQL): {offenders}"
    )
