"""Shared helpers for declared operators.

Numeric hash-stability contract (SURVEY §2 note, §7 risk 2): the driver
compares Spark results against DuckDB by order-insensitive value-hash, so
float aggregates must be *bit-identical* across engines.  Summing doubles is
order-dependent; Spark's partial/final aggregation and DuckDB's parallel sum
can disagree in the last ulps.  We therefore:

- SUM: cast the addend to DECIMAL(18,6) pre-sum (exact, associative integer
  arithmetic in both engines), cast the result back to double.  Both sides of
  every oracle pair use the same cast, so results are bit-identical.
- AVG / STDDEV / CORR: round(…, 4) — the error of a mean/variance is
  O(sum_error / n), far below 1e-4 at our scales.
- Alias every computed column identically in Spark code and oracle SQL
  (the driver sorts columns by name before hashing).

At 100 TB these casts are still the right call: decimal sums avoid
nondeterministic reduce orders across thousands of partial aggregates, for a
few % cpu cost inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dsum(col: Column, alias: str) -> Column:
    """Exact, engine-portable SUM of a double expression."""
    return F.sum(col.cast(DEC)).cast("double").alias(alias)


def r4(col: Column, alias: str) -> Column:
    """round(expr, 4) with alias — for avg/stddev-class aggregates."""
    return F.round(col, 4).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """Oracle-side twin of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


_SCRATCH_ROOT: list[str] = []


def scratch_dir(prefix: str) -> str:
    """Fresh unique directory under one per-process scratch root that is
    removed at interpreter exit.

    Operators that materialize layouts (bucketed warehouses, compaction
    targets, format round-trips) need a private directory per invocation,
    but a bare ``tempfile.mkdtemp`` per call leaks disk across repeated
    bench/registry runs (ADVICE r3).  Routing every call through one
    atexit-cleaned root keeps per-invocation isolation and bounds the leak
    to a single process lifetime.
    """
    import atexit
    import shutil
    import tempfile

    if not _SCRATCH_ROOT:
        root = tempfile.mkdtemp(prefix="dfts_scratch_")
        _SCRATCH_ROOT.append(root)
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_SCRATCH_ROOT[0])
