"""Central registry: aggregates every declared operator (SURVEY §2) into the
``queries()`` / ``oracle_sql()`` dicts that ``__spark_entry__.py`` exports.

Each operator module exposes ``QUERIES: dict[name, fn(spark, sf_dir) -> DF]``
and ``ORACLE: dict[name, sql]`` (omit a name from ORACLE for rows-only ops).
Modules are imported lazily-tolerantly so one broken family never takes down
the whole surface.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULES = [
    "datafusion_test_spark.operators.relational",
    "datafusion_test_spark.operators.filters",
    "datafusion_test_spark.operators.aggregates",
    "datafusion_test_spark.operators.joins",
    "datafusion_test_spark.operators.windows",
    "datafusion_test_spark.operators.sorting",
    "datafusion_test_spark.operators.setops",
    "datafusion_test_spark.operators.subqueries",
    "datafusion_test_spark.operators.udf",
    "datafusion_test_spark.functions.scalar",
    "datafusion_test_spark.sources.generate",
    "datafusion_test_spark.sources.connectors",
    "datafusion_test_spark.streaming.batch_windows",
    "datafusion_test_spark.pipeline.dedup",
    "datafusion_test_spark.pipeline.similarity",
    "datafusion_test_spark.pipeline.text",
    "datafusion_test_spark.pipeline.multimodal",
]


def _collect() -> tuple[dict, dict]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        try:
            mod = importlib.import_module(modname)
        except Exception as exc:  # pragma: no cover - defensive
            import sys

            print(f"[registry] skipping {modname}: {exc!r}", file=sys.stderr)
            continue
        queries.update(getattr(mod, "QUERIES", {}))
        oracles.update(getattr(mod, "ORACLE", {}))
    return queries, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _collect()[0]


def oracle_sql() -> dict[str, str]:
    q, o = _collect()
    return {k: v for k, v in o.items() if k in q}
