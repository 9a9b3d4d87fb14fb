"""Physical-plan introspection helpers.

The reference proves its optimizations by config (pushdown_filters,
with_enable_pruning — src/main.rs:126,131); we prove ours by inspecting the
executed plan.  Used by tests/test_plans.py and handy interactively:

    >>> from datafusion_test_spark.plans.introspect import summarize
    >>> print(summarize(df))
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Predicates that reached the parquet scan (row-group pruning inputs)."""
    out: list[str] = []
    # NB: Spark elides long scan descriptions with "...", so the list may
    # lack its closing bracket — stop at "]" or at the next field.
    for m in re.finditer(
        r"PushedFilters: \[(.*?)(?:\]|\.\.\.|, ReadSchema)", plan_string(df)
    ):
        out += [p.strip() for p in m.group(1).split(",") if p.strip()]
    return out


def read_schema(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column-pruning proof)."""
    cols: list[str] = []
    # tolerate Spark's "..." elision of long scan descriptions
    for m in re.finditer(r"ReadSchema: struct<([^>]*?)(?:>|\.\.\.)", plan_string(df)):
        cols += [c.split(":")[0] for c in m.group(1).split(",") if c and ":" in c]
    return sorted(set(cols))


def join_strategies(df: DataFrame) -> list[str]:
    """Join operators in the physical plan, in appearance order."""
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan_string(df),
    )


def num_shuffles(df: DataFrame) -> int:
    """Exchange count — the scale-critical quantity to minimize."""
    return len(re.findall(r"Exchange (hash|range|rangepartitioning|RoundRobin|SinglePartition)", plan_string(df)))


def summarize(df: DataFrame) -> str:
    return (
        f"joins={join_strategies(df)} shuffles={num_shuffles(df)} "
        f"pushed={pushed_filters(df)} read={read_schema(df)}"
    )
