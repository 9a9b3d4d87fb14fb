"""io.table's r14 plan/schema memo — semantics pins.

The memo caches METADATA (a StructType) and a logical PLAN (the finished
DataFrame object), never rows: every execution still scans the parquet
files.  These pins hold the three load-bearing properties:

1. repeated table() calls return ONE object (the memo actually memoizes —
   the 109 ms/call footer re-inference is what the r14 optimization
   removed);
2. ``fresh=True`` returns a relation with NEW expression ids (the
   udf_cogrouped self-cogroup hazard: a cogroup's two sides must bind
   distinct attributes — tests/test_plans.py pins the plan side of this);
3. clear_schema_cache() resets both memos.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

from datafusion_test_spark.io import clear_schema_cache, table
from datafusion_test_spark.session import get_session

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_session("test_io_cache")


def test_table_plan_is_memoized(spark):
    a = table(spark, SF, "orders")
    b = table(spark, SF, "orders")
    assert a is b, "table() should return the memoized plan object"


def test_fresh_gives_new_expression_ids(spark):
    a = table(spark, SF, "events")
    b = table(spark, SF, "events", fresh=True)
    assert a is not b
    def out_ids(df):
        out = df._jdf.queryExecution().analyzed().output()
        return {
            out.apply(i).name(): out.apply(i).exprId().id()
            for i in range(out.length())
        }

    ids_a, ids_b = out_ids(a), out_ids(b)
    assert all(ids_a[n] != ids_b[n] for n in ids_a), (
        "fresh=True must produce distinct attribute ids so cogroup sides "
        "bind separately"
    )


def test_fresh_is_not_cached(spark):
    b = table(spark, SF, "events", fresh=True)
    c = table(spark, SF, "events")
    assert b is not c, "a fresh read must not replace the memoized plan"


def test_clear_resets_the_memo(spark):
    a = table(spark, SF, "orders")
    clear_schema_cache()
    b = table(spark, SF, "orders")
    assert a is not b


def test_memoized_plan_still_scans_files(spark):
    # the memo holds a plan, not rows: a count on the memoized object must
    # read the real file (here: equals a fresh read's count)
    a = table(spark, SF, "orders")
    b = table(spark, SF, "orders", fresh=True)
    assert a.count() == b.count()


def test_cogroup_sites_take_a_fresh_side():
    """ADVICE r14 (medium): the plan memo hands every table() caller ONE
    shared DataFrame object, so a self-cogroup whose two sides come from
    the same table silently mis-binds the right side's pandas arguments
    (udf_cogrouped's documented hazard; plain self-joins are safe — the
    analyzer deduplicates conflicting attribute ids for joins, but NOT
    for cogroup binding).  This lint fails ANY package function that
    cogroups after reading the same table twice without taking at least
    one side with fresh=True — so the safety is no longer a single
    hand-patched site."""
    import ast
    import pathlib

    pkg = (
        pathlib.Path(__file__).resolve().parents[1] / "datafusion_test_spark"
    )
    offenders = []
    for py in pkg.rglob("*.py"):
        tree = ast.parse(py.read_text(), filename=str(py))
        for fn in (
            n
            for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        ):
            if not any(
                isinstance(n, ast.Attribute) and n.attr == "cogroup"
                for n in ast.walk(fn)
            ):
                continue
            reads: dict = {}
            for n in ast.walk(fn):
                is_table_call = isinstance(n, ast.Call) and (
                    (isinstance(n.func, ast.Name) and n.func.id == "table")
                    or (
                        isinstance(n.func, ast.Attribute)
                        and n.func.attr == "table"
                    )
                )
                if (
                    is_table_call
                    and len(n.args) >= 3
                    and isinstance(n.args[2], ast.Constant)
                ):
                    fresh = any(
                        kw.arg == "fresh"
                        and isinstance(kw.value, ast.Constant)
                        and kw.value.value
                        for kw in n.keywords
                    ) or (
                        len(n.args) >= 4
                        and isinstance(n.args[3], ast.Constant)
                        and n.args[3].value
                    )
                    reads.setdefault(n.args[2].value, []).append(fresh)
            for name, flags in reads.items():
                if len(flags) >= 2 and not any(flags):
                    offenders.append(
                        f"{py.name}:{fn.name} cogroups but reads "
                        f"'{name}' {len(flags)}x without fresh=True"
                    )
    assert not offenders, offenders


def test_stale_session_entries_evicted(spark):
    """ADVICE r14: entries for a DIFFERENT applicationId (a stopped
    session) are dead weight pinning JVM-backed objects; the first
    table() call under a new appId must purge them."""
    import datafusion_test_spark.io as io

    table(spark, SF, "orders")
    io._SCHEMA_CACHE[("dead-app", "x")] = "sentinel"
    io._DF_CACHE[("dead-app", "x")] = "sentinel"
    io._CACHE_APP[0] = "dead-app"  # simulate: caches were filled under it
    table(spark, SF, "orders")
    assert not any(k[0] == "dead-app" for k in io._SCHEMA_CACHE)
    assert not any(k[0] == "dead-app" for k in io._DF_CACHE)


def test_tune_repins_after_external_conf_mutation(spark):
    """ADVICE r14: the tune() memo must not let a driver-provided session
    whose runtime confs were mutated by EXTERNAL code run un-pinned; the
    sentinel probe re-applies the full set on drift."""
    from datafusion_test_spark.session import RUNTIME_CONFS, tune

    tune(spark)
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        tune(spark)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        for k, v in RUNTIME_CONFS.items():
            assert spark.conf.get(k, v) == v
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
