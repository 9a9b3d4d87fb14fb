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
