"""Property-based algebraic invariants (SURVEY §5 "Property-based"):
relational-algebra laws the engine must satisfy for ANY predicate/column
choice.  Hypothesis draws predicates over the sf0.001 tables."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from datafusion_test_spark.io import table

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Predicates over lineitem drawn from a closed family.
_NUM_COLS = ["l_quantity", "l_discount", "l_tax", "l_extendedprice"]
predicates = st.tuples(
    st.sampled_from(_NUM_COLS),
    st.sampled_from(["<", ">="]),
    st.floats(min_value=0.0, max_value=60.0, allow_nan=False),
)


def _pred(col, op, v):
    return (F.col(col) < v) if op == "<" else (F.col(col) >= v)


@given(p=predicates)
@SETTINGS
def test_distinct_idempotent(spark, sf_dir, p):
    li = table(spark, sf_dir, "lineitem").filter(_pred(*p)).select(
        "l_returnflag", "l_linestatus"
    )
    once = li.distinct()
    assert once.count() == once.distinct().count()


@given(p=predicates)
@SETTINGS
def test_filter_commutes_with_project(spark, sf_dir, p):
    li = table(spark, sf_dir, "lineitem")
    cols = ["l_orderkey", "l_linenumber", *_NUM_COLS]
    a = li.filter(_pred(*p)).select(*cols)
    b = li.select(*cols).filter(_pred(*p))
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0


@given(p=predicates)
@SETTINGS
def test_union_counts_add(spark, sf_dir, p):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", *_NUM_COLS)
    sat = li.filter(_pred(*p))
    unsat = li.filter(~_pred(*p))
    # the predicate family never produces NULLs, so sat ⊎ unsat = all
    assert sat.count() + unsat.count() == li.count()
    assert sat.unionAll(unsat).count() == li.count()


@given(p=predicates, q=predicates)
@SETTINGS
def test_conjunctive_filter_composes(spark, sf_dir, p, q):
    li = table(spark, sf_dir, "lineitem")
    chained = li.filter(_pred(*p)).filter(_pred(*q))
    combined = li.filter(_pred(*p) & _pred(*q))
    assert chained.count() == combined.count()


def test_registry_consistency():
    """Every oracle pairs with a declared query; no orphans, no duplicate
    names across operator modules (asserted inside _collect), and every
    oracle is a non-empty SELECT/WITH statement."""
    from datafusion_test_spark import registry

    qs = registry.queries()
    oracles = registry.oracle_sql()
    assert set(oracles) <= set(qs)
    for name, sql in oracles.items():
        head = sql.strip().split(None, 1)[0].upper()
        assert head in ("SELECT", "WITH"), f"{name}: oracle must be a query"
