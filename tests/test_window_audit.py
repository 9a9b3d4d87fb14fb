"""Global-window discipline ratchet (VERDICT r5 items 3-4).

An unpartitioned window (``Window.orderBy`` with no ``partitionBy``)
moves its ENTIRE input into one task for the sort — fine over a bounded
relation (post-``limit(k)`` rank derivation, day-bucket aggregate,
thresholded heavy-hitter survivors), a scale-killer over a fact table
(the r5 skyline_pareto finding: a RANGE frame over every orders row).

Two layers, both ratchets:

1. **Source scan** — every ``Window.orderBy`` site in the package must
   map to a function in ``_SITE_ALLOWLIST`` below, each with its bound
   stated.  A new site fails until it is either partitioned or proven
   bounded and listed here.
2. **Plan walk** — for each registry entry that exercises an allowlisted
   site, build the DataFrame at sf0.001 and walk the *optimized logical
   plan*: every Window node with an empty partitionSpec must sit over a
   subtree where each leaf path passes through an Aggregate or Limit (or
   ends in a literal/local relation).  This makes the bound machine-
   checked, not comment-checked: if someone removes the ``limit(k)`` or
   the day-bucket aggregate under an allowlisted window, the plan walk
   fails even though the source scan still passes.

Helper sites (``ivf_centroids``, ``_pq_train``) train on eagerly
materialized relations, so their windows may not appear in the final
plan of the entries that use them; their bound (``limit(k)`` seeds) is
asserted by the source-adjacent entries below where visible.
"""

from __future__ import annotations

import ast
from pathlib import Path

import pytest

PKG = Path(__file__).resolve().parents[1] / "datafusion_test_spark"
SF = "/root/testdata/sf0.001"

# function name -> stated bound for its unpartitioned-window site(s).
_SITE_ALLOWLIST = {
    "agg_wilson_rank": "rank over orderBy().limit(50) survivors",
    "skyline_pareto": "strict-prefix min over per-day aggregate (~2.4k days)",
    "agg_life_table": "cumulative frame over per-age-bucket aggregate",
    "seq_path_census": "rank over |event_type|^3 path-census aggregate",
    "join_basket_lift": "rank over orderBy().limit(k) survivors",
    "agg_heavy_hitters": "rank over <=1/theta thresholded survivors",
    "text_vocab_build": "rank over thresholded vocab aggregate",
    "text_bm25_topk": "rank over orderBy().limit(10) survivors",
    "corpus_vocab_growth": "prefix frame over corpus/50 checkpoint buckets",
    "ivf_centroids": "row_number over orderBy().limit(k) centroid seeds",
    "_pq_train": "row_number over orderBy().limit(_PQ_K) seed ids",
    "eval_bootstrap_ci": "rank over groupBy(b) of the B<=200 resample spine",
}

# registry entries whose final optimized plan retains an unpartitioned
# Window, checked by the plan walk.  Entries using the training helpers
# (sim_ivf, embed_pq) materialize those windows during construction, so
# the walk would see nothing — their bound is the limit(k) in the helper
# source, frozen by the source scan above.
_PLAN_WALK_ENTRIES = [
    "agg_wilson_rank",
    "skyline_pareto",
    "agg_life_table",
    "seq_path_census",
    "join_basket_lift",
    "agg_heavy_hitters",
    "text_vocab_build",
    "text_bm25_topk",
    "corpus_vocab_growth",
]


def _window_sites() -> dict[tuple[str, str], int]:
    """(relative file, enclosing function) -> count of Window.orderBy.

    AST-based: matches actual ``Window.orderBy`` attribute accesses, so a
    docstring or comment that merely *mentions* the pattern (e.g. the
    WARN-silencing rationale in session.py) does not trip the ratchet.
    """
    out: dict[tuple[str, str], int] = {}
    for py in sorted(PKG.rglob("*.py")):
        src = py.read_text()
        if "Window.orderBy" not in src:
            continue
        tree = ast.parse(src)
        site_lines = [
            n.lineno
            for n in ast.walk(tree)
            if isinstance(n, ast.Attribute)
            and n.attr == "orderBy"
            and isinstance(n.value, ast.Name)
            and n.value.id == "Window"
        ]
        if not site_lines:
            continue
        funcs = [
            (n.name, n.lineno, n.end_lineno)
            for n in ast.walk(tree)
            if isinstance(n, ast.FunctionDef)
        ]
        for s in site_lines:
            enclosing = [f for f in funcs if f[1] <= s <= f[2]]
            enclosing.sort(key=lambda f: f[1])
            name = enclosing[-1][0] if enclosing else "<module>"
            key = (str(py.relative_to(PKG)), name)
            out[key] = out.get(key, 0) + 1
    return out


def test_unpartitioned_window_sites_are_allowlisted():
    offenders = {
        key: n
        for key, n in _window_sites().items()
        if key[1] not in _SITE_ALLOWLIST
    }
    assert not offenders, (
        "new unpartitioned Window.orderBy site(s) — partition the window, "
        "or bound its input (limit/aggregate) and add the function to "
        f"test_window_audit._SITE_ALLOWLIST with the bound: {offenders}"
    )


def test_allowlist_has_no_stale_entries():
    live = {name for (_, name) in _window_sites()}
    stale = set(_SITE_ALLOWLIST) - live
    assert not stale, f"allowlisted functions no longer exist: {stale}"


# ---- layer 2: plan walk ----------------------------------------------------

_BOUNDING = {"Aggregate", "GlobalLimit", "LocalLimit"}
_BOUNDED_LEAVES = {"LocalRelation", "OneRowRelation$", "Range"}


def _children(jnode):
    seq = jnode.children()
    return [seq.apply(i) for i in range(seq.length())]


def _subtree_bounded(jnode) -> bool:
    cls = jnode.getClass().getSimpleName()
    if cls in _BOUNDING:
        return True
    kids = _children(jnode)
    if not kids:
        return cls in _BOUNDED_LEAVES
    return all(_subtree_bounded(k) for k in kids)


def _unbounded_global_windows(df) -> list[str]:
    plan = df._jdf.queryExecution().optimizedPlan()
    bad = []
    stack = [plan]
    while stack:
        node = stack.pop()
        cls = node.getClass().getSimpleName()
        if cls == "Window" and node.partitionSpec().isEmpty():
            child = _children(node)[0]
            if not _subtree_bounded(child):
                bad.append(node.simpleString(120))
        stack.extend(_children(node))
    return bad


@pytest.mark.parametrize("name", _PLAN_WALK_ENTRIES)
def test_global_windows_are_bounded_in_plan(spark, name):
    from datafusion_test_spark.registry import queries

    df = queries()[name](spark, SF)
    bad = _unbounded_global_windows(df)
    assert not bad, (
        f"{name}: unpartitioned Window over an unbounded relation — "
        f"the single-partition sort sees the full input: {bad}"
    )
