"""Bounded-collect discipline ratchet (machine-checks the judge's manual
per-round audit).

``collect()``/``first()``/``toPandas()``/``take()`` move rows onto the
driver: over a bounded relation (a 1-row aggregate, a d×d gramian, catalog
metadata) that is correct and cheap at any corpus size; over a data-scale
relation it is the canonical "operator isn't distributed" failure.  Every
driver-materialization site in the package must map to a function in
``_SITE_ALLOWLIST`` below with its bound stated, and the per-function
site COUNT is pinned — a new site (even inside an already-allowlisted
function) fails until its bound is stated here.

AST-based like tests/test_window_audit.py: only real method-call actions
count.  Expression builders (``F.first(col)``, ``F.collect_list``) and
docstrings that merely mention the pattern do not trip the ratchet.
"""

from __future__ import annotations

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "datafusion_test_spark"

_ACTIONS = {"collect", "first", "toPandas", "toLocalIterator", "take"}

# (relative file, enclosing function) -> (site count, stated bound)
_SITE_ALLOWLIST = {
    ("cancel.py", "run_query"): (
        1, "the cancellation TARGET itself (reference-protocol harness)"),
    ("operators/joins.py", "plan_aqe_skew_join"): (
        1, "AQE plan-introspection result: one row per post-AQE partition "
           "of a 5-row aggregate"),
    ("operators/relational.py", "observe_metrics"): (
        1, "groupBy(l_returnflag).count(): <= |distinct flags| rows"),
    ("pipeline/dedup.py", "_star_contract"): (
        1, "1-row convergence aggregate per O(log n) contraction round"),
    ("pipeline/evals.py", "eval_elo_bt"): (
        1, "<= |event types|^2 pairwise win/loss sufficient statistics"),
    ("pipeline/similarity.py", "embed_pca"): (
        1, "d x d gramian partials (d = embedding dim), never N rows"),
    ("pipeline/similarity.py", "sim_index_persist"): (
        3, "1-row query-vector fetches against the persisted ANN layout"),
    ("pipeline/similarity.py", "sim_pairwise_lsh"): (
        1, "1-row corpus-size + degeneracy probe (sizes the LSH "
           "signature and selects the vacuity-contract branch)"),
    ("pipeline/text.py", "text_bpe_train"): (
        1, "1-row top-pair fetch per fixed BPE round (6 rounds)"),
    ("sources/connectors.py", "catalog_stats"): (
        2, "DESCRIBE TABLE catalog metadata: O(#columns) rows"),
    ("sources/connectors.py", "scan_parquet_bloom"): (
        1, "1-row min/max aggregate picking the bloom probe keys"),
    ("sources/connectors.py", "scan_parquet_pageindex"): (
        1, "1-row min/count aggregate picking the page-index probe key"),
    ("sources/connectors.py", "scan_parquet_pageindex_string"): (
        1, "1-row min/max/count aggregate picking the string probe keys"),
    ("sources/connectors.py", "scan_parquet_pageindex_nulls"): (
        1, "1-row min/count aggregate picking the null-axis probe key"),
    ("sources/connectors.py", "scan_parquet_pageindex_reader"): (
        1, "1-row count/min/max aggregate deriving the k1/k2 probe range"),
}


def _action_sites() -> dict[tuple[str, str], int]:
    out: dict[tuple[str, str], int] = {}
    for py in sorted(PKG.rglob("*.py")):
        tree = ast.parse(py.read_text())
        sites = [
            n
            for n in ast.walk(tree)
            if isinstance(n, ast.Call)
            and isinstance(n.func, ast.Attribute)
            and n.func.attr in _ACTIONS
            # F.first(...) / F.take(...) are EXPRESSIONS, not actions
            and not (
                isinstance(n.func.value, ast.Name) and n.func.value.id == "F"
            )
        ]
        if not sites:
            continue
        funcs = [
            (n.name, n.lineno, n.end_lineno)
            for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        ]
        for s in sites:
            enc = sorted(
                (f for f in funcs if f[1] <= s.lineno <= f[2]),
                key=lambda f: f[1],
            )
            name = enc[-1][0] if enc else "<module>"
            key = (str(py.relative_to(PKG)), name)
            out[key] = out.get(key, 0) + 1
    return out


def test_collect_sites_are_allowlisted_with_bounds():
    sites = _action_sites()
    offenders = {
        key: n
        for key, n in sites.items()
        if key not in _SITE_ALLOWLIST or n > _SITE_ALLOWLIST[key][0]
    }
    assert not offenders, (
        "new driver-materialization site(s) — keep the operator "
        "distributed, or state the bound in "
        f"test_collect_audit._SITE_ALLOWLIST: {offenders}"
    )


def test_collect_allowlist_not_stale():
    sites = _action_sites()
    stale = {
        key: (sites.get(key, 0), allowed)
        for key, (allowed, _) in _SITE_ALLOWLIST.items()
        if sites.get(key, 0) != allowed
    }
    assert not stale, (
        f"allowlist out of date (actual vs allowed counts): {stale}"
    )
