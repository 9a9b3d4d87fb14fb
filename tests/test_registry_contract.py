"""Registry / bench contract pins.

The driver walks ``registry._PRIORITY`` with a ~50-entry budget per
round.  Two silent failure modes the import-time guard does NOT catch:

* a registry entry MISSING from ``_PRIORITY`` — ``_collect`` appends it
  at the very back, so a new operator never reaches the driver's budget
  and stays "never checked" forever (the exact disease the rotation
  discipline exists to prevent);
* a DUPLICATE name in ``_PRIORITY`` — dict construction collapses it, so
  the list length lies about the budget layout.

Also pins the oracle-coverage ratchet (every entry has a full SQL
oracle: 350/350 since round 4 — a new rows-only entry must be a
deliberate, documented decision, not an omission) and the bench
HEADLINE/LAYOUT name validity (a typo there silently drops the query
from the round's bench record).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_test_spark import registry


def test_priority_is_exactly_the_registry():
    q = registry.queries()
    pri = registry._PRIORITY
    assert len(pri) == len(set(pri)), "duplicate names in _PRIORITY"
    missing_from_priority = set(q) - set(pri)
    assert not missing_from_priority, (
        "registry entries absent from _PRIORITY would never reach the "
        f"driver's per-round budget: {sorted(missing_from_priority)}"
    )


def test_every_entry_has_a_full_sql_oracle():
    q, o = registry.queries(), registry.oracle_sql()
    rows_only = set(q) - set(o)
    assert not rows_only, (
        "entries without a DuckDB oracle get only the weak rows-only "
        f"check — add the oracle or document the exception: {sorted(rows_only)}"
    )


def test_bench_groups_name_real_registry_entries():
    import bench

    q = registry.queries()
    bad = [n for n in bench.HEADLINE + bench.LAYOUT if n not in q]
    assert not bad, f"bench.py names not in the registry: {bad}"
    dup = [n for n in set(bench.HEADLINE) if bench.HEADLINE.count(n) > 1]
    assert not dup, f"duplicate HEADLINE entries double-count the total: {dup}"
