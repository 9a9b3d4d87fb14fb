"""Emit the next round's ``registry._PRIORITY`` ordering.

The driver verifies ~50 registry entries per round, walking _PRIORITY in
order.  VERDICT r3's process finding: unless the head is rotated each
round, the budget re-verifies already-green entries while new ones stay
unchecked forever.  This tool reads every CORRECTNESS_r0*.json in the repo
root and prints the rotated list:

    1. red rows (any check false in their LATEST driver row) — first
    2. entries with NO driver row yet — in current priority order
    3. green entries — last, by evidence vintage OLDEST-FIRST (the round
       of their latest driver row; ties keep current priority order) —
       the ~50/round budget then always refreshes the stalest evidence
       (VERDICT r9 item 2 methodology)

Usage: python tools/rotate_priority.py          # prints the list literal
The output is pasted over the list body in registry.py (between the
``_PRIORITY = ["`` line and the closing ``]``); the registry's own
missing-name guard catches typos at import time.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_test_spark import registry


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, dict] = {}

    def round_no(path: str) -> int:
        # numeric sort: lexicographic would order r10 before r2 and let an
        # old round's row overwrite the latest verdict
        digits = "".join(c for c in os.path.basename(path) if c.isdigit())
        return int(digits or 0)

    vintage: dict[str, int] = {}
    paths = sorted(
        glob.glob(os.path.join(root, "CORRECTNESS_r*.json")), key=round_no
    )
    for path in paths:
        for name, row in json.load(open(path)).items():
            latest[name] = row  # later rounds overwrite earlier
            vintage[name] = round_no(path)

    def is_green(row: dict) -> bool:
        return bool(
            row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match")
            and not row.get("err")
        )

    current = list(registry._PRIORITY)
    reds = [n for n in current if n in latest and not is_green(latest[n])]
    unchecked = [n for n in current if n not in latest]
    greens = sorted(
        (n for n in current if n in latest and is_green(latest[n])),
        key=lambda n: (vintage[n], current.index(n)),
    )

    print(
        f"# rotated: {len(reds)} red, {len(unchecked)} never-checked, "
        f"{len(greens)} green (checked across {len(latest)} driver rows)"
    )
    for section, names in (
        ("# --- red rows (latest driver check failed) — re-verify first ---", reds),
        ("# --- never driver-checked — the round's budget lands here ---", unchecked),
        ("# --- green — re-verify last ---", greens),
    ):
        print(f"    {section}")
        for n in names:
            print(f'    "{n}",')


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # piping into head is fine
        pass
