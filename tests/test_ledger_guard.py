"""Round-ledger and source-hygiene guards (VERDICT r9 items 1 & 4).

Round 9 shipped ROUND9.md with its nine round-close battery cells still
holding ``{PLACEHOLDER}`` template tokens — the round's own ledger was not
judge-readable and the judge had to re-run the battery to establish what
the file should have attested.  These guards make that class of lapse a
red test instead of a judge finding:

* ``test_round_ledgers_have_no_unfilled_placeholders`` — no committed
  ROUND*.md may contain a ``{UPPER_SNAKE}`` template token.  Authoring
  discipline: write battery cells only when the numbers exist; a
  template with placeholders cannot survive a green pytest run.
* ``test_no_invalid_escape_sequences`` — every repo .py must compile
  clean of invalid-escape DeprecationWarning/SyntaxWarning (the r9
  ``'\\S'`` in the scan_csv_multiline oracle; a future Python makes these
  a hard error).  Scoped to escape warnings via fresh ``compile()`` of
  the source text, NOT a blanket -W error (pyspark/pandas internals
  legitimately emit unrelated DeprecationWarnings).
"""

from __future__ import annotations

import re
import warnings
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]

_PLACEHOLDER = re.compile(r"\{[A-Z][A-Z0-9_]*\}")


def test_round_ledgers_have_no_unfilled_placeholders():
    offenders: dict[str, list[str]] = {}
    for md in sorted(ROOT.glob("ROUND*.md")):
        hits = _PLACEHOLDER.findall(md.read_text())
        if hits:
            offenders[md.name] = sorted(set(hits))
    assert not offenders, (
        "round ledger committed with unfilled template placeholders — "
        f"fill the battery cells with real results first: {offenders}"
    )


def _py_files():
    for sub in ("datafusion_test_spark", "tests", "tools"):
        yield from sorted((ROOT / sub).rglob("*.py"))
    yield ROOT / "bench.py"
    yield ROOT / "__spark_entry__.py"


def test_no_invalid_escape_sequences():
    offenders = []
    for py in _py_files():
        src = py.read_text()
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            try:
                # fresh compile re-triggers compile-time escape warnings
                # even for already-imported modules
                compile(src, str(py), "exec")
            except SyntaxError as exc:  # pragma: no cover - broken source
                offenders.append((str(py), f"SyntaxError: {exc}"))
                continue
        for w in caught:
            if "invalid escape sequence" in str(w.message):
                offenders.append((str(py.relative_to(ROOT)), str(w.message)))
    assert not offenders, (
        "invalid escape sequence(s) — use raw strings for regex/SQL "
        f"literals: {offenders}"
    )


def test_round_bench_records_attest_a_same_session_pair():
    """VERDICT r10 item 4: single-run cross-round bench numbers carry no
    signal (identical r9 code measured 201.95 s at r9 close vs 128.92 s
    one round later — a 1.57x spread from box state alone).  From round
    11 on, any ROUND*.md that reports a headline bench number must attest
    a same-session prior-HEAD baseline pair: the word "paired" plus a
    pointer to the baseline record (tools/bench_pair_baseline_*.json from
    `python bench.py --pair <rev>`, or another tools/bench_*.json run in
    the same session)."""
    offenders = []
    for md in sorted(ROOT.glob("ROUND*.md")):
        n = int("".join(c for c in md.stem if c.isdigit()) or 0)
        if n < 11:
            continue  # grandfathered: the discipline starts at r11
        text = md.read_text()
        if "headline" not in text.lower():
            continue  # no bench cell yet (ledger still in progress)
        if "paired" not in text.lower() or "tools/bench_" not in text:
            offenders.append(md.name)
    assert not offenders, (
        "bench cell without a same-session baseline pair — run "
        f"`python bench.py --pair <prior-HEAD>` and cite it: {offenders}"
    )


def test_bench_summary_line_is_compact_and_self_contained():
    """VERDICT r12 process item 1: the driver's capture truncates bench.py's
    single giant JSON line mid-record (BENCH_r11/r12 landed with
    ``"parsed": null``).  Pin the fix: the FIRST stdout JSON line is a
    compact (< 2 KB) self-contained summary — headline/layout totals, query
    counts, machine block, top-10 slowest — and main() prints it before the
    full per-query record (which stays LAST, where --pair reads it)."""
    import json
    import sys

    sys.path.insert(0, str(ROOT))
    import bench

    # Synthetic full record at realistic scale: 220 headline queries with
    # long names — the size class that overflowed the driver's capture.
    queries = {f"eval_confound_consensus_variant_{i:03d}": i * 0.017 for i in range(220)}
    record = {
        "metric": "headline_wall_sec",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "layout_queries": {f"layout_{i}": 1.0 for i in range(6)},
        "layout_wall_sec": 6.0,
        "sf": 0.1,
        "machine": {
            "cpus": 32,
            "spark_cpus": "32",
            "load1_start": 0.42,
            "load1_end": 17.3,
            "load1_high": False,
        },
        "paired_baseline": {
            "rev": "0" * 40,
            "headline_wall_sec": 132.467,
            "load1_start": 0.0,
            "json": "tools/bench_pair_baseline_000000000.json",
        },
    }
    line = json.dumps(bench.summary_record(record))
    assert len(line.encode()) < 2048, f"summary line {len(line)} B >= 2 KB"
    summary = json.loads(line)  # self-contained: one parseable line
    assert summary["summary"] is True
    assert summary["value"] == record["value"]
    assert summary["n_queries"] == 220
    assert summary["layout_wall_sec"] == 6.0
    assert summary["machine"] == record["machine"]
    assert summary["paired_baseline"]["headline_wall_sec"] == 132.467
    assert len(summary["top10_slowest"]) == 10
    assert max(queries, key=queries.get) in summary["top10_slowest"]
    # the giant per-query maps must NOT be in the summary line
    assert "queries" not in summary and "layout_queries" not in summary
    # print-order contract: summary line emitted before the full record
    src = (ROOT / "bench.py").read_text()
    assert src.index("json.dumps(summary_record(record))") < src.index(
        "print(json.dumps(record))"
    )


def test_bench_pair_flag_requires_an_argument():
    """ADVICE r11: `bench.py --pair` without a rev used to die with a
    bare IndexError deep in argv slicing.  Pin the contract: it must
    exit nonzero with a usage message BEFORE any Spark/bench work."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, str(ROOT / "bench.py"), "--pair"],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert proc.returncode != 0
    assert "--pair requires a git rev" in (proc.stderr + proc.stdout)
    assert "Traceback" not in proc.stderr
