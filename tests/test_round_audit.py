"""Rounding-rule ratchet over Spark code and oracle SQL (no Spark needed).

Spark's ``round()`` is decimal HALF_UP; DuckDB's is half-even.  A derived
mean or integer ratio whose value is dyadic (n/2^k) lands EXACTLY on
.xxxx5 and the two engines disagree — two driver-visible bug instances in
round 4 (agg_vector_centroid, round-half ties) drove the repo convention:
tie-PRONE aggregates go through ``_util.half_up`` / ``sql_half_up`` (the
``floor(x*10^4 + 0.5)`` formula on BOTH engines).

The round-5 audit converted every tie-prone site and left exactly the
sites that provably cannot tie at 4 decimals:

* ``median`` / ``quantile_cont`` over 2-decimal money: linear
  interpolation at factors 0.25/0.5/0.75/0.95 of 2dp values yields at
  most 4 decimal digits, so round(.,4) is the identity — no tie exists.
* ``corr`` / ``regr_*`` over the float ``events.value`` column: the
  quotient of large sums of products of non-dyadic doubles; a shortest-
  repr x.xxxx5 double requires a small dyadic rational, which the data
  cannot produce (verified by both-scale hash sweeps since r2).

The pattern also matches ``round(safe_corr`` (the NULL-safe corr
wrapper) so corr sites cannot dodge the audit by routing through the
helper — the r5 advisor found ``agg_corr_matrix`` doing exactly that
over 2dp money columns; it now uses ``half_up`` on both engines.

This test freezes that allowlist: any NEW bare ``round(<agg>...)`` site
must either use the half-up helpers or prove it cannot tie and be added
here with a justification.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parents[1] / "datafusion_test_spark"

_BARE = re.compile(
    r"(?i)round\(\s*(avg|sum|stddev|var_|corr|safe_corr|quantile|"
    r"percentile|regr_|median)"
)

# file -> exact number of justified bare-round sites (see module docstring)
_ALLOWED = {
    "operators/aggregates.py": 8,  # median/quantile interpolation + corr
    # (was 14: agg_corr_matrix's 6 oracle round(corr) sites — and its
    # Spark-side round(safe_corr, which the old pattern missed —
    # converted to half_up in r6)
    "operators/udf.py": 2,  # regr_slope/intercept oracle twins
}


def _count(path: Path) -> int:
    return len(_BARE.findall(path.read_text()))


def test_bare_round_sites_only_in_allowlist():
    offenders = {}
    for py in sorted(PKG.rglob("*.py")):
        rel = str(py.relative_to(PKG))
        n = _count(py)
        allowed = _ALLOWED.get(rel, 0)
        if n > allowed:
            offenders[rel] = (n, allowed)
    assert not offenders, (
        "new bare round(<aggregate>) site(s) — use _util.half_up / "
        f"sql_half_up or justify in test_round_audit._ALLOWED: {offenders}"
    )


def test_allowlist_not_stale():
    """If a justified site is converted, shrink the allowlist too."""
    for rel, allowed in _ALLOWED.items():
        n = _count(PKG / rel)
        assert n == allowed, (
            f"{rel}: {n} bare sites vs allowlist {allowed} — "
            "update _ALLOWED downward"
        )
