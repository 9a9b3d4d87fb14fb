"""Guard for the join_asof / join_asof_forward oracle determinism.

The DuckDB oracles use native ASOF JOIN, which picks an *unspecified* match
among duplicate (user_id, ts) purchase rows, while the Spark side
deterministically tie-breaks on event_id (operators/joins.py).  The pair
agrees exactly when no such ties exist in the testdata (ADVICE r3).  This
test pins that precondition at every generated scale; if the driver ever
regenerates events with purchase-side (user_id, ts) ties, this fails first
and the oracles must be rephrased as the union+window with an event_id
tie-break.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

SF_DIRS = sorted(
    d for d in glob.glob("/root/testdata/sf*")
    if os.path.isfile(os.path.join(d, "events.parquet"))
)

pytestmark = pytest.mark.skipif(not SF_DIRS, reason="no testdata")


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=[os.path.basename(d) for d in SF_DIRS])
def test_no_duplicate_purchase_user_ts(sf_dir):
    con = duckdb.connect()
    dupes = con.sql(
        f"""
        SELECT user_id, ts, count(*) AS n
        FROM read_parquet('{sf_dir}/events.parquet')
        WHERE event_type = 'purchase'
        GROUP BY user_id, ts HAVING count(*) > 1
        LIMIT 5
        """
    ).fetchall()
    assert not dupes, (
        "purchase-side (user_id, ts) ties found — DuckDB ASOF JOIN match "
        f"choice is now unspecified; rephrase the join_asof oracles: {dupes}"
    )
