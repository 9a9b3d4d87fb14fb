"""Build degenerate-corpus sf dirs for the empty/tiny-input parity gate.

At 100 TB a partition-pruned scan, a filtered date range, or a cold
tenant legitimately yields ZERO rows — an operator that crashes or
hash-diverges from the oracle on an empty relation is a real production
bug (the r4 advisor found one instance: dedup_threshold_sweep's bare
F.sum returning NULL where the oracle COALESCEd to 0).  This tool
materializes two corpora with the exact testdata schemas:

* ``empty``  — every table 0 rows (schema copied from a source sf dir)
* ``tiny``   — every table LIMIT 1 (one-row groups: degenerate variance,
               single-node graphs, n<2 regression fits)

Usage::

    python tools/make_degenerate.py [src_sf_dir] [dest_root]

then run the standing gate against them::

    python tools/check_oracles.py <dest_root>/empty
    python tools/check_oracles.py <dest_root>/tiny
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_test_spark.io import TABLES


def build(src: str, dest_root: str) -> None:
    for mode, nrows in (("empty", 0), ("tiny", 1)):
        dest = os.path.join(dest_root, mode)
        os.makedirs(dest, exist_ok=True)
        for name in TABLES:
            t = pq.read_table(os.path.join(src, f"{name}.parquet"))
            slice_ = t.slice(0, nrows)
            pq.write_table(slice_, os.path.join(dest, f"{name}.parquet"))
        print(f"{mode}: {len(TABLES)} tables -> {dest}")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dest_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_degenerate"
    build(src, dest_root)
