"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()[name]`` on Spark and its ``oracle_sql()[name]`` on
DuckDB over the same sf dir, then compares row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted,
values normalized).  Usage:

    python tools/check_oracles.py [--exec-only] [sf_dir] [name ...]

``--exec-only`` skips the DuckDB comparison and just EXECUTES every Spark
query to completion at the given sf dir — the standing sf0.1 sweep gate
(r4 caught an int64 variance-product overflow and a self-cogroup
analyzer mis-binding this way; both invisible at sf0.01).
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from datafusion_test_spark.io import TABLES
from datafusion_test_spark.session import get_session


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _sortkey(row):
    return tuple((x is None, str(x)) for x in row)


def rows_of_spark(df):
    cols = sorted(df.columns)
    data = [tuple(_norm(r[c]) for c in cols) for r in df.collect()]
    return cols, sorted(data, key=_sortkey)


def rows_of_duck(con, sql):
    cur = con.sql(sql)
    cols_in_order = cur.columns
    rows = cur.fetchall()
    order = sorted(range(len(cols_in_order)), key=lambda i: cols_in_order[i])
    cols = [cols_in_order[i] for i in order]
    data = [tuple(_norm(r[i]) for i in order) for r in rows]
    return cols, sorted(data, key=_sortkey)


def risky_duck_types(con, sql):
    """Oracle result columns whose DuckDB carrier type the driver hashes
    differently from Spark's: HUGEINT (int128 from SUM over integers),
    DECIMAL, and nested list/struct/map."""
    cur = con.sql(sql)
    return [
        (c, str(t))
        for c, t in zip(cur.columns, cur.types)
        if "HUGEINT" in str(t).upper()
        or str(t).upper().startswith("DECIMAL")
        or "[]" in str(t)
        or "STRUCT" in str(t).upper()
        or "MAP" in str(t).upper()
    ]


def cells_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return a == b or math.isclose(a, b, rel_tol=0, abs_tol=0)
    return a == b


def main():
    args = [a for a in sys.argv[1:]]
    exec_only = "--exec-only" in args
    args = [a for a in args if a != "--exec-only"]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(args)

    spark = get_session("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    if exec_only:
        qs = entrymod.queries()
        failures, passed = [], 0
        for name, fn in sorted(qs.items()):
            if only and name not in only:
                continue
            t0 = time.time()
            try:
                # collect, not count: count() lets Catalyst prune computed
                # columns, hiding exactly the overflow/ANSI-error classes
                # this sweep exists to catch
                n = len(fn(spark, sf_dir).collect())
            except Exception:
                failures.append(name)
                print(f"FAIL  {name}: spark raised\n{traceback.format_exc()}")
                continue
            passed += 1
            print(f"exec  {name}: {n} rows ({time.time()-t0:.1f}s)")
        print(
            f"\n{passed} executed, {len(failures)} failed"
            + (f": {failures}" if failures else "")
        )
        sys.exit(1 if failures else 0)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures, passed, rows_only = [], 0, 0
    # No allowlists (r12): the last one — the empty-input grouping-sets
    # engine divergence — became a stated witnessed-rows contract in the
    # agg_rollup/agg_cube/agg_grouping_sets query+oracle pairs themselves
    # (HAVING COUNT(*) >= 1 on both engines; VERDICT r11 item 4).

    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            scols, srows = rows_of_spark(df)
        except Exception:
            failures.append(name)
            print(f"FAIL  {name}: spark raised\n{traceback.format_exc()}")
            continue
        # Policy gate: bare DECIMAL/array/map/struct output columns render
        # differently in the driver's cell canonicalizer than in this local
        # replica (Decimal-object equality masked the fn_cast r02 red row).
        # Every such column must be cast back to double or stringified.
        risky = [
            (c, t)
            for c, t in df.dtypes
            if t.startswith(("decimal", "array", "map", "struct"))
        ]
        if risky:
            failures.append(name)
            print(f"FAIL  {name}: driver-unsafe output column types {risky}")
            continue
        if name not in oracles:
            rows_only += 1
            print(f"rows  {name}: {len(srows)} rows, cols={scols} ({time.time()-t0:.1f}s)")
            continue
        try:
            duck_risky = risky_duck_types(con, oracles[name])
            dcols, drows = rows_of_duck(con, oracles[name])
        except Exception:
            failures.append(name)
            print(f"FAIL  {name}: duckdb raised\n{traceback.format_exc()}")
            continue
        if duck_risky:
            # DuckDB widens SUM(BIGINT) to HUGEINT and keeps DECIMAL —
            # value-equal to Spark's bigint/double here, but the driver's
            # canonicalizer hashes the carrier type (r1 agg_collect, r2
            # fn_cast, r3 tpch_q12_shape).  Cast in the oracle SQL.
            failures.append(name)
            print(f"FAIL  {name}: driver-unsafe ORACLE column types {duck_risky}")
            continue
        if scols != dcols:
            failures.append(name)
            print(f"FAIL  {name}: cols spark={scols} duck={dcols}")
            continue
        if len(srows) != len(drows):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(drows)}")
            continue
        bad = None
        for i, (sr, dr) in enumerate(zip(srows, drows)):
            if not all(cells_equal(a, b) for a, b in zip(sr, dr)):
                bad = (i, sr, dr)
                break
        if bad:
            failures.append(name)
            print(f"FAIL  {name}: row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
            continue
        passed += 1
        print(f"ok    {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")

    print(
        f"\n{passed} hash-ok, {rows_only} rows-only, {len(failures)} failed"
        + (f": {failures}" if failures else "")
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
