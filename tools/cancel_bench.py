"""Cancellation-latency sweep — the reference's benchmark, reproduced on
Spark (see /root/reference/src/main.rs:27-105 and README.md:63-124).

Protocol parity:
- dataset: generated random table (11 cols, reference schema), loaded into
  executor MEMORY (persist MEMORY_ONLY ~= the reference's InMemory object
  store, chosen there because in-memory reads don't yield — README.md:8-9)
- query: SELECT DISTINCT A,B,C,D,E (src/main.rs:122)
- sweep: wait in 10..=60 ms, one run each (src/main.rs:48)
- metric: elapsed from cancel request to confirmed teardown (src/main.rs:94-104)

Output: markdown appended to BENCH.md in the reference's exact table format
(src/main.rs:46-47), with machine specs recorded (which the reference omits,
README.md:60-61).

Usage: python tools/cancel_bench.py [rows=2000000] [out=BENCH.md]
"""

from __future__ import annotations

import json
import os
import platform
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.storagelevel import StorageLevel

from datafusion_test_spark.cancel import markdown_table, sweep
from datafusion_test_spark.session import get_session
from datafusion_test_spark.sources.generate import generate_random_table


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH.md"
    )

    spark = get_session("cancel-bench")
    base = generate_random_table(spark, n_rows=rows, seed=11).persist(
        StorageLevel.MEMORY_ONLY
    )
    n = base.count()  # materialize the in-memory store

    def heavy():
        return base.select("A", "B", "C", "D", "E").distinct()

    # One throwaway full run so codegen is compiled before the sweep.
    t0 = time.monotonic()
    heavy().write.mode("overwrite").format("noop").save()
    full_query_ms = int((time.monotonic() - t0) * 1000)

    results = sweep(spark, heavy, range(10, 61))
    cancels = [c for (_, c, _) in results]

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "4")
    spec = (
        f"{platform.system()} {platform.machine()}, "
        f"{os.cpu_count()} cpus (local[{cpus}]), python {platform.python_version()}"
    )
    section = "\n".join(
        [
            "",
            "## Cancellation sweep (reference protocol, Spark engine)",
            "",
            f"- dataset: {n:,} generated rows, 11 cols, persisted MEMORY_ONLY",
            "- query: `SELECT DISTINCT A,B,C,D,E` (reference src/main.rs:122)",
            f"- uncancelled full query time: {full_query_ms} ms",
            f"- machine: {spec}",
            f"- min/median/max cancel: {min(cancels)} / "
            f"{sorted(cancels)[len(cancels) // 2]} / {max(cancels)} ms "
            "(reference published 17 / ~300 / 2086 ms, README.md:72-124)",
            "",
            markdown_table(results),
            "",
        ]
    )
    with open(out, "a") as f:
        f.write(section)
    print(json.dumps({"min": min(cancels), "median": sorted(cancels)[len(cancels) // 2],
                      "max": max(cancels), "full_query_ms": full_query_ms}))


if __name__ == "__main__":
    main()
