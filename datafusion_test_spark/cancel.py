"""Cooperative query cancellation — Spark analog of the reference's core
experiment (/root/reference/src/main.rs:56-105).

Reference semantics: spawn the query on a tokio task, race it against a
CancellationToken, measure elapsed from `token.cancel()` to runtime teardown
(src/main.rs:92-104).  The published defect: non-yielding in-memory scans
delay cancellation by ~300-2000 ms (README.md:69-71).

Spark mapping: the query runs in a job group on a background
InheritableThread with ``interruptOnCancel=True``; ``cancelJobGroup`` kills
its active jobs, and tasks stop at the next InterruptibleIterator record
boundary — the same cooperative-yield granularity the reference measures.
Cancel duration = elapsed from the cancel call until the action thread
observes termination.
"""

from __future__ import annotations

import threading
import time

from pyspark import InheritableThread
from pyspark.sql import SparkSession


def cancel_once(spark: SparkSession, build_df, wait_ms: int) -> tuple[int, int, bool]:
    """Run one cancellation race (mirrors run_test, src/main.rs:56-105).

    Returns (wait_ms, cancel_duration_ms, query_errored) where query_errored
    True means the query was actually interrupted (expected for short waits).
    """
    sc = spark.sparkContext
    gid = f"cancel-bench-{wait_ms}-{time.monotonic_ns()}"
    done = threading.Event()
    errored: list[bool] = []

    def run_query() -> None:
        sc.setJobGroup(gid, "cancellation benchmark query", interruptOnCancel=True)
        try:
            build_df().collect()
            errored.append(False)
        except Exception:
            errored.append(True)
        finally:
            done.set()

    t = InheritableThread(target=run_query)
    t.start()
    time.sleep(wait_ms / 1000.0)  # src/main.rs:92
    t_cancel = time.monotonic()  # src/main.rs:94
    # The reference's CancellationToken stays cancelled forever; Spark's
    # cancelJobGroup is a one-shot that only hits *active* jobs.  For short
    # waits the job may not be submitted yet, so re-issue until the action
    # thread ends (still cancel-request -> teardown semantics).
    sc.cancelJobGroup(gid)  # src/main.rs:97 (token.cancel)
    while not done.wait(timeout=0.01):
        if time.monotonic() - t_cancel > 300:
            break
        sc.cancelJobGroup(gid)
    t.join(timeout=300)
    cancel_ms = int((time.monotonic() - t_cancel) * 1000)  # src/main.rs:100-104
    return wait_ms, cancel_ms, bool(errored and errored[0])


def sweep(spark: SparkSession, build_df, waits_ms) -> list[tuple[int, int, bool]]:
    """Wait-time sweep (mirrors the 10..=60 ms loop, src/main.rs:48-51)."""
    return [cancel_once(spark, build_df, w) for w in waits_ms]


def markdown_table(results) -> str:
    """The reference's exact output format (src/main.rs:46-47)."""
    lines = [
        "| Wait time (ms) | Cancel duration (ms) |",
        "|----------------|----------------------|",
    ]
    lines += [f"| {w} | {c} |" for (w, c, _) in results]
    return "\n".join(lines)
