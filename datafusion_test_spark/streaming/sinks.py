"""Streaming sink surface: foreachBatch over a file-source micro-batch read.

The reference's execution model is a pull-based batch stream collected once
(/root/reference/src/main.rs:155-161); Structured Streaming generalizes that
to continuous micro-batches.  This module exercises the *sink* half of that
surface — `writeStream.foreachBatch` with an availableNow trigger, the
standard pattern for idempotent lakehouse upserts (each micro-batch arrives
as a normal DataFrame the callback can write transactionally).

Scale notes (100 TB/day): foreachBatch is the production sink escape hatch —
the callback runs on the driver but the DataFrame it receives executes
distributed, so per-batch MERGE/compact/write-parquet work scales with the
cluster.  availableNow processes a backlog in bounded batches and stops,
which is also the replay/backfill pattern.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..session import tune


def stream_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-batch read of the events table through a streaming file source,
    foreachBatch sink accumulating per-batch row counts; self-verifying
    result: the sink must observe exactly the batch-mode row count
    (exactly-once over a bounded source) in at least one batch.
    """
    tune(spark)
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    seen = {"rows": 0, "batches": 0}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        seen["rows"] += batch_df.count()
        seen["batches"] += 1

    ckpt = tempfile.mkdtemp(prefix="dfts_fb_ckpt_")
    q = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        if q.isActive:
            q.stop()

    n_src = table(spark, sf_dir, "events").count()
    return spark.createDataFrame(
        [(n_src, seen["rows"] == n_src, seen["batches"] >= 1)],
        "n_events long, sink_complete boolean, batched boolean",
    )


QUERIES = {
    "stream_foreach_batch": stream_foreach_batch,
}

ORACLE = {
    "stream_foreach_batch": """
        SELECT COUNT(*) AS n_events, TRUE AS sink_complete, TRUE AS batched
        FROM events
    """,
}
