"""Corpus-curation operators over `documents` (training-data tier,
BASELINE.json:6 — the steps between raw crawl and training shards).

- text_contamination  benchmark-contamination check: flag corpus documents
                      sharing a word-5-gram with a (small, broadcast) eval
                      set — the decontamination pass every LLM pipeline
                      runs before training (SQL oracle)
- seq_pack            sequence packing: assign documents, in doc_id order,
                      to fixed token-budget training bins via a
                      DISTRIBUTED prefix sum — no global-order window, so
                      no single-partition bottleneck (SQL oracle)

Scale design (100 TB):

* text_contamination — the eval side is always small (benchmarks are MBs;
  the corpus is TBs), so its n-gram set is broadcast and the probe is a
  map-side BroadcastHashJoin over the exploded corpus n-grams; the only
  shuffle is the final per-document aggregation.  The corpus n-gram
  explode never materializes: it feeds the join directly.
* seq_pack — a global running sum over `ORDER BY doc_id` is the textbook
  single-partition window trap (WindowExec moves ALL rows to one task).
  Instead: range-repartition by doc_id (ranges are ordered by partition
  id), local prefix sums within each range via a pid-partitioned window,
  per-partition totals (a ~#partitions-row aggregate) turned into partition
  offsets, broadcast back, global prefix = offset + local prefix.  Every
  stage is columnar and whole-stage-codegen; the one tiny global window
  runs over #partitions rows, not N.  (At 100 TB the same two-phase scan
  is how you pack shards per range bucket; a mapPartitions carry-over
  would fuse the local phase into the shuffle read but leaves codegen.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import table
from ._expr import shingles_of_words, sql_shingles

# Documents leaked verbatim into the corpus under new ids — the planted
# contamination the checker must find (same fixture idiom as dedup._plant_dups).
_LEAK_OFFSET = 20_000_000
_N_EVAL = 20
_N_LEAK = 10

# seq_pack token budget per training bin.
_BIN_TOKENS = 512


def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document eval-set contamination report.

    Eval set = the _N_EVAL lowest-doc_id documents (stand-in for a held-out
    benchmark).  _N_LEAK of them are re-planted verbatim under fresh ids —
    leaked eval examples the checker must flag.  A corpus document is
    contaminated iff it shares >= 1 word-5-gram with any eval document;
    output counts shared distinct 5-grams and distinct eval docs hit.
    Eval members themselves are excluded via a broadcast anti-join (they
    match trivially).  5-grams, not 13-grams, because the synthetic docs
    are short — the operator shape is n-independent.
    """
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    eval_docs = d.orderBy("doc_id").limit(_N_EVAL)
    leaked = (
        eval_docs.orderBy("doc_id")
        .limit(_N_LEAK)
        .select((F.col("doc_id") + F.lit(_LEAK_OFFSET)).alias("doc_id"), "text")
    )
    corpus = d.unionByName(leaked)

    def grams(df: DataFrame) -> DataFrame:
        w = df.select("doc_id", F.split("text", " ").alias("w"))
        return w.select(
            "doc_id", F.explode(shingles_of_words(F.col("w"), n=5)).alias("g")
        )

    eval_grams = grams(eval_docs).select(
        F.col("doc_id").alias("eval_id"), "g"
    )
    hits = (
        grams(corpus)
        .join(eval_docs.select("doc_id"), "doc_id", "left_anti")
        .join(F.broadcast(eval_grams), "g")
    )
    return hits.groupBy("doc_id").agg(
        F.countDistinct("g").alias("n_shared_grams"),
        F.countDistinct("eval_id").alias("n_eval_docs_hit"),
    )


def seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: documents in doc_id order fill
    _BIN_TOKENS-token training bins; bin id = exclusive-prefix-sum(tokens)
    div budget.  Deterministic, and the bin assignment is independent of
    the physical partitioning (the prefix sum is over the logical doc_id
    order).  Returns per-bin packing stats.
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("tok")
    )
    par = max(4, spark.sparkContext.defaultParallelism // 4)
    ranged = (
        d.repartitionByRange(par, "doc_id")
        .sortWithinPartitions("doc_id")
        .withColumn("pid", F.spark_partition_id())
    )
    w_local = (
        Window.partitionBy("pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "lpre", F.coalesce(F.sum("tok").over(w_local), F.lit(0))
    )
    ptot = local.groupBy("pid").agg(F.sum("tok").alias("ptok"))
    # #partitions rows — the single-partition window here is O(par), not O(N)
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = ptot.withColumn(
        "off", F.coalesce(F.sum("ptok").over(w_off), F.lit(0))
    ).select("pid", "off")
    packed = local.join(F.broadcast(offs), "pid").withColumn(
        "bin_id", F.expr(f"(lpre + off) div {_BIN_TOKENS}")
    )
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok").alias("tok_sum"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


QUERIES = {
    "text_contamination": text_contamination,
    "seq_pack": seq_pack,
}

_G5 = sql_shingles("text", n=5)

ORACLE = {
    "text_contamination": f"""
        WITH ev AS (
            SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT {_N_EVAL}
        ),
        leaked AS (
            SELECT doc_id + {_LEAK_OFFSET} AS doc_id, text
            FROM (SELECT doc_id, text FROM ev ORDER BY doc_id LIMIT {_N_LEAK})
        ),
        corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL SELECT doc_id, text FROM leaked
        ),
        eg AS (
            SELECT doc_id AS eval_id, unnest({_G5}) AS g FROM ev
        ),
        cg AS (
            SELECT doc_id, unnest({_G5}) AS g FROM corpus
            WHERE doc_id NOT IN (SELECT doc_id FROM ev)
        )
        SELECT cg.doc_id,
               COUNT(DISTINCT cg.g) AS n_shared_grams,
               COUNT(DISTINCT eg.eval_id) AS n_eval_docs_hit
        FROM cg JOIN eg ON cg.g = eg.g
        GROUP BY cg.doc_id
    """,
    "seq_pack": f"""
        WITH t AS (
            SELECT doc_id, len(string_split(text, ' ')) AS tok FROM documents
        ),
        p AS (
            SELECT doc_id, tok,
                   CAST(COALESCE(SUM(tok) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS prefix
            FROM t
        )
        SELECT prefix // {_BIN_TOKENS} AS bin_id,
               COUNT(*) AS n_docs,
               CAST(SUM(tok) AS BIGINT) AS tok_sum,
               MIN(doc_id) AS first_doc,
               MAX(doc_id) AS last_doc
        FROM p GROUP BY 1
    """,
}
