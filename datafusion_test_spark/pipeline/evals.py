"""Model-evaluation operators (training-pipeline tier) — the metrics a
data/eval team runs over scored examples, phrased so every statistic is
integer-carried or single-divide exact:

- eval_auc          ROC-AUC via the Mann-Whitney rank-sum, ties handled by
                    average ranks carried as INTEGERS (2·rank), cumulative
                    counts via the shared two-phase prefix sum (SQL oracle)
- eval_prf          confusion counts + precision/recall/F1 at a fixed
                    threshold; F1 as the single-divide 2tp/(2tp+fp+fn)
                    (SQL oracle)
- eval_calibration  reliability-diagram bins: per-bin mean score vs
                    positive rate (SQL oracle)

The binary task is modeled on the events stream: does `value` separate
purchases (positive) from clicks (negative)?  The AUC answers "how well",
PRF at a threshold answers "at this operating point", calibration answers
"are the scores honest probabilities-ish".

Scale design (100 TB):
* eval_auc — one groupBy collapses duplicate scores (map-side combined),
  the cumulative count uses the range-partitioned two-phase prefix sum
  (never a single-partition ORDER BY window), and the final rank-sum is a
  plain aggregate.  (Carrier note: 2·rank sums stay < 2^63 up to ~2·10⁹
  scored rows; past that, bucket scores first — AUC over quantile-bucketed
  scores is the standard streaming approximation.)
* eval_prf — one conditional aggregate over the scan; map-only until the
  4-cell reduce.
* eval_calibration — min/max as a 1-row broadcast, then one groupBy on
  the bin id; bins are O(10) rows at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .._util import DEC, half_up, sql_half_up, two_phase_prefix
from ..io import table

_POS, _NEG = "purchase", "click"
_PRF_THRESHOLD = 50.0
_CAL_BINS = 10


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(s, y): score + binary label, NULL scores excluded explicitly
    (same window-NULL-order rationale as quality.drift_ks)."""
    e = table(spark, sf_dir, "events")
    return e.filter(
        F.col("event_type").isin(_POS, _NEG) & F.col("value").isNotNull()
    ).select(
        F.col("value").alias("s"),
        F.when(F.col("event_type") == _POS, 1).otherwise(0).alias("y"),
    )


def eval_auc(spark: SparkSession, sf_dir: str, par: int | None = None) -> DataFrame:
    """Exact ROC-AUC by Mann-Whitney rank-sum, tie-correct and
    integer-carried: for each distinct score, 2·(average rank) =
    2·pre + n_at + 1 where pre = count of strictly-smaller rows — an
    integer, so the positive rank sum R2 = Σ np_at·(2·pre + n_at + 1) is
    exact, 2U = R2 − n_pos·(n_pos+1), and AUC = 2U / (2·n_pos·n_neg) is
    one IEEE divide.  No float accumulates anywhere.
    """
    j = _scored(spark, sf_dir)
    g = j.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_at"), F.sum("y").alias("np_at")
    )
    par = par or max(4, spark.sparkContext.defaultParallelism // 4)
    pre, _totals = two_phase_prefix(g, par, ["s"], sum_cols=("n_at",))
    t = pre.agg(
        F.sum(
            F.col("np_at") * (2 * F.col("pre_n_at") + F.col("n_at") + 1)
        ).alias("r2"),
        F.sum("np_at").alias("n_pos"),
        F.sum(F.col("n_at") - F.col("np_at")).alias("n_neg"),
    )
    u2 = F.col("r2") - F.col("n_pos") * (F.col("n_pos") + 1)
    return t.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        u2.cast("long").alias("u2"),
        # single-class slice => undefined AUC as NULL (not an ANSI
        # DIVIDE_BY_ZERO crash; DuckDB's x/0-free CASE mirrors this)
        F.when(
            F.col("n_pos") * F.col("n_neg") > 0,
            half_up(
                u2 / (2 * F.col("n_pos") * F.col("n_neg")).cast("double")
            ),
        ).alias("auc"),
    )


def eval_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion counts and precision/recall/F1 at score >= 50: every
    ratio is a single divide of exact integers (F1 via 2tp/(2tp+fp+fn),
    never the p·r composition that would chain float error)."""
    j = _scored(spark, sf_dir).withColumn(
        "pred", (F.col("s") >= F.lit(_PRF_THRESHOLD)).cast("int")
    )
    t = j.agg(
        F.sum(F.col("y") * F.col("pred")).alias("tp"),
        F.sum((1 - F.col("y")) * F.col("pred")).alias("fp"),
        F.sum(F.col("y") * (1 - F.col("pred"))).alias("fn"),
        F.sum((1 - F.col("y")) * (1 - F.col("pred"))).alias("tn"),
    )
    return t.select(
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.col("tn").cast("long").alias("tn"),
        # empty denominators (no predicted / no actual positives) emit
        # NULL instead of raising under ANSI mode — mirrored in the oracle
        F.when(
            F.col("tp") + F.col("fp") > 0,
            half_up(F.col("tp") / (F.col("tp") + F.col("fp")).cast("double")),
        ).alias("precision"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            half_up(F.col("tp") / (F.col("tp") + F.col("fn")).cast("double")),
        ).alias("recall"),
        F.when(
            2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
            half_up(
                (2 * F.col("tp"))
                / (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double")
            ),
        ).alias("f1"),
    )


def eval_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability bins: scores split into 10 equal-width bins over the
    observed [min, max]; per bin, the decimal-carried mean score and the
    exact positive rate.  A calibrated scorer shows mean_score ≈ pos_rate
    per bin (up to the score scale) — the drift signal for a quality or
    reward model."""
    j = _scored(spark, sf_dir)
    mm = F.broadcast(j.agg(F.min("s").alias("mn"), F.max("s").alias("mx")))
    binned = j.crossJoin(mm).select(
        "s",
        "y",
        # degenerate all-equal-score slice collapses to bin 0 explicitly
        # (ANSI would raise on the 0-width divide; DuckDB would NULL it)
        F.when(F.col("mx") > F.col("mn"),
            F.least(
                F.lit(_CAL_BINS - 1),
                F.floor(
                    (F.col("s") - F.col("mn"))
                    * _CAL_BINS
                    / (F.col("mx") - F.col("mn"))
                ).cast("int"),
            ),
        ).otherwise(F.lit(0)).alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        half_up(
            F.sum(F.col("s").cast(DEC)).cast("double") / F.count(F.lit(1))
        ).alias("mean_score"),
        half_up(
            F.sum("y") / F.count(F.lit(1)).cast("double")
        ).alias("pos_rate"),
    )


QUERIES = {
    "eval_auc": eval_auc,
    "eval_prf": eval_prf,
    "eval_calibration": eval_calibration,
}

_J = f"""
            SELECT value AS s,
                   CAST(CASE WHEN event_type = '{_POS}' THEN 1 ELSE 0 END
                        AS BIGINT) AS y
            FROM events
            WHERE event_type IN ('{_POS}', '{_NEG}') AND value IS NOT NULL
"""

_AUC_RATIO = sql_half_up(
    "CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE) / (2 * n_pos * n_neg)"
)

ORACLE = {
    "eval_auc": f"""
        WITH j AS ({_J}),
        g AS (
            SELECT s, CAST(count(*) AS BIGINT) AS n_at,
                   CAST(SUM(y) AS BIGINT) AS np_at
            FROM j GROUP BY s
        ),
        c AS (
            SELECT *,
                   CAST(COALESCE(SUM(n_at) OVER (
                       ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS pre
            FROM g
        ),
        t AS (
            SELECT CAST(SUM(np_at * (2 * pre + n_at + 1)) AS BIGINT) AS r2,
                   CAST(SUM(np_at) AS BIGINT) AS n_pos,
                   CAST(SUM(n_at - np_at) AS BIGINT) AS n_neg
            FROM c
        )
        SELECT n_pos, n_neg,
               CAST(r2 - n_pos * (n_pos + 1) AS BIGINT) AS u2,
               CASE WHEN n_pos * n_neg > 0 THEN {_AUC_RATIO} END AS auc
        FROM t
    """,
    "eval_prf": f"""
        WITH j AS ({_J}),
        t AS (
            SELECT
                CAST(SUM(y * (CASE WHEN s >= {_PRF_THRESHOLD!r}
                              THEN 1 ELSE 0 END)) AS BIGINT) AS tp,
                CAST(SUM((1 - y) * (CASE WHEN s >= {_PRF_THRESHOLD!r}
                              THEN 1 ELSE 0 END)) AS BIGINT) AS fp,
                CAST(SUM(y * (CASE WHEN s >= {_PRF_THRESHOLD!r}
                              THEN 0 ELSE 1 END)) AS BIGINT) AS fn,
                CAST(SUM((1 - y) * (CASE WHEN s >= {_PRF_THRESHOLD!r}
                              THEN 0 ELSE 1 END)) AS BIGINT) AS tn
            FROM j
        )
        SELECT tp, fp, fn, tn,
               CASE WHEN tp + fp > 0 THEN
                   {sql_half_up("CAST(tp AS DOUBLE) / (tp + fp)")}
               END AS precision,
               CASE WHEN tp + fn > 0 THEN
                   {sql_half_up("CAST(tp AS DOUBLE) / (tp + fn)")}
               END AS recall,
               CASE WHEN 2 * tp + fp + fn > 0 THEN
                   {sql_half_up("CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn)")}
               END AS f1
        FROM t
    """,
    "eval_calibration": f"""
        WITH j AS ({_J}),
        mm AS (SELECT min(s) AS mn, max(s) AS mx FROM j),
        b AS (
            SELECT s, y,
                   CASE WHEN mm.mx > mm.mn THEN
                       LEAST({_CAL_BINS - 1},
                             CAST(floor((s - mm.mn) * {_CAL_BINS}
                                        / (mm.mx - mm.mn)) AS INTEGER))
                   ELSE 0 END AS bin
            FROM j, mm
        )
        SELECT bin, CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               {sql_half_up(
                   "CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DOUBLE) / count(*)"
               )} AS mean_score,
               {sql_half_up("CAST(SUM(y) AS DOUBLE) / count(*)")} AS pos_rate
        FROM b GROUP BY bin
    """,
}
