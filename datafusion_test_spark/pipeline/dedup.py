"""Deduplication operators over `documents` (mandated tier, BASELINE.json:6).

Five strategies, each a `queries()` entry:

- dedup_exact          hash group-by on full text (SQL oracle)
- dedup_ngram_jaccard  exact word-3-gram Jaccard via inverted-index self-join
                       (SQL oracle — fully relational, no approximation)
- dedup_minhash        MinHash + LSH banding over shingles (rows-only:
                       hash-function-dependent, but seeded/deterministic)
- dedup_simhash        64-bit SimHash + hamming-band candidate pairs
                       (rows-only: xxhash64-dependent, deterministic)
- dedup_embed_cosine   embedding-cosine near-dup pairs, label-blocked
                       (SQL oracle — bit-identical double folds)

Scale design (100 TB): every pairwise strategy is *blocked* — candidate pairs
come from an inverted index (shared shingle / LSH bucket / simhash band /
label) and never from a full cross-join.  The inverted-index joins shuffle on
the bucket key; frequency caps (DF cap on shingles) bound worst-case bucket
fanout, the standard guard against quadratic hot buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..io import table
from ._expr import cosine_prenormed, norm2, shingle_sql, sql_cosine, sql_shingles


def _doc_words(spark, sf_dir):
    """documents -> (doc_id, w): tokens materialized, scan repartitioned.

    The repartition matters: testdata is a single parquet file -> one input
    split, which would serialize the CPU-heavy shingle construction onto one
    core.  On a real lake the many input files make this a near-no-op; the
    principle (size partitions to cores for expression-heavy stages) is the
    same at 100 TB.  Downstream shingle expressions are evaluated INLINE
    (see _expr.shingle_sql perf note).
    """
    par = spark.sparkContext.defaultParallelism
    return (
        table(spark, sf_dir, "documents")
        .repartition(par)
        .select("doc_id", F.split("text", " ").alias("w"))
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups: keeper (min doc_id) + copy count per text.

    groupBy-on-text rather than dropDuplicates so the surviving row is
    deterministic (dropDuplicates keeps an arbitrary row).
    """
    d = table(spark, sf_dir, "documents")
    return d.groupBy("text").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    ).select("keep_id", "n_copies", "text")


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (similarity >= 0.6).

    Inverted index: (shingle -> doc) exploded, self-joined on shingle to get
    pairwise intersection counts; |A∪B| = |A|+|B|−|A∩B|.  One shuffle on the
    shingle key; no cross-join.
    """
    sh = shingle_sql("w")
    # Persist the inverted index before self-joining: (1) both join branches
    # reuse one computation, (2) it stops Catalyst pushing the join's
    # null-filter below the projections, which would re-inline the whole
    # shingle expression into a pre-shuffle Filter (observed 10x slowdown).
    # At 100 TB this is the same persist-the-index pattern, MEMORY_AND_DISK.
    inv = (
        _doc_words(spark, sf_dir)
        .select(
            "doc_id",
            F.expr(f"size({sh})").alias("n_sh"),
            F.explode(F.expr(sh)).alias("shingle"),
        )
        # join on the 64-bit shingle hash, not the ~20-byte string: halves
        # shuffle bytes and makes key compares O(1).  Collision odds at
        # 2^64 are ~n^2/2^65 (≈1e-9 at 1e5 distinct shingles; still <1e-3
        # at 1e8) — the standard trade in shingle-index dedup.
        .select("doc_id", "n_sh", F.xxhash64("shingle").alias("sid"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a, b = inv.alias("a"), inv.alias("b")
    # shuffle-hash, not broadcast: the inverted index is O(corpus) — at any
    # real scale collecting it to the driver is wrong, and even at sf0.1 the
    # broadcast build dominates (measured 8.3s -> 3.8s with the hint).
    pairs = (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.sid") == F.col("b.sid"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        pairs.withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= 0.6)
        .select("doc_a", "doc_b", "jaccard")
    )


def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32 perms) + LSH(8 bands × 4 rows) candidate dup pairs.

    Columnar implementation (no ML-lib dependency, no Python UDF):
    h_i(s) = (a_i·xxhash64(s) + b_i) mod p over the shingle set, minimum per
    permutation; band key = hash of 4 consecutive minhashes; pairs sharing
    any band bucket are candidates.  Deterministic (fixed a_i/b_i), so the
    rows-only oracle count is stable.  At 100 TB: the only shuffles are
    explode→min-agg (by doc) and the band-bucket self-join; band buckets are
    capped implicitly by banding width.
    """
    p = 1_000_000_007  # prime; h < p and a < 2^7 keep h*a+b far from 2^63
    perms = [(2 * k + 1, 7919 * (k + 1)) for k in range(32)]

    tok = (
        _doc_words(spark, sf_dir)
        .select("doc_id", F.explode(F.expr(shingle_sql("w"))).alias("s"))
        .withColumn("h", F.pmod(F.xxhash64("s"), F.lit(p)))
    )
    sig = tok.groupBy("doc_id").agg(
        *[
            F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(p)).alias(f"mh{k}")
            for k, (a, b) in enumerate(perms)
        ]
    )
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(*[f"mh{4 * bi + r}" for r in range(4)]).alias("bkey"),
                    )
                    for bi in range(8)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.bkey").persist(StorageLevel.MEMORY_AND_DISK)
    x, y = bands.alias("x"), bands.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bkey") == F.col("y.bkey"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup candidates: hamming distance <= 6, candidates
    blocked by 4×16-bit bands (a pair within distance 6 shares at least one
    exact band by pigeonhole when distance < 4 bands... we accept band-miss
    recall loss, the standard trade).

    Bit votes: explode tokens, per (doc, bit) sum ±1 votes, reassemble the
    signature with bit shifts — fully columnar, scales as one shuffle on
    (doc_id) after an explode bounded by token count × 1 (votes kept as a
    64-element array, not 64 rows).
    """
    tok = _doc_words(spark, sf_dir).select(
        "doc_id", F.explode("w").alias("t")
    ).withColumn("h", F.xxhash64("t"))
    # Per-bit ±1 vote sums as 64 aggregate expressions over the token rows —
    # no 64× row explosion, and every sum combines map-side before the one
    # shuffle on doc_id.
    vote_sums = [
        F.sum(F.expr(f"CAST(shiftright(h, {i}) & 1 AS INT) * 2 - 1")).alias(f"b{i}")
        for i in range(64)
    ]
    voted = tok.groupBy("doc_id").agg(*vote_sums)
    sig_expr = F.lit(0).cast("long")
    for i in range(64):
        sig_expr = sig_expr + F.when(
            F.col(f"b{i}") > 0, F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    sig = voted.select("doc_id", sig_expr.alias("simhash"))
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright(F.col("simhash"), 16 * bi)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bkey"),
                    )
                    for bi in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.bkey").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    x, y = banded.alias("x"), banded.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bkey") == F.col("y.bkey"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= 6).select("doc_a", "doc_b", "hamming")


def dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos >= 0.95), blocked on `label`.

    The label block stands in for an ANN/LSH pre-filter: pairs are only
    formed within a block, so the self-join is |block|² not N².
    """
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        "embedding",
        F.sqrt(norm2(F.col("embedding"))).alias("nrm"),
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn(
            "cos",
            cosine_prenormed(
                F.col("a.embedding"),
                F.col("b.embedding"),
                F.col("a.nrm"),
                F.col("b.nrm"),
            ),
        )
        .filter(F.col("cos") >= 0.95)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round("cos", 4).alias("cos_sim"),
        )
    )


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash": dedup_minhash,
    # SURVEY §2.5's declared name for the MinHash-LSH strategy
    "dedup_near": dedup_minhash,
    "dedup_simhash": dedup_simhash,
    "dedup_embed_cosine": dedup_embed_cosine,
}

_SH = sql_shingles("text")

ORACLE = {
    "dedup_exact": """
        SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies, text
        FROM documents GROUP BY text
    """,
    "dedup_ngram_jaccard": f"""
        WITH sh AS (
            SELECT doc_id, {_SH} AS sh FROM documents
        ),
        sized AS (SELECT doc_id, len(sh) AS n_sh, sh FROM sh),
        inv AS (SELECT doc_id, n_sh, unnest(sh) AS shingle FROM sized),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS n_common
            FROM inv a JOIN inv b
              ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4
        )
        SELECT doc_a, doc_b,
               ROUND(n_common / CAST(n_a + n_b - n_common AS DOUBLE), 4) AS jaccard
        FROM pairs
        WHERE ROUND(n_common / CAST(n_a + n_b - n_common AS DOUBLE), 4) >= 0.6
    """,
    "dedup_embed_cosine": f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               ROUND({sql_cosine('a.embedding', 'b.embedding')}, 4) AS cos_sim
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {sql_cosine('a.embedding', 'b.embedding')} >= 0.95
    """,
}
