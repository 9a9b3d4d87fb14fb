"""Shared columnar expressions for the LLM-pipeline tier.

Everything here is built-in higher-order functions — no Python UDFs — so the
similarity/dedup operators run JVM-side inside whole-stage codegen.  The
DuckDB oracle twins fold in the same left-to-right DOUBLE order, making the
float results bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]·b[i], accumulated in double, left-to-right.

    Measured negative result (round 2): unrolling this into 64 explicit
    element_at multiply-adds (hoping for whole-stage codegen) is 2.6-10x
    SLOWER than the lambda fold at sf0.1 — per-element element_at pays
    repeated array header/bounds work and the 128-term expressions blow up
    plan compile time, while the fold walks the UnsafeArrayData once.  Keep
    the fold.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm2(a: Column) -> Column:
    """Σ a[i]², accumulated in double."""
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(norm2(a)) * F.sqrt(norm2(b)))


def cosine_prenormed(a: Column, b: Column, nrm_a: Column, nrm_b: Column) -> Column:
    """Cosine with per-row precomputed norms.  Bit-identical to :func:`cosine`
    (caching sqrt(norm2(v)) does not change its value) but folds each vector
    once per ROW instead of once per PAIR — the difference between O(N·d)
    and O(pairs·d) work in pairwise self-joins."""
    return dot(a, b) / (nrm_a * nrm_b)


def lsh_bits(n_vectors: int, target_bucket: int = 128, lo: int = 8, hi: int = 24) -> int:
    """Signature width that scales with corpus size (VERDICT r1: a fixed
    8 bits = 256 buckets stops blocking once N ≫ 256·bucket): enough
    hyperplanes that the expected bucket population is ~target_bucket, i.e.
    ceil(log2(n / target_bucket)), clamped to [lo, hi].  At testdata scale
    (≤2000 vectors) this stays at the 8-bit floor — bucketing identical to
    round 1 — while 10⁹ vectors get 23 bits (~8M buckets).  The caller pays
    one count() to know n — count it on the BARE table scan (footer
    metadata only, with parquet aggregate pushdown), never on a derived
    lineage that would be recomputed for the count."""
    import math

    if n_vectors <= target_bucket:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(n_vectors / target_bucket))))


def rh_signature(vec: Column, bits: int = 8, dim: int = 64) -> Column:
    """Random-hyperplane LSH signature (an int in [0, 2^bits)).

    Hyperplane j has ±1 components derived from xxhash64(j, dim-index) —
    deterministic, no stored model to ship; bit j = sign(v·h_j).  Shared by
    sim_ann_lsh (query-time bucket probe) and dedup_embed_lsh (pairwise
    bucket blocking), so the two operators see the same bucketing.
    """
    def _plane_component(j: int):
        # closure factory: PySpark derives lambda arity from the signature,
        # so j must be captured, not passed as a defaulted third arg
        return lambda x, i: x.cast("double") * (
            (F.pmod(F.xxhash64(F.lit(j), i), F.lit(2)) * 2 - 1).cast("double")
        )

    out = None
    for j in range(bits):
        comp = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), F.lit(dim - 1)), _plane_component(j)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(comp > 0, F.lit(1 << j)).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out


def spark_dot_sql(a: str, b: str) -> str:
    """Spark-SQL-text form of :func:`dot` — parses to the IDENTICAL
    expression tree (same zip_with/aggregate nodes, same casts, same fold
    order).  Exists because building deep HOF Columns through py4j costs
    ~1 ms per API call; a plan that embeds this fold k×dim times (the IVF
    argmax) spends more driver time CONSTRUCTING the expression than
    executing it (r14 measurement: 1.47 s build vs 1.35 s exec for the
    2-round Lloyd plan).  One F.expr parse is one py4j call."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
        f"CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
    )


def spark_norm2_sql(a: str) -> str:
    """Spark-SQL-text form of :func:`norm2` (see spark_dot_sql)."""
    return (
        f"aggregate(transform({a}, x -> CAST(x AS DOUBLE) * "
        f"CAST(x AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
    )


def spark_cosine_sql(a: str, b: str) -> str:
    """Spark-SQL-text form of :func:`cosine` (see spark_dot_sql)."""
    return (
        f"({spark_dot_sql(a, b)} / "
        f"(SQRT({spark_norm2_sql(a)}) * SQRT({spark_norm2_sql(b)})))"
    )


def sql_dot(a: str, b: str) -> str:
    """DuckDB twin of :func:`dot` (index-based zip, double fold)."""
    return (
        f"list_aggregate(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
    )


def sql_norm2(a: str) -> str:
    return (
        f"list_aggregate(list_transform({a}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')"
    )


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / (sqrt({sql_norm2(a)}) * sqrt({sql_norm2(b)})))"


# SQL-text form of the shingle expression over a token-array column `w`.
# IMPORTANT perf note: always evaluate this INLINE in the same select as its
# consumer (explode/size).  Aliasing the shingle array in an intermediate
# Project forces UnsafeArrayData serialization of the string array between
# operators — measured 7x slower at sf0.1 than inline evaluation.
def shingle_sql(w: str = "w", n: int = 3) -> str:
    parts = ", ".join(f"element_at({w}, i+{k})" for k in range(n))
    return (
        f"CASE WHEN size({w}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size({w}) - {n - 1}), "
        f"i -> concat_ws(' ', {parts}))) "
        f"ELSE CAST(array() AS array<string>) END"
    )


def shingles_of_words(w: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from an ALREADY-MATERIALIZED token
    array column.  Callers must project the split() into a real column
    first — referencing `split(text)` inside the lambda would re-split the
    text once per element access (O(n·len) blowup observed at sf0.1)."""
    return F.when(
        F.size(w) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(w) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(w, i + k) for k in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def md5_capped_sample(arr: Column, cap: int) -> Column:
    """Deterministic sample of ≤ ``cap`` elements from a string array: the
    ``cap`` smallest by ``md5(element)`` (full element appended as the
    tiebreak, so the key set is distinct and the selection is a pure
    function of the element SET — input order never matters).  Used to
    bound per-document shingle work in the near-dup index: MinHash over a
    bounded shingle sample is the standard long-document mitigation, and
    the md5 draw makes Spark and the DuckDB oracle twin
    (:func:`sql_md5_capped`) sample identically.  Both engines emit
    lowercase-hex md5 over UTF-8 bytes and compare strings bytewise, so
    the selected sets are bit-identical (pinned incl. unicode in
    tests/test_properties.py).  Lambdas reference only their own argument,
    so the expression is safe under any optimizer substitution (no
    per-element re-evaluation hazard — see _exploded_shingles in
    pipeline/dedup.py for the hazard this discipline avoids).

    PRECONDITION (r9 advisor): the array must contain no NULL elements.
    A NULL element yields a NULL sort key, and the engines disagree on
    where NULL keys sort (Spark array_sort: NULLs last; DuckDB
    list_sort: configurable default order) — the twins could then select
    DIFFERENT subsets.  Every current caller feeds concat_ws shingles,
    which are never NULL; a future caller with a nullable array must
    filter NULL elements identically on both engines first."""
    keyed = F.array_sort(F.transform(arr, lambda s: F.concat(F.md5(s), s)))
    return F.when(F.size(arr) <= cap, arr).otherwise(
        F.transform(F.slice(keyed, 1, cap), lambda k: F.substring(k, 33, 2147483647))
    )


def sql_md5_capped(arr: str, cap: int) -> str:
    """DuckDB twin of :func:`md5_capped_sample` (same key, same order,
    same slice; ``k[33:]`` strips the 32-char hex prefix).  Same no-NULL-
    element precondition as the Spark side (see md5_capped_sample)."""
    return (
        f"CASE WHEN len({arr}) <= {cap} THEN {arr} "
        f"ELSE list_transform(list_sort(list_transform({arr}, s -> md5(s) || s))"
        f"[1:{cap}], k -> k[33:]) END"
    )


_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER = "abcdefghijklmnopqrstuvwxyz"


def sql_indexed_unnest(text: str, n: int = 1, lower: bool = False) -> str:
    """Lateral-free token/n-gram explode for DuckDB oracles: an
    ``unnest((SELECT ...))`` expression yielding structs
    ``{'pos': <0-based>, 'w1': tok[i], ..., 'w<n>': tok[i+n-1]}``.

    The split is bound ONCE per row in a correlated scalar subquery — the
    round-8 sql_shingles discipline.  The lateral shape it replaces
    (``FROM cte, unnest(generate_series(1, len(w))) t(i)`` + ``w[i]``)
    re-evaluates the inlined ``string_split`` once per GENERATED row —
    O(words²·len) per document; measured 237.5 s → 0.3 s on the long
    corpus's bigram relation with identical output (round 9)."""
    src = f"translate({text}, '{_UPPER}', '{_LOWER}')" if lower else text
    fields = ", ".join(f"'w{k + 1}': __w[i+{k}]" for k in range(n))
    return (
        f"unnest((SELECT CASE WHEN len(__w) >= {n} THEN "
        f"list_transform(generate_series(1, len(__w) - {n - 1}), "
        f"i -> {{'pos': i - 1, {fields}}}) ELSE [] END "
        f"FROM (SELECT string_split({src}, ' ') AS __w) __s))"
    )


def sql_shingles(text: str, n: int = 3) -> str:
    """DuckDB twin of :func:`shingles`.

    The split is bound ONCE via a correlated scalar subquery.  The naive
    inline form re-evaluated `string_split(text)` inside the per-element
    lambda (no CSE across lambda captures), turning shingling O(words²):
    measured 79 s and tens of GB for ONE 24k-word document vs 0.03 s
    bound (long-document corpus, round 8).  The Spark twin never had the
    hazard — its call sites pass a pre-split column."""
    w = "__shw"
    parts = " || ' ' || ".join(f"{w}[i+{k}]" for k in range(n))
    return (
        f"(SELECT CASE WHEN len({w}) >= {n} THEN "
        f"list_distinct(list_transform(generate_series(1, len({w}) - {n - 1}), "
        f"i -> {parts})) ELSE [] END "
        f"FROM (SELECT string_split({text}, ' ') AS {w}) __shs)"
    )
