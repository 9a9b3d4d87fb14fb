"""Property-based tests (hypothesis) for the pure cross-engine helpers —
the hex-draw thresholds, Morton interleave SQL, and LSH sizing that the
oracle determinism contract leans on."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_test_spark.pipeline._expr import lsh_bits
from datafusion_test_spark.pipeline.curation import _frac_threshold_hex
from datafusion_test_spark.sources.connectors import _Z_SQL


@given(st.floats(min_value=0.0, max_value=4.0, allow_nan=False))
def test_frac_threshold_hex_is_fraction_exact(rate):
    t = _frac_threshold_hex(rate)
    assert len(t) == 8 and t == t.lower()
    frac = rate - int(rate)
    assert abs(int(t, 16) / 16**8 - frac) <= 1.0 / 16**8 + 1e-12


def _morton_ref(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=255), st.integers(min_value=0, max_value=255))
def test_z_interleave_sql_matches_reference(x, y):
    got = duckdb.sql(f"SELECT {_Z_SQL} AS z FROM (SELECT {x} AS zx, {y} AS zy)").fetchone()[0]
    assert got == _morton_ref(x, y)


@given(st.integers(min_value=0, max_value=255), st.integers(min_value=0, max_value=255))
def test_morton_locality_monotone_in_each_dim_prefix(x, y):
    # z-order preserves per-dimension bit-prefix ordering: doubling a
    # coordinate's high bit always raises z past any lower-half value
    assert _morton_ref(x | 0x80, y) > _morton_ref(x & 0x7F, y)
    assert _morton_ref(x, y | 0x80) > _morton_ref(x, y & 0x7F)


@given(st.integers(min_value=1, max_value=10**12))
def test_lsh_bits_monotone_and_clamped(n):
    b = lsh_bits(n)
    assert 8 <= b <= 24
    assert lsh_bits(n * 2) >= b


@given(st.integers(min_value=1, max_value=400))
def test_bucketize_formula_equal_frequency(n):
    """feature_bucketize's bucket id floor((rank-1)*k/n): for any corpus
    size, bucket sizes differ by at most 1 and ids are the contiguous
    prefix of range(k) — the equal-frequency contract the operator's
    oracle restates over row_number()."""
    k = 10
    buckets = [(r * k) // n for r in range(n)]
    sizes = {}
    for b in buckets:
        sizes[b] = sizes.get(b, 0) + 1
    assert len(sizes) == min(k, n)
    if n >= k:  # full corpora fill every bucket exactly
        assert sorted(sizes) == list(range(k))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert buckets == sorted(buckets)


def test_drift_ks_partition_count_invariant(spark, sf_dir):
    """The two-phase prefix-sum KS statistic must not depend on how many
    range partitions carry the cumulative counts."""
    from datafusion_test_spark.pipeline.quality import drift_ks

    a = drift_ks(spark, sf_dir, par=3).collect()[0]
    b = drift_ks(spark, sf_dir, par=7).collect()[0]
    assert (a["n_a"], a["n_b"], a["d_num"], a["ks_stat"]) == (
        b["n_a"],
        b["n_b"],
        b["d_num"],
        b["ks_stat"],
    )


def test_pipeline_shuffle_partition_count_invariant(spark, sf_dir):
    """Global shuffle positions are a pure function of the data, not of
    the partition count used to compute the distributed rank."""
    from datafusion_test_spark.pipeline.curation import pipeline_shuffle

    a = {r["doc_id"]: r["pos"] for r in pipeline_shuffle(spark, sf_dir, par=3).collect()}
    b = {r["doc_id"]: r["pos"] for r in pipeline_shuffle(spark, sf_dir, par=7).collect()}
    assert a == b


def test_two_phase_prefix_matches_pandas_cumsum(spark):
    """The shared helper must reproduce pandas' exclusive cumsum and rank
    for arbitrary (unsorted, duplicate-keyed) inputs at several partition
    counts — three operators ride on this arithmetic."""
    import pandas as pd

    from datafusion_test_spark._util import two_phase_prefix

    pdf = pd.DataFrame(
        {
            "k": [5, 1, 9, 3, 3, 7, 2, 8, 6, 4, 0, 9],
            "tie": list(range(12)),  # unique tiebreak -> total order
            "w": [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37],
        }
    )
    expected = pdf.sort_values(["k", "tie"]).reset_index(drop=True)
    expected["pre_w"] = expected["w"].cumsum().shift(fill_value=0)
    expected["rnk"] = range(1, len(expected) + 1)
    df = spark.createDataFrame(pdf)
    for par in (1, 3, 5):
        out, totals = two_phase_prefix(
            df, par, ["k", "tie"], sum_cols=("w",), rank_as="rnk"
        )
        got = (
            out.toPandas()
            .sort_values(["k", "tie"])
            .reset_index(drop=True)[["k", "tie", "w", "pre_w", "rnk"]]
        )
        assert got.astype("int64").equals(
            expected[["k", "tie", "w", "pre_w", "rnk"]].astype("int64")
        ), par
        t = totals.collect()[0]
        assert t["tot_w"] == int(pdf["w"].sum()) and t["tot_rows"] == len(pdf)


def test_half_up_three_way_agreement_on_ties(spark):
    """The engine-stable rounding must produce the SAME result in python,
    Spark, and DuckDB — including on exact .xxxx5 ties where round()
    semantics differ between engines."""
    import math

    import duckdb

    from pyspark.sql import functions as F

    from datafusion_test_spark._util import half_up, sql_half_up

    vals = [-0.00005, 0.00005, 0.12345, -0.12345, 1.00005, -1.00005, 0.0,
            48.69125, 2.5e-05, -0.0001499999]
    py = [math.floor(v * 10000 + 0.5) / 10000 for v in vals]
    con = duckdb.connect()
    duck = [
        # CAST: a bare numeric literal parses as DECIMAL in DuckDB, but
        # every real oracle feeds sql_half_up a DOUBLE expression
        con.sql(f"SELECT {sql_half_up(f'CAST({v!r} AS DOUBLE)')} AS x").fetchone()[0]
        for v in vals
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [
        r["x"]
        for r in df.select(half_up(F.col("v")).alias("x"), "v")
        .orderBy("v")
        .collect()
    ]
    want = [x for _, x in sorted(zip(vals, py))]
    assert duck == py
    assert got == want
