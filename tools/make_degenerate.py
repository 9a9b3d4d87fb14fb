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
* ``const``  — 8 copies of row 1 with UNIQUE primary keys (and unique
               event timestamps, preserving the ASOF (user_id, ts)
               oracle precondition) but every VALUE column constant:
               zero variance, zero range, all-duplicate documents,
               identical embeddings — the constant-valued-partition
               state that exercises stddev/corr/MAD/range denominators
* ``pairs``  — 4+4 copies of rows 1 and 2 (same key/timestamp
               uniquification): a two-point distribution, the state that
               exercises mode/argmax/percentile TIE handling that
               ``const`` (all equal) and ``tiny`` (n=1) cannot reach
               (first run found the approx-quantile bracket floor and
               widened the sim_pairwise_lsh degeneracy probe)
* ``subset<K>`` (``--subset K``) — a deterministic ~30% row sample of
               every table (md5 of the first key column, salted by K):
               the oracle differential must hold on ANY subset of the
               corpus — foreign-key orphans, missing labels, and thinned
               groups are normal runtime states between the degenerate
               extremes and the full corpus

* ``skew``   — every join/group FOREIGN key column re-pointed so ONE
               hot value owns ~90% of rows (o_custkey, l_partkey,
               l_suppkey, user_id, c_nationkey): the canonical 100 TB
               hot-key state.  Primary keys and the ASOF (user_id, ts)
               uniqueness precondition survive (event timestamps are
               globally unique in the source data).
* ``unicode`` — text-bearing columns rewritten on a deterministic
               per-row fraction with adversarial Unicode drawn from a
               fixed pool: combining marks vs precomposed accents,
               Turkish dotted/dotless casing, German ß, Greek final
               sigma, CJK (no whitespace), RTL Arabic/Hebrew, ZWJ emoji
               sequences, astral-plane letters, zero-width and exotic
               space characters (U+2028 line separator!), mixed
               CR/LF/TAB, a 4k single token, and LIKE/regex
               metacharacters used as DATA.  The gate hunts engine
               divergences in casing (JVM vs utf8proc), codepoint vs
               byte length/substring, tokenization, JSON escaping, and
               binary-collation sort order.  Keys, labels, and grouping
               columns are untouched.
* ``ieee``   — non-finite floats injected into the MEASUREMENT columns
               where they occur in production: ``events.value`` gets
               NaN (~5%), +Inf (~2%), -Inf (~2%) — sensor glitches,
               log-of-zero features, divide-overflow metrics — and
               ``embeddings.embedding`` gets a NaN element in ~4% of
               vectors plus ~1% all-NaN vectors (the failed model
               forward pass).  TPC-H money columns stay finite by
               DOMAIN: lakehouse money is decimal-backed and cannot
               hold NaN.  -0.0 is deliberately NOT injected: engines
               agree it equals 0.0 but render it differently, so it
               poisons row-sort keys for purely cosmetic insight.
* ``dup``    — every row cloned 4×: clones keep all payload/FK values
               (extra facts against the same dimensions) and offset only
               PRIMARY-key columns by j·2×10⁷ (NOT 10⁷ — that is the ANN
               entries' _PLANT_OFFSET; a colliding clone offset collides
               planted ids with clone ids, found on first run);
               events.ts shifts j seconds per clone so the ASOF
               (user_id, ts) uniqueness precondition holds.  Saturates
               every tie-break (rank/argmax/max_by/top-k boundary) and
               every dedup group at CORPUS scale, not the 8-row
               ``pairs`` scale.
* ``nulls``  — value/attribute columns NULLed on a deterministic
               per-column ~33% of rows (measures, prices, labels,
               props) and ~10% for load-bearing payloads (text,
               embedding, dates, event_type): the missing-data state
               every 100 TB corpus is in.  Keys, event timestamps, and
               partition columns stay non-null so structural
               preconditions hold; the gate hunts ANSI null-arithmetic,
               null-skipping aggregate, and null-ordering divergences.

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


# primary-key columns overwritten with 0..N-1 so uniqueness contracts
# (join keys, dedup doc ids, ASOF event ids) survive the row cloning
_KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_linenumber"],  # (l_orderkey, l_linenumber) unique
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

_CONST_N = 8


def _const_table(t, name, distinct_rows: int = 1):
    import pyarrow as pa

    srcs = [t.slice(j, 1) for j in range(distinct_rows)]
    rep = pa.concat_tables(srcs * (_CONST_N // distinct_rows))
    for key in _KEYS[name]:
        i = rep.schema.get_field_index(key)
        seq = pa.array(range(_CONST_N), type=pa.int64()).cast(
            rep.schema.field(i).type
        )
        rep = rep.set_column(i, rep.schema.field(i), seq)
    if name == "events":
        # unique, strictly-increasing timestamps: the ASOF oracles'
        # (user_id, ts) uniqueness precondition must hold
        i = rep.schema.get_field_index("ts")
        base = rep.column("ts").to_pylist()[0]
        import datetime as dt

        ts = pa.array(
            [base + dt.timedelta(hours=j) for j in range(_CONST_N)],
            type=rep.schema.field(i).type,
        )
        rep = rep.set_column(i, rep.schema.field(i), ts)
    return rep


# composite ROW key for the subset filter: _KEYS deliberately lists only
# the within-parent ordinal for lineitem (the const/tiny builders want a
# small re-sequenced column), but a row-level sample must hash a key that
# is unique PER ROW — hashing l_linenumber alone (~7 distinct values)
# would select whole linenumber classes, realized fraction a multiple of
# ~1/7 instead of ~30% (ADVICE r5).
_SUBSET_KEYS = {**{n: k for n, k in _KEYS.items()}, "lineitem": ["l_orderkey", "l_linenumber"]}


def _subset_table(t, name, salt: int):
    """Deterministic ~30% row filter keyed on md5(composite row key, salt)
    — no RNG, reproducible on any machine/run.  Filters by a row-level
    boolean mask (never isin on a non-unique column) so the sample is
    genuinely per-row even when a key component repeats."""
    import hashlib

    import pyarrow as pa

    cols = [t.column(k).to_pylist() for k in _SUBSET_KEYS[name]]
    mask = [
        int(
            hashlib.md5(
                (str(salt) + ":" + ":".join(str(v) for v in row)).encode()
            ).hexdigest(),
            16,
        )
        % 10
        < 3
        for row in zip(*cols)
    ]
    return t.filter(pa.array(mask, type=pa.bool_()))


# skew: (column, hot fraction) — FK / grouping columns only; PKs and
# ASOF-precondition columns (event ts) are never touched
_SKEW = {
    "orders": [("o_custkey", 0.9)],
    "lineitem": [("l_partkey", 0.9), ("l_suppkey", 0.9)],
    "events": [("user_id", 0.9)],
    "customer": [("c_nationkey", 0.9)],
}


def _skew_table(t, name):
    """Re-point ~`frac` of each skew column's rows at the column MIN
    (the hot key), selected by md5 of the row's composite key — no RNG,
    reproducible, and independent across columns."""
    import hashlib

    import pyarrow as pa
    import pyarrow.compute as pc

    keys = list(zip(*[t.column(k).to_pylist() for k in _SUBSET_KEYS[name]]))
    for col, frac in _SKEW.get(name, []):
        i = t.schema.get_field_index(col)
        hot = pc.min(t.column(col)).as_py()
        mask = pa.array(
            [
                int(
                    hashlib.md5(
                        (col + ":" + ":".join(str(v) for v in row)).encode()
                    ).hexdigest(),
                    16,
                )
                % 100
                < frac * 100
                for row in keys
            ],
            type=pa.bool_(),
        )
        skewed = pc.if_else(
            mask, pa.scalar(hot, type=t.schema.field(i).type), t.column(col)
        )
        t = t.set_column(i, t.schema.field(i), skewed)
    return t


# nulls: (column, null fraction).  ~33% for measures/attributes, ~10%
# for load-bearing payloads whose null state fans into many operators.
_NULLS = {
    "orders": [
        ("o_totalprice", 0.33),
        ("o_orderpriority", 0.33),
        ("o_orderdate", 0.10),
    ],
    "lineitem": [
        ("l_quantity", 0.33),
        ("l_extendedprice", 0.33),
        ("l_discount", 0.33),
        ("l_tax", 0.33),
        ("l_shipdate", 0.10),
    ],
    "events": [
        ("value", 0.33),
        ("props", 0.33),
        ("event_type", 0.10),
    ],
    "documents": [
        ("lang", 0.33),
        ("source", 0.33),
        ("n_chars", 0.33),
        ("text", 0.10),
    ],
    "customer": [("c_acctbal", 0.33), ("c_mktsegment", 0.33)],
    "embeddings": [("label", 0.33), ("embedding", 0.10)],
}


def _null_table(t, name):
    """NULL a deterministic md5-selected fraction of each listed column
    — per-column independent masks so null patterns overlap naturally."""
    import hashlib

    import pyarrow as pa
    import pyarrow.compute as pc

    keys = list(zip(*[t.column(k).to_pylist() for k in _SUBSET_KEYS[name]]))
    for col, frac in _NULLS.get(name, []):
        i = t.schema.get_field_index(col)
        typ = t.schema.field(i).type
        mask = pa.array(
            [
                int(
                    hashlib.md5(
                        ("null:" + col + ":" + ":".join(str(v) for v in row)).encode()
                    ).hexdigest(),
                    16,
                )
                % 100
                < frac * 100
                for row in keys
            ],
            type=pa.bool_(),
        )
        nulled = pc.if_else(mask, pa.scalar(None, type=typ), t.column(col))
        t = t.set_column(i, t.schema.field(i), nulled)
    return t


# ---- unicode corpus ---------------------------------------------------------
# Adversarial pool.  Every entry keeps a couple of plain-ASCII tokens so
# shingle / token / tfidf relations stay non-degenerate; the adversarial
# payload rides alongside.  Each string is a distinct divergence class.
_UNI_POOL = [
    "naïve café protégé déjà vu scan merge",               # precomposed accents
    "éléphant créme sort hash",          # NFD combining marks
    "İstanbul ırmak Diyarbakır index join",                # Turkish dotted/dotless i
    "straße weiß GROSS Straße batch spark",                # ß casing (upper -> SS)
    "ΣΙΣΥΦΟΣ σίσυφος τέλος window stream",                  # Greek final sigma
    "北京上海廣州データベース東京 table scan",               # CJK, no intra-word spaces
    "مرحبا بالعالم نص عربي partition key",                 # RTL Arabic
    "שלום עולם מסד נתונים shuffle sort",                    # RTL Hebrew
    "👩‍👩‍👧‍👦 🇺🇸🇯🇵 👍🏽 emoji zwj flags merge",                    # ZWJ sequences + modifiers
    "𝕊𝕡𝕒𝕣𝕜 𝒟𝒶𝓉𝒶 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 astral plane rows",                 # supplementary-plane letters
    "zero\u200bwidth\u200cjoin\u200dtext \u2060word scan",  # zero-width chars
    "non\u00a0breaking\u2009thin\u2028line\u2029para sep",  # exotic spaces + LS/PS
    "tab\tsep\r\nwindows\rmac\nunix mixed lines",           # mixed newline/tab
    "q\"uote back\\slash 'single' %pct% _und_ [brkt] .dot*",  # LIKE/regex metachars as data
    "ꞧɇꞥđɇꞧ ʂǥɍƀ ƚøꞥǥ ᴛᴀɪʟ latin extended glyphs",           # Latin Extended blocks
    "longtoken" + "é" * 4000 + " end",                 # 4k single multibyte token
]

# (column, rewrite fraction) per table; keys / labels / grouping columns
# (lang, c_mktsegment, event_type) stay untouched so structural oracles
# and ground-truth contracts hold.
_UNICODE_TEXT = {
    "documents": [("text", 0.40), ("source", 0.30)],
    "customer": [("c_name", 0.30)],
    "part": [("p_name", 0.20)],
}


def _unicode_table(t, name):
    """Rewrite a deterministic md5-selected fraction of each listed text
    column with pool entries (cycled by the same hash), leaving the rest
    of the rows as-is.  events.props gets an extra unicode string FIELD
    appended inside the JSON so ``$.k`` extraction still works while the
    raw-string consumers see adversarial bytes."""
    import hashlib
    import json

    import pyarrow as pa

    keys = list(zip(*[t.column(k).to_pylist() for k in _SUBSET_KEYS[name]]))

    def _h(tag, row):
        return int(
            hashlib.md5(
                (tag + ":" + ":".join(str(v) for v in row)).encode()
            ).hexdigest(),
            16,
        )

    for col, frac in _UNICODE_TEXT.get(name, []):
        i = t.schema.get_field_index(col)
        vals = t.column(col).to_pylist()
        out = [
            _UNI_POOL[_h("uni:" + col, row) % len(_UNI_POOL)]
            if v is not None and _h("uni:" + col, row) % 100 < frac * 100
            else v
            for v, row in zip(vals, keys)
        ]
        t = t.set_column(i, t.schema.field(i), pa.array(out, type=pa.string()))
    if name == "events":
        i = t.schema.get_field_index("props")
        vals = t.column("props").to_pylist()
        out = []
        for v, row in zip(vals, keys):
            if v is not None and _h("uni:props", row) % 100 < 30:
                d = json.loads(v)
                d["s"] = _UNI_POOL[_h("uni:props", row) % len(_UNI_POOL)][:40]
                v = json.dumps(d, ensure_ascii=False)
            out.append(v)
        t = t.set_column(i, t.schema.field(i), pa.array(out, type=pa.string()))
    return t


# ---- ieee corpus ------------------------------------------------------------
def _ieee_table(t, name):
    """Inject NaN / ±Inf into measurement columns on deterministic
    md5-selected rows (disjoint buckets, same keying as the other modes)."""
    import hashlib

    import pyarrow as pa

    keys = list(zip(*[t.column(k).to_pylist() for k in _SUBSET_KEYS[name]]))

    def _h(tag, row):
        return int(
            hashlib.md5(
                (tag + ":" + ":".join(str(v) for v in row)).encode()
            ).hexdigest(),
            16,
        ) % 100

    if name == "events":
        i = t.schema.get_field_index("value")
        vals = t.column("value").to_pylist()
        out = []
        for v, row in zip(vals, keys):
            b = _h("ieee:value", row)
            if v is not None and b < 5:
                v = float("nan")
            elif v is not None and b < 7:
                v = float("inf")
            elif v is not None and b < 9:
                v = float("-inf")
            out.append(v)
        t = t.set_column(i, t.schema.field(i), pa.array(out, type=t.schema.field(i).type))
    if name == "embeddings":
        i = t.schema.get_field_index("embedding")
        typ = t.schema.field(i).type
        vecs = t.column("embedding").to_pylist()
        out = []
        for v, row in zip(vecs, keys):
            b = _h("ieee:emb", row)
            if v is not None and b < 1:
                v = [float("nan")] * len(v)          # failed forward pass
            elif v is not None and b < 5 and len(v) > 0:
                v = list(v)
                v[_h("ieee:pos", row) % len(v)] = float("nan")
            out.append(v)
        t = t.set_column(i, t.schema.field(i), pa.array(out, type=typ))
    return t


# ---- time-edges corpus ------------------------------------------------------
# Calendar/epoch adversarial instants.  The hunt targets: division rounding
# on NEGATIVE pre-epoch microseconds — measured on this build (r9 advisor
# check, `SELECT -7 // 2`): Spark `div` AND DuckDB integer `//` BOTH
# truncate toward zero (-7 // 2 = -3), so for INTEGER operands the engines
# agree, which is exactly why drift_psi's '(lo_us+hi_us) div 2' vs '// 2'
# midpoints match; the documented divergence class exists only if either
# engine's semantics change, or if an oracle lets `//` see non-integer
# operands (DuckDB `-7.5 // 2` = -3.75 on this build — not floor division
# — so never twin Spark `div` with a float-typed `//`),
# date_trunc/window bucketing across the epoch, proleptic-Gregorian vs
# hybrid-calendar handling of the 1582 Julian gap, leap-day and
# century-leap rules, the 32-bit time_t boundary, and year-9999 extremes
# (capped a minute short of datetime.max so per-row µs uniquification
# cannot overflow Python/Arrow datetime).  All values are UTC wall-clock;
# the DST-gap instants matter if any operator ever localizes.
import datetime as _dt

_TIME_POOL = [
    _dt.datetime(1969, 12, 31, 23, 59, 59),      # last pre-epoch second
    _dt.datetime(1970, 1, 1, 0, 0, 0),           # epoch zero
    _dt.datetime(1970, 1, 1, 0, 0, 0, 1),        # epoch + 1 µs
    _dt.datetime(1969, 7, 20, 20, 17, 40),       # deep negative epoch
    _dt.datetime(1582, 10, 10, 12, 0, 0),        # inside the Julian gap
    _dt.datetime(1900, 2, 28, 23, 59, 59),       # 1900 is NOT a leap year
    _dt.datetime(2000, 2, 29, 12, 0, 0),         # century leap day IS real
    _dt.datetime(2016, 12, 31, 23, 59, 59, 999999),  # leap-second adjacency
    _dt.datetime(2017, 1, 1, 0, 0, 0),
    _dt.datetime(2021, 3, 14, 2, 30, 0),         # US DST spring-forward gap
    _dt.datetime(2021, 11, 7, 1, 30, 0),         # US DST fall-back overlap
    _dt.datetime(2024, 2, 29, 23, 59, 59, 999999),   # leap-day last µs
    _dt.datetime(2038, 1, 19, 3, 14, 7),         # 32-bit time_t max
    _dt.datetime(2038, 1, 19, 3, 14, 8),
    # 0001-01-02, NOT 01-01: CPython's datetime.fromtimestamp probes
    # +/-1 day for DST-fold detection, so ANY instant on 0001-01-01
    # lands in year 0 and raises in every timezone — the engines compute
    # it fine, but no PySpark driver (non-Arrow collect deserializes via
    # fromtimestamp) nor pandas client can MATERIALIZE it.  Day two is
    # the smallest collectible minimum-year instant (round-8 first
    # sweep: 30 of 32 failures were this one Python-client class).
    _dt.datetime(1, 1, 2, 0, 0, 0),              # minimum collectible year
    _dt.datetime(9999, 12, 31, 23, 59, 0),       # maximum year (capped)
]

_TIME_DATE_POOL = [
    _dt.datetime(1969, 12, 31),
    _dt.datetime(1970, 1, 1),
    _dt.datetime(1582, 10, 10),
    _dt.datetime(1900, 2, 28),
    _dt.datetime(2000, 2, 29),
    _dt.datetime(2024, 2, 29),
    _dt.datetime(1, 1, 2),  # see the fromtimestamp fold-probe note above
    _dt.datetime(9999, 12, 31),
]

_TIME_COLS = {"events": "ts", "orders": "o_orderdate", "lineitem": "l_shipdate"}


def _time_table(t, name):
    """Rewrite ~12% of the table's time column (md5-selected rows, same
    keying as the other modes) with adversarial calendar instants.
    events.ts values are uniquified with a per-row +idx µs so the ASOF
    (user_id, ts) / global-ts uniqueness preconditions survive (idx stays
    < pool spacing, so every edge keeps its semantic: pre-epoch stays
    pre-epoch, the 9999 cap leaves a minute of headroom).  Date-valued
    columns stay at midnight (their contract is day granularity)."""
    import hashlib

    import pyarrow as pa

    if name not in _TIME_COLS:
        return t
    col = _TIME_COLS[name]
    keys = list(zip(*[t.column(k).to_pylist() for k in _SUBSET_KEYS[name]]))

    def _h(tag, row):
        return int(
            hashlib.md5(
                (tag + ":" + ":".join(str(v) for v in row)).encode()
            ).hexdigest(),
            16,
        )

    i = t.schema.get_field_index(col)
    typ = t.schema.field(i).type
    vals = t.column(col).to_pylist()
    pool = _TIME_POOL if name == "events" else _TIME_DATE_POOL
    out, idx = [], 0
    for v, row in zip(vals, keys):
        h = _h("time:" + col, row)
        if v is not None and h % 100 < 12:
            edge = pool[h % len(pool)]
            if name == "events":
                edge = edge + _dt.timedelta(microseconds=idx)
                idx += 1
            v = edge
        out.append(v)
    return t.set_column(i, t.schema.field(i), pa.array(out, type=typ))


# ---- long-document corpus ---------------------------------------------------
# Multi-hundred-KB documents (~1000x the synthetic ~500 B norm).  The hunt:
# quadratic-in-length text ops (per-pair edit distance, shingle explosion),
# regex behavior on giant tokens, shuffle record sizes, and driver collects
# of huge cells.  Four shapes, md5-assigned to ~8 docs:
#   rep   — one sentence repeated (repetition/boilerplate detectors see a
#           pathological doc; n-gram models see max-count collisions)
#   uniq  — tens of thousands of DISTINCT tokens (vocab/tfidf/minhash row
#           explosion concentrates in single documents)
#   giant — a single ~100 KB token with no spaces (tokenizers must stay
#           O(len); whitespace splits see ONE enormous word)
#   mixed — long mixed prose with punctuation (the realistic big page)
_LONG_N = 8


def _long_text(kind: int, seed: int) -> str:
    if kind == 0:    # rep: ~200 KB, 40-char sentence x 5000
        return (f"the quick dataset row {seed % 97} repeats here. " * 5000).strip()
    if kind == 1:    # uniq: ~170 KB of distinct tokens
        return " ".join(f"w{seed % 7}x{i}" for i in range(24000))
    if kind == 2:    # giant: single ~100 KB token
        return "ab" * 50000
    # mixed: ~250 KB prose
    unit = (
        f"Data page {seed % 13}, with commas, numbers 12{seed % 10} and "
        "trailing clauses; also URLs like http://example.com/a?b=c. "
    )
    return (unit * 2500).strip()


def _long_table(t, name):
    """Rewrite _LONG_N md5-selected documents' text with multi-hundred-KB
    payloads (n_chars kept consistent — metadata that lies about the blob
    is a different corpus's job)."""
    import hashlib

    import pyarrow as pa

    if name != "documents":
        return t
    keys = list(zip(*[t.column(k).to_pylist() for k in _SUBSET_KEYS[name]]))
    ranked = sorted(
        range(len(keys)),
        key=lambda i: hashlib.md5(
            ("long:" + ":".join(str(v) for v in keys[i])).encode()
        ).hexdigest(),
    )[:_LONG_N]
    chosen = {i: rank for rank, i in enumerate(ranked)}
    texts = t.column("text").to_pylist()
    nchars = t.column("n_chars").to_pylist()
    for i, rank in chosen.items():
        texts[i] = _long_text(rank % 4, rank)
        nchars[i] = len(texts[i])
    ti = t.schema.get_field_index("text")
    t = t.set_column(ti, t.schema.field(ti), pa.array(texts, type=pa.string()))
    ni = t.schema.get_field_index("n_chars")
    t = t.set_column(ni, t.schema.field(ni), pa.array(nchars, type=t.schema.field(ni).type))
    return t


# ---- dup-heavy corpus -------------------------------------------------------
_DUP_K = 4
# NOT 10_000_000: the self-verifying ANN/dedup entries plant twins at
# vec_id + 10_000_000 (_PLANT_OFFSET) — a colliding clone offset makes
# planted ids collide with clone-1 ids (found on this corpus's first run)
_DUP_OFFSET = 20_000_000


def _dup_table(t, name):
    """Every row cloned _DUP_K times: clone j keeps all payload/FK values
    (clones are extra facts against the same dimensions) and offsets only
    the PRIMARY-key columns by j*_DUP_OFFSET so uniqueness contracts hold.
    events.ts is offset by j seconds per clone, preserving the ASOF
    (user_id, ts) uniqueness precondition.  The point: every tie-break
    (rank/argmax/max_by/top-k boundary) and every dedup group saturates
    at CORPUS scale, not the 8-row `pairs` scale."""
    import datetime as dt

    import pyarrow as pa

    copies = []
    for j in range(_DUP_K):
        c = t
        if j:
            for key in _KEYS[name]:
                i = c.schema.get_field_index(key)
                typ = c.schema.field(i).type
                vals = [
                    v + j * _DUP_OFFSET if v is not None else None
                    for v in c.column(key).to_pylist()
                ]
                c = c.set_column(i, c.schema.field(i), pa.array(vals, type=typ))
            if name == "events":
                i = c.schema.get_field_index("ts")
                typ = c.schema.field(i).type
                vals = [
                    v + dt.timedelta(seconds=j) if v is not None else None
                    for v in c.column("ts").to_pylist()
                ]
                c = c.set_column(i, c.schema.field(i), pa.array(vals, type=typ))
        copies.append(c)
    return pa.concat_tables(copies)


def build_dup(src: str, dest_root: str) -> None:
    dest = os.path.join(dest_root, "dup")
    os.makedirs(dest, exist_ok=True)
    for name in TABLES:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        out = _dup_table(t, name)
        pq.write_table(out, os.path.join(dest, f"{name}.parquet"))
    print(f"dup: {len(TABLES)} tables -> {dest}")


def build_subset(src: str, dest_root: str, salt: int) -> None:
    dest = os.path.join(dest_root, f"subset{salt}")
    os.makedirs(dest, exist_ok=True)
    for name in TABLES:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        out = _subset_table(t, name, salt)
        pq.write_table(out, os.path.join(dest, f"{name}.parquet"))
        print(f"subset{salt}: {name} {t.num_rows} -> {out.num_rows} rows")


def build(src: str, dest_root: str) -> None:
    for mode in ("empty", "tiny", "const", "pairs", "skew", "nulls", "unicode", "ieee", "dup", "time", "long"):
        dest = os.path.join(dest_root, mode)
        os.makedirs(dest, exist_ok=True)
        for name in TABLES:
            t = pq.read_table(os.path.join(src, f"{name}.parquet"))
            if mode == "const":
                out = _const_table(t, name)
            elif mode == "pairs":
                out = _const_table(t, name, distinct_rows=2)
            elif mode == "skew":
                out = _skew_table(t, name)
            elif mode == "nulls":
                out = _null_table(t, name)
            elif mode == "unicode":
                out = _unicode_table(t, name)
            elif mode == "ieee":
                out = _ieee_table(t, name)
            elif mode == "dup":
                out = _dup_table(t, name)
            elif mode == "time":
                out = _time_table(t, name)
            elif mode == "long":
                out = _long_table(t, name)
            else:
                out = t.slice(0, 0 if mode == "empty" else 1)
            pq.write_table(out, os.path.join(dest, f"{name}.parquet"))
        print(f"{mode}: {len(TABLES)} tables -> {dest}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    src = args[0] if args else "/root/testdata/sf0.001"
    dest_root = args[1] if len(args) > 1 else "/tmp/spark_graft_degenerate"
    subset_salts = [
        int(a.split("=", 1)[1])
        for a in sys.argv[1:]
        if a.startswith("--subset=")
    ]
    if subset_salts:
        for salt in subset_salts:
            build_subset(src, dest_root, salt)
    elif "--dup" in sys.argv[1:]:
        build_dup(src, dest_root)
    else:
        build(src, dest_root)
