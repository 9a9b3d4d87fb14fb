"""Source/sink connector round-trips beyond parquet (SURVEY §1 storage
model).  The reference itself is parquet-only over an object store
(src/main.rs:131-144, 229-231); Spark's DataSource V2 gives CSV/JSON/ORC for
free.  Each operator writes a testdata table through the format and re-reads
it with an explicit schema — the SQL oracle hash-matching the ORIGINAL table
proves the connector round-trip is lossless.

Scale note: these formats exist for interchange; the engine's native format
stays parquet (columnar, splittable, statistics).  CSV/JSON scans at 100 TB
are line-splittable but schema-on-read-expensive — always land to parquet
first, which is exactly what these operators' write-then-read shape does.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .._util import dsum, sql_dsum, scratch_dir
from ..io import table


def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer -> CSV (header) -> re-read with explicit schema.

    multiLine=true on the read: the writer QUOTES fields containing
    newlines, but the default reader splits records on raw newlines
    before parsing quotes — a value with an embedded CR/LF becomes two
    half-rows (unicode corpus, round 7: 150 rows came back as 156).
    Embedded newlines are legal CSV (RFC 4180 §2.6) and routine in real
    exports, so multiLine is the production-correct setting.  Cost note:
    multiLine makes a file non-splittable (quote state is unknowable
    mid-file) — at 100 TB keep per-file sizes bounded by the writer's
    maxRecordsPerFile instead of relying on intra-file splits."""
    out = os.path.join(scratch_dir("dfts_csv_"), "customer_csv")
    c = table(spark, sf_dir, "customer")
    c.write.mode("overwrite").option("header", True).csv(out)
    return (
        spark.read.schema(c.schema)
        .option("header", True)
        .option("multiLine", True)
        .csv(out)
    )


def scan_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> JSON lines -> re-read with explicit schema (timestamps
    serialize as ISO-8601 and parse back losslessly at µs precision)."""
    out = os.path.join(scratch_dir("dfts_json_"), "events_json")
    ev = table(spark, sf_dir, "events")
    # default JSON timestampFormat truncates to milliseconds; pin µs
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ev.write.mode("overwrite").option("timestampFormat", fmt).json(out)
    return spark.read.schema(ev.schema).option("timestampFormat", fmt).json(out)


def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> ORC -> re-read (the other columnar container).

    Calendar contract (time corpus, round 8, measured): the ORC container
    rebases timestamps through the HYBRID Julian/Gregorian calendar, so
    instants inside the Gregorian-transition gap (1582-10-05..14 — dates
    that never existed in the hybrid calendar) come back shifted onto the
    following valid day (1582-10-10 → 1582-10-15; the rebase confs don't
    reach this path in the current build).  Every other instant — year 1,
    pre-epoch, year 9999 — roundtrips exactly.  Gap instants are excluded
    from the roundtrip contract on BOTH sides; at 100 TB the operational
    answer is the same: don't route pre-Gregorian instants through ORC."""
    out = os.path.join(scratch_dir("dfts_orc_"), "orders_orc")
    # null-safe: a NULL order date is not a gap instant and must survive
    # the roundtrip (nulls corpus discipline)
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNull()
        | ~(
            (F.col("o_orderdate") >= F.lit("1582-10-05").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1582-10-15").cast("timestamp"))
        )
    )
    o.write.mode("overwrite").orc(out)
    return spark.read.orc(out)


def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution scan: two parquet batches of documents written with
    DIFFERENT schemas (the second adds n_chars — a column added mid-life,
    the normal state of a years-old lake table), read back as ONE dataset
    with mergeSchema; rows from the old-schema batch surface NULL for the
    added column.  Batch membership = doc_id parity, so the oracle
    re-derives exactly which rows must be null.

    Scale: mergeSchema reconciles footers at planning time — at 100 TB
    pin the merged schema explicitly (or keep it in a catalog) so the
    planner doesn't stat every footer; the per-row cost of absent columns
    is zero (parquet column chunks simply aren't there to read)."""
    out = os.path.join(scratch_dir("dfts_evo_"), "docs_evo")
    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    old = d.filter(F.col("doc_id") % 2 == 0).drop("n_chars")
    new = d.filter(F.col("doc_id") % 2 == 1)
    old.write.mode("overwrite").parquet(os.path.join(out, "batch=0"))
    new.write.mode("overwrite").parquet(os.path.join(out, "batch=1"))
    rt = spark.read.option("mergeSchema", True).parquet(out)
    # old-schema membership comes from the batch PARTITION column, not
    # from "n_chars IS NULL": once the source data itself admits NULL
    # n_chars, a new-batch null is indistinguishable from an absent
    # column by value alone (nulls degenerate corpus, round 6) — which
    # is exactly why real lakes track schema per file/partition
    return rt.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("n_chars").alias("n_with_chars"),
        F.sum("n_chars").alias("chars_sum"),
        F.sum(F.when(F.col("batch") == 0, 1).otherwise(0)).alias(
            "n_old_schema"
        ),
    )


def scan_json_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE JSON ingestion with corrupt-record capture — crawl and
    log feeds ALWAYS contain broken lines, and a 100 TB load must land
    them in a quarantine column instead of failing the job (FAILFAST) or
    silently dropping them (DROPMALFORMED).  A JSONL copy of documents
    gets one malformed line per 50 docs injected; the scan keeps good
    rows typed and surfaces bad lines via _corrupt_record.

    The corrupt count and the good-row aggregate are both exact and
    SQL-derivable (the injection rule is deterministic), so the oracle
    verifies the quarantine accounting itself."""
    path = os.path.join(scratch_dir("dfts_jsonc_"), "docs_jsonl")
    d = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    # DISTRIBUTED fixture write (was a driver-side collect loop — the one
    # O(N) driver materialization in the package, r5 collect audit): each
    # row renders its JSON line as a column; injected rows append the
    # malformed line via explode, and the lines land with write.text
    # to_json with ignoreNullFields=false renders NULL attributes as
    # JSON null instead of dropping the line: the previous hand-built
    # concat() returned NULL for any NULL field, silently vanishing ~40%
    # of rows from the fixture (nulls degenerate corpus, round 6)
    good = F.to_json(
        F.struct("doc_id", "lang", "n_chars"),
        {"ignoreNullFields": "false"},
    )
    lines = d.select(
        F.explode(
            F.when(
                F.col("doc_id") % 50 == 0,
                F.array(good, F.lit('{"doc_id": broken-not-json')),
            ).otherwise(F.array(good))
        ).alias("value")
    )
    lines.write.mode("overwrite").text(path)
    schema = (
        "doc_id bigint, lang string, n_chars bigint, _corrupt_record string"
    )
    rt = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return rt.groupBy().agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count("doc_id").alias("n_good"),
        # coalesce: SUM over an empty file is NULL; the oracle's
        # conditional count is 0 (degenerate-corpus gate, round 5)
        F.coalesce(
            F.sum(F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0)),
            F.lit(0),
        ).alias("n_corrupt"),
        F.sum("n_chars").alias("chars_sum"),
    )


def scan_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot/time-travel reads over a versioned table layout — the
    poor-man's table format: every commit writes a full snapshot directory
    (v=1, v=2) and readers pin a version, exactly the semantics
    Iceberg/Delta expose as VERSION AS OF.  v2 applies a deterministic
    mutation to v1 (10% price uplift for open orders); the query reads
    BOTH versions and reports the per-status diff an auditor would ask of
    a table's history.

    Scale: snapshot directories share unchanged files in real formats
    (manifests point at data files; only deltas are new) — here the
    mutation rewrites everything because there is no manifest layer, which
    is precisely the write-amplification argument FOR table formats at
    100 TB, stated by construction.
    """
    base = os.path.join(scratch_dir("dfts_tt_"), "orders_vers")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    o.write.mode("overwrite").parquet(os.path.join(base, "v=1"))
    v2 = o.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderstatus") == "O", F.col("o_totalprice") * 1.1
        ).otherwise(F.col("o_totalprice")),
    )
    v2.write.mode("overwrite").parquet(os.path.join(base, "v=2"))
    r1 = spark.read.parquet(os.path.join(base, "v=1"))
    r2 = spark.read.parquet(os.path.join(base, "v=2"))
    j = r1.alias("a").join(r2.alias("b"), "o_orderkey")
    return j.groupBy(F.col("a.o_orderstatus").alias("o_orderstatus")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("a.o_totalprice"), "total_v1"),
        dsum(F.col("b.o_totalprice"), "total_v2"),
        F.sum(
            F.when(F.col("b.o_totalprice") != F.col("a.o_totalprice"), 1).otherwise(
                0
            )
        ).alias("n_changed"),
    )


def _z_interleave(x, y, bits: int = 8):
    """16-bit Morton code: interleave the low `bits` of x (even positions)
    and y (odd positions) — pure integer expressions, identical in SQL."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering — the TWO-dimensional extension of
    layout_zonemap: orders are sorted by the interleaved bits of
    (o_custkey % 256, day-of-month), so file-level min/max footer stats
    prune scans filtered on EITHER dimension; a 1-D sort would serve only
    its leading column.

    The z-value is exact integer arithmetic, so the oracle recomputes the
    full z distribution (count / min / max / sum per z-quartile); the 2-D
    locality claim — every file owns a z-interval DISJOINT from every
    other file's — is measured from parquet FOOTERS only and emitted as a
    result column.  Disjoint z-ranges are what pruning actually consumes:
    an (x, y) rectangle predicate decomposes into Morton intervals, and
    each interval can intersect only the files whose footer z-range
    overlaps it.  (An earlier per-file x-span × y-span area bound was
    distribution-DEPENDENT, not an invariant: the skew degenerate corpus
    — 90% of custkeys on one hot value — pushes the sparse tail rows of a
    range partition across quadrant boundaries, and a Morton interval
    that crosses the domain midline has a bounding box up to the whole
    domain with as few as 2 rows.  Disjointness is what
    repartitionByRange(zval) + sortWithinPartitions guarantees for ANY
    distribution: equal keys never split across partitions.)  At 100 TB
    this layout is written once per partition roll-up and every dashboard
    range scan after that pays sub-linear IO on both dims.
    """
    import pyarrow.parquet as pq

    out = os.path.join(scratch_dir("dfts_zord_"), "orders_z")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 256).alias("zx"),
        F.dayofmonth("o_orderdate").alias("zy"),
    )
    z = o.withColumn("zval", _z_interleave(F.col("zx"), F.col("zy")))
    (
        z.repartitionByRange(8, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(out)
    )
    zranges, n_files, total_rows = [], 0, 0
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out, f)).metadata
        total_rows += md.num_rows
        if md.num_rows == 0:
            continue  # schema-only file from an empty range partition
        n_files += 1
        names = md.schema.names
        iz = names.index("zval")
        # all-NULL row groups (NULL o_orderdate => NULL zval) carry a
        # statistics object without min/max — they prune every z-range
        # probe, so they impose no disjointness constraint
        sz = [
            st
            for g in range(md.num_row_groups)
            if (st := md.row_group(g).column(iz).statistics) is not None
            and st.has_min_max
        ]
        if not sz:
            continue
        zranges.append((min(s.min for s in sz), max(s.max for s in sz)))
    # every file owns a contiguous z interval; the layout invariant the
    # pruner consumes is that those intervals are pairwise DISJOINT (a z
    # probe interval hits only the files whose footer range overlaps it).
    # repartitionByRange never splits equal keys, so disjointness holds
    # for any distribution — incl. the skew and const degenerate corpora.
    # Vacuously true at <= 1 total row or a single file (nothing to be
    # disjoint FROM) — the oracle emits literal TRUE; degenerate gate, r5
    zranges.sort()
    disjoint = all(
        zranges[i][1] < zranges[i + 1][0] for i in range(len(zranges) - 1)
    )
    # constant z key (one distinct (zx, zy) point): range partitioning
    # lands everything in one file, which is the whole locality there is
    const_key = bool(zranges) and (
        min(r[0] for r in zranges) == max(r[1] for r in zranges)
    )
    vacuous = total_rows <= 1 or const_key
    locality = vacuous or disjoint
    rt = spark.read.schema(z.schema).parquet(out)
    return (
        rt.groupBy(F.expr("CAST((zval * 4) DIV 65536 AS INT)").alias("z_quartile"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("zval").alias("z_min"),
            F.max("zval").alias("z_max"),
            F.sum("zval").alias("z_sum"),
        )
        .withColumn("files_ok", F.lit(2 <= n_files <= 8 or vacuous))
        .withColumn("two_dim_locality", F.lit(locality))
    )


def catalog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE statistics — the CBO's food: row/size stats plus
    per-column NDV recorded in the catalog, which is what turns join
    reordering and broadcast decisions from guesses into plans.  orders is
    materialized as a catalog table, analyzed, and the recorded stats are
    read back from DESCRIBE output and cross-checked against exact counts.

    Scale: ANALYZE is a one-pass aggregate (NDV via HLL) you schedule
    after each batch load; without stats a 100 TB star join can pick a
    shuffle join for a 1000-row dim.  The NDV tolerance check (within 10%)
    reflects the sketch's documented error, not a loose test.
    """
    import shutil
    from urllib.parse import urlparse

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # pid-scoped name: the MANAGED table lives in the shared
    # spark-warehouse dir, so concurrent sweep processes would race on a
    # fixed name (observed: three parallel degenerate sweeps cross-read
    # each other's ANALYZE output)
    tbl = f"dfts_stats_orders_{os.getpid()}"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    # the in-memory catalog is per-session: a previous session's managed-
    # table directory survives its DROP, so clear the location too
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(wh, tbl), ignore_errors=True)
    # sweep stale siblings from crashed/killed runs — only dirs whose pid
    # is dead, so a (misconfigured) concurrent sweep's live table is safe
    try:
        for d in os.listdir(wh):
            if d.startswith("dfts_stats_orders") and d != tbl:
                pid = d.rsplit("_", 1)[-1]
                # pid-suffixed dir of a dead process, or the legacy
                # fixed-name dir from pre-r5 code: both are garbage
                if not pid.isdigit() or not os.path.exists(f"/proc/{pid}"):
                    shutil.rmtree(os.path.join(wh, d), ignore_errors=True)
    except OSError:
        pass
    try:
        o.write.mode("overwrite").saveAsTable(tbl)
        spark.sql(
            f"ANALYZE TABLE {tbl} COMPUTE STATISTICS FOR COLUMNS o_custkey"
        )
        stats_rows = None
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect():
            if r["col_name"] == "Statistics":
                # e.g. "123456 bytes, 15000 rows"
                parts = r["data_type"].split(",")
                for p in parts:
                    p = p.strip()
                    if p.endswith("rows"):
                        stats_rows = int(p.split()[0])
        ndv = None
        for r in spark.sql(
            f"DESCRIBE EXTENDED {tbl} o_custkey"
        ).collect():
            if r["info_name"] == "distinct_count":
                ndv = int(r["info_value"])
    finally:
        # the stats live in the returned relation, not the table — drop
        # it so sweeps don't accumulate per-pid garbage in the warehouse
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(os.path.join(wh, tbl), ignore_errors=True)
    n_rows = o.count()
    n_custs = o.select("o_custkey").distinct().count()
    ndv_ok = ndv is not None and abs(ndv - n_custs) * 10 <= n_custs
    return spark.createDataFrame(
        [(n_rows, stats_rows == n_rows, ndv_ok)],
        "n_rows bigint, stats_rows_match boolean, ndv_within_10pct boolean",
    )


def write_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned write (orders partitionBy o_orderstatus) and
    re-read — the 100 TB lakehouse layout.  Filters on the partition column
    become PartitionFilters (directory pruning, zero data read for pruned
    partitions; asserted in tests/test_plans.py).  Oracle hash-matches the
    source table, proving the layout round-trip is lossless."""
    out = os.path.join(scratch_dir("dfts_part_"), "orders_part")
    o = table(spark, sf_dir, "orders")
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    # explicit schema: an empty source writes no partition dirs, and a
    # schema-less read of the bare _SUCCESS dir raises (degenerate gate)
    rt = spark.read.schema(o.schema).parquet(out)
    # partition column comes back as the last column; restore source order
    return rt.select(*o.columns)


def scan_row_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level lineage scan — `_metadata.file_path` + `_metadata.row_index`,
    the lakehouse audit idiom: which physical file did a row come from, and
    is the in-file row numbering contiguous?  (What Delta/Iceberg expose for
    row-level tracking; Spark serves both as hidden metadata columns on any
    file scan, no table format required.)

    Layout: orders written partitionBy(bucket = o_orderkey % 4) after a
    repartition(1), pinning exactly ONE parquet file per bucket directory so
    the per-file contract is oracle-stateable (the repartition(1) is a
    harness determinism device, NOT the production shape — per-file lineage
    works identically with any file count; only the n_files=1 pin would go).

    Driver-verified contracts per bucket, all computed from the ACTUAL
    metadata columns: n_files (distinct file_path) = 1; path_ok — every
    file's path embeds its own bucket value (`bucket=N`), i.e. lineage
    column ↔ physical layout agree; idx_ok — row_index is exactly
    0..n_rows-1 per file (min 0, max n-1, sum n(n-1)/2, order-insensitive
    so the check is independent of which row got which index).

    Plan property (tests/test_plans.py): metadata columns must not widen
    ReadSchema with stored columns — the scan reads o_orderkey only
    (file_path stays constant per-file metadata; row_index surfaces as
    the reader-generated `_tmp_metadata_row_index`).  At 100 TB lineage is
    footer-free constant-space bookkeeping per row; the aggregate is one
    shuffle on (bucket, file).
    """
    out = os.path.join(scratch_dir("dfts_lineage_"), "orders_lineage")
    o = table(spark, sf_dir, "orders").select("o_orderkey")
    (
        o.withColumn("bucket", (F.col("o_orderkey") % 4).cast("int"))
        .repartition(1)
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out)
    )
    # explicit schema: an empty source writes no partition dirs (cf.
    # write_partitioned) and a schema-less read of bare _SUCCESS raises
    schema = "o_orderkey bigint, bucket int"
    rt = spark.read.schema(schema).parquet(out)
    per_file = (
        rt.select(
            "bucket",
            F.col("_metadata.file_path").alias("fp"),
            F.col("_metadata.row_index").alias("ri"),
            "o_orderkey",
        )
        .groupBy("bucket", "fp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ri").alias("ri_min"),
            F.max("ri").alias("ri_max"),
            F.sum("ri").alias("ri_sum"),
            F.min("o_orderkey").alias("min_okey"),
            F.max("o_orderkey").alias("max_okey"),
            F.sum("o_orderkey").alias("sum_okey"),
        )
    )
    return per_file.groupBy("bucket").agg(
        F.count_distinct("fp").cast("bigint").alias("n_files"),
        F.sum("n").alias("n_rows"),
        F.every(
            (F.col("ri_min") == 0)
            & (F.col("ri_max") == F.col("n") - 1)
            & (2 * F.col("ri_sum") == F.col("n") * (F.col("n") - 1))
        ).alias("idx_ok"),
        F.every(
            F.col("fp").contains(F.concat(F.lit("bucket="), F.col("bucket")))
        ).alias("path_ok"),
        F.min("min_okey").alias("min_okey"),
        F.max("max_okey").alias("max_okey"),
        F.sum("sum_okey").alias("sum_okey"),
    )


def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (upsert) expressed as a full-outer join —
    what Delta/Iceberg MERGE compiles to, runnable on plain parquet.

    Deterministic change set: the 100 lowest order keys get a 10% price
    bump and status 'U' (matched → UPDATE); 50 synthetic negative keys are
    new rows (not matched → INSERT).  The merge is one full-outer join on
    the key with source-wins COALESCE per column.

    Scale notes (100 TB): the join shuffles both sides on the key unless
    the target is bucketed on it (see join_bucketed — then the merge is a
    map-side SMJ against the small shuffled source); with a partitioned
    target, only partitions containing source keys need rewriting
    (dynamic partition overwrite), which is exactly how table-format MERGE
    bounds its write amplification.  The 1.1 price multiply is a single
    IEEE double op, bit-identical in DuckDB, so the oracle hash-matches.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    upd = (
        o.orderBy("o_orderkey")
        .limit(100)
        .select(
            "o_orderkey",
            "o_custkey",
            (F.col("o_totalprice") * F.lit(1.1)).alias("o_totalprice"),
            F.lit("U").alias("o_orderstatus"),
        )
    )
    ins = (
        o.orderBy("o_orderkey")
        .limit(50)
        .select(
            (-F.col("o_orderkey") - 1).alias("o_orderkey"),
            "o_custkey",
            "o_totalprice",
            F.lit("N").alias("o_orderstatus"),
        )
    )
    src = upd.unionByName(ins)
    t, s = o.alias("t"), src.alias("s")
    return t.join(s, "o_orderkey", "full_outer").select(
        "o_orderkey",
        F.coalesce(F.col("s.o_custkey"), F.col("t.o_custkey")).alias("o_custkey"),
        F.coalesce(F.col("s.o_totalprice"), F.col("t.o_totalprice")).alias(
            "o_totalprice"
        ),
        F.coalesce(F.col("s.o_orderstatus"), F.col("t.o_orderstatus")).alias(
            "o_orderstatus"
        ),
    )


def stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction — replay a change stream into current-state rows:
    last-writer-wins per key with delete tombstones, the computation behind
    every table-format snapshot read (Delta/Iceberg MOR, Debezium sinks).

    events is read as the change log: key = user_id, ordering = (ts,
    event_id) — event_id breaks timestamp ties deterministically, exactly
    the (commit, sequence) pair of a real CDC feed — and op = DELETE for
    'error' events, UPSERT otherwise.  One window per key picks the last
    op; keys whose last op is a tombstone vanish from the snapshot.

    Scale: one hash shuffle on the key, then WindowGroupLimit prunes each
    partition to its top row before the filter — the same plan as
    topk_per_group, linear in the log, never materializing intermediate
    states.  At 100 TB the log is additionally bucketed by key so periodic
    re-compactions reuse the layout.
    """
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") == "U"))
        .select(
            "user_id",
            F.col("event_id").alias("last_event"),
            F.col("value").alias("last_value"),
        )
    )


def scan_manifest_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-driven file pruning — the Iceberg/Delta scan pattern: a
    file-level manifest (path, row_count, per-column min/max, built from
    parquet FOOTERS at write time, exactly what an Iceberg manifest entry
    stores) answers "which files can contain rows matching the
    predicate?" BEFORE any data page is read; the scan then lists only
    surviving files.  At 100 TB this turns a full directory listing +
    scan into an O(n_files) metadata pass plus a scan of the overlapping
    fraction — the difference between touching 3 files and 30,000.

    Layout: orders range-partitioned into 6 files on o_totalprice (the
    pay-once clustering that makes per-file ranges disjoint).  Query:
    ``o_totalprice <= 150000``.  Pruning rule (Iceberg semantics): keep a
    file iff its [min,max] overlaps the predicate range, drop stat-less
    zero-row files (nothing to miss), keep stat-less files WITH rows (a
    scanner may never skip data it has no stats for).  The predicate is
    re-applied after the read — manifest pruning is file-granular, not
    row-exact.

    The driver-verified ``manifest_pruned`` column asserts the IO proof:
    fewer files read than written, OR no file was fully above the
    threshold (a layout where pruning is impossible — single-file corpus,
    constant or all-below-threshold prices — makes the claim vacuously
    true; a broken pruner that reads everything while prunable files
    exist makes it FALSE).  Footer reads are O(n_files) driver-side
    metadata, the same bounded shape layout_zonemap proved.
    """
    import pyarrow.parquet as pq

    thr = 150000.0
    out = os.path.join(scratch_dir("dfts_manifest_"), "orders_ranged")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    (
        o.repartitionByRange(6, "o_totalprice")
        .sortWithinPartitions("o_totalprice")
        .write.mode("overwrite")
        .parquet(out)
    )
    # manifest build: one footer read per file — (path, rows, min, max)
    manifest = []
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        path = os.path.join(out, f)
        md = pq.ParquetFile(path).metadata
        idx = md.schema.names.index("o_totalprice")
        stats = [
            st
            for rg in range(md.num_row_groups)
            if (st := md.row_group(rg).column(idx).statistics) is not None
            and st.has_min_max
        ]
        # The "stat-less must be read" contract is per ROW GROUP, not per
        # file: a file mixing stat-bearing and stat-less row groups has an
        # UNKNOWN true min (the stat-less group may hold rows below any
        # stat-bearing min), so its bound must be open (lo=None -> always
        # read), never the min over only the groups that happen to carry
        # stats.  Unreachable with Spark-written parquet (stats always
        # written) but the fallback contract must hold for any writer.
        if len(stats) < md.num_row_groups:
            lo, hi = None, None
        else:
            lo = min((s.min for s in stats), default=None)
            hi = max((s.max for s in stats), default=None)
        manifest.append((path, md.num_rows, lo, hi))
    # prune: overlap test against (-inf, thr]; stat-less files with rows
    # must be read, zero-row files never
    survivors = [
        p
        for p, n, lo, hi in manifest
        if n > 0 and (lo is None or lo <= thr)
    ]
    prunable = any(lo is not None and lo > thr for _, n, lo, hi in manifest)
    pruned = len(survivors) < len(manifest) or not prunable
    if survivors:
        rt = spark.read.schema(o.schema).parquet(*survivors)
    else:
        rt = spark.createDataFrame([], o.schema)
    return (
        rt.filter(F.col("o_totalprice") <= thr)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "sum_price"),
        )
        .withColumn("manifest_pruned", F.lit(bool(pruned)))
    )


def _bloom_probe_file(spark: SparkSession, path: str, column: str,
                      hits: list[str], misses: list[str]):
    """Probe a parquet file's bloom filters via parquet-mr — the SAME
    reader-side library Spark's scan uses for bloom row-group filtering
    (org.apache.parquet.hadoop.ParquetFileReader), reached through the
    session's JVM gateway.  Driver-side O(n_rowgroups) metadata work, the
    scan_manifest_prune footer-read shape.

    Returns (rg_total, rg_with_bloom, miss_cells, miss_excluded,
    hit_flags) where a "cell" is one (probe value, bloomed row group)
    pair: miss_excluded counts cells the bloom EXCLUDES (the row-group
    skip a reader performs on a miss), and hit_flags is one bool PER HIT
    KEY — True iff THIS file maybe-contains the key (some row-group
    bloom finds it, or the file carries no bloom and so cannot exclude).
    A present key lives in exactly ONE file of a multi-file layout, so
    the no-false-negative contract is per-key ∨ ACROSS files — the
    caller ORs flags file-by-file (ADVICE r10: counting found-per-file
    made hit_ok false for any file count > 1, because the other files'
    blooms correctly exclude a key they don't hold)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        hpath, conf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    rg_total = rg_bloom = miss_cells = miss_excluded = 0
    hit_flags: list[bool] = []
    try:
        blocks = reader.getRowGroups()
        blooms = []
        for i in range(blocks.size()):
            block = blocks.get(i)
            rg_total += 1
            cols = block.getColumns()
            for j in range(cols.size()):
                cc = cols.get(j)
                if cc.getPath().toDotString() == column:
                    bf = reader.getBloomFilterDataReader(block).readBloomFilter(cc)
                    if bf is not None:
                        rg_bloom += 1
                        blooms.append(bf)
                    break
        Binary = jvm.org.apache.parquet.io.api.Binary
        for v in misses:
            for bf in blooms:
                miss_cells += 1
                if not bf.findHash(bf.hash(Binary.fromString(v))):
                    miss_excluded += 1
        for v in hits:
            hit_flags.append(
                not blooms
                or any(
                    bf.findHash(bf.hash(Binary.fromString(v)))
                    for bf in blooms
                )
            )
    finally:
        reader.close()
    return rg_total, rg_bloom, miss_cells, miss_excluded, hit_flags


def scan_parquet_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet bloom-filter point lookup — the IO-skip structure for
    predicates min/max statistics CANNOT serve: an equality probe on a
    high-cardinality column with no clustering correlation (user ids,
    request ids, content hashes).  Zone maps prune by range; when every
    row group's [min,max] spans the whole key domain, only a bloom
    filter lets the reader skip row groups on a miss.  At 100 TB this is
    the difference between reading 3 row groups and 30,000 for a
    needle-in-haystack lookup — the same manifest-level IO proof
    scan_manifest_prune established, one level deeper in the file.

    Layout: orders written with `parquet.bloom.filter.enabled#key` (key =
    'k' || o_orderkey, a string surrogate uncorrelated with file order),
    per-row-group ndv sized to the 256 KB row groups, and dictionary
    encoding DISABLED for the column (parquet-mr omits the bloom when a
    fully-dictionary-encoded chunk can already answer membership exactly
    — plain-encoded is the shape where the bloom is load-bearing).
    repartition(1) pins one file (harness determinism, as in
    scan_row_lineage); the probe is nonetheless file-count-correct —
    hit-found is a per-key OR across files, because a present key lives
    in exactly ONE file and the other files' blooms rightly exclude it
    (ADVICE r10: the earlier found-count-per-file aggregation would have
    broken hit_ok under any repartition change; pinned multi-file in
    tests/test_plans.py).

    Driver-verified contracts, probed through parquet-mr's OWN
    BloomFilter reader (the code path Spark's vectorized scan consults
    for pushed Eq predicates, so the skip decision proven here is the
    reader's real one):
      * bloom_written — every row group carries a bloom for `key`;
      * miss_ok — ≥ 90% of (absent-key probe × bloomed row group) cells
        are EXCLUDED (16 deterministic absent keys; expected exclusion
        ~99% at the configured fpp, so the margin absorbs the bloom's
        false-positive allowance — and the bloom content is a pure
        function of the data, so the outcome is stable per corpus);
      * hit_ok — every present key (min/max surrogate) is maybe-contained
        by at least one row group of at least one FILE: blooms have NO
        false negatives, exact semantics under any output file count.
    All three are vacuously true on an empty corpus (zero row groups) —
    the oracle states them as constants (scan_row_lineage pattern).

    Data plane: the point lookup itself runs through a normal Spark scan
    with the Eq predicate PUSHED (PushedFilters pin in PLANS.md) —
    count + deterministic price sum over the matched rows, recomputed by
    the oracle from the source table.  The 1-row min/max collect that
    picks the probe keys is bounded driver-side metadata (the
    scan_manifest_prune footer-loop class).
    """
    out = os.path.join(scratch_dir("dfts_bloom_"), "orders_bloom")
    o = table(spark, sf_dir, "orders").select(
        F.concat(F.lit("k"), F.col("o_orderkey").cast("string")).alias("key"),
        "o_orderkey",
        "o_totalprice",
    )
    (
        o.repartition(1)
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#key", "true")
        .option("parquet.bloom.filter.expected.ndv#key", "16384")
        .option("parquet.enable.dictionary#key", "false")
        .option("parquet.block.size", 262144)
        .option("parquet.page.size", 65536)
        .parquet(out)
    )
    row = (
        table(spark, sf_dir, "orders")
        .agg(F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi"))
        .first()
    )
    hit_keys = [] if row["lo"] is None else [f"k{row['lo']}", f"k{row['hi']}"]
    miss_keys = [f"miss{i}" for i in range(16)]  # 'k<digits>' never matches
    rg_total = rg_bloom = cells = excluded = 0
    hit_found = [False] * len(hit_keys)
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        t, b, c, e, flags = _bloom_probe_file(
            spark, os.path.join(out, f), "key", hit_keys, miss_keys
        )
        rg_total += t
        rg_bloom += b
        cells += c
        excluded += e
        hit_found = [got or new for got, new in zip(hit_found, flags)]
    bloom_written = rg_bloom == rg_total
    miss_ok = cells == 0 or excluded * 10 >= cells * 9
    hit_ok = all(hit_found)  # vacuous on an empty corpus (no hit keys)
    # the point lookup: schema-stated read (empty corpus writes a bare
    # _SUCCESS dir), literal Eq predicate → PushedFilters on `key`
    rt = spark.read.schema("key string, o_orderkey bigint, o_totalprice double").parquet(out)
    hit = rt.filter(F.col("key") == (hit_keys[0] if hit_keys else "k"))
    return (
        rt.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .crossJoin(
            hit.agg(
                F.count(F.lit(1)).cast("bigint").alias("hit_n"),
                dsum(F.col("o_totalprice"), "hit_sum_price"),
            )
        )
        .withColumn("bloom_written", F.lit(bool(bloom_written)))
        .withColumn("miss_ok", F.lit(bool(miss_ok)))
        .withColumn("hit_ok", F.lit(bool(hit_ok)))
    )


_PAGE_ROW_LIMIT = 1000


def _pageindex_probe_file(spark: SparkSession, path: str, column: str,
                          point: int | None, below: int | None):
    """Probe a parquet file's page-level ColumnIndex/OffsetIndex via
    parquet-mr — the reader-side structures Spark's vectorized scan
    consults for page skipping when a filter is pushed
    (spark.sql.parquet.filterPushdown + parquet.filter.columnindex).
    Driver-side O(n_pages) metadata work, the scan_manifest_prune /
    _bloom_probe_file footer-read shape.

    Returns (rg_total, rg_indexed, pages_total, granular_bad, unordered,
    point_pages, below_pages): rg_indexed counts row groups whose target
    chunk carries BOTH a ColumnIndex and an OffsetIndex; granular_bad
    counts chunks with fewer pages than ceil(rows / _PAGE_ROW_LIMIT)
    (the writer's page-row cap makes that floor exact); unordered counts
    chunks whose boundary order is UNORDERED (the sorted layout must
    yield ASCENDING); point_pages / below_pages count non-null pages
    whose [min,max] CONTAINS the probe value — the exact page set a
    page-index reader scans (INT64 min/max are exact, never truncated,
    so containment is the reader's real decision).

    INT64-only by contract (ADVICE r11): the decode is a little-endian
    getLong, which would silently misread any other primitive type, so
    the target chunk's type is asserted before decoding.  The
    variable-length BINARY tier (truncated bounds, one-sided
    containment) is :func:`_pageindex_probe_file_str`."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        hpath, conf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    rg_total = rg_indexed = pages_total = granular_bad = unordered = 0
    point_pages = below_pages = 0
    little = jvm.java.nio.ByteOrder.LITTLE_ENDIAN
    try:
        blocks = reader.getRowGroups()
        for i in range(blocks.size()):
            block = blocks.get(i)
            rg_total += 1
            cols = block.getColumns()
            for j in range(cols.size()):
                cc = cols.get(j)
                if cc.getPath().toDotString() != column:
                    continue
                ptype = str(cc.getPrimitiveType().getPrimitiveTypeName())
                if ptype != "INT64":
                    raise ValueError(
                        f"_pageindex_probe_file decodes INT64 bounds only; "
                        f"column {column!r} is {ptype} (use the BINARY "
                        f"variant _pageindex_probe_file_str)"
                    )
                ci = reader.readColumnIndex(cc)
                oi = reader.readOffsetIndex(cc)
                if ci is None or oi is None:
                    break
                rg_indexed += 1
                n_pages = oi.getPageCount()
                pages_total += n_pages
                rows = block.getRowCount()
                if n_pages * _PAGE_ROW_LIMIT < rows:
                    granular_bad += 1
                if str(ci.getBoundaryOrder()) == "UNORDERED":
                    unordered += 1
                mins, maxs, nullp = (
                    ci.getMinValues(), ci.getMaxValues(), ci.getNullPages()
                )
                for p in range(n_pages):
                    if nullp[p]:
                        continue
                    lo = mins.get(p).duplicate().order(little).getLong(0)
                    hi = maxs.get(p).duplicate().order(little).getLong(0)
                    if point is not None and lo <= point <= hi:
                        point_pages += 1
                    if below is not None and lo <= below <= hi:
                        below_pages += 1
                break
    finally:
        reader.close()
    return (rg_total, rg_indexed, pages_total, granular_bad, unordered,
            point_pages, below_pages)


def scan_parquet_pageindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet page-level ColumnIndex skip — the finest tier of the
    IO-skip ladder this repo proves end-to-end: scan_manifest_prune
    (file-level min/max), layout_zonemap (row-group zone maps),
    scan_parquet_bloom (row-group blooms for uncorrelated keys), and now
    the PAGE-level column index (parquet-mr's ColumnIndex/OffsetIndex,
    written per data page).  At 100 TB with wide row groups (128 MB+,
    the production default) a row group is ~10⁵ rows per column page
    set; row-group stats admit the whole group while the page index
    narrows a clustered point/range predicate to a handful of 1000-row
    pages — a further 10-100× IO cut on exactly the scans zone maps
    already admitted.

    Layout: orders clustered on o_orderkey (repartition(1) +
    sortWithinPartitions — the layout_zonemap clustering discipline one
    level down) and written with parquet.page.row.count.limit=1000 so
    the page tier is materially finer than the row group.

    Driver-verified contracts, probed through parquet-mr's OWN
    ColumnIndex reader (the structures Spark's vectorized reader uses
    for page skipping on pushed predicates):
      * index_written — every row group's o_orderkey chunk carries both
        a ColumnIndex and an OffsetIndex;
      * page_granular — every chunk has at least ceil(rows/1000) pages
        (the writer's page-row cap makes the floor exact — the claim is
        live at every corpus size, not just the big ones);
      * ordered_ok — no chunk's boundary order is UNORDERED (the sorted
        layout must surface as ASCENDING page bounds, which is what lets
        a reader binary-search pages instead of scanning the index);
      * point_prune_ok — the global-min key is contained by ≥1 page
        (page min/max are exact for INT64 — no false negatives) and, when
        the layout has ≥2 pages, by at most HALF of them (the actual
        page skip; vacuously true at ≤1 page, the scan_row_lineage
        vacuity pattern, and when a probed min-key multiplicity shows the
        minimum owning ≥ half the rows — ADVICE r11: the unique-ish-key
        precondition is probed, not assumed);
      * below_min_excluded — a key below the global minimum is contained
        by ZERO pages (the full-skip decision, exact for INT64).
    All contracts are vacuously true on an empty corpus (zero row
    groups) — the oracle states them as constants.

    Data plane: the point lookup runs through a normal Spark scan with
    the Eq predicate PUSHED (PushedFilters pin in PLANS.md) — count +
    deterministic price sum over the matched rows, recomputed by the
    oracle from the source table (the scan_parquet_bloom twin).  The
    1-row min/max collect picking the probe keys is bounded driver-side
    metadata (the scan_manifest_prune footer-loop class).
    """
    out = os.path.join(scratch_dir("dfts_pageidx_"), "orders_pageindex")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    (
        o.repartition(1)
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .option("parquet.page.row.count.limit", _PAGE_ROW_LIMIT)
        .option("parquet.page.size", 8192)
        .option("parquet.block.size", 1048576)
        .parquet(out)
    )
    row = o.agg(
        F.min("o_orderkey").alias("lo"),
        F.count("o_orderkey").alias("nn"),
    ).first()
    lo, nn = row["lo"], row["nn"]
    below = None if lo is None else lo - 1
    # min-key multiplicity probe (ADVICE r11): the "≤ half the pages"
    # claim presumes the min key does not itself OWN a large share of the
    # sorted layout.  A corpus where the minimum repeats across most rows
    # legitimately admits most pages — probe the multiplicity (bounded
    # 1-row aggregate) and fold it into the vacuity condition instead of
    # leaving the unique-ish-key precondition implicit.
    m_min = 0 if lo is None else o.filter(F.col("o_orderkey") == lo).count()
    rg_total = rg_indexed = pages_total = granular_bad = unordered = 0
    point_pages = below_pages = 0
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        t, idx, pg, gb, uo, pp, bp = _pageindex_probe_file(
            spark, os.path.join(out, f), "o_orderkey", lo, below
        )
        rg_total += t
        rg_indexed += idx
        pages_total += pg
        granular_bad += gb
        unordered += uo
        point_pages += pp
        below_pages += bp
    index_written = rg_indexed == rg_total
    page_granular = granular_bad == 0
    ordered_ok = unordered == 0
    point_prune_ok = (
        pages_total <= 1
        or (point_pages >= 1 and point_pages * 2 <= pages_total)
        # vacuity: the min key owns ≥ half the rows, so admitting more
        # than half the pages is the CORRECT reader decision (ADVICE r11)
        or (point_pages >= 1 and 2 * m_min >= nn)
    )
    below_min_excluded = below_pages == 0
    # the point lookup: schema-stated read (empty corpus writes a bare
    # _SUCCESS dir), literal Eq predicate → PushedFilters on o_orderkey
    rt = spark.read.schema("o_orderkey bigint, o_totalprice double").parquet(out)
    hit = rt.filter(F.col("o_orderkey") == (lo if lo is not None else F.lit(-1)))
    return (
        rt.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .crossJoin(
            hit.agg(
                F.count(F.lit(1)).cast("bigint").alias("hit_n"),
                dsum(F.col("o_totalprice"), "hit_sum_price"),
            )
        )
        .withColumn("index_written", F.lit(bool(index_written)))
        .withColumn("page_granular", F.lit(bool(page_granular)))
        .withColumn("ordered_ok", F.lit(bool(ordered_ok)))
        .withColumn("point_prune_ok", F.lit(bool(point_prune_ok)))
        .withColumn("below_min_excluded", F.lit(bool(below_min_excluded)))
    )


_PAGE_TRUNC_LEN = 16  # parquet.columnindex.truncate.length for the layout
_KEY_PAD = 12  # zero-padded digits: lex order == numeric order, unique
_KEY_SUFFIX = "x" * 20  # shared tail pushes every key PAST the truncation


def _pageindex_probe_file_str(spark: SparkSession, path: str, column: str,
                              point: bytes | None, fp: bytes | None,
                              below: bytes | None):
    """BINARY twin of :func:`_pageindex_probe_file` — probe a parquet
    file's page-level ColumnIndex for a STRING column, where parquet-mr
    TRUNCATES the stored page bounds (BinaryTruncator,
    parquet.columnindex.truncate.length): min is cut to a prefix (rounds
    DOWN) and max is cut with its last byte incremented (rounds UP), so
    the stored [min,max] only CONTAINS the true page range.  Containment
    against truncated bounds is therefore ONE-SIDED — false positives
    are legal, false negatives are not — which is exactly the weaker
    contract a reader on any URL/doc-id clustered lake table runs under.

    Returns (rg_total, rg_indexed, pages_total, granular_bad, unordered,
    point_pages, fp_pages, below_pages, overlong_bounds): the first five
    as in the INT64 probe; point/fp/below_pages count non-null pages
    whose stored (truncated) bounds admit the probe bytes under UNSIGNED
    lexicographic order (parquet's UTF8 sort order — python bytes
    comparison is the same order); overlong_bounds counts stored bounds
    LONGER than the configured truncation length (must be zero when
    every value exceeds the limit: truncation observably fired).
    ADVICE r12 caveat on that zero: BinaryTruncator's max-side cut keeps
    the ORIGINAL untruncated max when the kept prefix is all 0xFF bytes
    (incrementing the last kept byte would overflow), so overlong_bounds
    == 0 is only guaranteed because this probe's callers derive keys
    from ASCII digits + 'x' (every byte < 0x7f, always incrementable);
    a caller probing arbitrary binary data must expect legal overlong
    max bounds.  Driver-side O(n_pages) metadata work, the
    _bloom_probe_file class.
    Asserts the chunk's primitive type is BINARY (ADVICE r11 — the
    decode-kind/type mismatch must fail loudly, not misread)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        hpath, conf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    binary = jvm.org.apache.parquet.io.api.Binary
    rg_total = rg_indexed = pages_total = granular_bad = unordered = 0
    point_pages = fp_pages = below_pages = overlong_bounds = 0
    try:
        blocks = reader.getRowGroups()
        for i in range(blocks.size()):
            block = blocks.get(i)
            rg_total += 1
            cols = block.getColumns()
            for j in range(cols.size()):
                cc = cols.get(j)
                if cc.getPath().toDotString() != column:
                    continue
                ptype = str(cc.getPrimitiveType().getPrimitiveTypeName())
                if ptype != "BINARY":
                    raise ValueError(
                        f"_pageindex_probe_file_str decodes BINARY bounds "
                        f"only; column {column!r} is {ptype} (use "
                        f"_pageindex_probe_file for INT64)"
                    )
                ci = reader.readColumnIndex(cc)
                oi = reader.readOffsetIndex(cc)
                if ci is None or oi is None:
                    break
                rg_indexed += 1
                n_pages = oi.getPageCount()
                pages_total += n_pages
                rows = block.getRowCount()
                if n_pages * _PAGE_ROW_LIMIT < rows:
                    granular_bad += 1
                if str(ci.getBoundaryOrder()) == "UNORDERED":
                    unordered += 1
                mins, maxs, nullp = (
                    ci.getMinValues(), ci.getMaxValues(), ci.getNullPages()
                )
                for p in range(n_pages):
                    if nullp[p]:
                        continue
                    lo = bytes(
                        binary.fromReusedByteBuffer(
                            mins.get(p).duplicate()
                        ).getBytes()
                    )
                    hi = bytes(
                        binary.fromReusedByteBuffer(
                            maxs.get(p).duplicate()
                        ).getBytes()
                    )
                    if max(len(lo), len(hi)) > _PAGE_TRUNC_LEN:
                        overlong_bounds += 1
                    if point is not None and lo <= point <= hi:
                        point_pages += 1
                    if fp is not None and lo <= fp <= hi:
                        fp_pages += 1
                    if below is not None and lo <= below <= hi:
                        below_pages += 1
                break
    finally:
        reader.close()
    return (rg_total, rg_indexed, pages_total, granular_bad, unordered,
            point_pages, fp_pages, below_pages, overlong_bounds)


def _pageindex_string_key():
    """The clustered string surrogate both engines derive from orders:
    o_orderkey zero-padded to _KEY_PAD digits (fixed width — UNSIGNED
    lexicographic order equals numeric order, and the discriminating
    digits sit INSIDE the truncation window so page bounds stay
    selective) plus a constant 20-char tail that pushes every key PAST
    parquet.columnindex.truncate.length (so truncation demonstrably
    fires on every stored bound)."""
    return F.concat(
        F.lpad(F.col("o_orderkey").cast("string"), _KEY_PAD, "0"),
        F.lit(_KEY_SUFFIX),
    )


def scan_parquet_pageindex_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet page-index skip on a STRING column — the truncation tier
    of the IO-skip ladder, queued by ROUND11 as the semantics the INT64
    proof (scan_parquet_pageindex) cannot cover: parquet-mr stores
    TRUNCATED page bounds for variable-length BINARY columns
    (BinaryTruncator, parquet.columnindex.truncate.length — min rounds
    DOWN to a prefix, max rounds UP by incrementing the last kept byte),
    so stored bounds only ENCLOSE the true page range.  Every real lake
    hits this tier on URL / doc-id / content-hash clustered tables; at
    100 TB the difference between exact and truncated bounds is the
    difference between a page skip that is a proof and one that is a
    one-sided filter — false positives legal, false negatives not.  The
    layout makes BOTH effects observable: keys are
    lpad(o_orderkey, 12, '0') || 'x'*20 (32 chars, truncation length
    16), so the discriminating digits survive truncation (pruning stays
    real) while the constant tail guarantees every bound is cut.

    Driver-verified contracts, probed through parquet-mr's OWN
    ColumnIndex reader on the truncated bounds:
      * index_written / page_granular / ordered_ok — as the INT64 twin
        (sorted layout must read back ASCENDING: prefix truncation is
        order-preserving);
      * trunc_real — every stored bound is ≤ 16 bytes while every data
        value is 32 chars: truncation OBSERVABLY fired on every page
        (the claim that separates this operator from the INT64 twin).
        ADVICE r12: this unconditional TRUE silently depends on the key
        derivation — BinaryTruncator keeps the ORIGINAL (overlong) max
        when the kept prefix is all 0xFF bytes (the increment would
        overflow); the lpad-digits + 'x'-tail keys are pure ASCII, so
        every truncated prefix is incrementable and the fallback is
        unreachable here by construction;
      * point_contained — the global-min key is admitted by ≥1 page:
        truncated bounds enclose true ranges, so false NEGATIVES are
        impossible (the one-sided contract's hard half);
      * point_prune_ok — the min key is admitted by at most HALF the
        pages (pruning survives truncation because the discriminating
        digits sit inside the window); vacuous at ≤1 page or when a
        probed min-key multiplicity shows the minimum owning ≥ half the
        rows (the ADVICE r11 probe, built in from day one);
      * fp_admitted — a key STRICTLY ABOVE the global max (max key +
        'z', provably absent) is nonetheless admitted by ≥1 page: the
        incremented-max bound overadmits, which is the legal
        false-positive half of the contract stated as an observed fact,
        not an allowance (exact INT64 bounds would exclude this probe —
        pinned in tests/test_plans.py);
      * below_min_excluded — the empty string (below every non-empty
        key) is admitted by ZERO pages: prefix-truncated minima are
        still valid lower bounds, so the full skip below the domain
        survives truncation.
    All contracts are vacuously true on an empty corpus (zero pages) —
    the oracle states them as constants (scan_parquet_bloom pattern).

    Data plane: the point lookup runs through a normal Spark scan with
    the string Eq predicate PUSHED (PushedFilters pin in PLANS.md) —
    count + deterministic price sum over the matched rows, recomputed by
    the oracle from the source table with the SAME key derivation.  The
    1-row min/max/count collect and the min-key multiplicity count are
    bounded driver-side probes (the scan_manifest_prune footer class).
    """
    out = os.path.join(scratch_dir("dfts_pageidx_s_"), "orders_pageindex_str")
    o = table(spark, sf_dir, "orders").select(
        _pageindex_string_key().alias("key"), "o_totalprice"
    )
    (
        o.repartition(1)
        .sortWithinPartitions("key")
        .write.mode("overwrite")
        .option("parquet.page.row.count.limit", _PAGE_ROW_LIMIT)
        .option("parquet.columnindex.truncate.length", _PAGE_TRUNC_LEN)
        # page byte cap sized so the 1000-row cap binds first (32-char
        # keys: 1000 rows ≈ 36 KB < 64 KB) — the granularity contract
        # stays the row cap's, as in the INT64 twin
        .option("parquet.page.size", 65536)
        .option("parquet.block.size", 1048576)
        .parquet(out)
    )
    row = o.agg(
        F.min("key").alias("lo"),
        F.max("key").alias("hi"),
        F.count("key").alias("nn"),
    ).first()
    lo, hi, nn = row["lo"], row["hi"], row["nn"]
    m_min = 0 if lo is None else o.filter(F.col("key") == lo).count()
    point = None if lo is None else lo.encode("utf-8")
    fp = None if hi is None else hi.encode("utf-8") + b"z"
    below = None if lo is None else b""
    rg_total = rg_indexed = pages_total = granular_bad = unordered = 0
    point_pages = fp_pages = below_pages = overlong = 0
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        t, idx, pg, gb, uo, pp, fpp, bp, ob = _pageindex_probe_file_str(
            spark, os.path.join(out, f), "key", point, fp, below
        )
        rg_total += t
        rg_indexed += idx
        pages_total += pg
        granular_bad += gb
        unordered += uo
        point_pages += pp
        fp_pages += fpp
        below_pages += bp
        overlong += ob
    index_written = rg_indexed == rg_total
    page_granular = granular_bad == 0
    ordered_ok = unordered == 0
    trunc_real = overlong == 0
    point_contained = lo is None or point_pages >= 1
    point_prune_ok = (
        pages_total <= 1
        or (point_pages >= 1 and point_pages * 2 <= pages_total)
        or (point_pages >= 1 and 2 * m_min >= nn)
    )
    fp_admitted = hi is None or fp_pages >= 1
    below_min_excluded = below_pages == 0
    # the point lookup: schema-stated read (empty corpus writes a bare
    # _SUCCESS dir), literal string Eq predicate → PushedFilters on key
    rt = spark.read.schema("key string, o_totalprice double").parquet(out)
    hit = rt.filter(F.col("key") == (lo if lo is not None else ""))
    return (
        rt.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .crossJoin(
            hit.agg(
                F.count(F.lit(1)).cast("bigint").alias("hit_n"),
                dsum(F.col("o_totalprice"), "hit_sum_price"),
            )
        )
        .withColumn("index_written", F.lit(bool(index_written)))
        .withColumn("page_granular", F.lit(bool(page_granular)))
        .withColumn("ordered_ok", F.lit(bool(ordered_ok)))
        .withColumn("trunc_real", F.lit(bool(trunc_real)))
        .withColumn("point_contained", F.lit(bool(point_contained)))
        .withColumn("point_prune_ok", F.lit(bool(point_prune_ok)))
        .withColumn("fp_admitted", F.lit(bool(fp_admitted)))
        .withColumn("below_min_excluded", F.lit(bool(below_min_excluded)))
    )


def _pageindex_probe_file_nulls(spark: SparkSession, path: str, column: str,
                                point: int | None, below: int | None):
    """Null-axis twin of :func:`_pageindex_probe_file` — probe a parquet
    file's page-level ColumnIndex for an INT64 column INCLUDING the
    null-page structures the value-bounds probes only step around:
    ``getNullPages()`` (per-page all-null flags — such pages store NO
    min/max) and ``getNullCounts()`` (exact per-page null counts).
    Per-page row counts are derived from the OffsetIndex
    (``getFirstRowIndex(p+1) - getFirstRowIndex(p)``, last page closed
    by the row-group row count), so the flag/count/row-count consistency
    is checked against parquet-mr's OWN metadata, not assumed.

    Returns (rg_total, rg_indexed, pages_total, granular_bad, unordered,
    point_pages, below_pages, allnull_pages, sum_null_counts,
    flag_mismatch, nonprefix_null_pages): the first five as in the INT64
    probe; point/below_pages count NON-null pages whose exact [min,max]
    admit the probe (all-null pages have no bounds and are skipped —
    the skippability every value predicate relies on); allnull_pages
    counts pages flagged all-null; sum_null_counts totals the per-page
    null counts (cross-checked against the oracle's count(*) −
    count(key)); flag_mismatch counts pages where the flag disagrees
    with null_count == page_rows (or null_count is out of [0, rows], or
    the null-count list is absent); nonprefix_null_pages counts pages
    with nulls appearing AFTER a null-free page in file order — zero for
    a NULLS-FIRST sorted layout, where null-bearing pages must form a
    file prefix.  Driver-side O(n_pages) metadata work, the
    _bloom_probe_file class.  INT64-only by contract (ADVICE r11)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        hpath, conf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    rg_total = rg_indexed = pages_total = granular_bad = unordered = 0
    point_pages = below_pages = allnull_pages = 0
    sum_null_counts = 0
    flag_mismatch = nonprefix = 0
    little = jvm.java.nio.ByteOrder.LITTLE_ENDIAN
    seen_nullfree_page = False  # file-order prefix check across row groups
    try:
        blocks = reader.getRowGroups()
        for i in range(blocks.size()):
            block = blocks.get(i)
            rg_total += 1
            cols = block.getColumns()
            for j in range(cols.size()):
                cc = cols.get(j)
                if cc.getPath().toDotString() != column:
                    continue
                ptype = str(cc.getPrimitiveType().getPrimitiveTypeName())
                if ptype != "INT64":
                    raise ValueError(
                        f"_pageindex_probe_file_nulls decodes INT64 bounds "
                        f"only; column {column!r} is {ptype}"
                    )
                ci = reader.readColumnIndex(cc)
                oi = reader.readOffsetIndex(cc)
                if ci is None or oi is None:
                    break
                rg_indexed += 1
                n_pages = oi.getPageCount()
                pages_total += n_pages
                rows = block.getRowCount()
                if n_pages * _PAGE_ROW_LIMIT < rows:
                    granular_bad += 1
                if str(ci.getBoundaryOrder()) == "UNORDERED":
                    unordered += 1
                mins, maxs, nullp = (
                    ci.getMinValues(), ci.getMaxValues(), ci.getNullPages()
                )
                nc = ci.getNullCounts()
                # absent null-count list: count the chunk's pages ONCE as
                # the defect and skip the per-page flag/count consistency
                # checks (they would re-trigger on every all-null page via
                # the substituted zeros, double-counting the same absence —
                # ADVICE r13); the substituted zeros still feed
                # sum_null_counts, so the cross-engine n_nulls VALUE check
                # catches the absence independently
                nc_absent = nc is None
                if nc_absent:
                    flag_mismatch += n_pages
                    nc = [0] * n_pages
                for p in range(n_pages):
                    first = oi.getFirstRowIndex(p)
                    last = (
                        oi.getFirstRowIndex(p + 1) if p + 1 < n_pages
                        else rows
                    )
                    page_rows = int(last) - int(first)
                    nulls_p = int(nc[p])
                    sum_null_counts += nulls_p
                    all_null = bool(nullp[p])
                    if not nc_absent and not (0 <= nulls_p <= page_rows):
                        flag_mismatch += 1
                    if not nc_absent and all_null != (nulls_p == page_rows):
                        flag_mismatch += 1
                    if nulls_p == 0:
                        seen_nullfree_page = True
                    elif seen_nullfree_page:
                        nonprefix += 1
                    if all_null:
                        allnull_pages += 1
                        continue  # no bounds: skippable by ANY value pred
                    lo = mins.get(p).duplicate().order(little).getLong(0)
                    hi = maxs.get(p).duplicate().order(little).getLong(0)
                    if point is not None and lo <= point <= hi:
                        point_pages += 1
                    if below is not None and lo <= below <= hi:
                        below_pages += 1
                break
    finally:
        reader.close()
    return (rg_total, rg_indexed, pages_total, granular_bad, unordered,
            point_pages, below_pages, allnull_pages, sum_null_counts,
            flag_mismatch, nonprefix)


def scan_parquet_pageindex_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet page-index skip on the NULL-page axis — the final tier of
    the IO-skip ladder (file min/max → row-group zone maps → row-group
    blooms → INT64 page bounds → truncated STRING page bounds → THIS:
    the ColumnIndex ``null_pages``/``null_counts`` fields the value
    tiers only step around).  Real lake tables carry sparse columns
    (optional attributes, late-arriving enrichments); clustering on such
    a key concentrates the NULLs, and the page index then encodes
    entire all-null page runs that (a) every value predicate can skip
    without touching data, and (b) are exactly where an IS NULL
    predicate must land.  At 100 TB a 33%-sparse clustered column makes
    a third of the pages skippable for value scans — the null axis is
    an IO cut, not bookkeeping.

    Layout: orders keyed by a derived nullable surrogate — o_orderkey
    where o_orderkey % 3 != 0, else NULL (~33% nulls, derivation stated
    identically in the oracle) — clustered via repartition(1) +
    sortWithinPartitions (Spark ASC sort puts NULLS FIRST, so the null
    run leads the file) with the 1000-row page cap, the
    scan_parquet_pageindex discipline.

    Driver-verified contracts, probed through parquet-mr's OWN
    ColumnIndex/OffsetIndex readers:
      * n_nulls — the SUM of per-page ``getNullCounts()`` across the
        layout, emitted as a VALUE and recomputed by the oracle as
        count(*) − count(key): the metadata path and the SQL path must
        agree exactly (the strongest cross-engine form — not a stated
        constant);
      * nullflags_ok — per page, ``getNullPages()[p]`` holds exactly
        when null_count == page row count (rows from the OffsetIndex),
        and every null count sits in [0, page_rows];
      * nulls_clustered_ok — null-bearing pages form a file-order
        PREFIX (NULLS-FIRST sort ⇒ null rows occupy the leading row
        range ⇒ the pages that intersect it are the leading pages) —
        the clustering claim that makes the null-run skip real;
      * allnull_observed_ok — ≥1 page is flagged ALL-null whenever the
        corpus has at least _PAGE_ROW_LIMIT null keys (the first page
        holds ≤1000 rows, all inside the null prefix); vacuous below
        that (tiny corpora legitimately blend nulls into page 1);
      * ordered_ok / index_written / page_granular — as the INT64 twin;
        boundary order stays ASCENDING with leading all-null pages
        (verified: parquet-mr computes it over non-null pages only);
      * point_contained / point_prune_ok / below_min_excluded — the
        INT64 value-probe contracts re-proven in the PRESENCE of
        all-null pages, which the probe skips (they store no bounds):
        value predicates never admit an all-null page.  point_prune_ok
        is additionally vacuous when NO non-null key exists (an all-null
        corpus has nothing to prune toward — reachable on the const
        degenerate corpus when the hot key ≡ 0 mod 3).

    Data plane: TWO pushed predicates through normal Spark scans over
    the layout — IS NULL (count + price sum over the null run: the
    pages a null-aware reader admits are exactly the flagged prefix)
    and the Eq point lookup on the min non-null key (PushedFilters pins
    in PLANS.md cover IsNull).  The 1-row min/count aggregate and the
    min-key multiplicity count are bounded driver-side probes (the
    scan_manifest_prune footer class).

    Reference anchor: the same pushed-lookup data plane as
    scan_parquet_pageindex (sources/connectors.py:929); queued by
    VERDICT r12 item 2 / ROUND12.md handoff (recipe prototyped there).
    """
    out = os.path.join(scratch_dir("dfts_pageidx_n_"), "orders_pageindex_nulls")
    o = table(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None))
        .otherwise(F.col("o_orderkey"))
        .cast("bigint")
        .alias("key"),
        "o_totalprice",
    )
    (
        o.repartition(1)
        .sortWithinPartitions("key")  # ASC = NULLS FIRST: the null run leads
        .write.mode("overwrite")
        .option("parquet.page.row.count.limit", _PAGE_ROW_LIMIT)
        .option("parquet.page.size", 8192)
        .option("parquet.block.size", 1048576)
        .parquet(out)
    )
    row = o.agg(
        F.min("key").alias("lo"),
        F.count(F.lit(1)).alias("n_all"),
        F.count("key").alias("nn"),
    ).first()
    lo, n_all, nn = row["lo"], row["n_all"], row["nn"]
    below = None if lo is None else lo - 1
    m_min = 0 if lo is None else o.filter(F.col("key") == lo).count()
    rg_total = rg_indexed = pages_total = granular_bad = unordered = 0
    point_pages = below_pages = allnull = 0
    sum_nulls = 0
    flag_mismatch = nonprefix = 0
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        (t, idx, pg, gb, uo, pp, bp, an, sn, fm, npx) = (
            _pageindex_probe_file_nulls(
                spark, os.path.join(out, f), "key", lo, below
            )
        )
        rg_total += t
        rg_indexed += idx
        pages_total += pg
        granular_bad += gb
        unordered += uo
        point_pages += pp
        below_pages += bp
        allnull += an
        sum_nulls += sn
        flag_mismatch += fm
        nonprefix += npx
    index_written = rg_indexed == rg_total
    page_granular = granular_bad == 0
    ordered_ok = unordered == 0
    nullflags_ok = flag_mismatch == 0
    nulls_clustered_ok = nonprefix == 0
    allnull_observed_ok = allnull >= 1 or (n_all - nn) < _PAGE_ROW_LIMIT
    point_contained = lo is None or point_pages >= 1
    point_prune_ok = (
        lo is None  # all-null corpus: nothing to prune toward
        or pages_total <= 1
        or (point_pages >= 1 and point_pages * 2 <= pages_total)
        # vacuity: the min key owns ≥ half the non-null rows (ADVICE r11)
        or (point_pages >= 1 and 2 * m_min >= nn)
    )
    below_min_excluded = below_pages == 0
    # data plane: schema-stated read (empty corpus writes a bare _SUCCESS
    # dir); IS NULL and literal Eq both reach PushedFilters on key
    rt = spark.read.schema("key bigint, o_totalprice double").parquet(out)
    nullhit = rt.filter(F.col("key").isNull())
    hit = rt.filter(F.col("key") == (lo if lo is not None else -1))
    return (
        rt.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .crossJoin(
            nullhit.agg(
                F.count(F.lit(1)).cast("bigint").alias("null_hit_n"),
                dsum(F.col("o_totalprice"), "null_sum_price"),
            )
        )
        .crossJoin(
            hit.agg(
                F.count(F.lit(1)).cast("bigint").alias("hit_n"),
                dsum(F.col("o_totalprice"), "hit_sum_price"),
            )
        )
        .withColumn("n_nulls", F.lit(int(sum_nulls)).cast("bigint"))
        .withColumn("index_written", F.lit(bool(index_written)))
        .withColumn("page_granular", F.lit(bool(page_granular)))
        .withColumn("ordered_ok", F.lit(bool(ordered_ok)))
        .withColumn("nullflags_ok", F.lit(bool(nullflags_ok)))
        .withColumn("nulls_clustered_ok", F.lit(bool(nulls_clustered_ok)))
        .withColumn("allnull_observed_ok", F.lit(bool(allnull_observed_ok)))
        .withColumn("point_contained", F.lit(bool(point_contained)))
        .withColumn("point_prune_ok", F.lit(bool(point_prune_ok)))
        .withColumn("below_min_excluded", F.lit(bool(below_min_excluded)))
    )


def _pageindex_admitted_rows(spark: SparkSession, path: str, column: str,
                             k1: int | None, k2: int | None):
    """Metadata side of the READER-skip proof: walk a file's page-level
    ColumnIndex/OffsetIndex (parquet-mr's own readers, the
    _pageindex_probe_file class) and return the exact row budget a
    page-index-aware reader is ALLOWED to materialize for two pushed
    predicates — ``key BETWEEN k1 AND k2`` (non-null pages whose exact
    INT64 [min,max] intersects the range; all-null pages store no bounds
    and are never admitted) and ``key IS NULL`` (pages whose null count
    is nonzero; an absent null-count list conservatively admits every
    page, keeping the <=-contract honest rather than vacuously tight).

    Returns (rg_total, rg_indexed, pages_total, rows_total,
    admitted_range_rows, admitted_null_rows).  Driver-side O(n_pages)
    metadata work.  INT64-only by contract (ADVICE r11)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        hpath, conf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
    rg_total = rg_indexed = pages_total = rows_total = 0
    adm_range = adm_null = 0
    little = jvm.java.nio.ByteOrder.LITTLE_ENDIAN
    try:
        blocks = reader.getRowGroups()
        for i in range(blocks.size()):
            block = blocks.get(i)
            rg_total += 1
            rows = int(block.getRowCount())
            rows_total += rows
            cols = block.getColumns()
            for j in range(cols.size()):
                cc = cols.get(j)
                if cc.getPath().toDotString() != column:
                    continue
                ptype = str(cc.getPrimitiveType().getPrimitiveTypeName())
                if ptype != "INT64":
                    raise ValueError(
                        f"_pageindex_admitted_rows decodes INT64 bounds "
                        f"only; column {column!r} is {ptype}"
                    )
                ci = reader.readColumnIndex(cc)
                oi = reader.readOffsetIndex(cc)
                if ci is None or oi is None:
                    break
                rg_indexed += 1
                n_pages = oi.getPageCount()
                pages_total += n_pages
                mins, maxs, nullp = (
                    ci.getMinValues(), ci.getMaxValues(), ci.getNullPages()
                )
                nc = ci.getNullCounts()
                for p in range(n_pages):
                    first = oi.getFirstRowIndex(p)
                    last = (
                        oi.getFirstRowIndex(p + 1) if p + 1 < n_pages
                        else rows
                    )
                    page_rows = int(last) - int(first)
                    if nc is None or int(nc[p]) > 0:
                        adm_null += page_rows
                    if bool(nullp[p]):
                        continue  # no bounds: no value predicate admits it
                    lo = mins.get(p).duplicate().order(little).getLong(0)
                    hi = maxs.get(p).duplicate().order(little).getLong(0)
                    if k1 is not None and lo <= k2 and k1 <= hi:
                        adm_range += page_rows
                break
    finally:
        reader.close()
    return (rg_total, rg_indexed, pages_total, rows_total, adm_range,
            adm_null)


def _scan_metric_rows(spark: SparkSession, path: str, schema: str,
                      pred, columnindex_enabled: bool) -> int:
    """Execute ``filter(pred)`` over a parquet layout with page-index
    filtering toggled via a per-read option (propagated into the
    relation's Hadoop conf — no session-global mutation) and return the
    SCAN node's own ``numOutputRows``: the rows the vectorized reader
    actually MATERIALIZED from admitted pages, before the post-scan
    Filter re-evaluates the predicate.  The plan instance whose metrics
    are read is the one executed (``executedPlan().execute().count()``
    — a JVM-side row count, zero rows to the driver; ``df.count()``
    would execute a DIFFERENT aggregate plan and leave these metrics
    untouched).  ROUND13-handoff recipe, verified there and re-verified
    this round."""
    rt = (
        spark.read
        .option(
            "parquet.filter.columnindex.enabled",
            "true" if columnindex_enabled else "false",
        )
        .schema(schema)
        .parquet(path)
    )
    plan = rt.filter(pred)._jdf.queryExecution().executedPlan()
    plan.execute().count()
    leaves = plan.collectLeaves()
    total = 0
    for i in range(leaves.size()):
        metrics = leaves.apply(i).metrics()
        it = metrics.iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "numOutputRows":
                total += int(kv._2().value())
    return total


def scan_parquet_pageindex_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """READER-side page-skip proof — the capstone of the IO-skip ladder
    (VERDICT r13 item 2).  The four scan_parquet_pageindex* entries prove
    the METADATA: parquet-mr's ColumnIndex/OffsetIndex say the pages are
    skippable.  This entry proves Spark's vectorized reader actually
    SKIPS them: the scan node's own ``numOutputRows`` (rows materialized
    from disk into column batches) is measured with page-index filtering
    ENABLED vs DISABLED on the same pushed predicate over the same
    single-row-group layout, and the enabled path must (a) stay within
    the admitted-row budget the ColumnIndex probe computed and (b) read
    strictly fewer rows than the file holds.  Single row group
    (parquet.block.size 1 GB) by construction, so the separation is
    PURELY page-level — no row-group-prune confound.

    Layout: the scan_parquet_pageindex_nulls discipline — orders keyed
    by the derived ~33%-null surrogate (o_orderkey where %3 != 0, else
    NULL), NULLS-FIRST clustered, 1000-row pages — so ONE layout proves
    both axes:
      * ``key IS NULL`` with the index ON materializes only the
        null-bearing page prefix; OFF reads the whole row group
        (ROUND13 prototype: 667k vs 2M rows on a 2M-row layout);
      * a ~1%-of-key-span range probe with the index ON materializes
        only the value-admitted pages and NEVER an all-null page
        (admitted_range_rows excludes them by construction: they store
        no bounds); OFF reads the whole row group (prototype: 14k vs
        2M; this round's re-verification at sf0.01: 996 vs 15,000).

    Driver-verified contract columns (oracle states literal TRUE):
      * single_rowgroup_ok / index_written — the no-confound
        preconditions (<= 1 row group; every chunk indexed);
      * disabled_null_full / disabled_range_full — index OFF reads the
        ENTIRE row group (vacuous when the coarser row-group-stats tier
        legitimately prunes first: a null-FREE layout zeroes an IS NULL
        scan with the page index off — observed, not assumed);
      * enabled_null_bounded / enabled_range_bounded — index ON stays
        within the metadata probe's admitted-row budget (range budget
        excludes all-null pages, so this is also the all-null-skip
        proof at the READER);
      * reader_skips_null / reader_skips_range — index ON reads
        strictly fewer rows than the file (vacuous when every page is
        legitimately admitted: single-page layouts, constant keys, or
        an all-null corpus — each a stated clause below).

    Data plane: the same IS NULL and BETWEEN predicates as normal
    pushed Spark scans — count + deterministic price sums the oracle
    recomputes from the source table with the identical k1/k2
    derivation (min + span//2 .. + greatest(span//100, 1), integer
    arithmetic in both engines).  The 1-row bounds aggregate is the
    scan_parquet_pageindex bounded driver-side probe class.

    Scale: at 100 TB nobody repartition(1)s — the single-file fixture
    isolates the reader behavior per file, which is exactly the unit the
    claim lives at (every executor task reads its own row groups; page
    skip is a per-task, per-row-group decision).  AQE is toggled off
    around the four metric scans only (restored in ``finally``) for a
    stable executed-plan leaf, per the ROUND13 recipe.
    """
    out = os.path.join(scratch_dir("dfts_pageidx_r_"), "orders_reader_skip")
    o = table(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None))
        .otherwise(F.col("o_orderkey"))
        .cast("bigint")
        .alias("key"),
        "o_totalprice",
    )
    (
        o.repartition(1)
        .sortWithinPartitions("key")  # ASC = NULLS FIRST: null prefix
        .write.mode("overwrite")
        .option("parquet.page.row.count.limit", _PAGE_ROW_LIMIT)
        .option("parquet.page.size", 8192)
        .option("parquet.block.size", 1073741824)  # 1 GB: one row group
        .parquet(out)
    )
    row = o.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count("key").alias("nn"),
        F.min("key").alias("lo"),
        F.max("key").alias("hi"),
    ).first()
    n_all, nn, lo, hi = row["n_all"], row["nn"], row["lo"], row["hi"]
    if lo is None:
        k1 = k2 = None
    else:
        span = hi - lo
        k1 = lo + span // 2
        k2 = k1 + max(span // 100, 1)
    rg_total = rg_indexed = pages_total = rows_meta = 0
    adm_range = adm_null = 0
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        t, idx, pg, rw, ar, an = _pageindex_admitted_rows(
            spark, os.path.join(out, f), "key", k1, k2
        )
        rg_total += t
        rg_indexed += idx
        pages_total += pg
        rows_meta += rw
        adm_range += ar
        adm_null += an
    schema = "key bigint, o_totalprice double"
    null_pred = F.col("key").isNull()
    # a NULL literal bound keeps the empty/all-null branch uniform: the
    # predicate selects zero rows in BOTH engines (BETWEEN NULL is never
    # true), and the metric scans are skipped below (Catalyst folds the
    # filter to an empty relation — no scan leaf to measure)
    range_pred = (F.col("key") >= F.lit(k1).cast("bigint")) & (
        F.col("key") <= F.lit(k2).cast("bigint")
    )
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        en_null = _scan_metric_rows(spark, out, schema, null_pred, True)
        dis_null = _scan_metric_rows(spark, out, schema, null_pred, False)
        if k1 is None:
            en_range = dis_range = 0
        else:
            en_range = _scan_metric_rows(spark, out, schema, range_pred, True)
            dis_range = _scan_metric_rows(
                spark, out, schema, range_pred, False
            )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    n_nulls = n_all - nn
    single_rowgroup_ok = rg_total <= 1
    index_written = rg_indexed == rg_total
    no_index = rg_indexed < rg_total  # no index, no skip claim (vacuity)
    disabled_null_full = (
        dis_null == rows_meta or n_nulls == 0 or n_all == 0
    )
    disabled_range_full = dis_range == rows_meta or k1 is None or n_all == 0
    enabled_null_bounded = en_null <= adm_null or no_index
    enabled_range_bounded = en_range <= adm_range or no_index
    reader_skips_null = (
        en_null < rows_meta or n_all == 0 or adm_null == rows_meta or no_index
    )
    reader_skips_range = (
        en_range < rows_meta
        or n_all == 0
        or k1 is None
        or adm_range == rows_meta
        or no_index
    )
    # data plane: the same two pushed predicates as normal Spark scans
    rt = spark.read.schema(schema).parquet(out)
    nullhit = rt.filter(null_pred)
    rangehit = rt.filter(range_pred)
    return (
        rt.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .crossJoin(
            nullhit.agg(
                F.count(F.lit(1)).cast("bigint").alias("null_hit_n"),
                dsum(F.col("o_totalprice"), "null_sum_price"),
            )
        )
        .crossJoin(
            rangehit.agg(
                F.count(F.lit(1)).cast("bigint").alias("range_hit_n"),
                dsum(F.col("o_totalprice"), "range_sum_price"),
            )
        )
        .withColumn("single_rowgroup_ok", F.lit(bool(single_rowgroup_ok)))
        .withColumn("index_written", F.lit(bool(index_written)))
        .withColumn("disabled_null_full", F.lit(bool(disabled_null_full)))
        .withColumn("disabled_range_full", F.lit(bool(disabled_range_full)))
        .withColumn("enabled_null_bounded", F.lit(bool(enabled_null_bounded)))
        .withColumn(
            "enabled_range_bounded", F.lit(bool(enabled_range_bounded))
        )
        .withColumn("reader_skips_null", F.lit(bool(reader_skips_null)))
        .withColumn("reader_skips_range", F.lit(bool(reader_skips_range)))
    )


def layout_zonemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-clustered parquet layout + a data-skipping proof read from the
    parquet FOOTERS — the zone-map/Z-order-lite pattern every 100 TB lake
    relies on: cluster on the filter column so file- and row-group-level
    min/max statistics prune scans.

    documents is range-repartitioned + sorted on n_chars and written; the
    proof then reads ONLY footer metadata (O(n_files), no data pages):
    per-file [min,max] of n_chars must be pairwise disjoint (range
    partitioning keeps equal keys in one partition, so file ranges cannot
    interleave), and a point predicate at the global minimum must select a
    strict subset of files — the skip a stats-aware scanner performs.
    Anchors: total rows and rows at the minimum, both SQL-recomputable.
    """
    import pyarrow.parquet as pq

    out = os.path.join(scratch_dir("dfts_zone_"), "docs_zoned")
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars", "lang")
    (
        d.repartitionByRange(4, "n_chars")
        .sortWithinPartitions("n_chars")
        .write.mode("overwrite")
        .parquet(out)
    )
    ranges = []
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out, f)).metadata
        idx = md.schema.names.index("n_chars")
        # schema-only files (an empty source partition at scale) carry no
        # row groups / no stats — skip them, they prune trivially.  An
        # ALL-NULL row group writes a statistics object WITHOUT min/max
        # (null_count only) — same treatment: a zone with no values
        # prunes every value predicate (nulls degenerate corpus, round 6)
        stats = [
            st
            for rg in range(md.num_row_groups)
            if (st := md.row_group(rg).column(idx).statistics) is not None
            and st.has_min_max
        ]
        if stats:
            ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
    ranges.sort()
    n_files = len(ranges)
    disjoint = all(ranges[i][1] < ranges[i + 1][0] for i in range(n_files - 1))
    lo = min((r[0] for r in ranges), default=None)
    hi = max((r[1] for r in ranges), default=None)
    files_hit = sum(1 for r in ranges if r[0] <= lo <= r[1])
    # explicit schema: a fully-empty write leaves no readable footers
    rt = spark.read.schema(d.schema).parquet(out)
    n_rows = rt.count()
    n_min_rows = 0 if lo is None else rt.filter(F.col("n_chars") == lo).count()
    # claims are vacuously true at n_rows <= 1 (a 1-row corpus cannot
    # split into 2 files) and on a CONSTANT cluster key (lo == hi: range
    # partitioning lands everything in one partition and a point query
    # legitimately hits it) — the oracle emits literal TRUE;
    # degenerate-corpus gate, round 5
    vacuous = n_rows <= 1 or (lo is not None and lo == hi)
    return spark.createDataFrame(
        [
            (
                n_rows,
                n_min_rows,
                disjoint,
                2 <= n_files <= 4 or vacuous,
                files_hit < n_files or vacuous,
            )
        ],
        "n_rows bigint, n_min_rows bigint, ranges_disjoint boolean, "
        "files_ok boolean, pruning_effective boolean",
    )


def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary ingestion via the binaryFile source — the front door
    of every multimodal pipeline: a directory of image/audio/whatever
    blobs becomes (path, length, content) rows, which downstream decode
    UDFs consume (see pipeline.multimodal).  Fixture: every document with
    doc_id ≡ 0 (mod 13) is written to scratch as blob_<doc_id>.bin
    containing its UTF-8 text, then re-read as binary.

    The result re-derives each blob's identity from the FILE side only —
    doc_id parsed from the path, byte length from both file metadata and
    the content column, payload decoded back to text — and the oracle
    recomputes the same rows from the documents view (the deterministic
    fixture rule IS the contract, scan_json_corrupt's discipline), so a
    lost, truncated, or mis-decoded blob breaks the hash.

    Scale (100 TB): binaryFile is splittable across FILES (not within
    one), so ingest parallelism = file count; real blob lakes write
    many-MB objects and list them from a manifest, and
    maxPartitionBytes-style packing bins small blobs per task.  Content
    bytes stream Arrow-batched into any downstream pandas UDF — the
    whole-file collect never touches the driver.
    """
    base = scratch_dir("dfts_blob_")
    # DISTRIBUTED fixture write (was a driver-side collect loop, r5
    # collect audit): each partition writes its own blobs — exactly how a
    # blob store materializes on shared storage; local-FS paths serve
    # that role under local[*]
    def _write_blobs(rows):
        for r in rows:
            with open(os.path.join(base, f"blob_{r['doc_id']}.bin"), "wb") as f:
                f.write(r["text"].encode("utf-8"))

    (
        table(spark, sf_dir, "documents")
        # a NULL text has no payload to materialize — no blob, no file
        # (the oracle carries the same predicate)
        .filter((F.col("doc_id") % 13 == 0) & F.col("text").isNotNull())
        .select("doc_id", "text")
        .foreachPartition(_write_blobs)
    )
    bf = spark.read.format("binaryFile").load(base)
    return bf.select(
        F.regexp_extract(F.col("path"), r"blob_(\d+)\.bin$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("length").cast("long").alias("n_bytes_meta"),
        F.length(F.col("content")).cast("long").alias("n_bytes_content"),
        F.col("content").cast("string").alias("payload"),
    )


def catalog_stats_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled statistics estimation — ANALYZE at 100 TB runs on a
    sample, not the table: a DETERMINISTIC 1/16 md5-bucket sample of
    lineitem (bucket 0 of the key hash — reproducible across engines
    and retries, unlike TABLESAMPLE's RNG) estimates row count and
    decimal-carried quantity mass, scaled ×16, next to the exact
    figures and the integer-scaled relative error of the row estimate
    (half-up, so the accuracy claim itself is hash-checked).

    Scale: the sample predicate pushes to the scan (md5 of the key is
    map-side), so the sampled pass reads 1/16 of the data — exactly the
    economics that make sampled ANALYZE viable.
    """
    from .._util import half_up

    li = table(spark, sf_dir, "lineitem")
    bucket = F.expr(
        "(instr('0123456789abcdef',"
        " substring(md5(concat(cast(l_orderkey as string), '-',"
        " cast(l_linenumber as string))), 1, 1)) - 1)"
    )
    t = li.select(
        F.expr("cast(floor(l_quantity * 100 + 0.5) as bigint)").alias(
            "q_s"
        ),
        bucket.alias("b"),
    )
    g = t.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.sum("q_s").alias("q_exact_s"),
        F.sum(F.when(F.col("b") == 0, 1).otherwise(0)).alias("n_sample"),
        F.coalesce(
            F.sum(F.when(F.col("b") == 0, F.col("q_s"))), F.lit(0)
        ).alias("q_sample_s"),
    )
    return g.select(
        F.col("n_exact").cast("long").alias("n_exact"),
        (F.col("n_sample") * 16).cast("long").alias("n_estimated"),
        F.col("q_exact_s").cast("long").alias("q_exact_s"),
        (F.col("q_sample_s") * 16).cast("long").alias("q_estimated_s"),
        half_up(
            F.abs(F.col("n_sample") * 16 - F.col("n_exact"))
            / F.col("n_exact").cast("double")
        ).alias("row_est_rel_err"),
    )


def scan_csv_multiline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quoted-newline CSV round-trip — the parser edge every real CSV
    feed hits: fields containing embedded newlines must survive
    write-and-re-read intact, which forces multiLine=true on the read
    (the default line-splittable reader would shear rows).  Fixture:
    documents with every 7th space replaced by a newline, written with
    quoting, re-read, and summarized per lang so a single sheared row
    breaks the hash (counts AND exact char mass including the newline
    bytes).

    Scale note: multiLine=true costs parallelism — files are no longer
    line-splittable, so ingest parallelism drops to file count.  That
    trade is the operator's lesson; land multiline feeds to parquet
    immediately (module docstring's rule).
    """
    out = os.path.join(scratch_dir("dfts_csvml_"), "docs_multiline")
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.regexp_replace(
            F.col("text"), r"((?:\S+ ){6}\S+) ", "$1\n"
        ).alias("mtext"),
    )
    d.write.mode("overwrite").option("header", True).option(
        "quoteAll", True
    ).csv(out)
    rt = spark.read.schema("doc_id bigint, lang string, mtext string").option(
        "header", True
    ).option("multiLine", True).csv(out)
    return rt.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("mtext")).alias("chars"),
        F.sum(
            F.length("mtext")
            - F.length(F.regexp_replace("mtext", "\n", ""))
        ).alias("n_newlines"),
    )


QUERIES = {
    "scan_csv_multiline": scan_csv_multiline,
    "catalog_stats_sampled": catalog_stats_sampled,
    "scan_binary_files": scan_binary_files,
    "write_partitioned": write_partitioned,
    "merge_upsert": merge_upsert,
    "scan_csv_roundtrip": scan_csv_roundtrip,
    "scan_json_roundtrip": scan_json_roundtrip,
    "scan_orc_roundtrip": scan_orc_roundtrip,
    "layout_zonemap": layout_zonemap,
    "scan_manifest_prune": scan_manifest_prune,
    "scan_parquet_bloom": scan_parquet_bloom,
    "scan_parquet_pageindex": scan_parquet_pageindex,
    "scan_parquet_pageindex_string": scan_parquet_pageindex_string,
    "scan_parquet_pageindex_nulls": scan_parquet_pageindex_nulls,
    "scan_parquet_pageindex_reader": scan_parquet_pageindex_reader,
    "scan_row_lineage": scan_row_lineage,
    "scan_schema_evolution": scan_schema_evolution,
    "scan_json_corrupt": scan_json_corrupt,
    "scan_time_travel": scan_time_travel,
    "catalog_stats": catalog_stats,
    "layout_zorder": layout_zorder,
    "stream_cdc_apply": stream_cdc_apply,
}

_Z_SQL = " + ".join(
    f"((((zx >> {i}) & 1) << {2 * i}) + (((zy >> {i}) & 1) << {2 * i + 1}))"
    for i in range(8)
)

_TT_V2_SUM = sql_dsum(
    "CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 1.1 "
    "ELSE o_totalprice END",
    "total_v2",
)

ORACLE = {
    # the same every-7th-space newline injection restated over the view —
    # a sheared row (multiLine off) would break counts and char mass
    "scan_csv_multiline": r"""
        WITH d AS (
            SELECT doc_id, lang,
                   regexp_replace(text, '((?:\S+ ){6}\S+) ',
                                  '\1' || chr(10), 'g') AS mtext
            FROM documents
        )
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(SUM(length(mtext)) AS BIGINT) AS chars,
               CAST(SUM(length(mtext)
                        - length(replace(mtext, chr(10), ''))) AS BIGINT)
                   AS n_newlines
        FROM d GROUP BY lang
    """,
    "catalog_stats_sampled": """
        WITH t AS (
            SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q_s,
                   (strpos('0123456789abcdef',
                        substring(md5(CAST(l_orderkey AS VARCHAR) || '-'
                                      || CAST(l_linenumber AS VARCHAR)),
                                  1, 1)) - 1) AS b
            FROM lineitem
        ),
        g AS (
            SELECT CAST(count(*) AS BIGINT) AS n_exact,
                   CAST(SUM(q_s) AS BIGINT) AS q_exact_s,
                   CAST(SUM(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_sample,
                   CAST(COALESCE(SUM(CASE WHEN b = 0 THEN q_s END), 0)
                        AS BIGINT) AS q_sample_s
            FROM t
        )
        SELECT n_exact,
               CAST(n_sample * 16 AS BIGINT) AS n_estimated,
               q_exact_s,
               CAST(q_sample_s * 16 AS BIGINT) AS q_estimated_s,
               CAST(floor(CAST(abs(n_sample * 16 - n_exact) AS DOUBLE)
                          / n_exact * 10000 + 0.5) AS DOUBLE) / 10000
                   AS row_est_rel_err
        FROM g
    """,
    # the deterministic fixture rule restated over the source view:
    # text is ASCII in this corpus, but octet_length states the byte
    # contract explicitly either way
    "scan_binary_files": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes_meta,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes_content,
               text AS payload
        FROM documents WHERE doc_id % 13 = 0 AND text IS NOT NULL
    """,
    "layout_zorder": f"""
        WITH base AS (
            SELECT o_custkey % 256 AS zx,
                   date_part('day', o_orderdate) AS zy
            FROM orders
        ),
        z AS (
            SELECT {_Z_SQL} AS zval FROM base
        )
        SELECT CAST((zval * 4) // 65536 AS INTEGER) AS z_quartile,
               count(*) AS n_orders,
               min(zval) AS z_min, max(zval) AS z_max,
               CAST(SUM(zval) AS BIGINT) AS z_sum,
               true AS files_ok,
               true AS two_dim_locality
        FROM z GROUP BY z_quartile
    """,
    "catalog_stats": """
        SELECT count(*) AS n_rows,
               true AS stats_rows_match,
               true AS ndv_within_10pct
        FROM orders
    """,
    "scan_json_corrupt": """
        SELECT (SELECT count(*) FROM documents)
                 + (SELECT count(*) FROM documents WHERE doc_id % 50 = 0)
                 AS n_lines,
               (SELECT count(*) FROM documents) AS n_good,
               CAST((SELECT count(*) FROM documents WHERE doc_id % 50 = 0)
                    AS BIGINT) AS n_corrupt,
               CAST((SELECT SUM(n_chars) FROM documents) AS BIGINT)
                   AS chars_sum
    """,
    "scan_time_travel": f"""
        SELECT o_orderstatus, count(*) AS n_orders,
               {sql_dsum('o_totalprice', 'total_v1')},
               {_TT_V2_SUM},
               CAST(SUM(CASE WHEN o_orderstatus = 'O'
                             AND o_totalprice * 1.1 <> o_totalprice
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
        FROM orders GROUP BY o_orderstatus
    """,
    "scan_schema_evolution": """
        SELECT lang, count(*) AS n_rows,
               count(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS n_with_chars,
               CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
                   AS chars_sum,
               CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_old_schema
        FROM documents GROUP BY lang
    """,
    "merge_upsert": """
        WITH tgt AS (
            SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
            FROM orders
        ),
        upd AS (
            SELECT o_orderkey, o_custkey,
                   o_totalprice * 1.1 AS o_totalprice,
                   'U' AS o_orderstatus
            FROM tgt ORDER BY o_orderkey LIMIT 100
        ),
        ins AS (
            -- negate AFTER the sorted limit: ORDER BY in the same SELECT
            -- would bind to the negated output alias and pick the wrong end
            SELECT -o_orderkey - 1 AS o_orderkey, o_custkey, o_totalprice,
                   'N' AS o_orderstatus
            FROM (SELECT * FROM tgt ORDER BY o_orderkey LIMIT 50)
        ),
        src AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
        SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
               COALESCE(s.o_custkey, t.o_custkey) AS o_custkey,
               COALESCE(s.o_totalprice, t.o_totalprice) AS o_totalprice,
               COALESCE(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus
        FROM tgt t FULL JOIN src s ON t.o_orderkey = s.o_orderkey
    """,
    "write_partitioned": "SELECT * FROM orders",
    "stream_cdc_apply": """
        WITH log AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
            FROM events
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC
            ) AS rn
            FROM log
        )
        SELECT user_id, event_id AS last_event, value AS last_value
        FROM ranked WHERE rn = 1 AND op = 'U'
    """,
    # the same predicate over the FULL table: file pruning must be
    # row-invisible; manifest_pruned is the Spark-side IO proof
    "scan_manifest_prune": """
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                   AS sum_price,
               TRUE AS manifest_pruned
        FROM orders
        WHERE o_totalprice <= 150000.0
        GROUP BY o_orderpriority
    """,
    # bloom contracts stated as constants (scan_row_lineage pattern):
    # Spark computes bloom_written/miss_ok/hit_ok from parquet-mr's OWN
    # bloom reader; the oracle restates the data-plane point lookup
    # (key = 'k'||o_orderkey is injective, so the key probe selects
    # exactly the min-orderkey rows)
    "scan_parquet_bloom": """
        SELECT
            CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_rows,
            CAST((SELECT count(*) FROM orders
                  WHERE o_orderkey = (SELECT min(o_orderkey) FROM orders))
                 AS BIGINT) AS hit_n,
            (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             FROM orders
             WHERE o_orderkey = (SELECT min(o_orderkey) FROM orders))
                AS hit_sum_price,
            TRUE AS bloom_written,
            TRUE AS miss_ok,
            TRUE AS hit_ok
    """,
    # page-index contracts stated as constants (scan_parquet_bloom's
    # pattern one tier down): Spark computes index_written/page_granular/
    # ordered_ok/point_prune_ok/below_min_excluded from parquet-mr's OWN
    # ColumnIndex reader; the oracle restates the data-plane point lookup
    # (Eq on the clustered min key selects exactly the min-orderkey rows)
    "scan_parquet_pageindex": """
        SELECT
            CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_rows,
            CAST((SELECT count(*) FROM orders
                  WHERE o_orderkey = (SELECT min(o_orderkey) FROM orders))
                 AS BIGINT) AS hit_n,
            (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             FROM orders
             WHERE o_orderkey = (SELECT min(o_orderkey) FROM orders))
                AS hit_sum_price,
            TRUE AS index_written,
            TRUE AS page_granular,
            TRUE AS ordered_ok,
            TRUE AS point_prune_ok,
            TRUE AS below_min_excluded
    """,
    # truncated-bounds tier: same constant-contract pattern; the data
    # plane rebuilds the SAME 32-char surrogate key (fixed-width
    # zero-padding makes the lexicographic min the numeric min) and
    # restates the point lookup from the source table
    "scan_parquet_pageindex_string": f"""
        WITH k AS (
            SELECT lpad(CAST(o_orderkey AS VARCHAR), {_KEY_PAD}, '0')
                       || '{_KEY_SUFFIX}' AS key,
                   o_totalprice
            FROM orders
        )
        SELECT
            CAST((SELECT count(*) FROM k) AS BIGINT) AS n_rows,
            CAST((SELECT count(*) FROM k
                  WHERE key = (SELECT min(key) FROM k)) AS BIGINT) AS hit_n,
            (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             FROM k WHERE key = (SELECT min(key) FROM k)) AS hit_sum_price,
            TRUE AS index_written,
            TRUE AS page_granular,
            TRUE AS ordered_ok,
            TRUE AS trunc_real,
            TRUE AS point_contained,
            TRUE AS point_prune_ok,
            TRUE AS fp_admitted,
            TRUE AS below_min_excluded
    """,
    # null-pages tier: the SAME constant-contract pattern for the
    # boolean probes, but n_nulls is a cross-engine VALUE — Spark emits
    # the sum of parquet-mr's per-page null counts, the oracle recomputes
    # count(*) - count(key) from the identical key derivation; the data
    # plane restates BOTH pushed lookups (IS NULL and min-key Eq)
    "scan_parquet_pageindex_nulls": """
        WITH k AS (
            SELECT CASE WHEN o_orderkey % 3 = 0 THEN NULL
                        ELSE o_orderkey END AS key,
                   o_totalprice
            FROM orders
        )
        SELECT
            CAST((SELECT count(*) FROM k) AS BIGINT) AS n_rows,
            CAST((SELECT count(*) - count(key) FROM k) AS BIGINT) AS n_nulls,
            CAST((SELECT count(*) FROM k WHERE key IS NULL) AS BIGINT)
                AS null_hit_n,
            (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             FROM k WHERE key IS NULL) AS null_sum_price,
            CAST((SELECT count(*) FROM k
                  WHERE key = (SELECT min(key) FROM k)) AS BIGINT) AS hit_n,
            (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             FROM k WHERE key = (SELECT min(key) FROM k)) AS hit_sum_price,
            TRUE AS index_written,
            TRUE AS page_granular,
            TRUE AS ordered_ok,
            TRUE AS nullflags_ok,
            TRUE AS nulls_clustered_ok,
            TRUE AS allnull_observed_ok,
            TRUE AS point_contained,
            TRUE AS point_prune_ok,
            TRUE AS below_min_excluded
    """,
    # reader-skip contracts stated as constants (the pageindex-family
    # pattern): Spark measures the scan node's numOutputRows with the
    # page index ON vs OFF and checks it against parquet-mr's admitted-
    # row budget; the oracle restates the two data-plane predicates with
    # the IDENTICAL k1/k2 integer derivation (min + span//2 ..
    # + greatest(span//100, 1)) so a drifted probe range hash-mismatches
    "scan_parquet_pageindex_reader": """
        WITH k AS (
            SELECT CASE WHEN o_orderkey % 3 = 0 THEN NULL
                        ELSE o_orderkey END AS key,
                   o_totalprice
            FROM orders
        ),
        b AS (
            SELECT min(key) + (max(key) - min(key)) // 2 AS k1,
                   min(key) + (max(key) - min(key)) // 2
                       + greatest((max(key) - min(key)) // 100, 1) AS k2
            FROM k
        )
        SELECT
            CAST((SELECT count(*) FROM k) AS BIGINT) AS n_rows,
            CAST((SELECT count(*) FROM k WHERE key IS NULL) AS BIGINT)
                AS null_hit_n,
            (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             FROM k WHERE key IS NULL) AS null_sum_price,
            CAST((SELECT count(*) FROM k, b
                  WHERE key >= b.k1 AND key <= b.k2) AS BIGINT)
                AS range_hit_n,
            (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             FROM k, b WHERE key >= b.k1 AND key <= b.k2)
                AS range_sum_price,
            TRUE AS single_rowgroup_ok,
            TRUE AS index_written,
            TRUE AS disabled_null_full,
            TRUE AS disabled_range_full,
            TRUE AS enabled_null_bounded,
            TRUE AS enabled_range_bounded,
            TRUE AS reader_skips_null,
            TRUE AS reader_skips_range
    """,
    # lineage contracts stated from the layout RULE (bucket = okey % 4,
    # one file per bucket dir): Spark computes n_files/idx_ok/path_ok from
    # the ACTUAL metadata columns, so a broken row_index or file pinning
    # hash-mismatches the stated TRUE/1
    "scan_row_lineage": """
        SELECT CAST(o_orderkey % 4 AS INT) AS bucket,
               CAST(1 AS BIGINT) AS n_files,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               TRUE AS idx_ok,
               TRUE AS path_ok,
               MIN(o_orderkey) AS min_okey,
               MAX(o_orderkey) AS max_okey,
               CAST(SUM(o_orderkey) AS BIGINT) AS sum_okey
        FROM orders
        GROUP BY 1
    """,
    "layout_zonemap": """
        SELECT COUNT(*) AS n_rows,
               (SELECT COUNT(*) FROM documents
                WHERE n_chars = (SELECT MIN(n_chars) FROM documents))
                   AS n_min_rows,
               TRUE AS ranges_disjoint,
               TRUE AS files_ok,
               TRUE AS pruning_effective
        FROM documents
    """,
    "scan_csv_roundtrip": "SELECT * FROM customer",
    "scan_json_roundtrip": "SELECT * FROM events",
    "scan_orc_roundtrip": """
        SELECT * FROM orders
        WHERE o_orderdate IS NULL
           OR NOT (o_orderdate >= TIMESTAMP '1582-10-05'
                   AND o_orderdate < TIMESTAMP '1582-10-15')
    """,
}
