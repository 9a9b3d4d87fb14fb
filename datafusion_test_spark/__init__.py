"""datafusion_test_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``integer32llc/datafusion-test``.

The reference (read-only at /root/reference) is a DataFusion-based reproducer
whose capability surface is: multi-file Parquet scan -> SQL (project / filter /
distinct / aggregate) -> partitioned execution -> coalesce -> streamed collect,
plus dataset generation and a query-cancellation benchmark
(see /root/reference/src/main.rs:27-282). This package re-expresses that
surface — and the mandated LLM-data-pipeline extensions — Spark-first:
DataFrame/SQL declarative plans optimized by Catalyst, Structured Streaming
for the streaming tier, and Pandas UDFs only where built-ins can't express
the semantics.

Layout:
    session.py    SparkSession factory + scale-tuned configs
    io.py         testdata loaders / view registration
    sources/      parquet scan & write, synthetic generation (reference parity)
    operators/    relational operators (filter/join/agg/window/sort/setops/dedup)
    functions/    scalar function families (string/date/math/json/array/...)
    pipeline/     LLM-data-pipeline ops (dedup, similarity, text, multimodal)
    streaming/    Structured Streaming surface over `events`
    plans/        plan introspection helpers (pushdown/broadcast assertions)
    registry.py   aggregates every declared operator into queries()/oracle_sql()
"""

__version__ = "0.1.0"
