"""pulsar_internal_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the *data-meaningful* capability surface of
``ethantherizzler2/Pulsar-Internal`` (surveyed in SURVEY.md), expressed
Spark-first: DataFrame/SQL plans optimized by Catalyst + AQE, Structured
Streaming for the reference's queue/tick/event semantics, and Pandas UDFs
only for the exotic exact-parity scalar functions.

Layout:
    session    — tuned SparkSession factory (AQE, shuffle sizing, Arrow)
    sources    — batch table catalog + streaming ingest sources
    functions  — scalar function layer (hashing/crypto/encoding parity UDFs
                 + idiomatic built-in wrappers), alias registration
    operators  — relational operators: tree queries, dedup (exact/minhash/
                 jaccard), compaction (last-write-wins), similarity search,
                 text analysis, multimodal column plumbing
    plans      — the named query suite (queries + DuckDB oracle SQL)
    streaming  — FIFO ingest, stateful keyed cache, windowed event streams
"""

__version__ = "0.1.0"
