"""Incremental hourly rollup materialization (hypertable write side).

The query-side merge algebra is proven by plans/queries.py
`hypertable_rollup_merge`; this module is the REFRESH side of the
continuous aggregate: materialize closed-hour partials to a
hive-partitioned parquet table and, on refresh, rewrite ONLY the
partitions at or after the previous watermark (Spark dynamic partition
overwrite) — history partitions are never re-scanned or re-written,
which is what makes hourly refresh affordable on a 100 TB event log.

Layout: one directory per closed hour (`bucket_hour=2024-01-15-12/`),
each holding the algebraic partials (count + unrounded sum) so serving
can merge them with a raw tail without precision loss.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_FMT = "yyyy-MM-dd-HH"


def hourly_partials(events: DataFrame) -> DataFrame:
    """Algebraic hourly partials: (bucket_hour, event_type, pn, pv).
    Sums stay unrounded — rounding happens at serve time, after the
    final merge (rounded partials would not be mergeable)."""
    return events.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), BUCKET_FMT).alias("bucket_hour"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("value").alias("pv"),
    )


def _closed_hour_cutoff(events: DataFrame):
    """Latest fully-closed hour boundary = floor(max ts to hour); the
    hour containing max(ts) is still open and must not materialize."""
    return events.agg(F.date_trunc("hour", F.max("ts")).alias("_cut"))


def refresh_rollup(
    spark: SparkSession,
    events: DataFrame,
    path: str,
    lateness_buckets: int = 0,
) -> None:
    """Materialize/refresh the closed-hour rollup at ``path``.

    Incremental: only events in hours >= (previously materialized
    maximum bucket − ``lateness_buckets``) are re-aggregated (the
    boundary hour was open at the last refresh, so it is recomputed in
    full), and dynamic partition overwrite rewrites exactly the touched
    bucket_hour directories. First call materializes everything closed.

    **Lateness contract**: an event arriving late into an hour within
    ``lateness_buckets`` buckets behind the watermark is picked up by
    the next refresh (its partition is fully recomputed). An event
    later than that window is permanently dropped from the materialized
    rollup — the same bounded-lateness semantics a streaming watermark
    gives; pick the window from the pipeline's observed arrival skew."""
    cut = _closed_hour_cutoff(events)
    closed = events.join(F.broadcast(cut)).filter(F.col("ts") < F.col("_cut"))

    from pyspark.errors import AnalysisException

    try:
        existing_max = (
            spark.read.parquet(path).agg(F.max("bucket_hour")).collect()[0][0]
        )
    except AnalysisException as e:
        # ONLY path-absent means first materialization; any OTHER
        # analysis failure (corrupt footer, schema lost) must propagate —
        # treating it as first-materialization would silently rewrite all
        # history partitions and mask the underlying fault
        err = getattr(e, "getErrorClass", lambda: None)() or str(e)
        if "PATH_NOT_FOUND" not in err and "Path does not exist" not in str(e):
            raise
        existing_max = None
    if existing_max is not None:
        boundary = F.to_timestamp(F.lit(existing_max), BUCKET_FMT) - F.expr(
            f"INTERVAL {int(lateness_buckets)} HOURS"
        )
        closed = closed.filter(F.date_trunc("hour", "ts") >= boundary)

    # per-write option scopes the dynamic overwrite to this write only
    (
        hourly_partials(closed.drop("_cut"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket_hour")
        .parquet(path)
    )


def expire_partitions(path: str, keep_from_bucket: str) -> list[str]:
    """Retention sweep: drop materialized hour-partitions strictly below
    ``keep_from_bucket`` (lexicographic compare works because the bucket
    format is zero-padded big-endian). Directory-level deletes — no file
    rewrite, no table scan; the hive layout makes TTL an O(#partitions)
    metadata operation, which is the point of partitioning by time.
    Routed through store_fs so the sweep hits the store's own
    filesystem (hdfs://, file://, or plain local). Returns the removed
    partition names."""
    from .store_fs import expire_prefixed_partitions

    return expire_prefixed_partitions(
        path, "bucket_hour=", lambda v: v < keep_from_bucket
    )


def serve_rollup(
    spark: SparkSession,
    events: DataFrame,
    path: str,
    lateness_buckets: int = 0,
) -> DataFrame:
    """Serve the hourly rollup: materialized closed-hour partials UNION
    a raw-tail aggregation of events past the materialized watermark,
    merged by one final algebraic aggregate (the same shape
    hypertable_rollup_merge proves against the single-pass oracle).

    ``lateness_buckets`` mirrors :func:`refresh_rollup` EXACTLY — both
    use the same boundary (watermark − K) and the same inclusive side:
    materialized partials at or above the boundary are DISCARDED and
    those hours re-aggregated from raw alongside the tail, the same
    hours the next refresh will recompute. An event that arrived late
    (within the window) after the last refresh is therefore counted
    identically by serve-now and by refresh-then-serve — serving
    matches the single-pass aggregate for any lateness ≤ K buckets.
    Returns (bucket_hour, event_type, n_events, value_sum)."""
    mat = spark.read.parquet(path).select("bucket_hour", "event_type", "pn", "pv")
    # serve boundary = watermark − K buckets, carried as a broadcast
    # column (no driver scalar): materialized rows AT or above it are
    # dropped, raw rows at or above it are re-aggregated — the same
    # >= boundary refresh_rollup uses, so the two windows agree at the
    # boundary bucket (a '> here, >= there' split would hide a late
    # event exactly K buckets back until the next refresh)
    watermark = mat.agg(
        F.date_format(
            F.to_timestamp(F.max("bucket_hour"), BUCKET_FMT)
            - F.expr(f"INTERVAL {int(lateness_buckets)} HOURS"),
            BUCKET_FMT,
        ).alias("_wm")
    )
    mat = (
        mat.join(F.broadcast(watermark))
        .filter(F.col("bucket_hour") < F.col("_wm"))
        .drop("_wm")
    )
    tail_events = events.join(F.broadcast(watermark)).filter(
        F.date_trunc("hour", "ts") >= F.to_timestamp(F.col("_wm"), BUCKET_FMT)
    )
    tail = hourly_partials(tail_events.drop("_wm"))
    return (
        mat.unionAll(tail)
        .groupBy("bucket_hour", "event_type")
        .agg(
            F.sum("pn").cast("long").alias("n_events"),
            F.round(F.sum("pv"), 2).alias("value_sum"),
        )
    )
