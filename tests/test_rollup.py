"""Incremental rollup materialization tests (operators/rollup.py): the
write side of the hypertable continuous aggregate — refresh rewrites
only watermark-forward partitions, serving merges materialized partials
with the raw tail exactly."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pulsar_internal_spark.operators.rollup import (
    hourly_partials,
    refresh_rollup,
    serve_rollup,
)
from pulsar_internal_spark.sources.tables import load_table


def _direct(events):
    """Single-pass reference rollup (what serving must equal)."""
    return events.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd-HH").alias(
            "bucket_hour"
        ),
        "event_type",
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value"), 2).alias("value_sum"),
    )


def _rows(df):
    return {
        (r.bucket_hour, r.event_type): (r.n_events, r.value_sum)
        for r in df.collect()
    }


def _partition_sig(path: str) -> dict[str, tuple]:
    """bucket dir -> (file set, mtimes) — identity of the written data."""
    sig = {}
    for d in os.listdir(path):
        if not d.startswith("bucket_hour="):
            continue
        full = os.path.join(path, d)
        files = sorted(f for f in os.listdir(full) if f.endswith(".parquet"))
        sig[d] = tuple((f, os.path.getmtime(os.path.join(full, f))) for f in files)
    return sig


def test_refresh_is_incremental_and_serving_is_exact(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "rollup")

    early = events.filter(F.col("ts") < "2024-01-20")
    refresh_rollup(spark, early, path)

    # serving early data == the single-pass rollup over the same data
    assert _rows(serve_rollup(spark, early, path)) == _rows(_direct(early))

    sig_before = _partition_sig(path)
    assert sig_before, "first refresh must materialize partitions"
    prev_max = max(sig_before)

    refresh_rollup(spark, events, path)
    sig_after = _partition_sig(path)

    # dynamic overwrite: every partition strictly before the previous
    # watermark is bit-identical (same files, same mtimes) — history is
    # never rewritten
    untouched = [d for d in sig_before if d < prev_max]
    assert untouched, "test needs history partitions"
    for d in untouched:
        assert sig_after[d] == sig_before[d], f"history partition {d} rewritten"
    assert len(sig_after) > len(sig_before), "new closed hours must appear"

    # serving the full log == the single-pass rollup over the full log
    assert _rows(serve_rollup(spark, events, path)) == _rows(_direct(events))


def test_open_hour_never_materializes(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "rollup2")
    refresh_rollup(spark, events, path)
    max_ts_hour = events.agg(
        F.date_format(F.date_trunc("hour", F.max("ts")), "yyyy-MM-dd-HH")
    ).collect()[0][0]
    mat_hours = {
        r.bucket_hour
        for r in spark.read.parquet(path).select("bucket_hour").distinct().collect()
    }
    assert max_ts_hour not in mat_hours, "open hour must stay unmaterialized"
    # but serving still covers it via the raw tail
    served = _rows(serve_rollup(spark, events, path))
    direct = _rows(_direct(events))
    assert served == direct


def test_partials_are_mergeable(spark, sf_dir):
    """Splitting events arbitrarily and merging hourly_partials must
    equal the partials of the whole — the algebraic property dynamic
    refresh relies on."""
    events = load_table(spark, sf_dir, "events")
    a = events.filter(F.col("user_id") % 2 == 0)
    b = events.filter(F.col("user_id") % 2 == 1)
    merged = (
        hourly_partials(a)
        .unionAll(hourly_partials(b))
        .groupBy("bucket_hour", "event_type")
        .agg(
            F.sum("pn").cast("long").alias("pn"),
            F.round(F.sum("pv"), 2).alias("pv"),
        )
    )
    whole = hourly_partials(events).select(
        "bucket_hour",
        "event_type",
        F.col("pn").cast("long").alias("pn"),
        F.round("pv", 2).alias("pv"),
    )
    got = {(r.bucket_hour, r.event_type): (r.pn, r.pv) for r in merged.collect()}
    want = {(r.bucket_hour, r.event_type): (r.pn, r.pv) for r in whole.collect()}
    assert got == want


def test_expire_partitions_ttl(spark, sf_dir, tmp_path):
    """Retention: expiring old hour-partitions is a directory-level
    delete; the surviving materialization still reads and serves."""
    from pulsar_internal_spark.operators.rollup import expire_partitions

    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "rollup3")
    refresh_rollup(spark, events, path)

    all_parts = sorted(
        d.split("=", 1)[1] for d in os.listdir(path) if d.startswith("bucket_hour=")
    )
    keep_from = all_parts[len(all_parts) // 2]
    removed = expire_partitions(path, keep_from)
    assert removed == [f"bucket_hour={b}" for b in all_parts if b < keep_from]

    kept = {
        r.bucket_hour
        for r in spark.read.parquet(path).select("bucket_hour").distinct().collect()
    }
    assert kept == {b for b in all_parts if b >= keep_from}
    # serving over the retained window still merges with the raw tail
    served = serve_rollup(spark, events, path)
    assert served.filter(F.col("bucket_hour") >= keep_from).count() > 0


def test_late_events_within_window_are_counted(spark, sf_dir, tmp_path):
    """Bounded-lateness contract: an event arriving late into an
    already-materialized hour is (a) still served exactly when within
    the serve-side lateness window, and (b) folded into the
    materialization by the next refresh with the same window — while a
    zero-window refresh (the old behavior) would drop it forever."""
    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "rollup_late")

    refresh_rollup(spark, events, path)
    wm = max(
        d.split("=", 1)[1] for d in os.listdir(path) if d.startswith("bucket_hour=")
    )  # e.g. 2024-01-31-22

    # a late event ONE bucket behind the serve boundary: at K=0 the
    # boundary is wm (the watermark bucket itself is always raw-served,
    # matching refresh's inclusive side), so the hazard bucket is wm-1
    from datetime import datetime, timedelta

    late_bucket = (
        datetime.strptime(wm, "%Y-%m-%d-%H") - timedelta(hours=1)
    ).strftime("%Y-%m-%d-%H")
    late_hour_ts = (
        late_bucket.rsplit("-", 1)[0] + " " + late_bucket.rsplit("-", 1)[1] + ":17:00"
    )
    late = spark.createDataFrame(
        [(999999, late_hour_ts, "late_type", 42.5)],
        "user_id long, ts string, event_type string, value double",
    ).select(
        "user_id", F.to_timestamp("ts").alias("ts"), "event_type", "value"
    )
    full = events.select("user_id", "ts", "event_type", "value").unionByName(late)

    # (a) serving with lateness window: exact vs single-pass aggregate
    served = _rows(serve_rollup(spark, full, path, lateness_buckets=1))
    assert served == _rows(_direct(full))
    # sanity: zero-window serving misses the late row (the hazard)
    served0 = _rows(serve_rollup(spark, full, path, lateness_buckets=0))
    assert (late_bucket, "late_type") not in served0

    # (b) refresh with the window folds the late row into the partition
    refresh_rollup(spark, full, path, lateness_buckets=1)
    mat = spark.read.parquet(path).filter(
        (F.col("bucket_hour") == late_bucket) & (F.col("event_type") == "late_type")
    )
    assert mat.count() == 1
    # and serving straight off the refreshed materialization is exact
    assert _rows(serve_rollup(spark, full, path)) == _rows(_direct(full))
