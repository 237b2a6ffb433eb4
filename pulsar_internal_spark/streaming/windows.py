"""Event-time windowed aggregation with watermark.

The reference batches work per render tick (scheduler.cpp:110-128) and
polls its WebSocket every 10 ms (websocket.hpp:175-209) but has NO
notion of event time, windows, or late data (SURVEY.md §2.11 — judged
absent, not overlooked). This module defines the Spark-idiomatic
semantics the rebuild adopts: tumbling/sliding event-time windows with
an explicit watermark as the late-data policy.

Scale posture: windowed streaming aggregation is a keyed shuffle on
(window, keys); state size is bounded by the watermark horizon — the
store only keeps windows newer than (max event time - watermark).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    keys: Sequence[str] = ("event_type",),
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Count events per (window, *keys) with late data dropped past the
    watermark. Works on both streaming and batch DataFrames (batch form
    is what the `hourly_event_windows` oracle query checks).

    Returns (window_start, window_end, *keys, cnt).
    """
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return (
        events.groupBy(win.alias("w"), *[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *[F.col(k) for k in keys],
            "cnt",
        )
    )


def session_windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    keys: Sequence[str] = ("user_id",),
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows: per-key activity runs split by ``gap`` of
    inactivity. In streaming mode Spark MERGES overlapping candidate
    sessions as events arrive, emitting a session only once the
    watermark passes its end — so each session is final when it
    appears (append mode). Batch form is checked by the
    `session_windows_events` oracle query.

    Returns (session_start, session_end, *keys, cnt).
    """
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(
            F.session_window(ts_col, gap).alias("w"),
            *[F.col(k) for k in keys],
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *[F.col(k) for k in keys],
            "cnt",
        )
    )
