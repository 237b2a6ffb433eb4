"""Temporal joins — operators Spark lacks as built-ins, composed from
DataFrame primitives (driver-mandated extension family; SURVEY.md §7
Phase 4 design stance: partition-parallel, no driver loops).

The as-of join ("latest right-side row at or before each left-side
time") is the canonical training-data alignment primitive: join events
to the most recent model/state snapshot, prices to trades, orders to
sessions. Spark has no ASOF JOIN; the naive rewrite (inequality join +
per-left-row max) explodes to O(L*R) pairs under a range predicate.

Implementation here is the scalable union-and-carry shape:

    tag left rows 1, right rows 0
    union on (key, t, tag, payload-cols)          -- narrow
    window PARTITION BY key ORDER BY (t, tag)
           ROWS UNBOUNDED PRECEDING..CURRENT      -- ONE shuffle on key
    last(payload, ignorenulls=true) carries the latest right payload
    keep tag==1 rows                              -- the joined output

Cost: one hash exchange + one sort — the same budget as a regular
sort-merge join, with no pair explosion. Right-side rows must be unique
per (key, t) for determinism; callers dedupe with an aggregate (see
`asof_latest_order` in plans/queries.py).

At 100 TB: the shuffle keys on the join key, so skewed keys salt the
same way joins do; state per partition is one sort run (spillable), and
no row set is ever collected or broadcast.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload: Sequence[str],
    carry_time_as: str = "asof_time",
    right_tie_break: Sequence[str] = (),
) -> DataFrame:
    """Left as-of join: every `left` row, plus `payload` columns from the
    latest `right` row with the same `on` key and
    ``right_time <= left_time`` (NULLs when no such row exists).

    `right` must be unique per (on, right_time); ties at equal time sort
    the right row first, so a left row at exactly the right row's time
    matches it (>= semantics, DuckDB-ASOF-compatible).

    ``right_tie_break`` (round 11): right-side columns appended
    ASCENDING to the carry-forward window's ordering. With it, `right`
    may hold several rows per (on, right_time): the carried payload is
    the row whose tie-break tuple sorts LAST — e.g. pass the id column
    to carry the max-id row, which equals pre-aggregating
    ``groupBy(on, right_time).agg(max(id))`` while REMOVING that
    aggregate's whole exchange: the dedup rides the window sort the
    as-of union already pays (duplicates within a (key, time) group
    are adjacent in the sort; last-write-wins through the running
    ``last(ignorenulls)``)."""
    # The union/window plumbing below manufactures internal columns; a
    # caller column with one of these names would silently produce
    # ambiguous/duplicate output, so refuse loudly instead.
    reserved = {"_k", "_t", "_tag", "_pt", carry_time_as}
    reserved |= {f"_p_{c}" for c in payload} | {f"_c_{c}" for c in payload}
    reserved |= {f"_tb_{c}" for c in right_tie_break}
    clashes = reserved.intersection(left.columns)
    if clashes:
        raise ValueError(
            f"asof_join reserves column names {sorted(clashes)}; rename them "
            "on the left frame (or pick a different carry_time_as)"
        )
    overlap = set(payload).intersection(left.columns)
    if overlap:
        raise ValueError(
            f"payload columns {sorted(overlap)} collide with left columns; "
            "rename one side before joining"
        )
    lcols = [c for c in left.columns]
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload],
        F.lit(None).cast(right.schema[right_time].dataType).alias("_pt"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_tb_{c}")
            for c in right_tie_break
        ],
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_p_{c}") for c in payload],
        F.col(right_time).alias("_pt"),
        *[F.col(c).alias(f"_tb_{c}") for c in right_tie_break],
    )
    # tie-break columns order only right-vs-right rows at an equal
    # (_k, _t): _tag already puts every right row before any left row
    # there, and left rows carry NULL ties (mutually equal, harmless)
    w = (
        Window.partitionBy("_k")
        .orderBy(
            F.asc("_t"),
            F.asc("_tag"),
            *[F.asc(f"_tb_{c}") for c in right_tie_break],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).select(
        *lcols,
        "_tag",
        *[F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"_c_{c}") for c in payload],
        F.last("_pt", ignorenulls=True).over(w).alias(carry_time_as),
    )
    return carried.filter(F.col("_tag") == 1).select(
        *lcols,
        *[F.col(f"_c_{c}").alias(c) for c in payload],
        carry_time_as,
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_start: str,
    right_end,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Interval-containment join WITHOUT an equi-key: pair every `left`
    row with every `right` interval where
    ``right_start <= left_time < right_end``.

    Spark's planner turns a pure inequality join into a broadcast
    nested-loop — O(L*R) comparisons. This operator manufactures the
    missing equi-key by time-bucketing: each right interval explodes to
    the buckets it touches (ceil(len/bucket)+1 rows), each left row maps
    to exactly one bucket, and the join becomes a hash equi-join on
    bucket with the range predicate as a residual condition. A left row
    matches an interval in exactly one bucket (its own), so no dedup
    pass is needed.

    ``right_end`` is a column name or Column (e.g. ``F.col(s) +
    F.expr("INTERVAL 1 HOUR")``); pick ``bucket_seconds`` ~ the typical
    interval length so intervals touch ~2 buckets.

    At 100 TB: shuffle keys on bucket; hot buckets are time skew —
    choose the bucket width against interval length, and AQE's
    skew-join split handles residual hotspots.
    """
    end_col = F.col(right_end) if isinstance(right_end, str) else right_end
    l2 = left.withColumn(
        "_rb", F.floor(F.unix_timestamp(F.col(left_time)) / bucket_seconds)
    )
    r2 = (
        right.withColumn("_re", end_col)
        .withColumn("_b0", F.floor(F.unix_timestamp(F.col(right_start)) / bucket_seconds))
        .withColumn("_b1", F.floor(F.unix_timestamp(F.col("_re")) / bucket_seconds))
        .withColumn("_rb", F.explode(F.sequence(F.col("_b0"), F.col("_b1"))))
        .drop("_b0", "_b1")
    )
    cond = (
        (l2["_rb"] == r2["_rb"])
        & (l2[left_time] >= r2[right_start])
        & (l2[left_time] < r2["_re"])
    )
    return l2.join(r2, cond, how).drop(r2["_rb"]).drop("_rb", "_re")
