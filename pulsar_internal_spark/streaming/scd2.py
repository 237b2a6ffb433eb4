"""Streaming SCD Type-2 history as a stateful operator.

The continuous form of the batch `scd2_user_state_history` query
(plans/queries.py): where the batch build derives validity intervals
with LAG/LEAD windows over the full log, the stream cannot see the
future — so each key holds its OPEN interval in state and, whenever a
micro-batch brings a state change, emits the CLOSED interval record
(valid_from, valid_to, is_current=false) plus the new open one. This is
the warehouse-history twin of the LWW cache in state.py (reference D5,
cache.hpp:14-58): LWW keeps only the latest value; SCD2 additionally
emits every superseded value with the interval it was valid for.

Scale posture: state is partitioned by key (the groupBy shuffle),
per-key state is O(1) (one open interval), Arrow batches carry the
rows. Out-of-order arrivals WITHIN a micro-batch are handled by sorting
the batch on (ts, seq); cross-batch late events are a watermark concern
— drop them upstream with withWatermark + dropDuplicatesWithinWatermark
(streaming/ingest.py) like any event-time stateful op.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# open interval per key: state value + when it started (epoch micros)
SCD2_STATE_SCHEMA = StructType(
    [
        StructField("state", StringType()),
        StructField("valid_from_us", LongType()),
    ]
)

SCD2_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("state", StringType()),
        StructField("valid_from_us", LongType()),
        StructField("valid_to_us", LongType()),  # null while open
        StructField("is_current", BooleanType()),
    ]
)


def _scd2_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold one key's micro-batch of (ts_us, seq, state) change events
    into the open-interval state; emit a closed-interval row per state
    change and the (possibly updated) open row. Consecutive duplicate
    states collapse, matching the batch build's LAG filter."""
    if state.exists:
        cur_state, cur_from = state.get
    else:
        cur_state, cur_from = None, None

    rows: dict[str, list] = {k: [] for k in SCD2_OUTPUT_SCHEMA.fieldNames()}

    def emit(st, vf, vt, current):
        rows["key"].append(key[0])
        rows["state"].append(st)
        rows["valid_from_us"].append(vf)
        rows["valid_to_us"].append(vt)
        rows["is_current"].append(current)

    events = pd.concat(list(pdfs), ignore_index=True)
    events = events.sort_values(["ts_us", "seq"], kind="mergesort")
    changed = False
    for ts_us, new_state in zip(events["ts_us"].astype("int64"), events["state"]):
        ts_us = int(ts_us)
        if cur_state is not None and ts_us < cur_from:
            # cross-batch late event older than the open interval: the
            # watermark upstream should have dropped it; failing safe
            # here (skip) beats emitting an inverted interval
            # (valid_to < valid_from) and rewinding state
            continue
        if cur_state is None:
            cur_state, cur_from = new_state, ts_us
            changed = True
        elif new_state != cur_state:
            emit(cur_state, cur_from, ts_us, False)  # close the interval
            cur_state, cur_from = new_state, ts_us
            changed = True

    state.update((cur_state, cur_from))
    if changed:
        emit(cur_state, cur_from, None, True)  # the (new) open interval
    yield pd.DataFrame(rows)


def streaming_scd2(changes: DataFrame) -> DataFrame:
    """Continuous SCD2 over a change stream with columns
    (key string, ts_us long, seq long, state string).

    Returns the update stream (key, state, valid_from_us, valid_to_us,
    is_current): every state change emits the superseded interval closed
    at the new event's timestamp plus the new open interval — the same
    rows the batch scd2_user_state_history build produces, delivered
    incrementally."""
    return changes.groupBy("key").applyInPandasWithState(
        _scd2_update,
        outputStructType=SCD2_OUTPUT_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
