"""Keyed last-write-wins cache as a stateful streaming operator.

Reference semantics (cache.hpp:14-58, SURVEY.md D5): a registry keyed by
instance pointer where `replace` overwrites the entry, `invalidate`
deletes it, `iscached` probes it — i.e. a compacted topic. The batch
form is operators/compaction.py; this is the continuous form: an
``applyInPandasWithState`` operator that keeps exactly one (seq, value)
per key and treats tombstones as deletes.

Scale posture: state is partitioned by key across executors (the shuffle
of the groupBy), per-key state is O(1) (one winner), and Arrow batches
carry the data — no per-row Python overhead.
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

STATE_SCHEMA = StructType(
    [
        StructField("seq", LongType()),
        StructField("value", StringType()),
        StructField("tombstone", BooleanType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("seq", LongType()),
        StructField("value", StringType()),
        StructField("cached", BooleanType()),  # iscached(key) after this batch
    ]
)


def _lww_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's writes for one key into the state.

    Highest seq wins (ties: tombstone wins, matching `invalidate`-after-
    `replace` ordering at equal sequence). Emits the post-batch view of
    the key — update-mode output, one row per touched key per batch.
    """
    if state.exists:
        best_seq, best_val, best_tomb = state.get
    else:
        best_seq, best_val, best_tomb = None, None, False

    for pdf in pdfs:
        for seq, val, tomb in zip(
            pdf["seq"].astype("int64"), pdf["value"], pdf["is_tombstone"]
        ):
            seq = int(seq)
            tomb = bool(tomb)
            if (
                best_seq is None
                or seq > best_seq
                or (seq == best_seq and tomb and not best_tomb)
            ):
                best_seq, best_val, best_tomb = seq, (None if tomb else val), tomb

    state.update((best_seq, best_val, best_tomb))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "seq": [best_seq],
            "value": [best_val],
            "cached": [not best_tomb],
        }
    )


def streaming_lww_cache(writes: DataFrame) -> DataFrame:
    """Continuous compaction over a write stream with columns
    (key string, seq long, value string, is_tombstone boolean).

    Returns the update stream (key, seq, value, cached) — `cached=false`
    rows are the observable form of `invalidate` (cache.hpp:14-27).
    """
    return writes.groupBy("key").applyInPandasWithState(
        _lww_update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
