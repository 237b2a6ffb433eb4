"""Keyed last-write-wins compaction.

Reference semantics: the instance cache (cache.hpp:14-58) holds exactly the
latest value per key; `replace` overwrites, `invalidate` deletes. That is
topic compaction. Batch form: one hash aggregation with `max_by` — a single
shuffle on the key, partial-aggregated map-side, no window needed.

Tombstones: a row with is_tombstone=true (the `invalidate` analogue) wins
like any other write by sequence order; compaction then drops keys whose
winning record is a tombstone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compact_last_write_wins(
    df: DataFrame,
    key_cols: list[str],
    seq_col: str,
    payload_cols: list[str] | None = None,
    tombstone_col: str | None = None,
) -> DataFrame:
    """Latest record per key by ``seq_col``. Ties broken by the full
    payload struct ordering (deterministic). Single shuffle; AQE sizes the
    partitions; skewed keys are split by AQE skew handling.
    """
    if payload_cols is None:
        payload_cols = [c for c in df.columns if c not in key_cols]
    struct_cols = [seq_col] + [c for c in payload_cols if c != seq_col]
    winner = F.max(F.struct(*[F.col(c) for c in struct_cols])).alias("_w")
    out = df.groupBy(*key_cols).agg(winner)
    for c in struct_cols:
        out = out.withColumn(c, F.col("_w." + c))
    out = out.drop("_w")
    if tombstone_col is not None:
        out = out.filter(~F.col(tombstone_col))
    return out
