"""Skew-aware aggregation and join helpers.

At 100 TB a handful of hot keys (a viral document source, a null-heavy
FK) can pin a whole stage on one task. AQE's skew-join splitting covers
sort-merge JOINS; it does NOT help a skewed AGGREGATION, where all rows
of a hot key still meet in one reducer. The classic fix is salting:

  stage 1: group by (key, salt) — the hot key's rows spread over
           ``salt_buckets`` reducers, partial-aggregated map-side;
  stage 2: group by key over the (much smaller) per-salt partials.

Works for any algebraic aggregate (sum/count/min/max; avg via
sum+count). Cost: one extra (tiny) shuffle — only worth it when skew is
real, so it's an explicit operator, not a default.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_counts(
    df: DataFrame,
    key_cols: Sequence[str],
    salt_buckets: int = 16,
    count_name: str = "cnt",
) -> DataFrame:
    """Skew-safe ``groupBy(keys).count()``."""
    out = salted_agg(
        df,
        key_cols,
        aggs={count_name: ("count", None)},
        salt_buckets=salt_buckets,
    )
    return out


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: dict[str, tuple[str, str | None]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output name -> (fn, input_col) where fn is one of
    count/sum/min/max (algebraic — mergeable across salt partials);
    input_col is ignored for count.
    """
    mergers = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    for name, (fn, _) in aggs.items():
        if fn not in mergers:
            raise ValueError(f"{fn} is not algebraic-mergeable; got {name}={fn}")

    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial_exprs: list[Column] = []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"_p_{name}"))
        else:
            partial_exprs.append(getattr(F, fn)(col).alias(f"_p_{name}"))
    partials = salted.groupBy(*key_cols, "_salt").agg(*partial_exprs)

    final_exprs = [
        mergers[fn](f"_p_{name}").alias(name) for name, (fn, _) in aggs.items()
    ]
    return partials.groupBy(*key_cols).agg(*final_exprs)


def salted_broadcast_left_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof join for the big-fact x small-dim case: broadcast the
    dim so NO shuffle of the big side happens at all — the strongest
    skew fix when the small side fits in memory. (For two big sides,
    rely on AQE skew-join; for pathological keys, pre-split them.)"""
    return big.join(F.broadcast(small), on, how)


def grouped_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column | str],
    k: int,
    salt_buckets: int = 16,
    salt_col: Column | None = None,
) -> DataFrame:
    """Hierarchical per-group top-K — the ranking twin of salted_agg.

    A plain ``row_number() OVER (PARTITION BY group ORDER BY ...)``
    pins EVERY row of the biggest group into one reduce task before the
    rank filter; when one group dominates (one source is 80% of a
    corpus), that task sorts the whole group alone. Phase 1 here salts
    each group into ``salt_buckets`` subgroups and keeps each
    subgroup's top-K; phase 2 re-ranks the ≤ salt_buckets·K survivors
    exactly. Equivalent to the single window: every global top-K row
    ranks ≤ K inside its own salt bucket (all rows ordered before it
    are also global top-K), so phase 1 never drops a winner.

    ``salt_col`` must be DETERMINISTIC per row (derived from row
    content, e.g. a hash prefix) so retries and resumptions rank
    identically; defaults to a hash of the order columns. Returns the
    input columns plus ``rk`` (1-based exact group rank), rows with
    rk <= k only.
    """
    salt = (
        salt_col
        if salt_col is not None
        else F.pmod(
            F.hash(*[F.col(c) if isinstance(c, str) else c for c in order_cols]),
            F.lit(salt_buckets),
        )
    )
    from pyspark.sql.window import Window

    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order_cols)
    survivors = (
        df.withColumn("_salt", salt)
        .withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= k)
        .drop("_rk1", "_salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        survivors.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
    )
