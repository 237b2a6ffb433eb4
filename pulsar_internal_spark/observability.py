"""In-flight plan metrics via DataFrame.observe.

The reference's Logger (D8, Logger.hpp:20-125) appends counters and
messages as work flows through the executor. The Spark-native analogue
is NOT a second counting pass — it's `DataFrame.observe`: named
aggregates evaluated by accumulators DURING the action, at whatever
point of the plan they are attached, for zero extra scans. Typical use:
attach row/volume counters before and after a filter stage to log
selectivity per batch job, or per micro-batch via the streaming
QueryProgress event.

At 100 TB an extra `.count()` for logging doubles the read; an
observation is free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed_rows(
    df: DataFrame, name: str = "metrics", extra: list[Column] | None = None
) -> tuple[DataFrame, Observation]:
    """Attach an Observation at this point of the plan counting the rows
    flowing through (plus any caller aggregates). Returns the same
    DataFrame (observation attached) and the Observation; read
    ``obs.get`` AFTER an action has materialized the plan.

    ``name`` is a display prefix only — the registered observation name
    gets a unique suffix, because Spark requires CollectMetrics names
    to be unique within one plan and per-stage instrumentation (the
    whole point) would otherwise collide on the second stage."""
    import uuid

    obs = Observation(f"{name}-{uuid.uuid4().hex[:8]}")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if extra:
        aggs.extend(extra)
    return df.observe(obs, *aggs), obs


def stage_selectivity(
    before: DataFrame, predicate: Column
) -> tuple[DataFrame, Observation, Observation]:
    """Instrument a filter stage: observations on both sides give the
    stage's selectivity from ONE pass — (filtered_df, obs_in, obs_out).
    selectivity = obs_out.get['n_rows'] / obs_in.get['n_rows'].
    Safe to apply to several stages of the same plan (unique names)."""
    pre, obs_in = observed_rows(before, "stage_in")
    post, obs_out = observed_rows(pre.filter(predicate), "stage_out")
    return post, obs_in, obs_out
