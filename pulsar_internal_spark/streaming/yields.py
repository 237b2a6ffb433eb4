"""Async side-effect + rejoin — the reference's yield queue (D4).

Reference lifecycle (SURVEY.md §3C, yield.cpp:14-41): a blocking call
(HTTP etc.) suspends the caller, runs on a detached worker thread, and
its continuation rejoins the engine on a later tick via the yield queue
(drained one per tick, yield.cpp:4-12).

Spark restatement: inside ``foreachBatch``, the side-effect calls run
ON THE EXECUTORS — a ``mapInPandas`` stage fans the batch across
``fanout`` partitions, each running its rows through a bounded thread
pool (the detached workers; threads because the work is blocking I/O).
Only the finished result RECORDS come back to the driver, which does
nothing but the idempotent file commit into a results directory that is
ITSELF a streaming source — so downstream consumers see side-effect
results rejoin the dataflow on a later micro-batch, exactly the
yield-queue rejoin-on-tick-boundary shape. Results are written under a
batch-id subdirectory, making retries idempotent (a re-run batch
overwrites its own output, never duplicates it).

Scale posture: side-effect CPU/IO scales with executors (fanout x
max_workers in-flight calls), not with the driver; the driver holds
only one micro-batch of small result records for the commit, so high
ingest rates never serialize behind a driver-side loop.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

RESULT_SCHEMA = "submission_id STRING, result STRING, ok BOOLEAN"


def make_yield_processor(
    side_effect: Callable[[str], str],
    results_dir: str,
    max_workers: int = 8,
    fanout: int = 8,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function: run ``side_effect(script)``
    per submission on the EXECUTORS (mapInPandas over ``fanout``
    partitions, a ``max_workers`` thread pool per partition for the
    blocking calls), then commit the outcomes as one JSON-lines file
    under ``results_dir/batch=<id>/`` — the only driver-side step.

    ``side_effect`` ships to executors via pickle, so it must be
    self-contained (no SparkSession/driver handles inside).
    """

    def run_batches(batches: Iterator) -> Iterator:
        import pandas as pd
        from concurrent.futures import ThreadPoolExecutor

        def run(args):
            sid, script = args
            try:
                return (sid, side_effect(script), True)
            except Exception as exc:  # the reference pcall-wraps (execution.cpp:96)
                return (sid, f"error: {exc}", False)

        for pdf in batches:
            if pdf.empty:
                continue
            with ThreadPoolExecutor(max_workers=max_workers) as pool:
                recs = list(
                    pool.map(run, zip(pdf["submission_id"], pdf["script"]))
                )
            yield pd.DataFrame(
                recs, columns=["submission_id", "result", "ok"]
            )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        results = (
            batch_df.select("submission_id", "script")
            .repartition(fanout)
            .mapInPandas(run_batches, RESULT_SCHEMA)
            .collect()  # result records only — bounded and tiny
        )
        if not results:
            return
        out_dir = os.path.join(results_dir, f"batch={batch_id}")
        os.makedirs(out_dir, exist_ok=True)
        # idempotent on batch_id: a retried batch rewrites the same file
        with open(os.path.join(out_dir, "results.jsonl"), "w") as f:
            for r in results:
                f.write(
                    json.dumps(
                        {
                            "submission_id": r.submission_id,
                            "result": r.result,
                            "ok": bool(r.ok),
                        }
                    )
                    + "\n"
                )

    return process


def read_yield_results(spark: SparkSession, results_dir: str) -> DataFrame:
    """The rejoin side: stream the results directory back into the
    dataflow (RunYield draining the queue, yield.cpp:4-12)."""
    return spark.readStream.schema(RESULT_SCHEMA).json(
        results_dir, pathGlobFilter="*.jsonl", recursiveFileLookup=True
    )


def rejoin_results_stream(
    submissions: DataFrame,
    results: DataFrame,
    max_delay: str = "5 minutes",
    watermark: str = "1 minute",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream rejoin: the submission stream joined to its async
    result stream — the yield queue's resume-on-tick (yield.cpp:24-37)
    as a first-class streaming join.

    ``submissions`` needs (submission_id, submitted_at TIMESTAMP);
    ``results`` needs (submission_id, completed_at TIMESTAMP, result, ok).
    A result only matches within ``max_delay`` of its submission — the
    reference's HTTP timeout (http.hpp:124: 30 s) as a join range
    condition. With ``how='left_outer'`` submissions whose result never
    arrived inside the horizon emerge with NULL result once the
    watermark passes: an observable timeout row.

    Scale posture: the range condition + watermarks bound BOTH state
    stores (each side evicts rows older than watermark + max_delay);
    without them a stream-stream join buffers forever.
    """
    from pyspark.sql import functions as F

    s = submissions.withWatermark("submitted_at", watermark)
    r = results.select(
        F.col("submission_id").alias("r_submission_id"),
        "completed_at",
        "result",
        "ok",
    ).withWatermark("completed_at", watermark)
    cond = (
        (s["submission_id"] == r["r_submission_id"])
        & (r["completed_at"] >= s["submitted_at"])
        & (r["completed_at"] <= s["submitted_at"] + F.expr(f"INTERVAL {max_delay}"))
    )
    return s.join(r, cond, how).drop("r_submission_id")
