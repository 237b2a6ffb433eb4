"""Structured Streaming layer (SURVEY.md §2.11 / §7 Phase 3).

Maps the reference's tick-driven dataflow onto Spark micro-batches:

  - ingest.py    — script-submission stream (TCP ingest analogue:
                   length-framed messages -> one file per message),
                   FIFO order, 8 MiB guard, at-most-N-per-trigger.
  - windows.py   — event-time windowed aggregation with watermark (the
                   late-data policy the reference never defined).
  - state.py     — keyed last-write-wins cache as a stateful streaming
                   operator (cache.hpp replace/invalidate semantics).
"""

from pulsar_internal_spark.streaming.ingest import (  # noqa: F401
    filter_blocklisted,
    read_socket_submissions,
    read_submission_stream,
    run_fifo_sink,
    streaming_exact_dedup,
)
from pulsar_internal_spark.streaming.state import streaming_lww_cache  # noqa: F401
from pulsar_internal_spark.streaming.windows import windowed_event_counts  # noqa: F401
from pulsar_internal_spark.streaming.yields import (  # noqa: F401
    make_yield_processor,
    read_yield_results,
    rejoin_results_stream,
)
