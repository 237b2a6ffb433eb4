#!/usr/bin/env python
"""Benchmark harness: runs the full query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line under 1900 chars: {"metric": ..., "value": N, "unit":
"sec", "n_queries": N, "mean": ..., "median": ..., "queries":
{<slowest that fit>}, "queries_truncated": bool, "sf": ...}. The FULL
per-query map is written to BENCH_local.json (same totals).

Timing = full plan execution into the `noop` sink (forces evaluation of
every column, no driver collect, no disk write). One warmup query first
so JVM/codegen startup isn't billed to the first query.

Each query is timed on THREE interleaved passes over the suite and the
MEDIAN is recorded: transient host stalls (CPU-steal bursts on shared
machines) land multi-second pauses on random queries, and a median over
pass-interleaved runs cannot be hit by the same burst twice — so the
recorded per-query numbers are comparable round-over-round without a
judge re-run. (A min would flatter queries whose plans have genuine
variance; a single pass records the host, not the query.)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pulsar_internal_spark.plans.queries import QUERIES  # noqa: E402
from pulsar_internal_spark.session import get_spark  # noqa: E402
from pulsar_internal_spark.staging import release_staged  # noqa: E402

# Drift controls: pinned trivial fixed-cost queries (single scan +
# narrow projection, no round ever touches their plans) surfaced
# separately as "control_secs" in BOTH the stdout line and
# BENCH_local.json. Same-HEAD full-suite runs on this box have
# measured 1.4-1.5x apart UNIFORMLY (shared-host CPU steal:
# BENCH_full_r09 132.99 s vs BENCH_local 204.53 s, with these very
# queries drifting 1.35-1.46x); dividing by the controls' ratio to a
# reference window turns cross-run comparison from forensics into
# arithmetic. Reference (clean-window, r9): class_filter_scan 0.129,
# path_normalization 0.135, top_accounts_limit 0.115.
CONTROLS = ("class_filter_scan", "path_normalization", "top_accounts_limit")
CONTROL_REF_SECS = {
    "class_filter_scan": 0.129,
    "path_normalization": 0.135,
    "top_accounts_limit": 0.115,
}


def _materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = sf

    # Machine-parsable contract: the JSON result must be the ONLY line on
    # stdout. The py4j-launched JVM inherits this process's fd 1 and writes
    # startup noise ("WARNING: Using incubator modules", Ivy resolution,
    # log4j banner) there, so dup the real stdout away for the result line
    # and point fd 1 at stderr BEFORE the JVM spawns.
    real_stdout = os.fdopen(os.dup(1), "w")
    os.dup2(2, 1)
    sys.stdout = sys.stderr

    spark = get_spark(app_name="pulsar_internal_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + codegen + parquet footer reads, plus the lazily
    # initialized subsystems whose startup would otherwise be billed to
    # whichever query alphabetically hits them first — the Python UDF
    # worker pool (blake2 pays ~2 s of worker spawn + package shipping)
    # and the IVF serving plan's large codegen unit (argmin over the
    # frozen centroid literals; since round 7 the query serves frozen
    # constants, so MLlib class loading is no longer on any query path)
    _materialize(QUERIES["class_filter_scan"](spark, sf_dir))
    # events-table scan path (nanos->timestamp) warms separately
    _materialize(QUERIES["distinct_users_by_type"](spark, sf_dir))
    warm_sf = os.environ.get("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(warm_sf):
        warm_sf = sf_dir
    _materialize(QUERIES["blake2_lookalike_nation"](spark, warm_sf))
    _materialize(QUERIES["ivf_cosine_topk"](spark, warm_sf))
    # the shingle/HOF expression family (tokenize -> transform/element_at
    # n-grams -> explode/join) JIT-compiles some of the largest codegen
    # units in the suite (~5-13 s of first-hit compile at sf0.1, billed
    # to whichever n-gram query runs first alphabetically) — warm it at
    # sf0.001 like the UDF pool and MLlib classes above
    _materialize(QUERIES["benchmark_contamination"](spark, warm_sf))
    _materialize(QUERIES["near_dup_jaccard"](spark, warm_sf))
    # the iterative components engine compiles a distinct plan per
    # round (propagate + hop + checkpoint) — first hit pays ~2-3 s of
    # codegen across the loop; warm the whole chain at sf0.001
    _materialize(QUERIES["near_dup_clusters"](spark, warm_sf))
    # the WIDE sign-LSH banding (96-plane literal matrix -> 8 band
    # projections) and the IVF+PQ serving plan (encode argmin + probed
    # ADC folds) are the two largest Catalyst-analysis + codegen units
    # the suite builds — a cold session pays ~10-20 s of JVM JIT on
    # whichever of their queries runs first (measured round 11:
    # embedding_near_dup_wide cold build 12.2 s + exec 8.1 s vs 2.3 s
    # warm, same session). Warm both families at sf0.001 like the
    # n-gram/codegen warmups above
    _materialize(QUERIES["embedding_near_dup_wide"](spark, warm_sf))
    _materialize(QUERIES["ivfpq_topk"](spark, warm_sf))
    # mapInPandas-over-binary is a distinct worker path from scalar
    # pandas UDFs (Arrow record batches + decode-module imports in every
    # worker) — first hit costs ~3-6 s; warm it at sf0.001
    _materialize(QUERIES["multimodal_real_decode"](spark, warm_sf))
    # spawn the FULL Python worker pool: a few-partition pandas UDF warm
    # leaves most of the 32 per-partition workers cold, and the first
    # wide mapInPandas query would pay ~2 s of worker spawn for them
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm_ident(s):
        return s

    cpus = spark.sparkContext.defaultParallelism
    _materialize(
        spark.range(0, cpus * 4, 1, cpus).select(_warm_ident("id"))
    )

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    samples: dict[str, list[float]] = {name: [] for name in QUERIES}
    for _ in range(n_runs):
        for name in sorted(QUERIES):
            t0 = time.perf_counter()
            _materialize(QUERIES[name](spark, sf_dir))
            samples[name].append(time.perf_counter() - t0)
            # staged frames are eager localCheckpoints — without a
            # release the block manager accumulates every measured
            # query's intermediates across the whole suite and later
            # queries run storage-starved (see scale_bench
            # _release_persisted for the measured pathology)
            release_staged(spark)

    # statistics.median averages the middle pair for even run counts —
    # sorted(ts)[n//2] would record the MAX when SPARK_GRAFT_BENCH_RUNS=2
    timings = {
        name: round(statistics.median(ts), 3) for name, ts in samples.items()
    }
    total = round(sum(timings.values()), 3)
    control_secs = {c: timings[c] for c in CONTROLS if c in timings}
    # host-drift factor: median of control ratios vs the pinned
    # clean-window reference — ~1.0 on an idle box, >1.2 means the
    # whole run is inflated by CPU steal and totals should be
    # normalized by this factor before round-over-round comparison
    ratios = [
        control_secs[c] / CONTROL_REF_SECS[c]
        for c in control_secs
        if c in CONTROL_REF_SECS
    ]
    drift = round(statistics.median(ratios), 3) if ratios else None
    full = {
        "metric": "query_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "control_secs": control_secs,
        "control_drift": drift,
        "sf": sf_num,
    }
    # The driver records only a 2000-char tail of stdout, so the full
    # per-query map (~6 KB at 150+ queries) is unparseable there: the
    # stdout line carries summary stats plus as many of the SLOWEST
    # queries as fit a 1900-char budget; the complete map lands in
    # BENCH_local.json for offline diffing.
    summary = {
        "metric": "query_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "n_queries": len(timings),
        "mean": round(total / max(len(timings), 1), 3),
        "median": round(statistics.median(timings.values()), 3),
        "control_secs": control_secs,
        "control_drift": drift,
        "queries": {},
        "queries_truncated": True,
        "sf": sf_num,
    }
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        summary["queries"][name] = sec
        if len(json.dumps(summary)) >= 1850:
            del summary["queries"][name]
            break
    else:
        summary["queries_truncated"] = False
    line = json.dumps(summary)
    assert len(line) < 1900, len(line)
    # one clean line on the real stdout + a disk artifact for offline diffing
    real_stdout.write(line + "\n")
    real_stdout.flush()
    artifact = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json"
    )
    with open(artifact, "w") as f:
        f.write(json.dumps(full) + "\n")


if __name__ == "__main__":
    main()
