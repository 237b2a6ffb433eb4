#!/usr/bin/env python
"""Split a query's wall time into BUILD (the Python call: eager
staging jobs, O(1) driver collects, plan construction) vs EXEC (the
noop materialization of the returned frame), plus job/stage counts
from the status REST API — the measurement that decides whether a
slow sf0.1 query is paying for its plan or for driver-side round
trips (guide §1: measure first; §7.3: driver-side work is invisible
in stage timings).

Usage: SPARK_GRAFT_PROFILE_SF=/root/testdata/sf0.1 \
       python tools/query_profile.py q1 q2 ...   [writes one JSON line per query]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pulsar_internal_spark.plans.queries import QUERIES  # noqa: E402
from pulsar_internal_spark.session import get_spark  # noqa: E402
from pulsar_internal_spark.staging import release_staged  # noqa: E402


def _jobs_url(spark) -> str:
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    return f"{base}/api/v1/applications/{app_id}/jobs"


def _job_count(url: str) -> int:
    with urllib.request.urlopen(url, timeout=30) as r:
        return len(json.loads(r.read()))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_PROFILE_SF", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "2"))
    names = sys.argv[1:] or sorted(QUERIES)
    spark = get_spark(
        app_name="query_profile",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.appStateStore.asyncTracking.enable": "false",
            "spark.ui.retainedJobs": "100000",
            "spark.ui.retainedStages": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    url = _jobs_url(spark)
    # warmup mirrors bench.py's intent cheaply
    QUERIES["class_filter_scan"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    for name in names:
        if name not in QUERIES:
            print(f"unknown: {name}", file=sys.stderr)
            continue
        best = None
        for _ in range(runs):
            j0 = _job_count(url)
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            j1 = _job_count(url)
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            j2 = _job_count(url)
            release_staged(spark)
            row = {
                "query": name,
                "build_s": round(t1 - t0, 3),
                "exec_s": round(t2 - t1, 3),
                "build_jobs": j1 - j0,
                "exec_jobs": j2 - j1,
            }
            if best is None or row["build_s"] + row["exec_s"] < (
                best["build_s"] + best["exec_s"]
            ):
                best = row
        print(json.dumps(best), flush=True)


if __name__ == "__main__":
    main()
