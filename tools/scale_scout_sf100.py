#!/usr/bin/env python
"""Third-decade scouting (VERDICT r8 #6) — writes SCALE_r09_sf100.json.

Each decade so far falsified one "it's linear" assumption (r7: fixture
time-bucket densification; r8: fingerprint banding saturation + the PQ
encode SortAggregate), so the controls get a third decade: sf10 vs
sf100 (1000x the driver's sf0.1 — ~600M lineitem rows, ~24 GB) for the
two classic-join controls and the PQ serving pair.

NOT scouted, with the arithmetic stated rather than hidden:
`user_triangle_counts` at sf100 writes a ~53 GB wedge exchange (5.3 GB
measured at sf10, linear in edges) — more than this box's free disk, so
the limit is box storage, not the operator: its per-task state is bounded
by the round-9 input-scaled partitioning (read-side sort spill 0 at
sf10), which is the property a third decade would test.

Methodology = tools/scale_bench.py (noop-sink, warmups, staged-frame
release, min-of-passes wall, median bytes), 2 passes by default (each
sf100 pass reads ~tens of GB; SPARK_GRAFT_BENCH_RUNS overrides).
Fixture:
  python tools/gen_scale_fixture.py --factor 1000 --out .scale/sf100 \
      --tables customer,supplier,part,orders,lineitem,embeddings

Run: SPARK_GRAFT_DRIVER_MEM=48g python tools/scale_scout_sf100.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pulsar_internal_spark.plans.queries import QUERIES  # noqa: E402
from pulsar_internal_spark.session import get_spark  # noqa: E402
from pulsar_internal_spark.staging import release_staged  # noqa: E402
from tools.scale_bench import StageMetrics, _materialize  # noqa: E402

CONTROLS = [
    "q3_shipping_priority",
    "q9_nation_year_revenue",
    "pq_adc_topk_fixedq",
    "ivfpq_topk_fixedq",
]


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dirs = {
        "sf10": os.path.join(repo, ".scale", "sf10"),
        "sf100": os.path.join(repo, ".scale", "sf100"),
    }
    for sf, d in sf_dirs.items():
        if not os.path.isdir(d):
            sys.exit(f"{sf} fixture missing at {d}")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))

    samples: dict = {
        n: {sf: {"secs": [], "bytes": []} for sf in sf_dirs} for n in CONTROLS
    }
    for r in range(n_runs):
        spark = get_spark(
            app_name="pulsar_internal_spark_scale_scout",
            extra_conf={
                "spark.ui.enabled": "true",
                "spark.ui.port": "4077",
                "spark.ui.retainedStages": "100000",
                "spark.ui.retainedJobs": "100000",
            },
        )
        spark.sparkContext.setLogLevel("ERROR")
        warm = "/root/testdata/sf0.001"
        for q in ("class_filter_scan", "pq_adc_topk", "ivf_cosine_topk"):
            _materialize(QUERIES[q](spark, warm))
        release_staged(spark)
        metrics = StageMetrics(spark)
        for name in CONTROLS:
            line = [f"pass {r + 1}/{n_runs} {name}:"]
            for sf, d in sf_dirs.items():
                before = metrics.snapshot()
                t0 = time.perf_counter()
                _materialize(QUERIES[name](spark, d))
                secs = time.perf_counter() - t0
                samples[name][sf]["secs"].append(secs)
                samples[name][sf]["bytes"].append(metrics.diff(before))
                line.append(f"{sf}={secs:.2f}s")
                release_staged(spark)
                spark.sparkContext._jvm.System.gc()
            print(" ".join(line), file=sys.stderr, flush=True)
        spark.stop()

    def mb(x: float) -> float:
        return round(x / 1048576, 2)

    out: dict = {
        "runs": n_runs,
        "wall_stat": "min of passes; secs_all = raw passes",
        "sf_dirs": sf_dirs,
        "skipped": {
            "user_triangle_counts": "wedge exchange ~53 GB at sf100 "
            "(5.3 GB at sf10, linear) exceeds box free disk when "
            "UNPRUNED; superseded by the Bloom semi-join reduction — "
            "the pruned form's sf100 row is measured in "
            "SCALE_r09_bloom.json (tools/bloom_bench.py)"
        },
        "queries": {},
    }
    for name in CONTROLS:
        q: dict = {"secs": {}, "secs_all": {}, "shuffle_mb": {}, "input_mb": {}, "spill_mb": {}}
        for sf, s in samples[name].items():
            q["secs"][sf] = round(min(s["secs"]), 3)
            q["secs_all"][sf] = [round(x, 3) for x in s["secs"]]
            q["shuffle_mb"][sf] = mb(statistics.median(b["shuffle_bytes"] for b in s["bytes"]))
            q["input_mb"][sf] = mb(statistics.median(b["input_bytes"] for b in s["bytes"]))
            q["spill_mb"][sf] = mb(statistics.median(b["spill_bytes"] for b in s["bytes"]))
            disk = statistics.median(b["disk_spill_bytes"] for b in s["bytes"])
            if disk:
                q.setdefault("disk_spill_mb", {})[sf] = mb(disk)
        if q["secs"]["sf10"] > 0:
            q["factor_1000x"] = round(q["secs"]["sf100"] / q["secs"]["sf10"], 2)
            if q["shuffle_mb"]["sf10"] > 0:
                q["shuffle_factor_1000x"] = round(
                    q["shuffle_mb"]["sf100"] / q["shuffle_mb"]["sf10"], 2
                )
        out["queries"][name] = q
    path = os.path.join(repo, "SCALE_r09_sf100.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))


if __name__ == "__main__":
    main()
