#!/usr/bin/env python
"""Bloom semi-join reduction payoff — writes SCALE_r09_bloom.json.

Measures user_triangle_counts with the wedge-closure Bloom prune OFF
vs ON (operators/bloomjoin, default 8 bits/key) at sf1.0 and sf10, so
the shuffle cut is a recorded before/after on the SAME session and
fixture, not an argument. The quantity that matters is shuffle bytes:
the wedge exchange is the query's scale ceiling (5.3 GB at sf10,
projected ~53 GB at sf100 — the SCALE_r09_sf100 skip this operator
exists to remove).

Methodology = tools/scale_bench.py: noop-sink materialization, warmup
pass, staged-frame release + GC settle between timed windows, min wall
over passes, median bytes. One session for the whole run (the query
pair fits well under the accumulation pathologies that forced
session-per-pass in the full suite).

Run: python tools/bloom_bench.py   (fixtures: .scale/sf1.0, .scale/sf10
events tables — tools/gen_scale_fixture.py --tables events)

Third decade: SPARK_GRAFT_DRIVER_MEM=48g SPARK_GRAFT_BLOOM_SFS=sf100
SPARK_GRAFT_BLOOM_MODES=on_8bits SPARK_GRAFT_BENCH_RUNS=2 — merges the
sf100 row into the existing artifact; off-mode at sf100 is deliberately
not run (its ~53 GB wedge exchange is the thing that does not fit the
box — the reason this operator exists). 12g driver heap OOMs at sf100;
48g matches tools/scale_scout_sf100.py.
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
from tools.scale_bench import (  # noqa: E402
    StageMetrics,
    _materialize,
    _mb,
    _release_persisted,
)

QUERY = "user_triangle_counts"
CONF = "spark.pulsar.triangles.bloomBitsPerKey"


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sfs = os.environ.get("SPARK_GRAFT_BLOOM_SFS", "sf1.0,sf10").split(",")
    sf_dirs = {sf: os.path.join(repo, ".scale", sf) for sf in sfs}
    modes = [
        m
        for m in (("off", "0"), ("on_8bits", "8"))
        if m[0] in os.environ.get("SPARK_GRAFT_BLOOM_MODES", "off,on_8bits")
    ]
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    spark = get_spark(
        app_name="pulsar_internal_spark_bloom_bench",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Optional staging storage-level override (round 11): the sf100
    # triangle spill attribution found 68% of the 100 GB memory spill
    # was staged localCheckpoint blocks held DESERIALIZED on-heap, not
    # the join sorts — SPARK_GRAFT_STAGE_LEVEL=disk_only re-measures
    # under the scale-run posture. Rows produced under an override get
    # a distinct mode label so they merge BESIDE the default rows.
    stage_lvl = os.environ.get("SPARK_GRAFT_STAGE_LEVEL")
    if stage_lvl:
        spark.conf.set("spark.pulsar.stage.level", stage_lvl)
    # SPARK_GRAFT_BLOOM_CONF="k=v,k=v": extra session confs, recorded
    # per-row — how the advisory-partition-size fix is re-measured in
    # bench shape (SPILL_DIAG_triangle_sf100_adv16m.json names why)
    conf_overrides = {}
    for kv in os.environ.get("SPARK_GRAFT_BLOOM_CONF", "").split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            conf_overrides[k.strip()] = v.strip()
            spark.conf.set(k.strip(), v.strip())
    # warmup: run the query itself once at sf0.001 (JVM + codegen)
    _materialize(QUERIES[QUERY](spark, "/root/testdata/sf0.001"))
    _release_persisted(spark)
    metrics = StageMetrics(spark)

    path = os.path.join(
        repo, os.environ.get("SPARK_GRAFT_BLOOM_OUT", "SCALE_r09_bloom.json")
    )
    if os.path.exists(path):
        # merge new SF/mode rows into an earlier run's artifact (the
        # sf100 pass runs separately from the sf1.0/sf10 before/after).
        # n_runs is recorded PER ROW below — never overwrite any
        # top-level count, which would misrecord how many passes
        # produced previously-merged rows.
        with open(path) as f:
            out = json.load(f)
    else:
        out = {
            "query": QUERY,
            "conf": CONF,
            "wall_stat": "min of passes; secs_all = raw passes; "
            "runs recorded per mode/sf row",
            "modes": {},
        }
    label = os.environ.get("SPARK_GRAFT_BLOOM_LABEL")
    for mode, bits in modes:
        spark.conf.set(CONF, bits)
        if label:
            mode = f"{mode}_{label}"
        elif stage_lvl:
            mode = f"{mode}_stage_{stage_lvl}"
        out["modes"].setdefault(mode, {})
        for sf, d in sf_dirs.items():
            if not os.path.isdir(d):
                continue
            secs, byts = [], []
            for _ in range(n_runs):
                before = metrics.snapshot()
                t0 = time.perf_counter()
                _materialize(QUERIES[QUERY](spark, d))
                secs.append(round(time.perf_counter() - t0, 3))
                byts.append(metrics.diff(before))
                _release_persisted(spark)
            med = {
                k: statistics.median(b[k] for b in byts) for k in byts[0]
            }
            out["modes"][mode][sf] = {
                "runs": n_runs,
                "secs": min(secs),
                "secs_all": secs,
                "shuffle_mb": _mb(med["shuffle_bytes"]),
                "input_mb": _mb(med["input_bytes"]),
                "spill_mb": _mb(med["spill_bytes"]),
                "disk_spill_mb": _mb(med["disk_spill_bytes"]),
            }
            if conf_overrides:
                out["modes"][mode][sf]["conf_overrides"] = conf_overrides
            print(mode, sf, out["modes"][mode][sf], flush=True)
    for sf in sf_dirs:
        on = out["modes"].get("on_8bits", {}).get(sf)
        off = out["modes"].get("off", {}).get(sf)
        if on and off and on["shuffle_mb"]:
            out.setdefault("shuffle_cut", {})[sf] = round(
                off["shuffle_mb"] / on["shuffle_mb"], 2
            )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
