#!/usr/bin/env python
"""Interleaved same-window A/B for named queries under different
runtime confs (guide §1: measure first; VERDICT r11 §9: cross-window
normalized claims are not evidence on this box — the ONLY accepted
evidence is interleaved medians from one window).

Each pass times every (query, variant) cell once, variants rotated
INSIDE the pass, so a host CPU-steal burst lands on all variants
equally; the median over passes is reported per cell.

Usage:
  python tools/ab_bench.py \
      --var default:spark.pulsar.stage.level=default \
      --var ser:spark.pulsar.stage.level=memory_disk_ser \
      --passes 5 -- winnowing_matches substring_scrub
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pulsar_internal_spark.plans.queries import QUERIES  # noqa: E402
from pulsar_internal_spark.session import get_spark  # noqa: E402
from pulsar_internal_spark.staging import release_staged  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--var",
        action="append",
        required=True,
        help="name:key=val[,key=val...] (empty conf: 'name:')",
    )
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    variants: dict[str, dict[str, str]] = {}
    for v in args.var:
        name, _, confs = v.partition(":")
        d: dict[str, str] = {}
        if confs:
            for kv in confs.split(","):
                k, _, val = kv.partition("=")
                d[k] = val
        variants[name] = d

    spark = get_spark(app_name="ab_bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warmups in bench.py's pattern: JVM/codegen/worker-pool startup
    # must not land on the first measured cell
    warm_sf = "/root/testdata/sf0.001"
    for w in ("class_filter_scan", "distinct_users_by_type"):
        QUERIES[w](spark, args.sf_dir).write.mode("overwrite").format("noop").save()
    for q in args.queries:
        QUERIES[q](spark, warm_sf).write.mode("overwrite").format("noop").save()
        release_staged(spark)

    samples: dict[tuple[str, str], list[float]] = {
        (q, v): [] for q in args.queries for v in variants
    }
    defaults = {k: spark.conf.get(k, None) for d in variants.values() for k in d}
    for p in range(args.passes):
        for vname, confs in variants.items():
            for k, val in confs.items():
                spark.conf.set(k, val)
            for q in args.queries:
                t0 = time.perf_counter()
                QUERIES[q](spark, args.sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                samples[(q, vname)].append(time.perf_counter() - t0)
                release_staged(spark)
            for k in confs:
                if defaults[k] is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, defaults[k])
        print(f"pass {p + 1}/{args.passes} done", file=sys.stderr, flush=True)

    out: dict[str, dict[str, dict[str, float]]] = {}
    for (q, v), ts in samples.items():
        out.setdefault(q, {})[v] = {
            "median": round(statistics.median(ts), 3),
            "min": round(min(ts), 3),
            "all": [round(t, 3) for t in ts],
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
