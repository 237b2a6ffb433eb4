#!/usr/bin/env python
"""Round 11: the perceptual tier's third decade, for real this time —
writes SCALE_r11.json.

Round 10 diagnosed (and round 11 fixed) a FIXTURE bias that blocked
the sf100 image row: group identity `(doc_id // 1e9 + doc_id) % gmod`
is diagonal-biased at sf100 — copy indexes (<= 4999) only reach group
ids 0..~6k of 40,000, so buckets still held up to 2,000 docs and every
scout measured the fixture, not the operator. With the coprime form
`((doc_id // 1e9) * 9973 + doc_id) % gmod` (operators/multimodal.py,
round 11) cluster size is scale-invariant (~125 docs/group at every
decade) and the true-pair arithmetic predicts ~930M candidates for the
3 x 21-bit xwide banding at sf100 — in budget.

This tool is the r10 workflow (scout -> decide -> measure, resumable)
scoped to round 11's queue:

1. RE-SCOUT both image bandings at sf10 + sf100 under the coprime
   grouping (the SCALE_r10.json scouts are stale: they measured the
   additive fixture). Keys are fresh in a fresh artifact; SCALE_r10's
   scouts stay in place as the record of the biased fixture.
2. Measure the image keeper rows the scouts admit: both bandings at
   sf10 (re-measured under the new grouping so factor_10x compares
   like with like), xwide at sf100 (the row the re-band exists for).
   The 4x16 wide banding is EXPECTED to stay refused at sf100 — its
   N^2 x bands / 2^16 random-collision term is grouping-independent.
3. The spans-bucketed sf100 row (r10's deferral: its first attempt
   died in a shared-/tmp disk event) — the round-10 cadence default
   measured at the decade it targets.

Embedding-tier rows are NOT re-run: they are grouping-independent and
SCALE_r10.json already carries their sf10/sf100 measurements.

Run: SPARK_GRAFT_DRIVER_MEM=48g python tools/scale_dedup_r11.py
Skip knob: SPARK_GRAFT_DEDUP_SKIP="name:sf,..." (same as r10).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pulsar_internal_spark.plans.queries import QUERIES  # noqa: E402
from pulsar_internal_spark.session import get_spark  # noqa: E402
from tools.scale_bench import (  # noqa: E402
    StageMetrics,
    _materialize,
    _mb,
    _release_persisted,
)
from tools.scale_dedup_r10 import scout_image_candidates  # noqa: E402

GB = 1 << 30


def spans_bucketed_release(spark, sf_dir):
    """The registered 2-batch bucketed spans workload in its CADENCE
    shape: each batch's spans are staged EAGERLY and the batch's
    staged k-gram occurrence frame is released before the next batch
    — exactly what the streaming twin does per micro-batch (emit the
    spans sink, release_staged). The r10 tool's form kept BOTH
    batches' staged k-gram frames alive until the final union
    materialized; at sf100 that is ~2 x 21 GB of staged occurrence
    blocks + the 15 GB catalog table + the append shuffles
    concurrently — measured 100% disk on this box's ~74 GB of scratch
    (the round-11 first attempt). Peak scratch here is ONE batch's
    k-grams + table + shuffle; the spans frames are interval rows,
    negligible. Same semantics, same store, same joins — only the
    lifetime of intermediates changes."""
    from pulsar_internal_spark.operators import span_store as SS
    from pulsar_internal_spark.sources.tables import load_table
    from pulsar_internal_spark.staging import (
        persistent_rdd_ids,
        release_staged,
        stage,
    )

    import uuid as _uuid

    docs = load_table(spark, sf_dir, "documents")
    table = f"kg_scale_{_uuid.uuid4().hex[:10]}"
    spark._scale_tmp = table
    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    cut = mx // 2
    batches = [
        docs.filter(F.col("doc_id") <= cut),
        docs.filter(F.col("doc_id") > cut),
    ]
    parts = []
    for bid, b in enumerate(batches):
        b0 = persistent_rdd_ids(spark)
        raw = SS.incremental_substring_spans_bucketed(
            spark, b, table, batch_id=bid
        )
        b1 = persistent_rdd_ids(spark)          # b1 - b0 = this batch's kg
        parts.append(stage(raw))                 # eager: spans computed NOW
        release_staged(spark, keep=b0 | (persistent_rdd_ids(spark) - b1))
    out = parts[0].unionByName(parts[1])
    return out.select(
        "doc_id",
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
    )


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sfs = os.environ.get("SPARK_GRAFT_DEDUP_SFS", "sf10,sf100").split(",")
    sf_dirs = {sf: os.path.join(repo, ".scale", sf) for sf in sfs}
    for sf, d in sf_dirs.items():
        if not os.path.isdir(d):
            sys.exit(f"{sf} fixture missing at {d} (gen_scale_fixture.py)")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "1"))
    cand_budget = float(
        os.environ.get("SPARK_GRAFT_IMAGE_CAND_BUDGET", "1.5e9")
    )

    spark = get_spark(
        app_name="pulsar_internal_spark_scale_dedup_r11",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
            # staged frames at this tier are tens of GB (the sf100
            # candidate-pair frame); the deserialized default OOMed a
            # 48g heap on re-read (BlockManager pulling a disk block
            # back as row objects) — disk_only keeps staged blocks off
            # the heap entirely, heap stays execution-only
            "spark.pulsar.stage.level": "disk_only",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # SPARK_GRAFT_PAIRS_PARTITIONS > 0 pins the banded pair-producing
    # stages' task count (spark.pulsar.pairs.partitions — see
    # SPILL_DIAG_imgxwide_sf100_pairs512.json: sf100 xwide keepers
    # 1,482.8 -> 667.1 s, 95.6 GB spill -> zero, at =512). Default off
    # so rows stay comparable with earlier artifacts unless asked.
    _pp = os.environ.get("SPARK_GRAFT_PAIRS_PARTITIONS", "0")
    if int(_pp or 0) > 0:
        spark.conf.set("spark.pulsar.pairs.partitions", _pp)
    warm = "/root/testdata/sf0.001"
    for q in ("class_filter_scan", "multimodal_real_decode"):
        _materialize(QUERIES[q](spark, warm))
    _release_persisted(spark)
    metrics = StageMetrics(spark)

    path = os.path.join(repo, "SCALE_r11.json")
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
        out.setdefault("scouts", {})
        out.setdefault("decisions", {})
        out.setdefault("queries", {})
    else:
        out = {
            "runs": n_runs,
            "wall_stat": "min of passes; secs_all = raw passes",
            "grouping": "coprime (doc_id // 1e9 * 9973 + doc_id) % gmod — "
                        "round 11; SCALE_r10.json scouts record the biased "
                        "additive fixture this replaces",
            "image_candidate_budget": cand_budget,
            "embedding_tier": "not re-run (grouping-independent); see "
                              "SCALE_r10.json",
            "scouts": {},
            "decisions": {},
            "queries": {},
        }

    def save() -> None:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)

    def measure(name: str, run, sf: str, sf_dir: str) -> None:
        rec = out["queries"].setdefault(
            name,
            {"secs": {}, "secs_all": {}, "shuffle_mb": {}, "input_mb": {},
             "spill_mb": {}, "disk_spill_mb": {}},
        )
        if sf in rec["secs"]:
            print(f"skip {name} {sf}: already measured", flush=True)
            return
        if f"{name}:{sf}" in os.environ.get("SPARK_GRAFT_DEDUP_SKIP", "").split(","):
            print(f"skip {name} {sf}: SPARK_GRAFT_DEDUP_SKIP", flush=True)
            return
        secs, byts = [], []
        for _ in range(n_runs):
            before = metrics.snapshot()
            t0 = time.perf_counter()
            _materialize(run(spark, sf_dir))
            secs.append(round(time.perf_counter() - t0, 3))
            byts.append(metrics.diff(before))
            tmp = getattr(spark, "_scale_tmp", None)
            if tmp:
                spark.sql(f"DROP TABLE IF EXISTS {tmp}")
                spark._scale_tmp = None
            _release_persisted(spark)
        med = {k: statistics.median(b[k] for b in byts) for k in byts[0]}
        rec["secs"][sf] = min(secs)
        rec["secs_all"][sf] = secs
        rec["shuffle_mb"][sf] = _mb(med["shuffle_bytes"])
        rec["input_mb"][sf] = _mb(med["input_bytes"])
        rec["spill_mb"][sf] = _mb(med["spill_bytes"])
        rec["disk_spill_mb"][sf] = _mb(med["disk_spill_bytes"])
        print(name, sf,
              {k: rec[k][sf] for k in ("secs", "shuffle_mb", "spill_mb",
                                       "disk_spill_mb")},
              flush=True)
        save()

    for sf, d in sf_dirs.items():
        scouts = out["scouts"].setdefault(sf, {})
        decisions = out["decisions"].setdefault(sf, {})

        # ---- fresh coprime-grouping scouts, both bandings
        if "image_wide" not in scouts:
            scouts["image_wide"] = scout_image_candidates(spark, d, 16)
            _release_persisted(spark)
            save()
        if "image_xwide" not in scouts:
            scouts["image_xwide"] = scout_image_candidates(spark, d, 21)
            _release_persisted(spark)
            save()
        decisions["image"] = {
            "wide_4x16_runs": scouts["image_wide"]["candidates"] <= cand_budget,
            "xwide_3x21_runs": scouts["image_xwide"]["candidates"] <= cand_budget,
            "candidate_budget": cand_budget,
        }
        save()
        print(sf, "scouts:",
              {k: scouts[k]["candidates"] for k in ("image_wide", "image_xwide")},
              flush=True)

        if decisions["image"]["wide_4x16_runs"]:
            measure("image_near_dup_wide_keepers",
                    QUERIES["image_near_dup_wide_keepers"], sf, d)
        if decisions["image"]["xwide_3x21_runs"]:
            measure("image_near_dup_xwide_keepers",
                    QUERIES["image_near_dup_xwide_keepers"], sf, d)

        # ---- the r10-deferred spans-bucketed row, in its cadence
        # (per-batch release) shape — measured at BOTH decades so the
        # factor compares like with like (SCALE_r10's sf10 row kept
        # all staged frames alive; this form is what a real cadence
        # job does and what the disk can hold at sf100)
        measure(
            "incremental_substring_spans_bucketed",
            spans_bucketed_release, sf, d,
        )

    for name, rec in out["queries"].items():
        if "sf10" in rec["secs"] and "sf100" in rec["secs"]:
            if rec["secs"]["sf10"]:
                rec["factor_10x"] = round(
                    rec["secs"]["sf100"] / rec["secs"]["sf10"], 2
                )
            if rec["shuffle_mb"]["sf10"]:
                rec["shuffle_factor_10x"] = round(
                    rec["shuffle_mb"]["sf100"] / rec["shuffle_mb"]["sf10"], 2
                )
    save()
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
