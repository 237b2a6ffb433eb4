#!/usr/bin/env python
"""Empirical scale-up proof (VERDICT r6 #1): run the heavy-tail queries
at sf0.1 AND at the 10x fixture (tools/gen_scale_fixture.py -> .scale/
sf1.0) and record per-query wall seconds + the sf1.0/sf0.1 scaling
factor. A plan whose cost is ~linear in input lands near 10x WORK at 10x
data; on local[32] with fixed parallelism that bounds wall-clock factor
at ~10 (fixed per-query overhead — session/jobs/codegen reuse, the
driver-side loop rounds in CC/BPE — pulls it BELOW 10). Factors well
above 10 flag super-linear plans (pair-join blowup, window memory,
skew); those get diagnosed, not explained away.

Methodology matches bench.py: noop-sink materialization (full plan
execution, no collect), warmups for JVM/codegen/UDF-pool/MLlib, then
N interleaved passes per sf with the per-query MEDIAN recorded.

Writes SCALE_r07.json at the repo root:
  {"queries": {name: {"sf01": s, "sf10": s, "factor": f}}, ...}
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

# The ~24 heaviest queries from BENCH_r06 (everything >= ~1.5 s at
# sf0.1) + two classic-join controls (q3/q9) as a linear yardstick.
HEAVY = [
    "semantic_dedup_keepers",
    "bpe_encode_tokens",
    "incremental_semantic_pairs",
    "incremental_substring_spans",
    "substring_scrub",
    "dedup_keep_best",
    "user_triangle_counts",
    "incremental_minhash_dedup",
    "audio_near_dup",
    "image_near_dup",
    "video_near_dup",
    "substring_dup_spans",
    "containment_candidates",
    "user_cooccurrence_components",
    "near_dup_clusters",
    "simhash_near_dup",
    "bigram_lm_xent",
    "user_pagerank",
    "ivf_cosine_topk",
    "winnowing_matches",
    "embedding_near_dup",
    "minhash_accuracy_pairs",
    "dedup_scrub_segments",
    "corpus_curation_verdicts",
    "tfidf_top_terms",
    "q21_sole_late_supplier",
    "q3_shipping_priority",
    "q9_nation_year_revenue",
]


def _materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf10 = os.environ.get(
        "SPARK_GRAFT_SF10_DIR", os.path.join(repo, ".scale", "sf1.0")
    )
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    spark = get_spark(app_name="pulsar_internal_spark_scale_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup set as bench.py: JVM, codegen units for the n-gram/HOF
    # family, the UDF worker pool, MLlib classes, the CC loop, and the
    # mapInPandas decode path
    warm = "/root/testdata/sf0.001"
    for q in (
        "class_filter_scan",
        "distinct_users_by_type",
        "blake2_lookalike_nation",
        "ivf_cosine_topk",
        "benchmark_contamination",
        "near_dup_jaccard",
        "near_dup_clusters",
        "multimodal_real_decode",
    ):
        _materialize(QUERIES[q](spark, warm))

    samples: dict[str, dict[str, list[float]]] = {
        n: {"sf01": [], "sf10": []} for n in HEAVY
    }
    for r in range(n_runs):
        for name in HEAVY:
            for key, d in (("sf01", sf01), ("sf10", sf10)):
                t0 = time.perf_counter()
                _materialize(QUERIES[name](spark, d))
                samples[name][key].append(time.perf_counter() - t0)
            print(
                f"pass {r + 1}/{n_runs} {name}: "
                f"sf0.1={samples[name]['sf01'][-1]:.2f}s "
                f"sf1.0={samples[name]['sf10'][-1]:.2f}s",
                file=sys.stderr,
                flush=True,
            )

    out = {"queries": {}, "runs": n_runs, "sf01_dir": sf01, "sf10_dir": sf10}
    for name in HEAVY:
        a = round(statistics.median(samples[name]["sf01"]), 3)
        b = round(statistics.median(samples[name]["sf10"]), 3)
        out["queries"][name] = {
            "sf01": a,
            "sf10": b,
            "factor": round(b / a, 2) if a > 0 else None,
        }
    out["total_sf01"] = round(sum(v["sf01"] for v in out["queries"].values()), 2)
    out["total_sf10"] = round(sum(v["sf10"] for v in out["queries"].values()), 2)
    path = os.path.join(repo, "SCALE_r07.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))


if __name__ == "__main__":
    main()
