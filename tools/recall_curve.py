#!/usr/bin/env python
"""Record ANN recall-vs-knob curves on clustered vs near-random
geometry (VERDICT r8 #5) — writes RECALL_r09.json.

Round 8 characterized IVF/IVFPQ recall only on the driver's near-random
embeddings (pairwise cosine ~0.2): there, coarse cells carry almost no
neighborhood signal, so recall@5 ~0.6 at nprobe=3/8 is the worst-case
FLOOR, and extrapolating tuning guidance from it overstates the probing
cost. Real corpora are clustered. This tool measures the curves an
operator actually tunes on:

- geometries: `random` = the sf0.1 driver fixture; `clustered` = the
  seeded mixture-of-Gaussians twin (tools/gen_clustered_embeddings.py,
  within-cluster cosine ~0.8, same n/dim/schema); `overlapping` = the
  same generator at sigma=2.0 / 4 broad clusters over 8 cells —
  separated OR tight-overlapping clusters pin IVF recall at 1.0 for
  any nprobe (cluster-mates stay co-celled), so the non-degenerate
  nprobe curve needs clusters broader than cells, where KMeans splits
  each cluster and neighborhoods straddle cell boundaries.
- quantizers are trained PER GEOMETRY with the exact committed recipes
  (freeze_ivf_centroids: KMeans k=8 seed=42 maxIter=4 initMode=random;
  freeze_pq_codebooks: per-subspace KMeans k=16 seed=42+j maxIter=8) —
  a quantizer trained on the other geometry would measure drift, not
  tuning (that failure mode has its own monitor: pq_residuals).
- curves: IVF recall@5 vs nprobe; PQ-ADC recall@5 vs shortlist;
  IVFPQ recall@5 vs nprobe at shortlist=50. Ground truth is the exact
  brute-force cosine top-5 (self-excluded) over the SAME query set the
  registry queries use (vec_id % 100 = 0 -> Q=20 at n=2000).

All serving paths are the frozen-constant fixed_topk forms — the same
code the registry queries serve, just with the per-geometry constants
passed as arguments. Deterministic end to end (seeded kmeans, seeded
fixture), so the artifact is reproducible at HEAD.

Run: python tools/recall_curve.py    (~2-4 min on local[32])

Production-scale re-run (round 10 — curve stability vs n): the n=2,000
curves drive the OPERATIONS tuning guidance but sit two orders below
the corpora the knobs target. Env knobs rerun the identical
methodology at 100x:
  SPARK_GRAFT_RECALL_OUT=RECALL_r10_200k.json \
  SPARK_GRAFT_RECALL_QMOD=1000 \
  SPARK_GRAFT_RECALL_GEOMS="random=.scale/sf10,clustered=.scale/clustered_200k,overlapping=.scale/clustered_overlap_200k" \
  python tools/recall_curve.py
(clustered fixtures: tools/gen_clustered_embeddings.py --n 200000
[--sigma 2.0 --k 4 --seed 13]; QMOD=1000 keeps the exact brute-force
ground truth at 200 queries x 200k corpus — the sample_mod idea.)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.ml.clustering import KMeans  # noqa: E402
from pyspark.ml.functions import array_to_vector  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pulsar_internal_spark.operators import similarity as sim  # noqa: E402
from pulsar_internal_spark.session import get_spark  # noqa: E402

NPROBES = [1, 2, 3, 4, 6, 8]
SHORTLISTS = [10, 25, 50, 100, 200]
K = 5

M, DSUB, KSUB = 16, 4, 16  # the committed PQ sizing (pq_frozen.py)


def train_centroids(emb) -> list[list[float]]:
    """freeze_ivf_centroids.py recipe, verbatim."""
    train = emb.select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias("_v")
    ).coalesce(1)
    km = KMeans(
        k=8, seed=42, maxIter=4, initMode="random",
        featuresCol="_v", predictionCol="cell",
    )
    return [
        [round(float(x), 6) for x in c]
        for c in km.fit(train).clusterCenters()
    ]


def train_codebooks(emb) -> list[list[list[float]]]:
    """freeze_pq_codebooks.py recipe, verbatim."""
    books = []
    for j in range(M):
        train = emb.select(
            array_to_vector(
                F.slice(F.col("embedding").cast("array<double>"), j * DSUB + 1, DSUB)
            ).alias("_v")
        ).coalesce(1)
        km = KMeans(
            k=KSUB, seed=42 + j, maxIter=8, initMode="random",
            featuresCol="_v", predictionCol="code",
        )
        books.append(
            [[round(float(x), 6) for x in c] for c in km.fit(train).clusterCenters()]
        )
    return books


def mean_recall(exact_sets: dict, approx_df) -> float:
    hits = {q: 0 for q in exact_sets}
    for r in approx_df.select("query_id", "neighbor_id").collect():
        if r.neighbor_id in exact_sets.get(r.query_id, ()):
            hits[r.query_id] += 1
    return round(sum(hits.values()) / (K * len(exact_sets)), 4)


def main() -> None:
    spark = get_spark(app_name="recall_curve")
    spark.sparkContext.setLogLevel("ERROR")
    geoms_env = os.environ.get("SPARK_GRAFT_RECALL_GEOMS")
    if geoms_env:
        geometries = {
            name: (p if os.path.isabs(p) else os.path.join(REPO, p))
            for name, p in (
                pair.split("=", 1) for pair in geoms_env.split(",")
            )
        }
    else:
        geometries = {
            "random": "/root/testdata/sf0.1",
            "clustered": os.path.join(REPO, ".scale", "clustered"),
            # round 9 follow-up: the separated mixture pins IVF recall
            # at 1.0 for every nprobe (cells = clusters) — a finding, not
            # a CURVE. Tight-but-overlapping mixtures (sigma 1.2, 16
            # clusters) STILL pin at 1.0: cluster-mates stay co-celled as
            # long as clusters are tighter than cells. The straddle regime
            # needs clusters BROADER than cells — sigma=2.0 over k=4
            # clusters (within-cos ~0.19) makes KMeans split each cluster
            # across cells, and true neighborhoods cross the boundaries:
            #   python tools/gen_clustered_embeddings.py --sigma 2.0 \
            #       --k 4 --seed 13 --out .scale/clustered_overlap
            "overlapping": os.path.join(REPO, ".scale", "clustered_overlap"),
        }
    qmod = int(os.environ.get("SPARK_GRAFT_RECALL_QMOD", "100"))
    out: dict = {"k": K, "query_filter": f"vec_id % {qmod} = 0", "geometries": {}}
    for geom, sf_dir in geometries.items():
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") % qmod == 0)
        exact_sets: dict = {}
        for r in sim.brute_force_topk(emb, queries, k=K).collect():
            exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
        cents = train_centroids(emb)
        books = train_codebooks(emb)
        g: dict = {
            "n": emb.count(),
            "q": len(exact_sets),
            "ivf_recall_vs_nprobe": {},
            "pq_recall_vs_shortlist": {},
            "ivfpq_recall_vs_nprobe_sl50": {},
        }
        for np_ in NPROBES:
            g["ivf_recall_vs_nprobe"][str(np_)] = mean_recall(
                exact_sets, sim.ivf_fixed_topk(emb, queries, cents, k=K, nprobe=np_)
            )
        for sl in SHORTLISTS:
            g["pq_recall_vs_shortlist"][str(sl)] = mean_recall(
                exact_sets,
                sim.pq_fixed_topk(emb, queries, books, k=K, shortlist=sl),
            )
        for np_ in NPROBES:
            g["ivfpq_recall_vs_nprobe_sl50"][str(np_)] = mean_recall(
                exact_sets,
                sim.ivfpq_fixed_topk(
                    emb, queries, cents, books, k=K, nprobe=np_, shortlist=50
                ),
            )
        out["geometries"][geom] = g
        print(geom, json.dumps(g), file=sys.stderr)
    path = os.path.join(
        REPO, os.environ.get("SPARK_GRAFT_RECALL_OUT", "RECALL_r09.json")
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wrote": path}))


if __name__ == "__main__":
    main()
