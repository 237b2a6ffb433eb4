#!/usr/bin/env python
"""Generate a CLUSTERED embedding fixture — seeded mixture of Gaussians
(VERDICT r8 #5).

The driver's embeddings fixture is near-random (pairwise cosine ~0.2),
which is the PATHOLOGICAL geometry for IVF-style pruning: cell
membership carries almost no neighborhood information, so recall vs
nprobe there is the worst-case floor (0.61/0.58 at nprobe=3 of 8,
SCALE/OPERATIONS round 8). Real corpora are clustered — embeddings of
near-duplicate or same-topic content concentrate — and operators tune
nprobe/shortlist on THAT geometry. This tool generates the clustered
twin so tools/recall_curve.py can record recall-vs-knob curves on both.

Model: k isotropic Gaussian components on the unit sphere. Component
centers are unit-normalized standard normals; a member = unit-normalized
(center + sigma * noise). sigma controls cluster tightness: with
sigma=0.5 the expected within-cluster cosine is ~1/(1+sigma^2) ~ 0.8
and cross-cluster cosine stays ~0 (random 64-dim directions), i.e. a
corpus where ~true neighbors share a component. Deterministic
(numpy default_rng(seed)); schema mirrors the driver fixture exactly
(vec_id BIGINT, embedding FLOAT[], label INT = component), so every
embedding-table operator reads it unchanged.

Run: python tools/gen_clustered_embeddings.py   # .scale/clustered/
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def generate(n: int, dim: int, k: int, sigma: float, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, k, size=n)
    # sigma is the noise VECTOR norm relative to the unit center, so
    # scale the per-dimension draw by sigma/sqrt(dim): within-cluster
    # cosine then concentrates near 1/(1+sigma^2), independent of dim
    noise = rng.standard_normal((n, dim)) * (sigma / np.sqrt(dim))
    vecs = centers[labels] + noise
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [row.astype(np.float32) for row in vecs],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int32)),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)  # = sf0.1 corpus size
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--k", type=int, default=8)  # = the IVF cell count
    ap.add_argument("--sigma", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument(
        "--out", default=os.path.join(REPO, ".scale", "clustered")
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    table = generate(args.n, args.dim, args.k, args.sigma, args.seed)
    path = os.path.join(args.out, "embeddings.parquet")
    pq.write_table(table, path)
    # quick geometry report so the fixture's claim is checkable inline
    vecs = np.stack(table["embedding"].to_pylist())
    labels = np.asarray(table["label"])
    k = args.k
    within, cross = [], []
    rng = np.random.default_rng(1)
    idx = rng.integers(0, args.n, size=(2000, 2))
    for a, b in idx:
        if a == b:
            continue
        c = float(vecs[a] @ vecs[b])
        (within if labels[a] == labels[b] else cross).append(c)
    print(
        f"wrote {path}: n={args.n} dim={args.dim} k={k} sigma={args.sigma} "
        f"within-cos~{np.mean(within):.3f} cross-cos~{np.mean(cross):.3f}"
    )


if __name__ == "__main__":
    main()
