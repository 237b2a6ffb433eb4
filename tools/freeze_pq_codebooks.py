#!/usr/bin/env python
"""Regenerate pulsar_internal_spark/operators/pq_frozen.py — the frozen
product-quantization codebooks served by the pq_adc_topk query.

Training recipe mirrors freeze_ivf_centroids.py (seeded, deterministic):
the 64-dim embedding space is split into M=16 contiguous 4-dim subspaces
and each subspace gets its own pyspark.ml KMeans codebook (k=16,
seed=42+j, maxIter=8, initMode=random) trained on the sf0.1 embeddings'
subvectors (5000 vectors — the larger offline training sample; serving
correctness never depends on where the frozen constants came from).

Sizing rationale: M=16 x 4-bit codes = 8 bytes per vector, 32x below the
256-byte float32 row. The coarser M=8/KSUB=8 variant measured only
~0.4 recall@5 on this fixture vs ~0.86 for this one at shortlist 50.

Run only if the embeddings fixture itself changes; the committed
constants are otherwise stable by construction.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

M = 16  # subspaces
DSUB = 4  # dims per subspace
KSUB = 16  # codebook entries per subspace (4-bit codes)


def train_codebooks(
    emb,
    m: int = M,
    dsub: int = DSUB,
    ksub: int = KSUB,
    seed_base: int = 42,
    max_iter: int = 8,
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """The committed PQ training recipe as a callable: per-subspace
    seeded KMeans over an embedding frame, returning CODEBOOKS[j][c]
    (6-dp rounded, same as the frozen module). Used by main() to
    regenerate pq_frozen.py and by the re-train cutover drill
    (OPERATIONS.md runbook step 1) to train era-2 codebooks on a
    CURRENT sample."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    books = []
    for j in range(m):
        lo = j * dsub + 1  # F.slice is 1-based
        train = emb.select(
            array_to_vector(
                F.slice(F.col(vec_col).cast("array<double>"), lo, dsub)
            ).alias("_v")
        ).coalesce(1)
        km = KMeans(
            k=ksub, seed=seed_base + j, maxIter=max_iter, initMode="random",
            featuresCol="_v", predictionCol="code",
        )
        model = km.fit(train)
        book = [[round(float(x), 6) for x in c] for c in model.clusterCenters()]
        # MLlib KMeans can return FEWER than k centers on small or
        # degenerate samples (duplicate random seeds collapse) — a
        # ragged book crashes pq_encode's unrolled element_at with an
        # out-of-bounds index. Pad by repeating the last center:
        # duplicate centers tie in the argmin and ties break to the
        # smaller code deterministically, so the padding is
        # semantics-free.
        while len(book) < ksub:
            book.append(book[-1])
        books.append(book)
    return books


def main() -> None:
    from pulsar_internal_spark.session import get_spark

    spark = get_spark(app_name="freeze_pq_codebooks")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    books = train_codebooks(emb)

    hdr = '''"""Frozen product-quantization codebooks (round 7).

M=16 contiguous 4-dim subspaces over the 64-dim embeddings fixture, each
with a 16-entry codebook (4-bit codes) trained OFFLINE with the seeded
per-subspace KMeans recipe in tools/freeze_pq_codebooks.py and frozen
here to 6 decimals. Same serving shape as operators/ivf_frozen: the
quantizer is trained once on a sample and SERVED as plan constants,
which is both the realistic 100 TB deployment (codebooks are tiny and
ship with the plan; the corpus scan touches only the 8-byte codes) and
what makes the pq_adc_topk query value-oracle-checkable — query and
DuckDB oracle replay encoding, ADC table lookups and the exact re-rank
over the same literals.

Regenerate (only if the embeddings fixture itself changes):
  python tools/freeze_pq_codebooks.py
"""

from __future__ import annotations

M = 16
DSUB = 4
KSUB = 16

# CODEBOOKS[j][c] = the 4-dim center c of subspace j
CODEBOOKS: list[list[list[float]]] = [
'''
    rows = []
    for j, book in enumerate(books):
        rows.append(f"    [  # subspace {j}")
        for c in book:
            rows.append("        [" + ", ".join(str(x) for x in c) + "],")
        rows.append("    ],")
    src = hdr + "\n".join(rows) + "\n]\n"
    path = os.path.join(
        REPO, "pulsar_internal_spark", "operators", "pq_frozen.py"
    )
    with open(path, "w") as f:
        f.write(src)
    print(f"wrote {path} ({len(src)} bytes)")


if __name__ == "__main__":
    main()
