"""Incremental mergeable sketches: a persisted count-min store fed by
batches, served by cell-wise merge.

Count-min cells are plain SUMs, so the sketch MERGES additively: the
sketch of a union is the cell-wise sum of the sketches of its parts.
That single property gives the whole incremental story for free — each
ingest batch is sketched ONCE (per-batch cells written under its
batch_id, idempotently), and serving reads sum the cells — no batch
ever re-reads another batch's tokens. Mirrors the layout and
exactly-once contract of signature_store.py (hive-partitioned by
batch_id; dynamic partition overwrite makes a retried streaming batch
replace its own partition), grown from the reference's incremental
memo idiom (script.hpp:127-129: compute once, look up thereafter).

Scale posture: a batch's sketch is d*w cells regardless of batch size;
the store grows by d*w rows per batch and compacts back to d*w total
(compact_sketch_store — additively lossless, property-tested). Serving
aggregates #batches * d * w rows: trivial at any corpus size, which is
the entire point of sketching.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

CELL_SCHEMA = "r INT, bucket BIGINT, cell BIGINT, batch_id INT"


def bucket_expr(r_col: Column, token_col: Column) -> Column:
    """Deterministic bucket in [0, 256): first byte of
    sha256(row || '|' || token) — seedless, engine-portable (the oracle
    reproduces it with hex-nibble arithmetic), and independent across
    the d rows because the row index is part of the preimage."""
    return F.conv(
        F.substring(
            F.sha2(F.concat(r_col.cast("string"), F.lit("|"), token_col), 256), 1, 2
        ),
        16,
        10,
    ).cast("long")


def countmin_cells(
    tokens_df: DataFrame, token_col: str = "w", *, depth: int = 4
) -> DataFrame:
    """Sketch a token-occurrence DataFrame (one row per occurrence)
    into (r, bucket, cell) counts — d x 256 cells, built by ONE
    partial-aggregated groupBy over the token-frequency table (by
    additivity, identical to per-occurrence updates, but the hot-token
    combine happens map-side)."""
    counts = tokens_df.groupBy(token_col).agg(F.count(F.lit(1)).alias("_c"))
    keyed = counts.select(
        F.col(token_col).alias("_w"),
        "_c",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
    ).withColumn("bucket", bucket_expr(F.col("r"), F.col("_w")))
    return keyed.groupBy("r", "bucket").agg(F.sum("_c").cast("long").alias("cell"))


def append_sketch_batch(
    spark: SparkSession,
    tokens_df: DataFrame,
    store_path: str,
    *,
    batch_id: int | None = None,
    token_col: str = "w",
    depth: int = 4,
) -> int:
    """Sketch ``tokens_df`` and write its cells under ``batch_id``
    (next sequential id when None). Dynamic partition overwrite on an
    explicit batch_id = idempotent retry, the foreachBatch contract."""
    from .signature_store import _read_store

    if batch_id is None:
        existing = _read_store(spark, store_path)
        batch_id = (
            0
            if existing is None
            else existing.select(F.max("batch_id")).first()[0] + 1
        )
    cells = countmin_cells(tokens_df, token_col, depth=depth).withColumn(
        "batch_id", F.lit(batch_id).cast("int")
    )
    (
        cells.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(store_path)
    )
    return batch_id


def serve_sketch(spark: SparkSession, store_path: str) -> DataFrame:
    """The merged sketch: cell-wise sum over every batch partition."""
    return (
        spark.read.parquet(store_path)
        .groupBy("r", "bucket")
        .agg(F.sum("cell").cast("long").alias("cell"))
    )


def estimate_counts(
    sketch_df: DataFrame, candidates_df: DataFrame, token_col: str, *, depth: int = 4
) -> DataFrame:
    """Point estimates for candidate tokens: min over the d cells each
    candidate hashes to (over-estimates only, by construction). The
    candidate side fans out d rows per token and equi-joins the d*256
    cell table — broadcast-sized at any corpus scale."""
    keyed = candidates_df.select(
        F.col(token_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
    ).withColumn("bucket", bucket_expr(F.col("r"), F.col(token_col)))
    return (
        keyed.join(F.broadcast(sketch_df), ["r", "bucket"])
        .groupBy(token_col)
        .agg(F.min("cell").cast("long").alias("cms_estimate"))
    )


def compact_sketch_store(spark: SparkSession, store_path: str) -> None:
    """Fold every batch partition into one: additively lossless (the
    merged cells are what serve_sketch already computes), bounds the
    store at d*w rows however many batches ever landed. Staged through
    a temp dir + atomic swap of the final rename, mirroring the
    signature store's crash posture: the store is either old or new,
    never half.

    MAINTENANCE WINDOW CONTRACT (same as signature_store.compact_store):
    run from the single maintainer, not concurrently with appends — an
    append that lands between the merge read and the swap would vanish
    with the old generation. Readers are safe at any time (they see the
    old or the new directory, never a torn one)."""
    import os
    import shutil
    import uuid

    merged = serve_sketch(spark, store_path).withColumn(
        "batch_id", F.lit(0).cast("int")
    )
    tmp = f"{store_path}.compact-{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").partitionBy("batch_id").parquet(tmp)
    old = f"{store_path}.old-{uuid.uuid4().hex[:8]}"
    os.rename(store_path, old)
    os.rename(tmp, store_path)
    shutil.rmtree(old, ignore_errors=True)
