"""Similarity search over embedding columns (array<float>).

Driver-mandated extension (SURVEY.md §7 Phase 4). Two paths:

  - brute_force_topk: exact cosine top-k. The query set is broadcast
    (small by contract); the corpus side streams through one narrow stage
    — dot products via JVM higher-order functions (zip_with/aggregate),
    no Python in the loop. Top-k per query via window row_number. At
    100 TB the corpus scan is embarrassingly parallel; the only shuffle is
    the per-query top-k, keyed by query id (bounded fan-in).

  - lsh_bucketed_topk: approximate path — random-hyperplane (sign) LSH
    computed with deterministic sha2-derived planes; candidates are pairs
    sharing a bucket, then exact cosine re-rank within buckets. Trades
    recall for pruning the cross product; bucket skew handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import spread


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector (excluding self-matches).
    Returns (query_id, neighbor_id, cos_sim, rank)."""
    # Norms are per-vector, so compute them once per side BEFORE the join
    # (inside the join they'd be re-derived for every (query, neighbor)
    # pair). spread(): cosine scoring is compute-bound, partition by cores.
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("cn", _norm(F.col("cv")))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _plane_weights(p: int, dim: int) -> list[float]:
    """±1 weight for plane p, dimension d = parity of the first hex nibble
    of sha256(f"{p}:{d}"). Computed driver-side with hashlib — the weights
    are plan constants, so baking them in as literals keeps the expression
    tree tiny (the sha2-expression form made Catalyst analyze/codegen a
    512-node subtree per signature)."""
    import hashlib

    return [
        1.0
        if int(hashlib.sha256(f"{p}:{d}".encode()).hexdigest()[0], 16) & 1 == 1
        else -1.0
        for d in range(dim)
    ]


import functools


def _context_key() -> str | None:
    """Cache key component tying memoized Column expressions to the
    LIVE SparkContext: a Column wraps a py4j handle into the context's
    JVM, so a cached one outliving a stop()/recreate cycle would fail
    opaquely on next use. Nothing in this repo bounces sessions
    in-process, but a long-lived driver might — keying on the context's
    applicationId (unique per context lifetime, unlike id() which can
    be reused after GC) makes a recreated context rebuild its literals
    instead."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    return sc.applicationId if sc is not None else None


@functools.lru_cache(maxsize=16)
def _plane_matrix_for(ctx_key, num_planes: int, dim: int):
    # ONE py4j call: a SQL array-of-arrays literal parsed JVM-side.
    # The former F.lit(list-of-lists) expanded into num_planes*dim
    # element-wise py4j round trips — measured 24.6 s of pure
    # Python-side plan build for the 96x64 wide-tier matrix on this
    # box (round 11), landing on whichever query first used each
    # geometry per session. ConstantFolding collapses the parsed
    # CreateArray tree into the SAME single Literal the F.lit form
    # produced (verified plan-identical modulo expression ids), so
    # execution and results are unchanged; weights are exactly ±1.0,
    # so the %r rendering is exact.
    rows = (
        "array(" + ",".join(f"{x!r}D" for x in _plane_weights(p, dim)) + ")"
        for p in range(num_planes)
    )
    return F.expr("array(" + ",".join(rows) + ")")


def _sql_double(x) -> str:
    """A SQL double literal that parses back to EXACTLY this float:
    repr() is the shortest string that round-trips through correctly
    rounded decimal->binary conversion, and the JVM's parseDouble is
    correctly rounded — so the parsed Literal is bit-identical to the
    F.lit(float) it replaces."""
    return f"{float(x)!r}D"


@functools.lru_cache(maxsize=32)
def _centroid_struct_literal_for(ctx_key, cents_key):
    body = ",".join(
        f"named_struct('cell',{i},'centroid',array("
        + ",".join(_sql_double(x) for x in ctr)
        + "))"
        for i, ctr in enumerate(cents_key)
    )
    return F.expr(f"array({body})")


def centroid_struct_literal(centroids):
    """The (cell, centroid) array-of-structs plan literal, built by ONE
    JVM-parsed expression and memoized per (context, values). The
    per-element F.lit form cost ~1.4 s of py4j round trips per QUERY
    INVOCATION at 8 cells x 64 dims (round 11) — pure driver-side plan
    build, re-paid on every call because nothing memoized it. Same
    folded Literal, same execution (see _plane_matrix_for)."""
    return _centroid_struct_literal_for(
        _context_key(), tuple(tuple(float(x) for x in c) for c in centroids)
    )


@functools.lru_cache(maxsize=32)
def _norms_matrix_literal_for(ctx_key, norms_key):
    body = ",".join(
        "array(" + ",".join(_sql_double(x) for x in row) + ")"
        for row in norms_key
    )
    return F.expr(f"array({body})")


def norms_matrix_literal(codebooks):
    """The M x KSUB codebook-entry squared-norm matrix as one
    JVM-parsed literal, memoized per (context, values) — the ADC
    denominator table every PQ serving call folds over. Norms are
    computed driver-side in the same index order as before; only the
    literal's CONSTRUCTION changed (one parse instead of M x KSUB
    py4j round trips)."""
    return _norms_matrix_literal_for(
        _context_key(),
        tuple(
            tuple(float(sum(x * x for x in ctr)) for ctr in book)
            for book in codebooks
        ),
    )


def _plane_matrix(num_planes: int, dim: int):
    """All plane weights as ONE 2-D array literal, MEMOIZED per
    (context, planes, dim) AND built by a single JVM-parsed expression
    (see _plane_matrix_for — the per-element F.lit form cost ~25 s of
    py4j round trips at 96x64). Column objects are unresolved
    expressions, safely reusable across DataFrames within one
    SparkContext, so the cache pays the construction once per context
    (see _context_key). Catalyst constant-folds the tree into a single
    Literal; execution is identical."""
    return _plane_matrix_for(_context_key(), num_planes, dim)


def _projections(vec_col, weights_2d):
    """dot(v, plane) per plane via one transform over the folded weight
    matrix (JVM higher-order functions, no UDF)."""
    return F.transform(
        weights_2d,
        lambda w: F.aggregate(
            F.zip_with(vec_col, w, lambda x, wx: x.cast("double") * wx),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )


def hyperplane_signature(vec_col, num_planes: int = 16, dim: int = 64):
    """Deterministic sign-LSH signature as a bit string.

    Plane p's weight for dimension d is derived from sha256(f"{p}:{d}") —
    mapped to ±1. sign(dot(v, plane)) per plane -> '0'/'1' chars.
    Deterministic, engine-independent, no UDF.
    """
    projs = _projections(vec_col, _plane_matrix(num_planes, dim))
    return F.array_join(
        F.transform(
            projs, lambda p: F.when(p >= 0, F.lit("1")).otherwise(F.lit("0"))
        ),
        "",
    )


def embedding_banded_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes_per_band: int = 6,
    num_bands: int = 2,
    dim: int = 64,
) -> DataFrame:
    """(id, band_idx, band_key) banded sign-LSH signatures over an
    embedding column — the vector-space counterpart of
    dedup.banded_signatures (MinHash over shingles) in EXACTLY the
    store schema: band b's key is the sign bit-string of planes
    [b*planes_per_band, (b+1)*planes_per_band). Feeds the one-shot
    self-join (lsh_blocked_pairs) AND the shared incremental store
    (signature_store.append_banded_batch) — so semantic near-dup gets
    per-batch ingestion, streaming exactly-once, compaction and
    retention from the same tested machinery as MinHash dedup.

    All projections staged once (single folded weight-matrix literal,
    see _plane_matrix), then sliced per band — the signature pipeline
    is evaluated once per row, and Spark's exchange reuse computes it
    once for both sides of a self-join."""
    projs = _projections(
        F.col("_v"), _plane_matrix(num_bands * planes_per_band, dim)
    )
    staged = (
        spread(df)
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("_v"))
        .select("id", projs.alias("_projs"))
    )
    bands = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.array_join(
                F.transform(
                    F.slice("_projs", b * planes_per_band + 1, planes_per_band),
                    lambda p: F.when(p >= 0, F.lit("1")).otherwise(F.lit("0")),
                ),
                "",
            ).alias("band_key"),
        )
        for b in range(num_bands)
    ]
    return (
        staged.select("id", F.explode(F.array(*bands)).alias("_b"))
        .select(
            "id",
            F.col("_b.band_idx").alias("band_idx"),
            F.col("_b.band_key").alias("band_key"),
        )
    )


def lsh_blocked_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes_per_band: int = 6,
    num_bands: int = 2,
    dim: int = 64,
) -> DataFrame:
    """Candidate near-dup pairs from banded sign-LSH — the production
    blocking key (no ground-truth columns anywhere in the plan).

    OR-amplification: band b's signature uses planes
    [b*planes_per_band, (b+1)*planes_per_band); two vectors are
    candidates if ANY band signature matches. Each row explodes to
    num_bands (band_idx, band_key) rows and the self-join is a hash
    equi-join on that pair — sum-of-buckets quadratic, never
    corpus-quadratic; viral buckets fall to AQE skew splitting.
    Returns (id_a, id_b) with id_a < id_b, distinct.
    """
    banded = embedding_banded_signatures(
        df, id_col, vec_col, planes_per_band, num_bands, dim
    )
    # spark.pulsar.pairs.partitions (0 = leave to AQE): same knob and
    # mechanism as dedup.hamming_banded_pairs — AQE sizes the
    # pair-producing stage by the banded frame's INPUT bytes while the
    # self-join explodes orders of magnitude more output, overflowing
    # per-task shuffle-write sorters at the third decade (see
    # SPILL_DIAG_imgxwide_sf100_pairs512.json for the measured fix on
    # the perceptual twin). Explicit keyed repartition is exempt from
    # AQE coalescing; result-exact.
    nparts = int(
        df.sparkSession.conf.get("spark.pulsar.pairs.partitions", "0") or 0
    )
    if nparts > 0:
        banded = banded.repartition(nparts, "band_idx", "band_key")
    a, b2 = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b2,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 4,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means coarse quantizer,
    then exact re-rank inside the ``nprobe`` closest cells per query.

    The 100 TB shape: centroids are trained on a SAMPLE (kmeans over the
    full corpus is unnecessary — cells only need to partition space),
    the corpus is assigned once (narrow map vs a broadcast centroid
    table), and each query scans ~nprobe/num_centroids of the corpus.
    Recall rises with nprobe; nprobe == num_centroids degenerates to
    brute force. Deterministic for a fixed seed.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    # count the raw input (metadata-only for parquet) BEFORE spread():
    # counting through the repartition would execute the exchange.
    n_corpus = corpus.count()
    raw_corpus = corpus
    corpus = spread(corpus)
    with_vec = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_v"),
    )
    # cells only partition space — a few Lloyd iterations suffice; full
    # convergence buys recall nothing nprobe doesn't buy cheaper. Train
    # on a seeded sample: every Lloyd iteration is a full pass over the
    # train set, and a few thousand points pin 16 cells as well as the
    # whole corpus would (at 100 TB a full-corpus fit is off the table).
    # Train lineage deliberately bypasses spread(): kmeans|| init plus
    # every Lloyd pass re-evaluates its input, and the sample is a few
    # thousand points — one partition straight off the raw scan turns
    # each of those ~10 internal jobs into a single task.
    target = max(num_centroids * 128, 2048)
    frac = min(1.0, target / max(n_corpus, 1))
    sampled = raw_corpus if frac >= 1.0 else raw_corpus.sample(False, frac, seed)
    train = sampled.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_v")
    ).coalesce(1)
    # random init: kmeans|| spends ~5 extra passes buying convergence
    # speed that coarse cells don't need
    km = KMeans(
        k=num_centroids, seed=seed, maxIter=max_iter, initMode="random",
        featuresCol="_v", predictionCol="cell",
    )
    model = km.fit(train)
    c = model.transform(with_vec).select(
        "neighbor_id", "cv", F.col("cell"), _norm(F.col("cv")).alias("cn")
    )

    # query -> nprobe nearest cells. The trained centroids are plan
    # CONSTANTS, so inline them as a literal array-of-structs and explode
    # — no createDataFrame round-trip, no broadcast exchange.
    cent_lit = centroid_struct_literal(model.clusterCenters())
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    q_cells = (
        q.select("query_id", "qv", "qn", F.explode(cent_lit).alias("_c"))
        .select("query_id", "qv", "qn", F.col("_c.cell").alias("cell"), F.col("_c.centroid").alias("centroid"))
        .withColumn(
            "dist2",
            F.aggregate(
                F.zip_with(
                    "qv", "centroid", lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        .withColumn(
            "cell_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.asc("dist2"), F.asc("cell"))
            ),
        )
        .filter(F.col("cell_rank") <= nprobe)
        .select("query_id", "qv", "qn", "cell")
    )

    scored = (
        c.join(F.broadcast(q_cells), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_fixed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF SERVING path: the coarse quantizer is pre-trained and arrives
    as frozen constants (operators/ivf_frozen.CENTROIDS — see that
    module for the offline training recipe). This is the realistic
    100 TB deployment shape: centroids are fitted once on a sample and
    then served as plan literals, exactly like sign-LSH serves
    _plane_weights; nothing is trained per query.

    Plan shape: corpus cell assignment is a NARROW map — argmin over the
    inlined centroid literals via array_min of (dist2, cell) structs
    (struct ordering = field order, so ties break to the smaller cell
    deterministically) — no explode, no window, no shuffle. The query
    side sorts the same literal array and keeps the nprobe closest
    cells, then broadcasts onto the assigned corpus; exact cosine +
    per-query top-k (the only shuffle, keyed by query id) finish it.
    Unlike the kmeans twin (ivf_topk), every arithmetic step here is
    expressible in ANSI SQL over the same literals, which is what makes
    the ivf_cosine_topk query value-oracle-checkable."""
    cent_lit = centroid_struct_literal(centroids)

    def d2(vec, cent):
        return F.aggregate(
            F.zip_with(
                vec, cent, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    assigned = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    ).withColumn(
        "cell",
        F.array_min(
            F.transform(
                cent_lit,
                lambda c: F.struct(
                    d2(F.col("cv"), c["centroid"]).alias("d2"),
                    c["cell"].alias("cell"),
                ),
            )
        )["cell"],
    )

    q_cells = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            _norm(F.col(vec_col)).alias("qn"),
        )
        .withColumn(
            "probed",
            F.slice(
                F.array_sort(
                    F.transform(
                        cent_lit,
                        lambda c: F.struct(
                            d2(F.col("qv"), c["centroid"]).alias("d2"),
                            c["cell"].alias("cell"),
                        ),
                    )
                ),
                1,
                nprobe,
            ),
        )
        .select("query_id", "qv", "qn", F.explode("probed").alias("_p"))
        .select("query_id", "qv", "qn", F.col("_p.cell").alias("cell"))
    )

    scored = (
        assigned.join(F.broadcast(q_cells), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _codebook_frame(spark, codebooks: list[list[list[float]]]) -> DataFrame:
    """The tiny (j, c, ctr) codebook relation (M x KSUB rows) the
    per-QUERY table builder broadcasts (Q x M x KSUB rows is trivial).
    The CORPUS-side encode does NOT use this relation any more — see
    pq_encode for the narrow-map argmin and the round-8 scale lesson
    that forced it."""
    rows = [
        (j, c, [float(x) for x in ctr])
        for j, book in enumerate(codebooks)
        for c, ctr in enumerate(book)
    ]
    return spark.createDataFrame(rows, "j INT, c INT, ctr ARRAY<DOUBLE>")


def _books_frame(spark, codebooks: list[list[list[float]]]) -> DataFrame:
    """The M-row (j, _book: KSUB x dsub) per-subspace codebook relation
    the encode broadcast-joins on j. Why a 16-row JOIN and not a nested
    literal: the argmin expression references the book ~8 x KSUB times,
    and CollapseProject inlines an ALIASED literal into every reference
    — a 1024-literal CreateArray tree replicated ~128x made analysis
    alone take ~14 s per plan build (measured). A join output ATTRIBUTE
    is an O(1) reference, so the tree stays small; the build side is 16
    rows, the probe side streams, and there is still no aggregate."""
    rows = [
        (j, [[float(x) for x in ctr] for ctr in book])
        for j, book in enumerate(codebooks)
    ]
    return spark.createDataFrame(rows, "j INT, _book ARRAY<ARRAY<DOUBLE>>")


def _unrolled_d2(sv, ctr, dsub: int):
    """(0.0 + d1*d1) + d2*d2 + ... over sv/ctr item pairs — aggregate's
    fold order, so the DuckDB oracle twins stay bit-identical."""
    s = F.lit(0.0)
    for t in range(dsub):
        d = sv.getItem(t).cast("double") - F.element_at(ctr, t + 1)
        s = s + d * d
    return s


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "codes",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization encode: attach to every row its M codes —
    code j = argmin over codebook j of squared L2 distance between the
    j-th contiguous subvector and the codebook entry (ties to the
    smaller code, deterministically, via array_min over (d2, code)
    structs — struct ordering is field order).

    Shape (round-8 scale lesson): explode each vector to its M
    subvectors, broadcast-join the 16-row per-subspace book relation
    (_books_frame — see it for why a join beats an inlined literal),
    and take the per-(row, subspace) argmin as a NARROW MAP — array_min
    of KSUB small unrolled-d2 structs, ivf_fixed_topk's cell-assign
    discipline. The previous form (broadcast-join the M x KSUB
    relation, then min(struct) over the KSUB-times-larger grain)
    planned the argmin as a SortAggregate — min over a struct has no
    mutable agg buffer, so Spark SORTS the exploded grain: at 200k
    vectors that sort burned ~7,300 CPU-seconds and spilled 14 GB
    memory / 5 GB disk (SCALE_r08 diagnosis), a 13x wall factor at 10x
    data. The narrow map needs no c-explosion and no argmin aggregate:
    per-row expressions stay small (KSUB x dsub = 64 fused
    multiply-adds), so whole-stage codegen keeps them, and the only
    remaining aggregate is the codes collect (ObjectHashAggregate —
    hash-based, measured spill-free). The fold order of each d2 and
    the (d2, code) tie-break are unchanged, so results are
    bit-identical to the old shape and to the DuckDB oracle twins.

    The giant-expression alternatives both still lose (measured in
    round 7): zip_with/aggregate lambdas interpret a closure per
    element (~8 s / 5000 encodes); fully unrolling all M x KSUB
    entries into ONE projection overflows Janino's 64 KB method limit
    and kills codegen for the whole stage (~20 s). The exploded
    (row, subspace) grain with per-row KSUB-way argmin is the sweet
    spot. At 100 TB this runs ONCE at ingest (the serving scan reads
    only the stored codes: M=16 x 4-bit codes replace 64 float32s,
    32x), so even the explode is ingest cost, never probe cost.

    ``id_col`` must be a unique row key — codes are computed at
    (id, subspace) grain and joined back onto ``df``."""
    m, dsub, ksub = len(codebooks), len(codebooks[0][0]), len(codebooks[0])

    sub = df.select(
        F.col(id_col).alias("_pq_id"),
        F.posexplode(
            F.array(*[F.slice(F.col(vec_col), j * dsub + 1, dsub) for j in range(m)])
        ).alias("j", "sv"),
    ).join(F.broadcast(_books_frame(df.sparkSession, codebooks)), "j")
    entries = [
        F.struct(
            _unrolled_d2(
                F.col("sv"), F.element_at(F.col("_book"), c + 1), dsub
            ).alias("d2"),
            F.lit(c).alias("code"),
        )
        for c in range(ksub)
    ]
    best = sub.select(
        "_pq_id", "j", F.array_min(F.array(*entries))["code"].alias("code")
    )
    codes = best.groupBy("_pq_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "code"))),
            lambda x: x["code"],
        ).alias(out_col)
    )
    return df.join(codes, F.col(id_col) == F.col("_pq_id")).drop("_pq_id")


def _pq_query_tables(
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    out_id: str = "query_id",
) -> DataFrame:
    """Per-query ADC lookup tables as DATA, relationally (same engine
    rationale as pq_encode): tables[j][c] = dot(query subvector j,
    codebook entry c), each dot a 4-term unrolled fold in index order
    (0.0 + q1*c1 + ...), assembled into the M x KSUB nested array by
    two ordered collects. Returns (out_id, tables)."""
    m, dsub = len(codebooks), len(codebooks[0][0])
    cb = _codebook_frame(queries.sparkSession, codebooks)
    qsub = queries.select(
        F.col(id_col).alias(out_id),
        F.posexplode(
            F.array(*[F.slice(F.col(vec_col), j * dsub + 1, dsub) for j in range(m)])
        ).alias("j", "sv"),
    )
    dp = F.lit(0.0)
    for t in range(dsub):
        dp = dp + F.col("sv").getItem(t).cast("double") * F.col("ctr").getItem(t)
    qdot = qsub.join(F.broadcast(cb), "j").select(
        out_id, "j", F.struct(F.col("c"), dp.alias("dp")).alias("s")
    )
    qtabj = qdot.groupBy(out_id, "j").agg(
        F.transform(F.array_sort(F.collect_list("s")), lambda x: x["dp"]).alias("tj")
    )
    return qtabj.groupBy(out_id).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "tj"))), lambda x: x["tj"]
        ).alias("tables")
    )


def pq_fixed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN serving (asymmetric distance / ADC):
    the third rung of the approximation ladder after sign-LSH banding
    and IVF probing, and the MEMORY answer at 100 TB — the hot scan
    touches only M=16 4-bit codes per vector, never the floats.

    Phases (all JVM-side; the corpus-side encode broadcast-joins the
    16-row per-subspace book relation — literal inlining was rejected,
    see _books_frame's CollapseProject note — and the query-side table
    builder broadcasts the same M x KSUB relation; see pq_encode for
    the codegen/spill tradeoffs):
      1. encode — pq_encode's narrow-map argmin (offline at real
         scale; in this one-plan demo it runs as its own staged
         subplan);
      2. ADC scan — each query precomputes an M x KSUB lookup table
         (_pq_query_tables: dot of its j-th subvector with every
         codebook entry, summed in index order) plus a shared literal
         table of entry norms; a corpus row's approximate cosine is
         then M table lookups (an unrolled j-ordered fold over its
         codes), no per-pair float math. Queries are broadcast (small
         by contract); per-query shortlist of ``shortlist`` by
         (score desc, id) is the only shuffle, keyed by query id;
      3. exact re-rank — the shortlist (Q x shortlist rows, tiny) is
         broadcast back onto the corpus to fetch TRUE vectors for the
         survivors only; exact cosine, top-``k``. Final scores are
         exact, so approximation affects WHICH candidates are ranked,
         never the reported similarity.

    Every arithmetic step folds in index order over the same literals
    the DuckDB oracle replays, so pq_adc_topk is value-checked
    end-to-end (same discipline as _ivf_oracle_sql)."""
    m = len(codebooks)

    # literal M x KSUB table of codebook-entry squared norms, folded in
    # index order (matches the oracle's list_sum over list_transform)
    norms_lit = norms_matrix_literal(codebooks)

    # NEITHER join input is staged (round 11): each feeds exactly ONE
    # consumer (codes -> the ADC scan join, tables -> its broadcast), so
    # materializing them bought nothing and cost a localCheckpoint pass
    # each — inlining both subplans into the one AQE query measured
    # ~0.4-1.2 s faster per serving query at sf0.1 (median of 5,
    # interleaved), results byte-identical. At real scale the codes
    # frame isn't even computed here: it is the stored index column
    # (ivf_index_adc_topk's layout).
    coded = pq_encode(
        spread(corpus).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        ),
        codebooks,
        vec_col="cv",
        id_col="neighbor_id",
    ).select("neighbor_id", "codes")
    q_tabs = _pq_query_tables(queries, codebooks, id_col, vec_col)

    def lut(tabs):  # unrolled M-term fold in j order (= aggregate's)
        s = F.lit(0.0)
        for j in range(m):
            s = s + F.element_at(
                F.element_at(tabs, j + 1), F.col("codes").getItem(j) + 1
            )
        return s

    adc = (
        coded.join(F.broadcast(q_tabs))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                lut(F.col("tables"))
                / F.sqrt(F.greatest(lut(norms_lit), F.lit(1e-12)))
            ).alias("score"),
        )
    )
    ws = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    short = (
        adc.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= shortlist)
        .select("query_id", "neighbor_id")
    )

    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    rer = (
        cvec.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("cos_sim"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return rer.withColumn("rank", F.row_number().over(wk)).filter(F.col("rank") <= k)


def ivfpq_fixed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 5,
    nprobe: int = 3,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF + PQ combined serving — the classic billion-scale ANN index
    layout (coarse cells prune WHICH vectors are scanned, PQ codes
    prune WHAT the scan reads): corpus rows carry (cell, codes) only;
    a query probes its nprobe closest cells and ADC-scores just those
    cells' codes, so the scan cost is (nprobe/num_cells) of the corpus
    at 8 bytes per row — both prunings compound, which is why this is
    the shape billion-vector deployments actually run.

    Plan: cell assignment is a narrow map over the centroid literals;
    PQ encode is pq_encode's staged relational argmin; the probed-cells
    x ADC-tables query frame is broadcast and joined BY CELL (a keyed
    BroadcastHashJoin — compare pq_fixed_topk's keyless scan of
    everything); per-query shortlist window, then the tiny shortlist
    broadcasts back to fetch true vectors for the exact cosine
    re-rank. Deterministic end to end
    over the same frozen literals the DuckDB twin replays
    (_ivfpq_oracle_sql), so the query is value-checked, not
    recall-checked."""
    m = len(codebooks)

    cent_lit = centroid_struct_literal(centroids)

    def d2(vec, cent):
        return F.aggregate(
            F.zip_with(
                vec, cent, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    norms_lit = norms_matrix_literal(codebooks)

    # the encode subplan and the probed+tables subplan each feed ONE
    # consumer (the cell join / its broadcast), so neither is staged
    # (round 11 — see pq_fixed_topk's note: inlining the single-use
    # subplans into one AQE query beat the localCheckpoint passes by
    # ~0.5-0.9 s per query at sf0.1, results byte-identical; at real
    # scale this frame IS the persisted index — see ivf_index_adc_topk)
    coded = pq_encode(
        spread(corpus).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        ),
        codebooks,
        vec_col="cv",
        id_col="neighbor_id",
    ).withColumn(
        "cell",
        F.array_min(
            F.transform(
                cent_lit,
                lambda c: F.struct(
                    d2(F.col("cv"), c["centroid"]).alias("d2"),
                    c["cell"].alias("cell"),
                ),
            )
        )["cell"],
    ).select("neighbor_id", "cell", "codes")

    q_probe = (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
        .withColumn(
            "probed",
            F.slice(
                F.array_sort(
                    F.transform(
                        cent_lit,
                        lambda c: F.struct(
                            d2(F.col("qv"), c["centroid"]).alias("d2"),
                            c["cell"].alias("cell"),
                        ),
                    )
                ),
                1,
                nprobe,
            ),
        )
        .select("query_id", F.explode("probed").alias("_p"))
        .select("query_id", F.col("_p.cell").alias("cell"))
    )
    q_side = q_probe.join(
        _pq_query_tables(queries, codebooks, id_col, vec_col), "query_id"
    )

    def lut(tabs):  # unrolled M-term fold in j order (= aggregate's)
        s = F.lit(0.0)
        for j in range(m):
            s = s + F.element_at(
                F.element_at(tabs, j + 1), F.col("codes").getItem(j) + 1
            )
        return s

    adc = (
        coded.join(F.broadcast(q_side), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                lut(F.col("tables"))
                / F.sqrt(F.greatest(lut(norms_lit), F.lit(1e-12)))
            ).alias("score"),
        )
    )
    ws = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    short = (
        adc.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= shortlist)
        .select("query_id", "neighbor_id")
    )

    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _norm(F.col(vec_col)).alias("cn"),
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    rer = (
        cvec.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("cos_sim"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return rer.withColumn("rank", F.row_number().over(wk)).filter(F.col("rank") <= k)


def _band_structs(projs_col, planes_per_band: int, num_bands: int):
    """(band_idx, band_key) structs from a staged projection array —
    band b's key is the sign-bit string of planes
    [b*planes_per_band, (b+1)*planes_per_band)."""
    return [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.array_join(
                F.transform(
                    F.slice(projs_col, b * planes_per_band + 1, planes_per_band),
                    lambda p: F.when(p >= 0, F.lit("1")).otherwise(F.lit("0")),
                ),
                "",
            ).alias("band_key"),
        )
        for b in range(num_bands)
    ]


@functools.lru_cache(maxsize=16)
def _band_struct_array_for(ctx_key, planes_per_band: int, num_bands: int):
    return F.explode(
        F.array(*_band_structs(F.col("_projs"), planes_per_band, num_bands))
    )


def _band_struct_array(planes_per_band: int, num_bands: int):
    """Memoized exploded-band expression over the staged ``_projs``
    column — same plan-build-cost and context-keying rationale as
    _plane_matrix (the per-band slice/transform lambdas cost ~0.3 s of
    py4j round-trips per call otherwise)."""
    return _band_struct_array_for(_context_key(), planes_per_band, num_bands)


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes_per_band: int = 8,
    num_bands: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k with banded (OR-amplified) sign-LSH: a corpus
    vector is a candidate for a query if ANY of the ``num_bands`` band
    signatures (``planes_per_band`` sign bits each) matches; candidates
    then get an exact cosine re-rank. The single-signature form this
    replaced (one AND-of-all-planes bucket) had recall@5 ~0.3 at useful
    precision — AND-only amplification can only trade recall down. With
    8x8 banding, genuinely-similar neighbors (cos >= ~0.9) collide in
    some band with probability ~0.99 while random pairs (cos ~0) match
    a band at 0.5^8 = 0.004 — the precision/recall knob is
    (planes_per_band up = fewer false candidates, num_bands up = higher
    recall), pinned by tests/test_operators.py's planted-neighbor gate
    at recall@5 >= 0.8.

    Scale shape: projections are staged ONCE per row over a single
    folded plane-matrix literal (num_bands*planes_per_band planes);
    each side explodes to num_bands narrow (band_idx, band_key) rows;
    the query side is broadcast, so the corpus never shuffles; the
    cross-band duplicate candidates collapse with one distinct at
    (query, neighbor) grain BEFORE the ranking window."""
    n_planes = num_bands * planes_per_band
    projs = _projections(F.col("_v"), _plane_matrix(n_planes, dim))

    def sided(df, idn, vecn, normn):
        staged = df.select(
            F.col(id_col).alias(idn), F.col(vec_col).alias("_v")
        ).select(
            idn,
            F.col("_v").alias(vecn),
            _norm(F.col("_v")).alias(normn),
            projs.alias("_projs"),
        )
        return staged.select(
            idn,
            vecn,
            normn,
            _band_struct_array(planes_per_band, num_bands).alias("_b"),
        ).select(
            idn, vecn, normn,
            F.col("_b.band_idx").alias("band_idx"),
            F.col("_b.band_key").alias("band_key"),
        )

    c = sided(spread(corpus), "neighbor_id", "cv", "cn")
    q = sided(queries, "query_id", "qv", "qn")
    scored = (
        c.join(F.broadcast(q), ["band_idx", "band_key"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("cos_sim"),
        )
        .distinct()  # a pair sharing m bands scores m identical rows
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector int8 quantization: affine-map each vector's range onto
    signed -128..127 codes stored as ARRAY<TINYINT>. Returns (id, codes,
    vmin, scale) — enough to reconstruct x~ = vmin + (code + 128)*scale.

    The ANN scale story: a 64-dim float corpus costs 256 B/vector;
    tinyint codes are byte-per-element in Tungsten's array layout, so
    ~4x more corpus fits in the same broadcast / cache budget (modulo
    the fixed per-array header). Coarse scoring runs on codes; the
    survivors re-rank against full precision (same two-tier shape as
    ivf_topk). All JVM-side higher-order functions, no UDF."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    staged = df.select(
        F.col(id_col),
        v.alias("_v"),
        F.array_min(v).alias("vmin"),
        F.array_max(v).alias("vmax"),
    )
    scale = F.when(
        F.col("vmax") == F.col("vmin"), F.lit(1.0)
    ).otherwise((F.col("vmax") - F.col("vmin")) / F.lit(255.0))
    with_scale = staged.select(
        id_col, "_v", "vmin", scale.alias("scale")
    )
    codes = F.transform(
        F.col("_v"),
        lambda x: (
            F.round((x - F.col("vmin")) / F.col("scale")) - 128
        ).cast("tinyint"),
    )
    return with_scale.select(
        id_col, codes.alias("codes"), "vmin", "scale", "_v"
    )


# -- persisted IVF index: build once, probe many --------------------------


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 4,
    codebooks: list[list[list[float]]] | None = None,
    health_sample_mod: int = 1,
) -> None:
    """Materialize an IVF index: train the coarse quantizer (sampled
    kmeans, same recipe as ivf_topk), assign every corpus vector to its
    cell ONCE, and write

      {path}/centroids/  — (cell, centroid array<double>) — tiny
      {path}/cells/      — pointer-committed generation store (round 7,
                           shared layout with the other stores): the
                           live generation holds (vec_id, embedding,
                           norm) partitioned by (cell, batch_id); the
                           build is batch_id=0
      {path}/health/     — (PQ-carrying only, round 8) one row per
                           ingested batch: sampled mean quantization
                           residual vs the frozen codebooks; batch 0 is
                           the drift baseline (see ivf_index_health)

    The build pays the assignment scan once; every subsequent probe
    reads ONLY its nprobe cell directories (dynamic partition pruning,
    plan-tested) — the serving shape that amortizes at 100 TB, where
    re-deriving cells per query batch (ivf_topk) would rescan the
    corpus. Norms are precomputed into the index so probes never touch
    raw vectors outside the scored cells. The second-level batch_id
    partition exists for the SAME exactly-once contract the signature
    and sketch stores carry: an explicit-batch-id append dynamically
    overwrites only its own (cell, batch_id) leaves, so a replayed
    streaming batch is idempotent (see ivf_index_append /
    streaming_ivf_append); probes ignore the level entirely."""
    import os

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = corpus.sparkSession
    n_corpus = corpus.count()
    target = max(num_centroids * 128, 2048)
    frac = min(1.0, target / max(n_corpus, 1))
    sampled = corpus if frac >= 1.0 else corpus.sample(False, frac, seed)
    train = sampled.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_v")
    ).coalesce(1)
    km = KMeans(
        k=num_centroids, seed=seed, maxIter=max_iter, initMode="random",
        featuresCol="_v", predictionCol="cell",
    )
    model = km.fit(train)

    cent_rows = [
        (i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())
    ]
    spark.createDataFrame(
        cent_rows, "cell INT, centroid ARRAY<DOUBLE>"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "centroids"))

    assigned = model.transform(
        spread(corpus).select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            array_to_vector(F.col(vec_col).cast("array<double>")).alias("_v"),
        )
    ).select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("norm"),
        "cell",
        F.lit(0).cast("int").alias("batch_id"),
    )
    if codebooks is not None:
        # PQ-carrying index: the codebooks are INDEX STATE (written
        # beside the centroids, read back by appends and the ADC
        # probe), and every stored row additionally carries its M
        # codes — the 8-byte column the ADC scan reads INSTEAD of the
        # embedding column, which parquet then never decodes on the
        # scan path (column pruning, plan-tested)
        cb_rows = [
            (j, c, [float(x) for x in ctr])
            for j, book in enumerate(codebooks)
            for c, ctr in enumerate(book)
        ]
        spark.createDataFrame(
            cb_rows, "j INT, c INT, ctr ARRAY<DOUBLE>"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, "codebooks")
        )
        assigned = pq_encode(assigned, codebooks, vec_col="embedding")

    # the cells dir is a pointer-committed generation store (round 7,
    # shared layout with the signature/sketch/span stores): a build is
    # a full (re)create — clear any prior generations, write gen-0,
    # commit the pointer only after the parquet write succeeds
    from . import store_fs
    from .signature_store import _begin_store_write, _commit_store_init

    cells_base = os.path.join(path, "cells")
    store_fs.delete_dir(cells_base, ignore_missing=True)
    root, _ = _begin_store_write(cells_base)
    assigned.write.mode("overwrite").partitionBy("cell", "batch_id").parquet(root)
    _commit_store_init(cells_base)
    if codebooks is not None:
        # batch-0 health row: the codebooks' residual on the BUILD data
        # is the drift baseline every later batch is compared against
        store_fs.delete_dir(os.path.join(path, "health"), ignore_missing=True)
        _write_index_health(
            assigned, path, codebooks, batch_id=0, replace=False,
            sample_mod=health_sample_mod,
        )


def ivf_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a persisted IVF index: rank the stored centroids per query
    (broadcast — the centroid table is tiny), keep each query's nprobe
    nearest cells, then join the cell-partitioned index on ``cell`` so
    DYNAMIC PARTITION PRUNING restricts the scan to the probed cell
    directories — the fraction of the index read per batch is
    nprobe/num_centroids regardless of corpus size, enforced by the
    storage layout rather than a filter over a full scan. Exact cosine
    re-rank inside the probed cells; returns (query_id, neighbor_id,
    cos_sim, rank)."""
    import os

    cents = spark.read.parquet(os.path.join(path, "centroids"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    q_cells = (
        q.join(F.broadcast(cents))
        .withColumn(
            "dist2",
            F.aggregate(
                F.zip_with(
                    "qv", "centroid",
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        .withColumn(
            "cell_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.asc("dist2"), F.asc("cell"))
            ),
        )
        .filter(F.col("cell_rank") <= nprobe)
        .select("query_id", "qv", "qn", "cell")
    )
    from .signature_store import _read_store

    cells = _read_store(spark, os.path.join(path, "cells"))
    if cells is None:
        raise FileNotFoundError(
            f"IVF index {path} has no committed cells generation"
        )
    scored = (
        cells.join(F.broadcast(q_cells), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _dot(F.col("qv"), F.col("embedding")) / (F.col("qn") * F.col("norm")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _read_index_codebooks(spark, path: str) -> list[list[list[float]]] | None:
    """Load a persisted index's PQ codebooks ({path}/codebooks) back
    into the nested-list literal form pq_encode consumes, or None for
    a plain IVF index. The collect is O(M x KSUB) rows (256 for the
    suite's 16x16 config) — driver-side by design: the codebooks must
    become PLAN LITERALS so encode/ADC stay whole-stage-codegen'd."""
    import os

    from . import store_fs

    cb_path = os.path.join(path, "codebooks")
    if not store_fs.is_dir(cb_path):
        return None
    rows = spark.read.parquet(cb_path).collect()
    m = 1 + max(r.j for r in rows)
    books: list[list[list[float]]] = []
    for j in range(m):
        entries = sorted((r for r in rows if r.j == j), key=lambda r: r.c)
        books.append([[float(x) for x in r.ctr] for r in entries])
    return books


def ivf_index_append(
    spark,
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_id: int | None = None,
    health_sample_mod: int = 1,
) -> int:
    """Append a vector batch to a persisted IVF index WITHOUT
    retraining or rewriting history: assign each new vector to its
    nearest EXISTING centroid (broadcast distance argmin — the exact
    ranking expression the probes use, so assignment and probing can
    never disagree on a cell boundary) and land the rows under the
    batch's (cell, batch_id) partitions. The coarse quantizer is
    FROZEN — the standard IVF ingestion trade: cells drift as the
    vector distribution shifts, which is monitored (cell-size skew)
    and fixed by an offline rebuild, never by blocking ingest. At
    100 TB this is the serving shape: a daily embedding batch costs
    one broadcast join + one partitioned append, while probes keep
    reading nprobe cell directories; appended files become visible
    per cell listing, so a concurrent probe sees the old or the new
    file set, never a torn cell.

    An EXPLICIT ``batch_id`` writes with dynamic partition overwrite —
    a replayed streaming batch replaces exactly its own
    (cell, batch_id) leaves instead of double-appending vectors: the
    same exactly-once contract as append_signature_batch and the
    sketch store. ``batch_id=None`` appends under the next sequential
    id. Returns the batch_id used.

    If the index was built WITH PQ codebooks ({path}/codebooks
    present), the batch's codes are computed here with those exact
    codebooks — appenders cannot drift from the index's quantizer
    because the quantizer IS index state, not a caller argument."""
    import os

    cents = spark.read.parquet(os.path.join(path, "centroids"))
    staged = spread(new_vectors).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        _norm(F.col(vec_col)).alias("norm"),
    )
    assigned = (
        staged.join(F.broadcast(cents))
        .withColumn(
            "dist2",
            F.aggregate(
                F.zip_with(
                    "embedding",
                    "centroid",
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.asc("dist2"), F.asc("cell"))
            ),
        )
        .filter(F.col("_rn") == 1)
        .select("vec_id", "embedding", "norm", "cell")
    )
    books = _read_index_codebooks(spark, path)
    if books is not None:
        assigned = pq_encode(assigned, books, vec_col="embedding")
    from . import store_fs
    from .signature_store import _read_store, ensure_no_orphan_generation

    cells_base = os.path.join(path, "cells")
    ensure_no_orphan_generation(cells_base)
    root = store_fs.resolve_current(cells_base)
    if root is None:
        raise FileNotFoundError(
            f"IVF index {path} has no committed cells generation — "
            "build_ivf_index first (appends never implicitly create an index)"
        )
    if batch_id is None:
        prev = (
            _read_store(spark, cells_base)
            .agg(F.max("batch_id"))
            .collect()[0][0]
        )
        bid = 0 if prev is None else int(prev) + 1
    else:
        bid = int(batch_id)
    assigned = assigned.withColumn("batch_id", F.lit(bid).cast("int"))
    if batch_id is None:
        assigned.write.mode("append").partitionBy("cell", "batch_id").parquet(
            root
        )
    else:
        (
            assigned.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("cell", "batch_id")
            .parquet(root)
        )
    if books is not None:
        # per-batch health row with the batch's own exactly-once
        # contract: a replayed explicit batch_id replaces its own
        # health partition instead of double-counting
        _write_index_health(
            assigned, path, books, batch_id=bid,
            replace=batch_id is not None, sample_mod=health_sample_mod,
        )
    return bid


def ivf_index_adc_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a PQ-carrying persisted IVF index the way a billion-scale
    deployment does: the probed cells' scan projects ONLY
    (vec_id, cell, codes) — parquet never decodes the embedding column
    on the hot path (column pruning + the partition pruning the cell
    layout already enforces: nprobe/num_cells of the index at ~8 bytes
    per row) — scores by ADC over the index's OWN codebooks
    (read back as plan literals via _read_index_codebooks, so the
    probe can never drift from what appends encoded), shortlists per
    query, and re-ranks exactly by fetching true vectors for the
    shortlist ids alone. The in-plan twin is ivfpq_fixed_topk; this is
    the same math over the persisted layout, equivalence-tested."""
    import os

    books = _read_index_codebooks(spark, path)
    if books is None:
        raise FileNotFoundError(
            f"IVF index {path} carries no PQ codebooks — build_ivf_index"
            " with codebooks=... first (or probe with ivf_index_topk)"
        )
    m = len(books)

    cents = spark.read.parquet(os.path.join(path, "centroids"))

    norms_lit = norms_matrix_literal(books)

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    q_cells = (
        q.join(F.broadcast(cents))
        .withColumn(
            "dist2",
            F.aggregate(
                F.zip_with(
                    "qv", "centroid",
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        .withColumn(
            "cell_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.asc("dist2"), F.asc("cell"))
            ),
        )
        .filter(F.col("cell_rank") <= nprobe)
        .select("query_id", "cell")
    )
    from ..staging import stage

    # barrier: the probe + relational-tables subplan runs once and
    # broadcasts; the codes side needs none — it is parquet, already
    # data
    q_cells = stage(
        q_cells.join(
            _pq_query_tables(queries, books, id_col, vec_col), "query_id"
        )
    )

    from .signature_store import _read_store

    cells = _read_store(spark, os.path.join(path, "cells"))
    if cells is None:
        raise FileNotFoundError(
            f"IVF index {path} has no committed cells generation"
        )

    def lut(tabs):  # unrolled M-term fold in j order (= aggregate's)
        s = F.lit(0.0)
        for j in range(m):
            s = s + F.element_at(
                F.element_at(tabs, j + 1), F.col("codes").getItem(j) + 1
            )
        return s

    adc = (
        cells.select("vec_id", "cell", "codes")  # embedding col PRUNED
        .join(F.broadcast(q_cells), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                lut(F.col("tables"))
                / F.sqrt(F.greatest(lut(norms_lit), F.lit(1e-12)))
            ).alias("score"),
        )
    )
    ws = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    short = (
        adc.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= shortlist)
        .select("query_id", "neighbor_id")
    )

    qn = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _norm(F.col(vec_col)).alias("qn"),
    )
    rer = (
        cells.select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"),
            F.col("norm").alias("cn"),
        )
        .join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(qn), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("cos_sim"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return rer.withColumn("rank", F.row_number().over(wk)).filter(F.col("rank") <= k)


def compact_ivf_cells(spark, path: str) -> int:
    """Maintenance: fold every (cell, batch_id) second-level partition
    of a persisted IVF index into base batch 0 — completing the shared
    store-maintenance contract (signature_store.compact_store,
    sketches.compact_sketch_store, span_store.compact_span_store).
    Thousands of daily appends otherwise accumulate one leaf directory
    per (cell, batch): listing cost on every probe's pruned scan, and
    small files. Semantics-preserving by construction: probes ignore
    the batch level entirely (ivf_index_topk reads (vec_id, embedding,
    norm, cell) only), and the fold changes no row — pure relayout.
    Staged safely via swap_in_generation on the cells directory (the
    centroids dir is untouched — the quantizer is not maintenance
    state). Same single-maintainer window contract as the other
    stores. Returns the number of batches folded."""
    import os

    from .signature_store import _read_store, swap_in_generation

    cells_path = os.path.join(path, "cells")
    cells = _read_store(spark, cells_path)
    if cells is None:
        return 0
    n_batches = cells.select("batch_id").distinct().count()
    if n_batches <= 1:
        return n_batches

    # schema-preserving fold (a PQ-carrying index keeps its codes):
    # only the batch level is rewritten, every data column rides along
    folded = cells.drop("batch_id").withColumn(
        "batch_id", F.lit(0).cast("int")
    )

    def _write(tmp: str) -> None:
        folded.write.mode("overwrite").partitionBy("cell", "batch_id").parquet(
            tmp
        )

    swap_in_generation(cells_path, _write)
    return n_batches


def expire_ivf_batches(path: str, keep_from_batch: int) -> list[str]:
    """Retention: drop index vectors ingested in batches strictly below
    ``keep_from_batch`` (embeddings aged out of the serving horizon) —
    directory-level deletes of the batch_id leaves under every cell,
    the same O(#partitions) metadata sweep as
    signature_store.expire_batches, routed through store_fs so it
    works on the index's own filesystem. Unlike the dedup stores,
    expiry here CHANGES probe results (the expired vectors stop being
    served) — that is the point of a TTL on an ANN index. Runs under
    the shared maintenance lease (vs compact_ivf_cells' swap). Returns
    the removed partition paths (cell-relative)."""
    from . import store_fs
    from .signature_store import maintenance_lease

    cells_path = store_fs.join(path, "cells")
    removed = []
    with maintenance_lease(cells_path):
        root = store_fs.resolve_current(cells_path)
        if root is None:
            return []
        for cell_dir in store_fs.list_subdirs(root):
            if not cell_dir.startswith("cell="):
                continue
            got = store_fs.expire_prefixed_partitions(
                store_fs.join(root, cell_dir),
                "batch_id=",
                lambda v: int(v) < keep_from_batch,
            )
            removed.extend(f"{cell_dir}/{d}" for d in got)
    return removed


def pq_residuals(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "residual_micro",
) -> DataFrame:
    """Per-vector PQ quantization residual in exact integer micro-units:
    FLOOR((1 - cos(v, reconstruction(v))) * 1e6) — 0 means the codebooks
    represent the vector perfectly; the index-health signal that RISES
    when ingest drifts away from the frozen quantizer's training
    distribution (the one failure mode of frozen-quantizer serving).

    Same relational grain as pq_encode (explode to (id, subspace),
    join the 16-row book relation, narrow-map argmin — the round-8
    SortAggregate-spill lesson in pq_encode's docstring applies here
    identically) but the winning struct carries the entry's dot/norm
    terms, so reconstruction cosine needs NO second codebook pass:
    because subspaces are disjoint, dot(v, v_hat) =
    sum_j dot(sv_j, ctr_code_j) and |v_hat|^2 = sum_j |ctr_code_j|^2.
    Folds run in subspace order over a j-sorted collect (matching the
    DuckDB twin's list_sum order) and the residual is floored to
    integer micro-units, so downstream SUMs are order-independent and
    engine-exact — no float tolerance anywhere.
    """
    m, dsub, ksub = len(codebooks), len(codebooks[0][0]), len(codebooks[0])

    sv2 = F.lit(0.0)
    for t in range(dsub):
        sv_t = F.col("sv").getItem(t).cast("double")
        sv2 = sv2 + sv_t * sv_t
    sub = (
        df.select(
            F.col(id_col).alias("_pq_id"),
            F.posexplode(
                F.array(
                    *[F.slice(F.col(vec_col), j * dsub + 1, dsub) for j in range(m)]
                )
            ).alias("j", "sv"),
        )
        .join(F.broadcast(_books_frame(df.sparkSession, codebooks)), "j")
        .withColumn("_sv2", sv2)
    )

    def entry(c: int):
        ctr = F.element_at(F.col("_book"), c + 1)
        dp = F.lit(0.0)
        n2 = F.lit(0.0)
        for t in range(dsub):
            sv_t = F.col("sv").getItem(t).cast("double")
            ctr_t = F.element_at(ctr, t + 1)
            dp = dp + sv_t * ctr_t
            n2 = n2 + ctr_t * ctr_t
        return F.struct(
            _unrolled_d2(F.col("sv"), ctr, dsub).alias("d2"),
            F.lit(c).alias("code"),
            dp.alias("dp"),
            n2.alias("n2"),
        )

    best = sub.select(
        "_pq_id",
        "j",
        F.array_min(F.array(*[entry(c) for c in range(ksub)])).alias("s"),
        F.col("_sv2").alias("sv2"),
    )
    terms = best.groupBy("_pq_id").agg(
        F.array_sort(
            F.collect_list(F.struct("j", "s.dp", "s.n2", "sv2"))
        ).alias("ts")
    )
    dot_v = F.lit(0.0)
    n2_r = F.lit(0.0)
    n2_v = F.lit(0.0)
    for j in range(m):
        dot_v = dot_v + F.col("ts").getItem(j)["dp"]
        n2_r = n2_r + F.col("ts").getItem(j)["n2"]
        n2_v = n2_v + F.col("ts").getItem(j)["sv2"]
    res = terms.select(
        "_pq_id",
        F.floor(
            (
                F.lit(1.0)
                - dot_v / F.sqrt(F.greatest(n2_v * n2_r, F.lit(1e-12)))
            )
            * F.lit(1e6)
        )
        .cast("long")
        .alias(out_col),
    )
    return df.join(res, F.col(id_col) == F.col("_pq_id")).drop("_pq_id")


def _write_index_health(
    assigned: DataFrame,
    path: str,
    codebooks: list[list[list[float]]],
    batch_id: int,
    replace: bool,
    sample_mod: int,
    vec_col: str = "embedding",
) -> None:
    """Append one per-batch health row to {path}/health: mean PQ
    quantization residual over a deterministic hash-sample of the
    batch's vectors (vec_id % sample_mod == 0 — at production scale the
    sample keeps health cost a fraction of ingest cost; the residual is
    recomputed on the sample only, so cost is sample-sized, not
    batch-sized). ``replace`` follows the batch's own exactly-once
    contract: an explicit (replayed) batch_id dynamically overwrites its
    own health partition instead of double-counting."""
    import os

    sample = assigned.filter(F.col("vec_id") % sample_mod == 0)
    stats = (
        pq_residuals(sample, codebooks, vec_col=vec_col)
        .agg(
            F.count("*").alias("n_sampled"),
            F.coalesce(F.sum("residual_micro"), F.lit(0)).alias(
                "sum_residual_micro"
            ),
        )
        .select(
            F.lit(batch_id).cast("int").alias("batch_id"),
            "n_sampled",
            "sum_residual_micro",
            F.round(
                F.col("sum_residual_micro")
                / (F.greatest(F.col("n_sampled"), F.lit(1)) * F.lit(1e6)),
                6,
            ).alias("mean_residual"),
        )
    )
    health = os.path.join(path, "health")
    w = stats.coalesce(1).write
    if replace:
        (
            w.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(health)
        )
    else:
        w.mode("append").partitionBy("batch_id").parquet(health)


def ivf_index_health(spark, path: str) -> DataFrame:
    """Residual-drift report for a persisted PQ-carrying IVF index: one
    row per ingested batch with its sampled mean quantization residual
    and the drift ratio vs the BUILD batch (batch_id 0, the codebooks'
    own training-era data). A ratio climbing across batches says the
    ingest distribution is walking away from the frozen quantizer —
    recall at fixed shortlist decays silently — and the fix is an
    offline codebook re-train + reindex (OPERATIONS.md runbook), never
    blocking ingest. Returns (batch_id, n_sampled, mean_residual,
    drift_vs_build)."""
    import os

    h = spark.read.parquet(os.path.join(path, "health"))
    base = h.filter(F.col("batch_id") == 0).select(
        F.col("mean_residual").alias("_base")
    )
    return (
        h.crossJoin(F.broadcast(base))
        .select(
            "batch_id",
            "n_sampled",
            "mean_residual",
            F.round(
                F.col("mean_residual")
                / F.greatest(F.col("_base"), F.lit(1e-9)),
                4,
            ).alias("drift_vs_build"),
        )
        .orderBy("batch_id")
    )


def streaming_ivf_append(
    vec_stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    num_centroids: int = 16,
    trigger: dict | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
):
    """CONTINUOUS IVF ingestion — the streaming twin of
    streaming_minhash_dedup / streaming_sketch, completing the
    exactly-once contract across all three incremental stores: the
    FIRST micro-batch trains the coarse quantizer and materializes the
    index (build is a full overwrite, so a replayed first batch is
    idempotent); every later micro-batch assigns against the FROZEN
    centroids and lands under its streaming batch id with dynamic
    partition overwrite (a crash-replayed batch replaces its own
    (cell, batch_id) leaves, never double-appending). Probes
    (ivf_index_topk) read the same index mid-stream with unchanged
    semantics. Returns the StreamingQuery.

    The build-vs-append probe runs on the INDEX'S OWN filesystem
    (store_fs) — an os.path.isdir against an hdfs://s3a:// index path
    is always False, which would silently retrain the quantizer and
    full-overwrite the index on EVERY micro-batch, discarding all
    previously ingested cells."""
    from .store_fs import is_dir as _store_is_dir
    from .store_fs import join as _store_join

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # an EMPTY first micro-batch must not train the quantizer (a
        # kmeans fit on zero vectors either crashes the query or
        # freezes degenerate centroids forever); empty later batches
        # have nothing to assign either — skip both
        if batch_df.isEmpty():
            return
        if not _store_is_dir(_store_join(path, "centroids")):
            # codebooks (if given) become INDEX STATE at first build;
            # appends then read them back and encode every batch, so a
            # PQ-carrying index streams with the same exactly-once
            # contract and no extra plumbing
            build_ivf_index(
                batch_df, path, num_centroids=num_centroids,
                id_col=id_col, vec_col=vec_col, codebooks=codebooks,
            )
        else:
            ivf_index_append(
                spark, batch_df, path,
                id_col=id_col, vec_col=vec_col, batch_id=batch_id,
            )

    writer = vec_stream.writeStream.queryName("ivf_append").option(
        "checkpointLocation", checkpoint_dir
    ).foreachBatch(process)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
