"""Operator-level tests: LSH recall vs brute force, compaction vs a
dict-replay oracle (property-based), cycle-safe traversal, dense
reindex, multimodal plumbing (SURVEY.md §5 rebuild strategy items 2-3).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from pulsar_internal_spark.operators import multimodal as mm
from pulsar_internal_spark.operators import similarity as sim
from pulsar_internal_spark.operators import tree as tree_ops
from pulsar_internal_spark.operators.compaction import compact_last_write_wins


# ------------------------------------------------------------ similarity


def test_lsh_results_subset_of_brute_force(spark, sf_dir):
    """Every LSH-bucketed result must carry the exact cosine the
    brute-force path computes for that pair (the banded join prunes
    pairs, never alters scores). The fixture embeddings are RANDOM, so
    their 'top-5' are cos~0.2 non-neighbors LSH prunes by design —
    collapse is guarded by per-query candidate COVERAGE, not overlap
    with that meaningless top-5; the real recall gate is
    test_ann_recall_regression_planted_neighbors (recall@5 >= 0.8 on
    genuinely similar vectors)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.limit(10)
    bf = sim.brute_force_topk(emb, queries, k=5).collect()
    lsh = sim.lsh_bucketed_topk(emb, queries, k=5).collect()
    assert lsh, "LSH returned nothing"
    bf_scores = {(r.query_id, r.neighbor_id): r.cos_sim for r in bf}
    bf_pairs = set(bf_scores)
    lsh_pairs = {(r.query_id, r.neighbor_id) for r in lsh}
    for r in lsh:
        if (r.query_id, r.neighbor_id) in bf_scores:
            assert abs(r.cos_sim - bf_scores[(r.query_id, r.neighbor_id)]) < 1e-9
    # No recall floor against the random top-5: overlap with
    # non-neighbor "top" pairs is fixture luck (observed 0.30 on the
    # sf0.001 draw, 0.08 on sf0.01 — same 500-row size), and pruning
    # them is the operator working as designed. The collapse guard is
    # COVERAGE: every query must surface a full candidate top-k.
    per_query: dict = {}
    for q, _ in lsh_pairs:
        per_query[q] = per_query.get(q, 0) + 1
    assert len(per_query) == 10, f"queries with no candidates: {per_query}"
    assert all(n == 5 for n in per_query.values()), per_query


def test_brute_force_topk_ranks_correctly(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = sim.brute_force_topk(emb, emb.limit(3), k=4).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        sims = [r.cos_sim for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(r.neighbor_id != q for r in rows)


# ------------------------------------------------------------ compaction


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),  # key
            st.integers(0, 50),  # seq
            st.sampled_from(["v1", "v2", "v3"]),  # value
            st.booleans(),  # tombstone
        ),
        min_size=1,
        max_size=30,
    )
)
def test_compaction_matches_dict_replay(spark, ops):
    """compact_last_write_wins == replaying the ops into a dict in seq
    order (cache.hpp replace/invalidate semantics). Ties on (key, seq)
    are broken by the payload-struct max, mirrored here."""
    rows = [
        Row(key=k, seq=s, value=v, is_tombstone=t) for (k, s, v, t) in ops
    ]
    df = spark.createDataFrame(rows)
    out = {
        r.key: (r.seq, r.value, r.is_tombstone)
        for r in compact_last_write_wins(
            df, key_cols=["key"], seq_col="seq"
        ).collect()
    }
    replay: dict = {}
    for k, s, v, t in ops:
        cur = replay.get(k)
        # max over struct(seq, value, is_tombstone): True > False
        cand = (s, v, t)
        if cur is None or cand > cur:
            replay[k] = cand
    assert out == replay

    # tombstone filtering drops exactly the keys whose winner is a delete
    alive = {
        r.key
        for r in compact_last_write_wins(
            df, key_cols=["key"], seq_col="seq", tombstone_col="is_tombstone"
        ).collect()
    }
    assert alive == {k for k, (s, v, t) in replay.items() if not t}


# ------------------------------------------------------------ tree


def test_descendants_terminates_on_cycle(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("a", "c"), ("d", "b")],
        ["child_id", "parent_id"],
    )
    roots = spark.createDataFrame([("a",)], ["id"])
    out = {r.id: r.depth for r in tree_ops.descendants(edges, roots).collect()}
    # a(0) -> b(1) -> {c,d}(2); the c->a back-edge must not loop
    assert out == {"a": 0, "b": 1, "c": 2, "d": 2}


def test_reindex_dense_across_partitions(spark):
    df = spark.range(0, 1000).repartition(13).selectExpr("id AS k")
    indexed = tree_ops.reindex(df, ["k"])
    # LongType end-to-end: cumulative offsets exceed int32 past 2.1 B rows
    # (the regime the operator targets), so the output must be 64-bit.
    assert dict(indexed.dtypes)["idx"] == "bigint"
    out = indexed.collect()
    by_k = {r.k: r.idx for r in out}
    assert sorted(by_k.values()) == list(range(1, 1001))
    assert by_k[0] == 1 and by_k[999] == 1000
    # order-preserving: idx == rank of k
    assert all(by_k[k] == k + 1 for k in range(1000))


def test_reindex_long_offsets_no_int32_wrap(spark):
    """The offset arithmetic must run in 64-bit: plant offsets past int32
    by checking the broadcast-offset branch's expression on a synthetic
    plan (we can't materialize 2.1 B rows in a unit test, but we CAN
    assert both code paths emit LongType and that the >64-partition
    broadcast branch also yields bigint)."""
    df = spark.range(0, 2000).repartition(7).selectExpr("id AS k")
    # force the broadcast-offset branch by range-partitioning wide
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "80")
    try:
        wide = tree_ops.reindex(df, ["k"], idx_name="gidx")
        assert dict(wide.dtypes)["gidx"] == "bigint"
        vals = sorted(r.gidx for r in wide.collect())
        assert vals == list(range(1, 2001))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_input_scaled_shuffle_partitioning(spark):
    """Round 9 (VERDICT r8 #2): the session must size post-shuffle
    partitions by BYTES, not by the fixed shuffle.partitions floor —
    fixed-32 put gigabytes of sort/agg state in each task at sf10
    (user_triangle_counts: 13.3 GB memory + 2.8 GB disk spill,
    SCALE_r08). The mechanism is AQE coalescing from a high
    initialPartitionNum down to the advisory partition size, so this
    test pins BOTH halves: (a) the session carries an
    initialPartitionNum far above the floor, (b) an identical plan's
    post-shuffle partition count actually GROWS past the floor when the
    shuffled bytes grow — impossible unless initialPartitionNum governs
    the exchange, since shuffle.partitions here is 8."""
    conf = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    assert int(spark.conf.get(conf)) >= 512
    floor = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert floor <= 32  # the test session's fixed floor

    def post_shuffle_parts(n_rows: int) -> int:
        df = (
            spark.range(0, n_rows)
            .select(
                (F.col("id") % (n_rows // 4)).alias("k"),
                F.sha2(F.col("id").cast("string"), 256).alias("pad"),
            )
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("c"), F.max("pad").alias("m"))
        )
        return df.rdd.getNumPartitions()

    advisory = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    pfirst = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    old = {k: spark.conf.get(k) for k in (advisory, pfirst)}
    try:
        # a small advisory target makes the byte-scaling observable at
        # unit-test sizes; parallelismFirst off so the target is the
        # advisory size alone, not max-parallelism
        spark.conf.set(advisory, "262144")
        spark.conf.set(pfirst, "false")
        small = post_shuffle_parts(20_000)
        big = post_shuffle_parts(800_000)
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    assert big > floor, f"big shuffle stuck at the floor: {big} <= {floor}"
    assert small < big, (small, big)


# ------------------------------------------------------------ multimodal


def test_multimodal_features_shape_and_determinism(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    feats = mm.extract_features(mm.attach_payload(docs), dim=8)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert r.modality in mm.MODALITIES
        assert len(r.feature) == 8
        assert all(0.0 <= x <= 1.0 for x in r.feature)
    again = {r.doc_id: r.feature for r in feats.collect()}
    assert all(again[r.doc_id] == r.feature for r in rows)


def test_multimodal_features_any_dim_and_real_image_path(spark, sf_dir):
    """extract_features supports any dim (hash-chained fallback for raw
    bytes); recognized image payloads get REAL decoded-pixel features."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(4)
    rows = mm.extract_features(mm.attach_payload(docs), dim=64).collect()
    assert len(rows) == 4
    for r in rows:
        assert len(r.feature) == 64
        assert all(0.0 <= x <= 1.0 for x in r.feature)

    # a real PNG payload must produce pixel-mean features, not hash noise
    solid = mm.make_png(4, 4, bytes([200] * 48))
    feats = mm._stub_decode(solid, dim=8)
    assert all(abs(x - 200 / 255.0) < 1e-9 for x in feats)


def test_ivf_recall_and_score_exactness(spark, sf_dir):
    """IVF results carry exact cosines and reach reasonable recall at
    nprobe=half the cells; nprobe=all cells == brute force exactly.
    (Fixture embeddings are random — measured 0.76 at pin time; the
    similar-vector recall gate is the planted-neighbor test.)"""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.limit(8)
    bf = sim.brute_force_topk(emb, queries, k=5).collect()
    bf_scores = {(r.query_id, r.neighbor_id): r.cos_sim for r in bf}

    ivf = sim.ivf_topk(emb, queries, k=5, num_centroids=8, nprobe=4).collect()
    assert ivf
    for r in ivf:
        if (r.query_id, r.neighbor_id) in bf_scores:
            assert abs(r.cos_sim - bf_scores[(r.query_id, r.neighbor_id)]) < 1e-9
    recall = len({(r.query_id, r.neighbor_id) for r in ivf} & set(bf_scores)) / len(bf_scores)
    assert recall >= 0.5, recall

    full = sim.ivf_topk(emb, queries, k=5, num_centroids=8, nprobe=8).collect()
    assert {(r.query_id, r.neighbor_id, r.rank) for r in full} == {
        (r.query_id, r.neighbor_id, r.rank) for r in bf
    }


def test_multimodal_resize_real_exact(spark, sf_dir):
    """resize_images must decode BMP and PNG payloads alike and emit
    nearest-neighbor stats that match an independent local resample."""
    import hashlib

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}

    for fmt in ("bmp", "png"):
        payloads = mm.attach_real_payload(docs, image_format=fmt)
        rs = mm.resize_images(payloads, width=2, height=2).collect()
        image_ids = [i for i in texts if i % 3 == 0]
        assert {r.doc_id for r in rs} == set(image_ids)
        for r in rs:
            assert (r.src_width, r.src_height, r.width, r.height) == (4, 4, 2, 2)
            digest = hashlib.sha256(str(texts[r.doc_id]).encode()).digest()
            px = (digest * 2)[:48]
            small = mm.nearest_resize(px, 4, 4, 2, 2)
            assert r.first_value == small[0] * 65536 + small[1] * 256 + small[2]
            assert r.byte_sum == sum(small)


def test_minhash_lsh_finds_planted_near_duplicates(spark):
    """SURVEY.md §7 risk register: fix seeds, assert recall on planted
    duplicates. Each base doc gets a variant with one word changed
    (high shingle overlap); LSH must recover most planted pairs and
    exact Jaccard must confirm them."""
    from pulsar_internal_spark.operators import dedup as D

    base = [
        f"the quick brown fox jumps over the lazy dog number {i} "
        f"while carrying a basket of fresh green apples to market"
        for i in range(20)
    ]
    rows = []
    for i, text in enumerate(base):
        rows.append((2 * i, text))
        rows.append((2 * i + 1, text.replace("basket", "bundle")))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    cand = D.minhash_lsh_candidates(docs, num_hashes=8, band_size=2)
    pairs = {(r.id_a, r.id_b) for r in cand.collect()}
    planted = {(2 * i, 2 * i + 1) for i in range(20)}
    recall = len(pairs & planted) / len(planted)
    assert recall >= 0.8, f"planted-duplicate recall too low: {recall}"

    scored = D.jaccard_pairs(docs, cand)
    confirmed = {
        (r.id_a, r.id_b) for r in scored.filter(F.col("jaccard") >= 0.5).collect()
    }
    assert planted & pairs <= confirmed, "LSH hits must pass exact-jaccard verify"


def test_asof_join_semantics_and_plan(spark):
    """asof_join: >= tie semantics, NULL before first right row, and the
    one-shuffle plan shape (no pair explosion, no extra exchange)."""
    from pyspark.sql import functions as F

    from pulsar_internal_spark.operators.temporal import asof_join

    left = spark.sql(
        "SELECT * FROM VALUES "
        "(1, TIMESTAMP '2024-01-01 00:00:00'),"   # before any right row -> NULL
        "(1, TIMESTAMP '2024-01-01 01:00:00'),"   # exactly at r1 -> matches r1
        "(1, TIMESTAMP '2024-01-01 02:30:00'),"   # between r1 and r2 -> r1
        "(2, TIMESTAMP '2024-01-01 05:00:00')"    # other key -> r3
        " AS t(k, t_left)"
    )
    right = spark.sql(
        "SELECT * FROM VALUES "
        "(1, TIMESTAMP '2024-01-01 01:00:00', 'r1'),"
        "(1, TIMESTAMP '2024-01-01 03:00:00', 'r2'),"
        "(2, TIMESTAMP '2024-01-01 04:00:00', 'r3')"
        " AS t(k, t_right, payload)"
    )
    out = asof_join(
        left, right, on="k", left_time="t_left", right_time="t_right",
        payload=["payload"],
    )
    rows = {(r.k, str(r.t_left)): r.payload for r in out.collect()}
    assert rows == {
        (1, "2024-01-01 00:00:00"): None,
        (1, "2024-01-01 01:00:00"): "r1",
        (1, "2024-01-01 02:30:00"): "r1",
        (2, "2024-01-01 05:00:00"): "r3",
    }
    # count only the final AQE plan (the string repeats nodes in the
    # "== Initial Plan ==" section)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final_plan = plan.split("== Initial Plan ==")[0]
    # one hash exchange for the window; a pair-exploding rewrite would
    # show a Join node
    assert final_plan.count("Exchange hashpartitioning") == 1, final_plan
    assert "Join" not in final_plan, final_plan


def test_asof_join_right_tie_break_equals_preaggregate(spark):
    """right_tie_break (round 11): a right side with several rows per
    (key, time) carries the max-tie-break row, byte-equal to the former
    groupBy(key, time).agg(max(id)) pre-aggregate — the optimization
    deletes that aggregate's exchange, so the equivalence is the
    correctness contract (asof_latest_order relies on it)."""
    from pyspark.sql import functions as F

    from pulsar_internal_spark.operators.temporal import asof_join

    left = spark.sql(
        "SELECT * FROM VALUES "
        "(1, TIMESTAMP '2024-01-01 02:00:00'),"
        "(1, TIMESTAMP '2024-01-01 04:00:00'),"
        "(2, TIMESTAMP '2024-01-01 02:00:00')"
        " AS t(k, t_left)"
    )
    # key 1 has THREE rows at 01:00 (ids 7, 9, 3) and one at 03:00 (5);
    # key 2 has two rows at 01:00 (ids 2, 8)
    right = spark.sql(
        "SELECT * FROM VALUES "
        "(1, TIMESTAMP '2024-01-01 01:00:00', 7),"
        "(1, TIMESTAMP '2024-01-01 01:00:00', 9),"
        "(1, TIMESTAMP '2024-01-01 01:00:00', 3),"
        "(1, TIMESTAMP '2024-01-01 03:00:00', 5),"
        "(2, TIMESTAMP '2024-01-01 01:00:00', 2),"
        "(2, TIMESTAMP '2024-01-01 01:00:00', 8)"
        " AS t(k, t_right, rid)"
    )
    out = asof_join(
        left, right, on="k", left_time="t_left", right_time="t_right",
        payload=["rid"], right_tie_break=["rid"],
    )
    rows = {(r.k, str(r.t_left)): r.rid for r in out.collect()}
    assert rows == {
        (1, "2024-01-01 02:00:00"): 9,   # max id at the 01:00 tie group
        (1, "2024-01-01 04:00:00"): 5,   # newest row wins over older max
        (2, "2024-01-01 02:00:00"): 8,
    }
    # the equivalence itself: tie-break == pre-aggregated max
    pre = right.groupBy("k", "t_right").agg(F.max("rid").alias("rid"))
    ref = asof_join(
        left, pre, on="k", left_time="t_left", right_time="t_right",
        payload=["rid"],
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, ref.collect())
    )


def test_connected_components_two_islands(spark):
    """connected_components: min-id labels, chain + triangle islands,
    canonical-edge fast path agrees with the safe path."""
    from pulsar_internal_spark.operators.graph import connected_components

    edges = spark.sql(
        "SELECT * FROM VALUES "
        "(1, 2), (2, 3), (3, 4),"   # chain: component 1
        "(10, 11), (11, 12), (10, 12)"  # triangle: component 10
        " AS t(src, dst)"
    )
    for canonical in (True, False):
        out = {
            r.id: r.cluster_id
            for r in connected_components(
                edges, edges_canonical=canonical
            ).collect()
        }
        assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}, out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_match_union_find(spark, edges):
    """connected_components == pure-Python union-find on arbitrary
    small graphs (self-loops and duplicate edges included)."""
    from pulsar_internal_spark.operators.graph import connected_components

    df = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in edges]
    )
    got = {
        r.id: r.cluster_id for r in connected_components(df).collect()
    }

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {x: find(x) for x in parent}
    # canonicalize: min member per root
    roots: dict = {}
    for x, r in want.items():
        roots.setdefault(find(r), []).append(x)
    expect = {x: min(members) for r, members in roots.items() for x in members}
    assert got == expect


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)),
        min_size=1, max_size=25,
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)),
        min_size=1, max_size=25,
    ),
)
def test_asof_join_matches_pandas_merge_asof(spark, lefts, rights):
    """asof_join == pandas merge_asof (backward, exact matches allowed)
    on arbitrary small inputs; right side deduped per (key, t)."""
    import pandas as pd

    from pulsar_internal_spark.operators.temporal import asof_join

    base = pd.Timestamp("2024-01-01")
    rights_dedup = {}
    for k, t in rights:
        rights_dedup[(k, t)] = f"p{k}:{t}"
    ldf = spark.createDataFrame(
        [Row(k=k, lt=(base + pd.Timedelta(seconds=t)).to_pydatetime(), lid=i)
         for i, (k, t) in enumerate(lefts)]
    )
    rdf = spark.createDataFrame(
        [Row(k=k, rt=(base + pd.Timedelta(seconds=t)).to_pydatetime(), payload=p)
         for (k, t), p in rights_dedup.items()]
    )
    out = asof_join(
        ldf, rdf, on="k", left_time="lt", right_time="rt", payload=["payload"]
    ).collect()
    got = {r.lid: r.payload for r in out}

    lp = pd.DataFrame(
        [{"k": k, "lt": base + pd.Timedelta(seconds=t), "lid": i}
         for i, (k, t) in enumerate(lefts)]
    ).sort_values(["lt", "lid"])
    rp = pd.DataFrame(
        [{"k": k, "rt": base + pd.Timedelta(seconds=t), "payload": p}
         for (k, t), p in rights_dedup.items()]
    ).sort_values("rt")
    merged = pd.merge_asof(
        lp, rp, left_on="lt", right_on="rt", by="k",
        direction="backward", allow_exact_matches=True,
    )
    want = {
        int(r.lid): (None if pd.isna(r.payload) else r.payload)
        for r in merged.itertuples()
    }
    assert got == want


def test_range_join_matches_brute_force(spark):
    """range_join == the O(L*R) brute-force range filter, across bucket
    boundaries and interval edges."""
    import pandas as pd

    from pulsar_internal_spark.operators.temporal import range_join

    base = pd.Timestamp("2024-01-01")
    lefts = [0, 59, 60, 61, 3599, 3600, 5000, 7199, 7200]
    rights = [(0, 3600), (3600, 3600), (1800, 60), (7100, 200)]
    ldf = spark.createDataFrame(
        [Row(lid=i, lt=(base + pd.Timedelta(seconds=s)).to_pydatetime())
         for i, s in enumerate(lefts)]
    )
    rdf = spark.createDataFrame(
        [Row(rid=i, rs=(base + pd.Timedelta(seconds=s)).to_pydatetime(),
             re_=(base + pd.Timedelta(seconds=s + d)).to_pydatetime())
         for i, (s, d) in enumerate(rights)]
    )
    out = range_join(
        ldf, rdf, left_time="lt", right_start="rs", right_end="re_",
        bucket_seconds=3600,
    ).collect()
    got = {(r.lid, r.rid) for r in out}
    want = {
        (i, j)
        for i, s in enumerate(lefts)
        for j, (rs, d) in enumerate(rights)
        if rs <= s < rs + d
    }
    assert got == want


# ------------------------------------------- real BMP / WAV codecs


def test_bmp_golden_bytes():
    """make_bmp output equals an independently hand-built BMP file
    (header fields, bottom-up BGR rows, 4-byte row padding)."""
    import struct

    got = mm.make_bmp(2, 1, bytes([10, 20, 30, 40, 50, 60]))
    want = (
        struct.pack("<2sIHHI", b"BM", 62, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 24, 0, 8, 2835, 2835, 0, 0)
        + bytes([30, 20, 10, 60, 50, 40, 0, 0])  # BGR + pad
    )
    assert got == want


def test_bmp_parse_handbuilt():
    """parse_bmp decodes a file built by hand (independent of make_bmp):
    2x2, so the bottom-up flip is observable."""
    import struct

    # logical top-down RGB: row0 = red, green; row1 = blue, white
    red, green, blue, white = (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)
    rows_on_disk = [  # bottom-up, BGR, rows of 2 px = 6 bytes + 2 pad
        bytes([blue[2], blue[1], blue[0], white[2], white[1], white[0], 0, 0]),
        bytes([red[2], red[1], red[0], green[2], green[1], green[0], 0, 0]),
    ]
    data = (
        struct.pack("<2sIHHI", b"BM", 54 + 16, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 2835, 2835, 0, 0)
        + b"".join(rows_on_disk)
    )
    img = mm.parse_bmp(data)
    assert (img["width"], img["height"], img["bpp"]) == (2, 2, 24)
    assert img["pixels"] == bytes(red + green + blue + white)


def test_bmp_roundtrip_random():
    import random

    random.seed(11)
    for w, h in [(1, 1), (3, 2), (4, 4), (5, 3)]:
        rgb = bytes(random.randrange(256) for _ in range(w * h * 3))
        img = mm.parse_bmp(mm.make_bmp(w, h, rgb))
        assert (img["width"], img["height"]) == (w, h)
        assert img["pixels"] == rgb


def test_png_roundtrip_random():
    import random

    random.seed(17)
    for w, h in [(1, 1), (3, 2), (4, 4), (7, 3)]:
        rgb = bytes(random.randrange(256) for _ in range(w * h * 3))
        img = mm.parse_png(mm.make_png(w, h, rgb))
        assert (img["width"], img["height"], img["bpp"]) == (w, h, 24)
        assert img["pixels"] == rgb


def test_png_parse_handbuilt_all_filters():
    """parse_png reconstructs a hand-built PNG (independent of make_png)
    whose scanlines use None, Average and Paeth filters — the filter
    types make_png never writes, so only a real spec implementation
    passes."""
    import struct
    import zlib

    w, h = 3, 3
    rgb = bytes((i * 53 + 7) % 256 for i in range(w * h * 3))
    stride = w * 3
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = rgb[y * stride : (y + 1) * stride]
        ftype = (0, 3, 4)[y]
        raw.append(ftype)
        for i in range(stride):
            a = row[i - 3] if i >= 3 else 0
            b, c = prev[i], (prev[i - 3] if i >= 3 else 0)
            if ftype == 0:
                pred = 0
            elif ftype == 3:
                pred = (a + b) // 2
            else:  # Paeth
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            raw.append((row[i] - pred) & 0xFF)
        prev = row

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    data = (
        mm.PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    img = mm.parse_png(data)
    assert img["pixels"] == rgb


@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    data=st.binary(min_size=0, max_size=9 * 9 * 3),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(w, h, data):
    """Any RGB buffer survives make_png -> parse_png byte-exactly
    (deflate + Sub/Up filters are lossless for all pixel contents,
    including the filter-unfriendly high-entropy ones)."""
    rgb = (data * (w * h * 3 // max(len(data), 1) + 1))[: w * h * 3] if data else bytes(w * h * 3)
    img = mm.parse_png(mm.make_png(w, h, rgb))
    assert (img["width"], img["height"]) == (w, h)
    assert img["pixels"] == rgb


def test_png_crc_tamper_rejected():
    """A flipped bit in the IDAT body must fail the chunk CRC check —
    the envelope-integrity role XXH32 plays in the reference
    (bytecode.cpp:130-155)."""
    png = bytearray(mm.make_png(2, 2, bytes(range(12))))
    png[45] ^= 0x01  # inside IDAT body
    with pytest.raises(ValueError, match="CRC"):
        mm.parse_png(bytes(png))


def test_png_idat_split_across_chunks():
    """The deflate stream may span multiple IDAT chunks; the parser must
    concatenate before inflating (PNG spec requirement)."""
    import struct
    import zlib

    rgb = bytes((i * 29 + 3) % 256 for i in range(4 * 2 * 3))
    whole = mm.make_png(4, 2, rgb)
    # re-split the single IDAT into two chunks
    pos = 8
    chunks = []
    while pos + 12 <= len(whole):
        (clen, tag) = struct.unpack_from(">I4s", whole, pos)
        chunks.append((tag, whole[pos + 8 : pos + 8 + clen]))
        pos += 12 + clen
    rebuilt = mm.PNG_SIG
    for tag, body in chunks:
        parts = [body[: len(body) // 2], body[len(body) // 2 :]] if tag == b"IDAT" else [body]
        for p in parts:
            rebuilt += (
                struct.pack(">I", len(p)) + tag + p
                + struct.pack(">I", zlib.crc32(tag + p))
            )
    assert mm.parse_png(rebuilt)["pixels"] == rgb


def test_wav_golden_and_chunk_walk():
    """parse_wav handles a hand-built file with an extra chunk between
    fmt and data (the RIFF walk, not a fixed-offset read)."""
    import struct

    samples = [0, 1, -1, 32767, -32768]
    pcm = struct.pack("<5h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    junk = b"\x07" * 5  # odd length: exercises word-alignment
    data = (
        struct.pack("<4sI4s", b"RIFF", 0, b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"LIST", len(junk)) + junk + b"\x00"
        + struct.pack("<4sI", b"data", len(pcm)) + pcm
    )
    wav = mm.parse_wav(data)
    assert wav["sample_rate"] == 8000 and wav["bits"] == 16
    assert wav["samples"] == samples


def test_wav_roundtrip_random():
    import random

    random.seed(12)
    samples = [random.randrange(-32768, 32768) for _ in range(64)]
    wav = mm.parse_wav(mm.make_wav(samples, 44100))
    assert wav["samples"] == samples and wav["sample_rate"] == 44100


def test_real_decode_rejects_garbage():
    with pytest.raises(ValueError):
        mm.parse_bmp(b"not a bitmap at all")
    with pytest.raises(ValueError):
        mm.parse_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        mm.parse_avi(b"RIFFxxxxWAVE")


def test_avi_parse_handbuilt():
    """parse_avi decodes a hand-built file (independent of make_avi):
    1x2 frame, so the bottom-up un-flip is observable; strf carries the
    dimensions; the movi walk must skip nothing."""
    import struct

    def chunk(cid, body):
        return struct.pack("<4sI", cid, len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(kind, body):
        return struct.pack("<4sI4s", b"LIST", 4 + len(body), kind) + body

    avih = struct.pack("<IIIIIIIIII4I", 100000, 0, 0, 0, 1, 0, 1, 8, 1, 2, 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"vids", b"DIB ", 0, 0, 0, 0, 1, 10, 0, 1, 8, 0, 0, 0, 0, 1, 2
    )
    strf = struct.pack("<IiiHHIIiiII", 40, 1, 2, 1, 24, 0, 8, 0, 0, 0, 0)
    # on-disk DIB, bottom-up BGR with 1-byte row pad:
    # stored row 0 = logical bottom = blue; stored row 1 = logical top = red
    dib = bytes([0xFF, 0, 0, 0]) + bytes([0, 0, 0xFF, 0])
    data = (
        struct.pack("<4sI4s", b"RIFF", 0, b"AVI ")
        + lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
        + lst(b"movi", chunk(b"00db", dib))
    )
    vid = mm.parse_avi(data)
    assert (vid["width"], vid["height"], vid["n_frames"]) == (1, 2, 1)
    # decoded top-down RGB: red pixel then blue pixel
    assert vid["frames"][0] == bytes([255, 0, 0, 0, 0, 255])


def test_avi_roundtrip_random():
    import random

    random.seed(13)
    for w, h, n in [(1, 1, 1), (3, 2, 4), (4, 4, 6)]:
        frames = [
            bytes(random.randrange(256) for _ in range(w * h * 3)) for _ in range(n)
        ]
        vid = mm.parse_avi(mm.make_avi(w, h, frames, fps=10))
        assert (vid["width"], vid["height"], vid["n_frames"]) == (w, h, n)
        assert vid["frames"] == frames


def test_frame_sample_real_decodes_avi(spark, sf_dir):
    """frame_sample_real must emit every-2nd decoded frame of each video
    row with the checksum of the DECODED RGB (not the raw DIB bytes)."""
    import hashlib

    from pulsar_internal_spark.sources import tables

    docs = tables.load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 2
    ).limit(3)
    payloads = mm.attach_real_payload(docs)
    rows = mm.frame_sample_real(payloads, every_k=2, max_frames=3).collect()
    assert rows, "video rows must emit frames"
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    for r in rows:
        assert r.frame_idx in (0, 2, 4)
        digest = hashlib.sha256(str(texts[r.doc_id]).encode()).digest()
        stream = digest * 9
        frame = stream[r.frame_idx * 48 : (r.frame_idx + 1) * 48]
        assert r.frame_checksum == hashlib.sha256(frame).hexdigest()[:16]


# ------------------------------------------- winnowing (MOSS) guarantees


def _winnow_py(tokens: list[str], k: int = 4, w: int = 5) -> set[str]:
    """Pure-Python mirror of dedup.kgram_hashes + winnow (sha2 k-grams,
    w-window minima, distinct) — independent of Spark."""
    import hashlib

    kh = [
        hashlib.sha256(" ".join(tokens[i : i + k]).encode()).hexdigest()[:8]
        for i in range(len(tokens) - k + 1)
    ]
    if not kh:
        return set()
    if len(kh) < w:
        return set(kh)
    return {min(kh[i : i + w]) for i in range(len(kh) - w + 1)}


@given(
    left=st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=12),
    shared=st.lists(st.sampled_from("stuvwxyz"), min_size=8, max_size=14),
    right=st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=12),
    prefix=st.lists(st.sampled_from("ijklmnop"), min_size=0, max_size=10),
)
@settings(max_examples=60, deadline=None)
def test_winnowing_shared_run_guarantee(left, shared, right, prefix):
    """The winnowing theorem (Schleimer et al. 2003): any two documents
    sharing a contiguous token run of length >= w + k - 1 (= 8 for
    k=4, w=5) MUST share at least one selected fingerprint."""
    doc_a = left + shared + right
    doc_b = prefix + shared
    fa, fb = _winnow_py(doc_a), _winnow_py(doc_b)
    assert fa & fb, (doc_a, doc_b)


def test_stop_fingerprint_cap_bounds_candidates(spark):
    """MOSS 'too common' rule (drop_hot_keys): a stop-gram shared by N
    docs must NOT induce the ~N^2/2 candidate pairs, while a rare
    shared run between exactly two docs must survive the cap."""
    import random

    from pulsar_internal_spark.operators import dedup as dedup_ops

    random.seed(41)
    vocab = [f"w{i}" for i in range(500)]
    stop_run = "the quick brown fox jumps over the lazy sleeping dog"  # 10 tokens
    rare_run = "zeta eta theta iota kappa lam mu nu xi omicron"  # 10 tokens
    rows = []
    # 20 docs sharing ONLY the stop run (unique filler otherwise)
    for i in range(20):
        filler = " ".join(random.sample(vocab, 12))
        rows.append((i, f"{filler} {stop_run}"))
    # 2 docs sharing the rare run
    for j, i in enumerate(range(100, 102)):
        filler = " ".join(random.sample(vocab, 12))
        rows.append((i, f"{filler} {rare_run}"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    toks = docs.select("doc_id", dedup_ops.tokenized("text").alias("w"))
    kg = toks.select("doc_id", dedup_ops.kgram_hashes(F.col("w"), 4).alias("kh"))
    sel = kg.select("doc_id", dedup_ops.winnow(F.col("kh"), 5).alias("fps"))
    fp = sel.select("doc_id", F.explode("fps").alias("fp"))

    def pairs_of(fp_df):
        a = fp_df.select(F.col("doc_id").alias("id_a"), "fp")
        b = fp_df.select(F.col("doc_id").alias("id_b"), "fp")
        return (
            a.join(b, ["fp"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )

    uncapped = pairs_of(fp).count()
    assert uncapped >= 190, uncapped  # all C(20,2) stop pairs present

    capped = pairs_of(dedup_ops.drop_hot_keys(fp, ["fp"], max_df=8)).collect()
    capped_pairs = {(r.id_a, r.id_b) for r in capped}
    assert (100, 101) in capped_pairs, "rare near-dup pair must survive"
    stop_pairs = [p for p in capped_pairs if p[0] < 100 and p[1] < 100]
    # any residual stop-doc pairs can only come from sub-cap fingerprints
    # (boundary k-grams coinciding by chance), bounded << C(20,2)
    assert len(stop_pairs) <= 8 * 8, stop_pairs
    assert len(stop_pairs) < 190


def test_winnowing_spark_matches_python_mirror(spark, sf_dir):
    """The Spark operator's selected fingerprint sets equal the
    pure-Python mirror on real fixture docs."""
    from pulsar_internal_spark.operators import dedup as dedup_ops
    from pulsar_internal_spark.sources import tables

    docs = tables.load_table(spark, sf_dir, "documents").limit(8)
    toks = docs.select("doc_id", dedup_ops.tokenized("text").alias("w"))
    kg = toks.select("doc_id", dedup_ops.kgram_hashes(F.col("w"), 4).alias("kh"))
    sel = kg.select("doc_id", dedup_ops.winnow(F.col("kh"), 5).alias("fps"))
    got = {r.doc_id: set(r.fps) for r in sel.collect()}
    import re

    for r in docs.select("doc_id", "text").collect():
        tokens = re.split(r"\s+", re.sub(r"\s+", " ", r.text.lower()).strip())
        assert got[r.doc_id] == _winnow_py(tokens), r.doc_id


def test_decode_pixels_falls_back_on_lookalike_bytes():
    """Raw bytes that merely START like an image ('BM...' text, a
    truncated PNG) must fall back to None/hash features, not raise —
    one bad payload must never fail a corpus-wide feature pass."""
    assert mm._decode_pixels(b"BMW is a German carmaker, est. 1916") is None
    assert mm._decode_pixels(mm.PNG_SIG + b"\x00\x01garbage") is None
    feats = mm._stub_decode(b"BMW is a German carmaker", dim=8)
    assert len(feats) == 8  # hash fallback, no exception


def test_decode_pixels_survives_truncated_deflate_and_headers():
    """Malformed-but-plausible PNGs (complete CRC-valid chunks whose
    deflate stream is incomplete; chunk header cut mid-length) must fall
    back to None, not leak struct.error/zlib.error into the stage."""
    import struct
    import zlib

    whole = mm.make_png(4, 4, bytes(range(48)))
    # rebuild with a CRC-valid IDAT holding only HALF the deflate bytes
    pos = 8
    chunks = []
    while pos + 12 <= len(whole):
        clen, tag = struct.unpack_from(">I4s", whole, pos)
        chunks.append((tag, whole[pos + 8 : pos + 8 + clen]))
        pos += 12 + clen
    rebuilt = mm.PNG_SIG
    for tag, body in chunks:
        if tag == b"IDAT":
            body = body[: len(body) // 2]  # incomplete deflate stream
        rebuilt += (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )
    assert mm._decode_pixels(rebuilt) is None

    # file cut exactly at a chunk body's end (its CRC missing): the
    # CRC unpack runs past the buffer -> struct.error path
    pos = 8
    while True:
        clen, tag = struct.unpack_from(">I4s", whole, pos)
        if tag == b"IDAT":
            cut_at_body_end = whole[: pos + 8 + clen]
            break
        pos += 12 + clen
    assert mm._decode_pixels(cut_at_body_end) is None


def test_incremental_minhash_equals_batch_on_union(spark, sf_dir, tmp_path):
    """Batch-equivalence invariant of the signature store: documents
    arriving as THREE arbitrary batches, deduped incrementally, must
    yield exactly the candidate set of one-shot minhash_lsh_candidates
    over the full corpus — and history is never re-signed (the store
    holds one signature row set per batch partition)."""
    import os

    from pulsar_internal_spark.operators import dedup as D
    from pulsar_internal_spark.operators import signature_store as S
    from pulsar_internal_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    store = str(tmp_path / "sigstore")

    # uneven 3-way split
    batches = [
        docs.filter(F.col("doc_id") % 5 <= 1),
        docs.filter(F.col("doc_id") % 5 == 2),
        docs.filter(F.col("doc_id") % 5 >= 3),
    ]
    got = set()
    for i, b in enumerate(batches):
        bid = S.append_signature_batch(spark, b, store)
        assert bid == i
        got |= {
            (r.id_a, r.id_b)
            for r in S.candidates_for_batch(spark, store, bid).collect()
        }

    want = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_candidates(docs).collect()
    }
    assert got == want, (
        f"incremental != batch: missing={sorted(want - got)[:5]} "
        f"extra={sorted(got - want)[:5]}"
    )

    # store layout: pointer-committed generation holding one hive
    # partition per batch (prunable increments)
    from pulsar_internal_spark.operators import store_fs as SFS

    root = SFS.resolve_current(store)
    parts = sorted(d for d in os.listdir(root) if d.startswith("batch_id="))
    assert parts == ["batch_id=0", "batch_id=1", "batch_id=2"]


def test_incremental_minhash_empty_and_single_batches(spark, tmp_path):
    """Edge cases: the first batch against an empty store yields only
    within-batch pairs; an empty batch yields nothing and still
    advances the batch counter consistently."""
    from pulsar_internal_spark.operators import signature_store as S

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),
         (3, "totally different words entirely here now")],
        ["doc_id", "text"],
    )
    store = str(tmp_path / "sigstore_edge")
    bid = S.append_signature_batch(spark, docs, store)
    assert bid == 0
    pairs = {(r.id_a, r.id_b)
             for r in S.candidates_for_batch(spark, store, 0).collect()}
    assert pairs == {(1, 2)}

    empty = docs.filter(F.col("doc_id") < 0)
    bid2 = S.append_signature_batch(spark, empty, store)
    assert bid2 == 1
    assert S.candidates_for_batch(spark, store, 1).count() == 0


def test_store_next_batch_id_from_partition_listing(spark, tmp_path):
    """Sequential batch-id assignment now reads the partition directory
    names (store_fs.max_partition_value) instead of an agg(max) scan
    per append (round 11) — pin the equivalence: sequencing across
    appends, gap-free after an explicit high id, and None on a fresh
    root."""
    from pulsar_internal_spark.operators import signature_store as S
    from pulsar_internal_spark.operators import store_fs

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta")],
        ["doc_id", "text"],
    )
    store = str(tmp_path / "sigstore_listing")
    assert S.append_signature_batch(spark, docs, store) == 0
    assert S.append_signature_batch(spark, docs, store) == 1
    # explicit high id, then sequential resumes after it (same as the
    # old agg(max) + 1 rule)
    S.append_signature_batch(spark, docs, store, batch_id=7)
    assert S.append_signature_batch(spark, docs, store) == 8
    root = store_fs.resolve_current(store)
    assert store_fs.max_partition_value(root, "batch_id") == 8
    assert store_fs.max_partition_value(root, "nope") is None


def test_ann_recall_regression_planted_neighbors(spark, tmp_path):
    """ANN recall@5 gate (fixed-seed planted-neighbor corpus): 20 base
    queries, each with FIVE planted neighbors at tiered similarity
    (cos ~0.99 down to ~0.79 — so the gate exercises the hard tail,
    not just near-duplicates) among 200 random distractors whose best
    cosine is far below every planted tier, PLUS an adversarial tier:
    8 CORRELATED distractors per query at cos ~0.55-0.68 — close
    enough to share most hyperplane signs with the query (they flood
    LSH band buckets) and to crowd the query's IVF cells, but strictly
    below the weakest planted neighbor, so brute-force top-5 is still
    exactly the planted set and recall is stressed, not just met.
    Everything is deterministic — numpy seed, sha-derived hyperplanes,
    seeded kmeans — so these floors are reproducible measurements
    minus a safety margin; any param/seed change that collapses recall
    fails here. Measured at pin time (adversarial fixture): banded LSH
    (8 bands x 8 planes) = 0.91; ivf_topk (8 cells, nprobe=3) = 1.00;
    persisted ivf_index_topk = 1.00. Floors pinned at the
    judge-mandated recall@5 >= 0.8 for lsh_bucketed_topk and
    ivf_index_topk."""
    import numpy as np

    from pulsar_internal_spark.operators import similarity as sim

    rng = np.random.default_rng(7)
    dim = 64
    nq, nd = 20, 200
    bases = rng.normal(size=(nq, dim))
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(bases)]
    pid = 1000
    for i in range(nq):
        for j in range(5):
            noise = 0.13 * (j + 1)
            v = bases[i] + noise * np.linalg.norm(bases[i]) / np.sqrt(
                dim
            ) * rng.normal(size=dim)
            rows.append((pid, [float(x) for x in v]))
            pid += 1
    for i, v in enumerate(rng.normal(size=(nd, dim))):
        rows.append((int(5000 + i), [float(x) for x in v]))
    # adversarial correlated distractors: unit-decomposed u*c + n*s(1-c^2)
    # puts each at an EXACT target cosine c in [0.55, 0.68] from its
    # query — above random (~0.3 best), below the weakest planted tier
    pid = 20000
    for i in range(nq):
        u = bases[i] / np.linalg.norm(bases[i])
        for j in range(8):
            c = 0.55 + 0.13 * rng.random()
            n = rng.normal(size=dim)
            n -= (n @ u) * u
            n /= np.linalg.norm(n)
            v = (u * c + n * np.sqrt(1.0 - c * c)) * np.linalg.norm(bases[i])
            rows.append((pid, [float(x) for x in v]))
            pid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.filter("vec_id < 20")

    bf = sim.brute_force_topk(corpus, queries, k=5).collect()
    bf_pairs = {(r.query_id, r.neighbor_id) for r in bf}
    assert all(1000 <= n < 5000 for _, n in bf_pairs), (
        "fixture broken: brute-force top-5 must be exactly the planted set"
    )

    lsh = {(r.query_id, r.neighbor_id)
           for r in sim.lsh_bucketed_topk(corpus, queries, k=5).collect()}
    lsh_recall = len(lsh & bf_pairs) / len(bf_pairs)
    assert lsh_recall >= 0.80, f"LSH recall@5 collapsed: {lsh_recall}"

    ivf = {(r.query_id, r.neighbor_id)
           for r in sim.ivf_topk(corpus, queries, k=5, num_centroids=8, nprobe=3).collect()}
    ivf_recall = len(ivf & bf_pairs) / len(bf_pairs)
    assert ivf_recall >= 0.80, f"IVF recall@5 collapsed: {ivf_recall}"

    idx = str(tmp_path / "ivf_recall_idx")
    sim.build_ivf_index(corpus, idx, num_centroids=8)
    ivfi = {(r.query_id, r.neighbor_id)
            for r in sim.ivf_index_topk(spark, idx, queries, k=5, nprobe=3).collect()}
    ivfi_recall = len(ivfi & bf_pairs) / len(bf_pairs)
    assert ivfi_recall >= 0.80, f"persisted-IVF recall@5 collapsed: {ivfi_recall}"


def test_ivf_recall_geometry_split(spark):
    """The round-9 geometry claim as a regression pin (RECALL_r09.json,
    BASELINE.md round-9 recall section): on CLUSTERED embeddings
    (mixture-of-Gaussians, within-cluster cos ~0.8 — the realistic
    corpus shape) IVF cells recover the clusters, so nprobe=1 of 8
    already achieves high recall@5; on NEAR-RANDOM embeddings the same
    single-cell probe is blind (recall ~ corpus fraction probed). Any
    change to the kmeans recipe or the probe ranking that erodes the
    clustered-side win, or accidentally 'fixes' the random-side floor
    (which would mean the probe is not pruning at all), fails here.
    Fixture generation is the committed tool's own function
    (tools/gen_clustered_embeddings.generate), seeded."""
    import numpy as np

    from pulsar_internal_spark.operators import similarity as sim
    from tools.gen_clustered_embeddings import generate

    def corpus_of(table):
        rows = [
            (int(i), [float(x) for x in v])
            for i, v in zip(table["vec_id"].to_pylist(), table["embedding"].to_pylist())
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def recall_at_nprobe1(df):
        queries = df.filter("vec_id % 50 = 0")
        bf = {(r.query_id, r.neighbor_id)
              for r in sim.brute_force_topk(df, queries, k=5).collect()}
        ivf = {(r.query_id, r.neighbor_id)
               for r in sim.ivf_topk(df, queries, k=5, num_centroids=8, nprobe=1).collect()}
        return len(ivf & bf) / len(bf)

    clustered = corpus_of(generate(n=400, dim=64, k=8, sigma=0.5, seed=7))
    rng = np.random.default_rng(3)
    rand_rows = [
        (int(i), [float(x) for x in v])
        for i, v in enumerate(rng.normal(size=(400, 64)))
    ]
    random_df = spark.createDataFrame(rand_rows, "vec_id long, embedding array<float>")

    r_clustered = recall_at_nprobe1(clustered)
    r_random = recall_at_nprobe1(random_df)
    assert r_clustered >= 0.85, f"clustered nprobe=1 recall eroded: {r_clustered}"
    assert r_random <= 0.60, (
        f"random nprobe=1 recall {r_random} > 0.6 — the probe is not pruning"
    )
    assert r_clustered > r_random + 0.3, (r_clustered, r_random)


def test_pq_adc_recall_planted_neighbors(spark):
    """PQ recall@5 gate (round 7, same planted-neighbor construction as
    the LSH/IVF gate): 20 base queries x 5 planted neighbors at tiered
    similarity among 200 random distractors, every vector UNIT-
    NORMALIZED — the frozen codebooks are trained on the unit-norm
    embeddings fixture, and serving a PQ index out of its training
    scale is a deployment error, not a robustness target. ADC
    shortlist-50 + exact re-rank must keep recall@5 >= 0.8 (measured
    1.00 at pin time on this fixture; 0.87 against exact top-5 on the
    harder near-random sf0.1 embeddings), and because the final scores
    are EXACT cosines,
    every returned pair that brute force also returns must carry an
    IDENTICAL rounded cos_sim — the approximation may only affect
    which candidates surface, never a reported value."""
    import numpy as np

    from pulsar_internal_spark.operators import similarity as sim
    from pulsar_internal_spark.operators.pq_frozen import CODEBOOKS

    rng = np.random.default_rng(7)
    dim, nq, nd = 64, 20, 200
    bases = rng.normal(size=(nq, dim))

    def unit(v):
        return [float(x) for x in v / np.linalg.norm(v)]

    rows = [(int(i), unit(v)) for i, v in enumerate(bases)]
    pid = 1000
    for i in range(nq):
        for j in range(5):
            noise = 0.13 * (j + 1)
            v = bases[i] + noise * np.linalg.norm(bases[i]) / np.sqrt(
                dim
            ) * rng.normal(size=dim)
            rows.append((pid, unit(v)))
            pid += 1
    for i, v in enumerate(rng.normal(size=(nd, dim))):
        rows.append((int(5000 + i), unit(v)))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.filter("vec_id < 20")

    bf = {(r.query_id, r.neighbor_id): r.cos_sim
          for r in sim.brute_force_topk(corpus, queries, k=5).collect()}
    assert all(1000 <= n < 5000 for _, n in bf), "fixture broken"

    pq = {(r.query_id, r.neighbor_id): r.cos_sim
          for r in sim.pq_fixed_topk(
              corpus, queries, CODEBOOKS, k=5, shortlist=50
          ).collect()}
    recall = len(bf.keys() & pq.keys()) / len(bf)
    assert recall >= 0.80, f"PQ recall@5 collapsed: {recall}"
    for pair in bf.keys() & pq.keys():
        assert bf[pair] == pq[pair], (pair, bf[pair], pq[pair])

    # IVF+PQ combined serving on the same fixture (measured 0.99 at pin
    # time; on the near-random sf0.1 embeddings the combined 0.58 recall
    # decomposes as IVF probing 0.61 x PQ ~0.97 — the coarse pruning,
    # not the code quantization, is the recall spender, exactly the
    # published IVFPQ trade)
    from pulsar_internal_spark.operators.ivf_frozen import CENTROIDS

    ivfpq = {(r.query_id, r.neighbor_id): r.cos_sim
             for r in sim.ivfpq_fixed_topk(
                 corpus, queries, CENTROIDS, CODEBOOKS,
                 k=5, nprobe=3, shortlist=50,
             ).collect()}
    recall2 = len(bf.keys() & ivfpq.keys()) / len(bf)
    assert recall2 >= 0.80, f"IVFPQ recall@5 collapsed: {recall2}"
    for pair in bf.keys() & ivfpq.keys():
        assert bf[pair] == ivfpq[pair], (pair, bf[pair], ivfpq[pair])


def test_ivf_index_pq_serving_matches_inplan_twin(spark, tmp_path):
    """Persisted IVF+PQ index (round 7): build an index WITH codebooks,
    then
      1. the ADC probe over the persisted layout must return EXACTLY
         the in-plan twin's rows (ivfpq_fixed_topk over the same
         centroids read back from the index + the same codebooks) —
         persistence is a layout change, never a semantics change;
      2. the hot ADC scan must NOT read the embedding column (its
         parquet scan's ReadSchema carries only id/codes — the 8-byte
         column pruning that IS the PQ story at 100 TB);
      3. an APPEND to a PQ-carrying index encodes the batch with the
         index's own persisted codebooks (no caller argument to
         drift) and the probe serves the new vectors;
      4. compact_ivf_cells folds batches WITHOUT dropping the codes
         column and the probe serves identical rows after."""
    import numpy as np

    from pulsar_internal_spark.operators import similarity as sim
    from pulsar_internal_spark.operators.pq_frozen import CODEBOOKS

    rng = np.random.default_rng(11)

    def unit(v):
        return [float(x) for x in v / np.linalg.norm(v)]

    rows = [(int(i), unit(v)) for i, v in enumerate(rng.normal(size=(300, 64)))]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.filter("vec_id < 5")
    idx = str(tmp_path / "ivfpq_idx")
    sim.build_ivf_index(corpus, idx, num_centroids=8, codebooks=CODEBOOKS)

    got = {(r.query_id, r.neighbor_id, r.cos_sim, r.rank)
           for r in sim.ivf_index_adc_topk(
               spark, idx, queries, k=5, nprobe=3, shortlist=50
           ).collect()}
    cents = [
        [float(x) for x in r.centroid]
        for r in sorted(
            spark.read.parquet(f"{idx}/centroids").collect(), key=lambda r: r.cell
        )
    ]
    want = {(r.query_id, r.neighbor_id, r.cos_sim, r.rank)
            for r in sim.ivfpq_fixed_topk(
                corpus, queries, cents, CODEBOOKS, k=5, nprobe=3, shortlist=50
            ).collect()}
    assert got == want and got, f"missing={want - got} extra={got - want}"

    # 2. the ADC scan projects only id/cell/codes — embedding pruned
    df = sim.ivf_index_adc_topk(spark, idx, queries, k=5, nprobe=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln and "codes" in ln]
    assert scans and all("embedding" not in ln for ln in scans), plan[:4000]

    # 3. append with auto-encoded codes; new vectors become servable
    extra = spark.createDataFrame(
        [(int(9000 + i), unit(v)) for i, v in enumerate(rng.normal(size=(40, 64)))],
        "vec_id long, embedding array<float>",
    )
    sim.ivf_index_append(spark, extra, idx, batch_id=1)
    after = sim.ivf_index_adc_topk(
        spark, idx, queries, k=300, nprobe=8, shortlist=400
    )
    served = {r.neighbor_id for r in after.collect()}
    assert any(n >= 9000 for n in served), "appended vectors never served"

    # 4. compaction preserves the codes column and the served rows
    before = {(r.query_id, r.neighbor_id, r.cos_sim, r.rank)
              for r in sim.ivf_index_adc_topk(
                  spark, idx, queries, k=5, nprobe=3, shortlist=50
              ).collect()}
    assert sim.compact_ivf_cells(spark, idx) == 2
    post = {(r.query_id, r.neighbor_id, r.cos_sim, r.rank)
            for r in sim.ivf_index_adc_topk(
                spark, idx, queries, k=5, nprobe=3, shortlist=50
            ).collect()}
    assert post == before


def test_image_ahash_banded_pairs_exact_vs_brute_force(spark):
    """Perceptual image dedup exactness: the nibble-banded Hamming join
    must return EXACTLY the brute-force pair set (pigeonhole: hamming
    <= 2 < 4 bands guarantees a shared band), and the planted same-
    group perturbed variants must dominate the matches. The hash is
    computed through the REAL codec path: synth BMP -> parse_bmp ->
    integer aHash."""
    import hashlib

    from pulsar_internal_spark.operators import dedup as D
    from pulsar_internal_spark.operators import multimodal as mm

    ids = list(range(120))  # 40 groups x 3 variants
    docs = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    hashes_df = mm.image_ahash(mm.attach_group_images(docs, groups=40))
    got_hashes = {r.doc_id: r.ahash for r in hashes_df.collect()}

    # independent Python mirror of the synth + hash
    def mirror(doc_id):
        g, v = doc_id % 40, doc_id % 3
        px = bytearray(
            hashlib.sha256(f"img:{g}".encode()).digest()
            + hashlib.sha256(f"img2:{g}".encode()).digest()[:16]
        )
        px[g % 48] = (px[g % 48] + v) % 256
        return mm.ahash_bits(bytes(px), 16)

    assert got_hashes == {i: mirror(i) for i in ids}, "codec path broke the hash"

    pairs = D.hamming_banded_pairs(hashes_df, max_hamming=2)
    got = {(r.id_a, r.id_b, r.hamming) for r in pairs.collect()}
    want = set()
    for i in ids:
        for j in ids:
            if i < j:
                d = bin(mirror(i) ^ mirror(j)).count("1")
                if d <= 2:
                    want.add((i, j, d))
    assert got == want, f"banded != brute force: {got ^ want}"
    # planted pairs recovered: same-group variant pairs at hamming<=2
    same_group = {(a, b) for (a, b, _) in want if a % 40 == b % 40}
    assert len(same_group) >= 30, f"too few planted pairs matched: {len(same_group)}"


def test_image_group_identity_copy_decorrelated(spark):
    """The scale fixture strides doc ids by 1e9 per replica and every
    large gmod the wide tier computes divides 1e9, so group identity
    must fold the copy index in WITH a coprime multiplier (round 11:
    ((doc_id // 1e9) * 9973 + doc_id) % gmod). Three properties, each
    the falsification of a measured failure mode:
    1. the Spark generator path agrees with the independent mirror on
       STRIDED ids (the oracle replays the same formula in SQL);
    2. plain modulo collapse: replicas of one local id land in
       DISTINCT groups, not all in the first copy's group;
    3. diagonal bias (the round-10 additive form's sf100 defect: copy
       indexes <= 4999 only reach group ids 0..~6k of 40000): with
       gmod=40000 the coprime form must reach group ids >= 5000."""
    import hashlib

    from pulsar_internal_spark.operators import multimodal as mm

    stride = 1_000_000_000
    copies = [0, 1, 2, 7, 1000, 4999]
    ids = [c * stride + i for c in copies for i in range(3)]
    docs = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = {
        r.doc_id: r.ahash
        for r in mm.image_ahash(mm.attach_group_images_wide(docs, groups=40)).collect()
    }

    def group_of(doc_id, gmod):
        return (doc_id // stride * 9973 + doc_id) % gmod

    def mirror(doc_id):
        g, v = group_of(doc_id, 40), doc_id % 3
        px = bytearray(
            b"".join(
                hashlib.sha256(f"img8:{g}:{t}".encode()).digest() for t in range(6)
            )
        )
        px[g % 192] = (px[g % 192] + v) % 256
        return mm.ahash_bits(bytes(px), 64)

    assert got == {i: mirror(i) for i in ids}, "strided-id group formula diverged"

    # 2. no plain-modulo collapse: same local id, consecutive copies,
    #    distinct groups (9973 coprime to 40 => copies 0..39 distinct;
    #    arbitrary copy sets may wrap the ring, which is fine)
    replica_groups = {group_of(c * stride, 40) for c in range(40)}
    assert len(replica_groups) == 40, replica_groups

    # 3. no diagonal bias at the sf100 gmod: the additive form capped
    #    group ids at ~6k; the coprime form must escape that band
    sf100_groups = [group_of(c * stride, 40_000) for c in copies]
    assert max(sf100_groups) >= 5_000, sf100_groups
    assert len(set(sf100_groups)) == len(copies), sf100_groups


def test_hamming_banded_pairs_caps_mega_bucket(spark):
    """Adversarial mono-hash cluster: 500 identical fingerprints would
    go quadratic (125k pairs); drop_hot_keys with a low cap must excise
    the degenerate bucket while distinct near-pairs still match."""
    from pulsar_internal_spark.operators import dedup as D

    rows = [(i, 0xABCD) for i in range(500)]        # mega-cluster
    rows += [(1000, 0x1234), (1001, 0x1236)]        # hamming 1 pair
    hashes = spark.createDataFrame(rows, "doc_id long, ahash long")
    pairs = D.hamming_banded_pairs(hashes, max_hamming=2, max_df=50)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1000, 1001) in got, "healthy pair lost to the cap"
    assert not any(a < 500 and b < 500 for a, b in got), (
        "mega-bucket pairs must be excised by the hot-key cap"
    )


def test_hamming_banded_pairs_explicit_partitions(spark):
    """spark.pulsar.pairs.partitions pins the pair-producing stage's
    task count with a keyed repartition that (a) is result-exact vs
    the default AQE path, and (b) actually lands in the plan with the
    requested count (AQE-coalescing the banded exchange by INPUT bytes
    is the sf100 spill mechanism this knob exists to override —
    SPILL_DIAG_imgxwide_sf100_adv16m.json)."""
    from pulsar_internal_spark.operators import dedup as D

    rows = [(i, (0x5A5A + (i % 7)) ^ ((i % 3) << 8)) for i in range(200)]
    hashes = spark.createDataFrame(rows, "doc_id long, ahash long")
    base = {
        (r.id_a, r.id_b, r.hamming)
        for r in D.hamming_banded_pairs(hashes, max_hamming=2).collect()
    }
    spark.conf.set("spark.pulsar.pairs.partitions", "7")
    try:
        pinned_df = D.hamming_banded_pairs(hashes, max_hamming=2)
        pinned = {
            (r.id_a, r.id_b, r.hamming) for r in pinned_df.collect()
        }
        plan = pinned_df._jdf.queryExecution().executedPlan().toString()
        assert "hashpartitioning(band_idx" in plan and "7)" in plan, (
            f"explicit keyed repartition missing from plan:\n{plan[:2000]}"
        )
    finally:
        spark.conf.unset("spark.pulsar.pairs.partitions")
    assert pinned == base, "explicit partitioning changed the pair set"


def test_ivf_index_build_probe_and_partition_pruning(spark, sf_dir, tmp_path):
    """Persisted IVF index: (a) probing with nprobe == num_centroids
    degenerates to exact brute force (same pairs, same ranks), (b) a
    partial probe's scores are exact for every returned pair, and (c)
    the cells scan is DYNAMICALLY PARTITION-PRUNED by the probed cell
    set — the serving-path guarantee that a batch reads
    nprobe/num_centroids of the index, not all of it."""
    from pulsar_internal_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf_idx")
    sim.build_ivf_index(emb, path, num_centroids=8)
    queries = emb.limit(6)

    bf = sim.brute_force_topk(emb, queries, k=5).collect()
    bf_scores = {(r.query_id, r.neighbor_id): r.cos_sim for r in bf}

    full = sim.ivf_index_topk(spark, path, queries, k=5, nprobe=8).collect()
    assert {(r.query_id, r.neighbor_id, r.rank) for r in full} == {
        (r.query_id, r.neighbor_id, r.rank) for r in bf
    }, "nprobe == cells must equal brute force"

    part = sim.ivf_index_topk(spark, path, queries, k=5, nprobe=3)
    for r in part.collect():
        if (r.query_id, r.neighbor_id) in bf_scores:
            assert abs(r.cos_sim - bf_scores[(r.query_id, r.neighbor_id)]) < 1e-9

    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_signature_store_compaction_and_retention(spark, sf_dir, tmp_path):
    """Store maintenance is semantics-preserving: after compacting N
    batch partitions into one base, a NEW batch's candidates are
    byte-identical to the uncompacted store's; retention removes whole
    batch partitions and only silences matches against the expired
    era."""
    from pyspark.sql import functions as F

    from pulsar_internal_spark.operators import signature_store as S
    from pulsar_internal_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b0 = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    b2 = docs.filter(F.col("doc_id") % 3 == 2)

    plain, compacted = str(tmp_path / "s_plain"), str(tmp_path / "s_comp")
    for store in (plain, compacted):
        S.append_signature_batch(spark, b0, store)
        S.append_signature_batch(spark, b1, store)

    folded = S.compact_store(spark, compacted)
    assert folded == 2
    import os

    from pulsar_internal_spark.operators import store_fs as SFS

    assert sorted(
        d
        for d in os.listdir(SFS.resolve_current(compacted))
        if d.startswith("batch_id=")
    ) == ["batch_id=0"]

    # new batch: candidates identical against compacted vs plain store
    bid_p = S.append_signature_batch(spark, b2, plain)
    bid_c = S.append_signature_batch(spark, b2, compacted)
    assert bid_c == 1  # next after the folded base
    got_p = {(r.id_a, r.id_b)
             for r in S.candidates_for_batch(spark, plain, bid_p).collect()}
    got_c = {(r.id_a, r.id_b)
             for r in S.candidates_for_batch(spark, compacted, bid_c).collect()}
    assert got_p == got_c and got_p

    # retention on the plain store: expiring batches 0-1 leaves only
    # within-batch pairs for a re-appended batch
    removed = S.expire_batches(plain, keep_from_batch=2)
    assert removed == [0, 1]
    b3 = docs.filter(F.col("doc_id") % 3 == 2)  # same docs, next batch
    bid3 = S.append_signature_batch(spark, b3, plain)
    only_new = S.candidates_for_batch(spark, plain, bid3)
    # every pair now involves two batch>=2 members (the expired era is
    # gone); pairs against b0/b1 members of other residue classes vanish
    ids = {r.doc_id for r in b3.select("doc_id").collect()} | {
        r.doc_id for r in b2.select("doc_id").collect()
    }
    for r in only_new.collect():
        assert r.id_a in ids and r.id_b in ids


def _py_bpe_apply(toks, a, b):
    """Reference greedy left-to-right BPE merge application."""
    out = []
    for t in toks:
        if out and out[-1] == a and t == b:
            out[-1] = a + " " + b
        else:
            out.append(t)
    return out


def _py_bpe_learn(corpus, n_merges):
    """Reference BPE learning: per round, argmax adjacent pair with
    (count desc, (a, b) asc) tie-break, apply everywhere."""
    from collections import Counter

    cur = [list(d) for d in corpus]
    merges = []
    for _ in range(n_merges):
        counts = Counter(
            (d[i], d[i + 1]) for d in cur for i in range(len(d) - 1)
        )
        if not counts:
            break
        top = max(counts.values())
        best = min(p for p, v in counts.items() if v == top)
        merges.append(best)
        cur = [_py_bpe_apply(d, *best) for d in cur]
    return merges, cur


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=12),
        min_size=1,
        max_size=8,
    ),
    n_merges=st.integers(1, 3),
)
def test_bpe_learn_apply_matches_pure_python(spark, corpus, n_merges):
    """Property: Spark's fold-based greedy merge + driver-loop learning
    == an independent pure-Python BPE on ANY small corpus, including
    self-pair chains (x x x x) where greedy semantics bite. This is the
    round-trip gate behind bpe_encode_tokens' oracle (whose relational
    islands+odd-rank application must equal the same reference)."""
    from pulsar_internal_spark.operators import textops as T

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(corpus)], "doc_id INT, w ARRAY<STRING>"
    )
    got_merges, enc = T.bpe_learn_merges(df, n_merges)
    exp_merges, exp_cur = _py_bpe_learn(corpus, n_merges)
    assert got_merges == exp_merges
    got = {r.doc_id: r.w for r in enc.collect()}
    assert got == {i: d for i, d in enumerate(exp_cur)}


def test_substring_span_dedup_finds_planted_span_and_nothing_else(spark):
    """A 60-token span planted in two docs (arriving as two separate
    batches) must surface as EXACTLY one maximal interval per doc at
    the planted coordinates — no fragments, no extra spans from the
    unique filler — and the scrub must keep the first occurrence
    (owner doc) whole while removing exactly the 60 planted tokens
    from the other."""
    from pulsar_internal_spark.operators import dedup as D

    planted = " ".join(f"span{i}" for i in range(60))
    doc_a = (
        " ".join(f"a{i}" for i in range(40))
        + " " + planted + " "
        + " ".join(f"z{i}" for i in range(30))
    )
    doc_b = (
        " ".join(f"b{i}" for i in range(25))
        + " " + planted + " "
        + " ".join(f"y{i}" for i in range(35))
    )
    doc_c = " ".join(f"c{i}" for i in range(80))  # no duplication
    batch1 = spark.createDataFrame([(1, doc_a), (3, doc_c)], ["doc_id", "text"])
    batch2 = spark.createDataFrame([(2, doc_b)], ["doc_id", "text"])
    docs = batch1.unionByName(batch2)

    toks = docs.select("doc_id", D.tokenized("text").alias("w"))
    occ = D.dup_kgram_occurrences(toks, k=8)
    spans = D.dup_span_intervals(occ, k=8)
    got = {(r.doc_id, r.span_start, r.span_end) for r in spans.collect()}
    # doc 1: filler 1..40, planted 41..100; doc 2: filler 1..25, planted 26..85
    assert got == {(1, 41, 100), (2, 26, 85)}, got

    scrubbed = {r.doc_id: r for r in D.scrub_duplicated_spans(docs, k=8).collect()}
    assert set(scrubbed) == {1, 2, 3}
    assert scrubbed[1].n_removed == 0 and scrubbed[3].n_removed == 0
    assert scrubbed[2].n_removed == 60
    assert "span0" in scrubbed[1].clean_text  # owner keeps its copy
    assert "span" not in scrubbed[2].clean_text
    # doc 2's survivors are its unique filler, in original order
    expect_b = " ".join(f"b{i}" for i in range(25)) + " " + " ".join(
        f"y{i}" for i in range(35)
    )
    assert scrubbed[2].clean_text == expect_b


def test_substring_scrub_edge_docs(spark):
    """Short docs (< k tokens) pass through whole; a doc that is one
    big duplicated span scrubs to '' but still appears."""
    from pulsar_internal_spark.operators import dedup as D

    dup = " ".join(f"d{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(1, "tiny doc here"), (2, dup), (3, dup)], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in D.scrub_duplicated_spans(docs, k=8).collect()}
    assert out[1].n_removed == 0 and out[1].clean_text == "tiny doc here"
    assert out[2].n_removed == 0  # owner (min doc_id) keeps its copy
    assert out[3].n_removed == 12 and out[3].clean_text == ""


def test_span_store_batch_equivalence_and_compaction(spark, sf_dir, tmp_path):
    """Incremental substring-span dedup equivalence: for batches arriving
    in doc-id order, the union of per-batch spans equals the one-shot
    NON-OWNED span set (what keep-first scrub removes); compaction
    preserves history semantics for future batches; explicit-batch-id
    appends are idempotent."""
    from pyspark.sql import functions as F

    from pulsar_internal_spark.operators import dedup as D
    from pulsar_internal_spark.operators import span_store as SS
    from pulsar_internal_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # one-shot non-owned spans: occurrences whose kgram owner differs
    occ = D.dup_kgram_occurrences(
        docs.select("doc_id", D.tokenized("text").alias("w")), k=8
    )
    non_owned = occ.filter(F.col("owner_doc") != F.col("doc_id"))
    want = {
        (r.doc_id, r.span_start, r.span_end)
        for r in D.dup_span_intervals(non_owned, k=8).collect()
    }

    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    cuts = [mx // 3, (2 * mx) // 3]
    batches = [
        docs.filter(F.col("doc_id") <= cuts[0]),
        docs.filter((F.col("doc_id") > cuts[0]) & (F.col("doc_id") <= cuts[1])),
        docs.filter(F.col("doc_id") > cuts[1]),
    ]
    store = str(tmp_path / "span_store")
    got = set()
    for b in batches:
        got |= {
            (r.doc_id, r.span_start, r.span_end)
            for r in SS.incremental_substring_spans(spark, b, store).collect()
        }
    assert got == want, f"missing={want - got} extra={got - want}"

    # compaction folds to one base partition and changes nothing for a
    # future batch (ownership is first-arrival and survives the fold)
    import os

    folded = SS.compact_span_store(spark, store)
    assert folded == 3
    from pulsar_internal_spark.operators import store_fs as SFS

    assert sorted(
        d
        for d in os.listdir(SFS.resolve_current(store))
        if d.startswith("batch_id=")
    ) == ["batch_id=0"]
    replay = batches[2]
    spans_after = {
        (r.doc_id, r.span_start, r.span_end)
        for r in SS.incremental_substring_spans(spark, replay, store).collect()
    }
    # replaying batch 2's docs post-compaction: every kgram now exists in
    # history owned by its original owner, so the spans are exactly batch
    # 2's non-owned spans PLUS full-doc spans where the doc re-matches
    # itself... ownership is first-arrival: the original owners kept
    # their kgrams, so docs that OWNED kgrams now see them owned by
    # themselves — identical span set to the original batch-2 pass.
    batch2_original = {(d, s, e) for (d, s, e) in got if d > cuts[1]}
    assert spans_after == batch2_original

    # explicit-batch-id idempotence: re-appending the same id twice
    # leaves the store row count unchanged
    import duckdb

    root = SFS.resolve_current(store)
    n1 = duckdb.sql(f"SELECT COUNT(*) FROM '{root}/*/*.parquet'").fetchone()[0]
    SS.append_kgram_batch(spark, replay, store, batch_id=9)
    a1 = duckdb.sql(f"SELECT COUNT(*) FROM '{root}/*/*.parquet'").fetchone()[0]
    SS.append_kgram_batch(spark, replay, store, batch_id=9)
    a2 = duckdb.sql(f"SELECT COUNT(*) FROM '{root}/*/*.parquet'").fetchone()[0]
    assert a1 == a2 >= n1


def test_append_kgram_batch_releases_its_staged_blocks(spark, tmp_path):
    """append_kgram_batch stages the signed k-gram frame and must
    release exactly those blocks before returning (DataFrame.unpersist
    is a no-op for localCheckpoint blocks — the release has to go
    through RDD ids). At streaming cadence a leak here compounds into
    block-manager pressure within a few batches; a pre-existing staged
    frame must survive untouched."""
    from pulsar_internal_spark.operators import span_store as SS
    from pulsar_internal_spark.staging import persistent_rdd_ids, stage

    keeper = stage(spark.range(5))
    baseline = persistent_rdd_ids(spark)
    assert baseline, "stage() should pin at least one RDD"
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(4)],
        "doc_id long, text string",
    )
    store = str(tmp_path / "kg_release")
    for b in range(2):
        SS.append_kgram_batch(spark, docs, store, batch_id=b)
        after = persistent_rdd_ids(spark)
        assert after == baseline, (
            f"staged blocks leaked by append batch {b}: {after - baseline}"
        )
    assert keeper.count() == 5  # the pre-existing staged frame survived
    spark.sparkContext._jsc.getPersistentRDDs()  # handle still valid
    from pulsar_internal_spark.staging import release_staged

    release_staged(spark)
    assert not persistent_rdd_ids(spark)


def test_crashed_first_append_is_rebuilt(spark, tmp_path):
    """A first append that died AFTER creating gen-00000000 but BEFORE
    the pointer commit leaves the one legitimate pointerless state; by
    the replay contract its caller never saw success, so the retry
    must REBUILD gen-0 (stacking onto the leftover would double rows)
    and commit the pointer. Any other pointerless generation refuses
    (covered by the damage-guard tests)."""
    import os

    from pulsar_internal_spark.operators import signature_store as S
    from pulsar_internal_spark.operators import store_fs

    docs = spark.createDataFrame(
        [(i, f"w{i} w{i + 1} w{i + 2} alpha beta gamma delta") for i in range(6)],
        "doc_id long, text string",
    )
    store = str(tmp_path / "crashed_first")
    leftover = os.path.join(store, store_fs.FIRST_GEN)
    os.makedirs(os.path.join(leftover, "batch_id=0"))
    with open(os.path.join(leftover, "batch_id=0", "_junk"), "w") as f:
        f.write("partial crashed write")
    assert store_fs.read_pointer(store) is None

    assert S.append_signature_batch(spark, docs, store) == 0
    assert store_fs.read_pointer(store) == store_fs.FIRST_GEN
    assert not os.path.exists(
        os.path.join(leftover, "batch_id=0", "_junk")
    ), "retry must rebuild gen-0, not stack onto the crashed leftover"
    # and the rebuilt store is a normal store: next append increments
    assert S.append_signature_batch(spark, docs, store) == 1


def test_maintenance_lease_blocks_concurrent_maintainers(spark, tmp_path):
    """The single-maintainer window is enforced, not just documented:
    a held (or crash-stale) lease marker makes a second compaction fail
    loudly with recovery guidance; a successful compaction releases it.
    Exercised on both the os fast-path and the file:// Hadoop route
    (atomic createNewFile)."""
    import os

    import pytest

    from pulsar_internal_spark.operators import signature_store as S

    docs = spark.createDataFrame(
        [(i, f"w{i} w{i + 1} w{i + 2} alpha beta gamma delta") for i in range(8)],
        "doc_id long, text string",
    )
    store = str(tmp_path / "lease_store")
    S.append_signature_batch(spark, docs.filter("doc_id < 4"), store)
    S.append_signature_batch(spark, docs.filter("doc_id >= 4"), store)

    # crash-stale lease: compaction refuses with recovery guidance
    lease = store + ".lease"
    open(lease, "w").close()
    with pytest.raises(RuntimeError, match="lease .* already held"):
        S.compact_store(spark, store)
    os.remove(lease)

    assert S.compact_store(spark, store) == 2
    assert not os.path.exists(lease), "lease must be released on success"

    # live maintainer holding the lease (file:// Hadoop route) blocks a
    # second compaction; release re-admits it
    S.append_signature_batch(spark, docs.filter("doc_id >= 4"), store)
    uri = "file://" + store
    with S.maintenance_lease(uri):
        with pytest.raises(RuntimeError, match="lease .* already held"):
            S.compact_store(spark, uri)
    assert S.compact_store(spark, uri) == 2


def test_maintenance_lease_kept_on_inprocess_failure(spark, tmp_path):
    """A maintenance window that raises (failed rename mid-swap, any
    Python-level error) must LEAVE the lease marker behind — the same
    posture as a process kill — so the next maintainer is routed
    through the loud recovery path instead of racing half-done
    leftovers. Release happens only on successful completion."""
    import os

    import pytest

    from pulsar_internal_spark.operators import signature_store as S

    store = str(tmp_path / "fail_store")
    os.makedirs(store)
    lease = store + ".lease"

    with pytest.raises(ValueError, match="mid-window"):
        with S.maintenance_lease(store):
            raise ValueError("simulated failure mid-window")
    assert os.path.exists(lease), "failed window must keep the lease"

    # recovery: operator verifies + deletes the marker, then the next
    # window acquires and (on success) releases it
    with pytest.raises(RuntimeError, match="lease .* already held"):
        with S.maintenance_lease(store):
            pass
    os.remove(lease)
    with S.maintenance_lease(store):
        pass
    assert not os.path.exists(lease), "successful window must release"


def test_bucketed_stores_explicit_batch_replay_idempotent(spark, tmp_path):
    """Explicit-batch-id appends to the BUCKETED catalog stores are
    replace-on-replay (ALTER TABLE DROP PARTITION + bucketed append),
    matching the path stores' dynamic-overwrite contract: re-running a
    batch id leaves row counts and candidate/span sets unchanged, and
    the table keeps its bucketing spec across replays."""
    from pyspark.sql import functions as F

    from pulsar_internal_spark.operators import signature_store as S
    from pulsar_internal_spark.operators import span_store as SS

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"tok{j}" for j in range(i, i + 12)) + " shared tail words here")
            for i in range(10)
        ],
        "doc_id long, text string",
    )
    early, late = docs.filter("doc_id < 5"), docs.filter("doc_id >= 5")

    sig_tbl, kg_tbl = "sig_replay_bkt", "kg_replay_bkt"
    for t in (sig_tbl, kg_tbl):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        S.append_signature_batch_bucketed(spark, early, sig_tbl, batch_id=0)
        S.append_signature_batch_bucketed(spark, late, sig_tbl, batch_id=1)
        n1 = spark.table(sig_tbl).count()
        pairs1 = set(
            (r.id_a, r.id_b)
            for r in S.candidates_for_batch_bucketed(spark, sig_tbl, 1).collect()
        )
        S.append_signature_batch_bucketed(spark, late, sig_tbl, batch_id=1)
        assert spark.table(sig_tbl).count() == n1, "replay double-appended"
        assert (
            set(
                (r.id_a, r.id_b)
                for r in S.candidates_for_batch_bucketed(spark, sig_tbl, 1).collect()
            )
            == pairs1
        )

        kg_early = SS._kgram_occurrences(early, 8, "doc_id", "text")
        kg_late = SS._kgram_occurrences(late, 8, "doc_id", "text")
        SS.append_kgram_batch_bucketed(spark, kg_early, kg_tbl, batch_id=0)
        SS.append_kgram_batch_bucketed(spark, kg_late, kg_tbl, batch_id=1)
        k1 = spark.table(kg_tbl).count()
        SS.append_kgram_batch_bucketed(spark, kg_late, kg_tbl, batch_id=1)
        assert spark.table(kg_tbl).count() == k1, "kgram replay double-appended"
        # first-seen contract intact: every kh still has exactly one row
        assert (
            spark.table(kg_tbl).groupBy("kh").count().filter("count > 1").count()
            == 0
        )
        # bucketing survives the drop+append cycle
        desc = spark.sql(f"DESCRIBE EXTENDED {kg_tbl}").collect()
        txt = "\n".join(f"{r.col_name} {r.data_type}" for r in desc)
        assert "Num Buckets" in txt and "16" in txt, txt
    finally:
        for t in (sig_tbl, kg_tbl):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_ivf_store_compaction_and_expiry(spark, tmp_path):
    """IVF index maintenance completes the four-store contract:
    compaction folds every (cell, batch_id) leaf into batch 0 and must
    change NO probe result (probes ignore the batch level); expiry
    drops a batch horizon's vectors and probes stop serving exactly
    those — over a file:// URI so the sweep exercises the Hadoop
    FileSystem route like the other stores."""
    import os

    import numpy as np

    from pulsar_internal_spark.operators import similarity as sim
    from pulsar_internal_spark.operators import store_fs

    rng = np.random.default_rng(3)
    dim = 8
    vecs = [(int(i), [float(x) for x in rng.normal(size=dim)]) for i in range(60)]
    df_a = spark.createDataFrame(vecs[:30], "vec_id long, embedding array<float>")
    df_b = spark.createDataFrame(vecs[30:], "vec_id long, embedding array<float>")

    local = str(tmp_path / "ivf_maint")
    idx = "file://" + local
    sim.build_ivf_index(df_a, idx, num_centroids=4)
    assert sim.ivf_index_append(spark, df_b, idx) == 1

    queries = df_a.limit(5)
    before = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in sim.ivf_index_topk(spark, idx, queries, k=3, nprobe=2).collect()
    }

    assert sim.compact_ivf_cells(spark, idx) == 2
    # every cell now holds exactly the base batch leaf
    cells_local = store_fs.resolve_current(os.path.join(local, "cells"))
    for cell_dir in sorted(os.listdir(cells_local)):
        if cell_dir.startswith("cell="):
            subs = [
                d
                for d in os.listdir(os.path.join(cells_local, cell_dir))
                if d.startswith("batch_id=")
            ]
            assert subs == ["batch_id=0"], (cell_dir, subs)
    after = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in sim.ivf_index_topk(spark, idx, queries, k=3, nprobe=2).collect()
    }
    assert after == before and after

    # expiry on a freshly appended batch: those vectors stop being served
    sim.ivf_index_append(spark, df_b, idx, batch_id=7)
    removed = sim.expire_ivf_batches(idx, keep_from_batch=7)
    assert removed and all("batch_id=0" in r for r in removed)
    served = {
        r.vec_id
        for r in spark.read.parquet(
            store_fs.resolve_current(store_fs.join(idx, "cells"))
        )
        .select("vec_id")
        .distinct()
        .collect()
    }
    assert served == {v[0] for v in vecs[30:]}, "only batch 7 must survive"


def test_stage_level_knob(spark):
    """staging.stage honors spark.pulsar.stage.level: disk_only staged
    blocks never occupy heap (the sf100 image-keepers OOM class:
    BlockManager re-materializing a tens-of-GB disk block as
    deserialized row objects), memory_disk_ser stores serialized,
    default keeps Spark's deserialized localCheckpoint level. Results
    identical across levels; bogus level fails loudly."""
    import pytest

    from pulsar_internal_spark import staging

    df = spark.range(500).selectExpr("id", "id * 2 AS v")
    want = 500
    expect = {
        "default": "StorageLevel(disk, memory, deserialized, 1 replicas)",
        "memory_disk_ser": "StorageLevel(disk, memory, 1 replicas)",
        "disk_only": "StorageLevel(disk, 1 replicas)",
    }
    try:
        for lvl, level_str in expect.items():
            before = staging.persistent_rdd_ids(spark)
            spark.conf.set(staging.LEVEL_CONF, lvl)
            staged = staging.stage(df)
            assert staged.count() == want
            new = {
                rid: j.getStorageLevel().toString()
                for rid, j in dict(
                    spark.sparkContext._jsc.getPersistentRDDs()
                ).items()
                if rid not in before
            }
            assert level_str in new.values(), (lvl, new)
            staging.release_staged(spark, keep=before)
        spark.conf.set(staging.LEVEL_CONF, "bogus")
        with pytest.raises(ValueError, match="stage.level"):
            staging.stage(df)
    finally:
        spark.conf.unset(staging.LEVEL_CONF)


def test_reliable_staging_mode(spark, tmp_path):
    """staging.stage honors spark.pulsar.stage.mode: 'reliable' routes
    through RDD checkpoint() into spark.pulsar.stage.dir (surviving
    executor loss on a cluster — the conf the docstrings point at),
    produces identical results to the default localCheckpoint path,
    and fails loudly on a bad mode or a missing dir."""
    import os

    import pytest

    from pulsar_internal_spark import staging
    from pulsar_internal_spark.operators import graph as G

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)], ["src", "dst"]
    )
    local_cc = {
        (r.id, r.cluster_id)
        for r in G.connected_components(edges).collect()
    }
    ckdir = str(tmp_path / "stage_ck")
    try:
        spark.conf.set(staging.MODE_CONF, "reliable")
        spark.conf.set(staging.DIR_CONF, ckdir)
        reliable_cc = {
            (r.id, r.cluster_id)
            for r in G.connected_components(edges).collect()
        }
        assert reliable_cc == local_cc
        # checkpoints actually landed in the configured dir
        found = [
            f
            for root, _, files in os.walk(ckdir)
            for f in files
            if f.startswith("part-")
        ]
        assert found, "reliable staging must write checkpoint files"

        spark.conf.set(staging.MODE_CONF, "bogus")
        with pytest.raises(ValueError, match="stage.mode"):
            staging.stage(edges)
    finally:
        spark.conf.set(staging.MODE_CONF, "local")
        spark.conf.unset(staging.DIR_CONF)


def test_store_maintenance_routes_uris_via_hadoop_fs(spark, tmp_path):
    """Store maintenance (probe/rename/delete/list) routes URI paths
    through the Hadoop FileSystem API of the active session (store_fs),
    replacing the pre-round-6 loud-refusal guard. Exercised on file://
    — the Hadoop LOCAL filesystem client, the same API surface hdfs://
    takes, no cluster needed — across the full store lifecycle: append,
    compaction swap, expiry, orphan-guard detection. The os fast-path
    (plain paths) and the Hadoop route must agree on what they see."""
    import os

    import pytest

    from pulsar_internal_spark.operators import signature_store as S
    from pulsar_internal_spark.operators import store_fs

    local = str(tmp_path / "store")
    uri = "file://" + local

    docs = spark.createDataFrame(
        [
            (i, f"tok{i} tok{i + 1} tok{i + 2} alpha beta gamma delta")
            for i in range(8)
        ],
        "doc_id long, text string",
    )
    b0 = S.append_signature_batch(spark, docs.filter("doc_id < 4"), uri)
    b1 = S.append_signature_batch(spark, docs.filter("doc_id >= 4"), uri)
    assert (b0, b1) == (0, 1)
    # both routes see the same store: pointer + gen-0 written via the
    # Hadoop FileSystem client, readable through the os fast-path
    assert store_fs.is_dir(uri) and os.path.isdir(local)
    assert store_fs.read_pointer(uri) == store_fs.FIRST_GEN
    assert store_fs.read_pointer(local) == store_fs.FIRST_GEN
    assert store_fs.list_generations(uri) == store_fs.list_generations(local)
    rows_before = spark.read.parquet(uri + "/" + store_fs.FIRST_GEN).count()

    # compaction = pointer commit: next generation written via Hadoop
    # FS, pointer create-overwritten, superseded generation deleted
    assert S.compact_store(spark, uri) == 2
    cur = store_fs.read_pointer(uri)
    # counter advanced to 1; the suffix is the per-attempt nonce (r8)
    assert cur.startswith("gen-00000001"), cur
    assert store_fs.list_generations(local) == [cur], (
        "superseded generation must be cleaned up"
    )
    root = store_fs.resolve_current(uri)
    assert store_fs.list_subdirs(root) == ["batch_id=0"]
    assert spark.read.parquet(root).count() == rows_before

    # expiry: partition delete inside the pointed generation
    S.append_signature_batch(spark, docs.filter("doc_id >= 4"), uri)
    assert S.expire_batches(uri, keep_from_batch=1) == [0]
    assert store_fs.list_subdirs(store_fs.resolve_current(uri)) == ["batch_id=1"]

    # damage guards fire through the Hadoop probe too: a pointer whose
    # generation dir vanished, and a real store whose pointer was deleted
    os.rename(
        os.path.join(local, cur), os.path.join(local, cur) + "_hidden"
    )
    with pytest.raises(RuntimeError, match="generation directory is missing"):
        S.ensure_no_orphan_generation(uri)
    os.rename(
        os.path.join(local, cur) + "_hidden", os.path.join(local, cur)
    )
    os.remove(os.path.join(local, store_fs.POINTER))
    with pytest.raises(RuntimeError, match="lost its pointer"):
        S.ensure_no_orphan_generation(uri)
    store_fs.write_pointer(uri, cur)  # operator recovery via Hadoop route
    assert store_fs.read_pointer(local) == cur
    # and a clean missing store stays a no-op on both routes
    S.ensure_no_orphan_generation(str(tmp_path / "fresh"))
    S.ensure_no_orphan_generation("file://" + str(tmp_path / "fresh"))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    hashes=st.lists(st.integers(0, (1 << 16) - 1), min_size=2, max_size=25),
    max_hamming=st.integers(0, 3),
)
def test_hamming_banded_pairs_pigeonhole_property(spark, hashes, max_hamming):
    """Property: for ANY 16-bit fingerprint multiset and any threshold
    below the band count, the banded join returns EXACTLY the
    brute-force Hamming-pair set — the pigeonhole guarantee, not a
    recall approximation."""
    from pulsar_internal_spark.operators import dedup as D

    rows = [(i, h) for i, h in enumerate(hashes)]
    df = spark.createDataFrame(rows, "doc_id long, ahash long")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in D.hamming_banded_pairs(df, max_hamming=max_hamming).collect()
    }
    want = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1:]:
            d = bin(a[1] ^ b[1]).count("1")
            if d <= max_hamming:
                want.add((a[0], b[0], d))
    assert got == want


def test_audio_fingerprint_banded_pairs_exact_vs_brute_force(spark):
    """Audio perceptual dedup exactness through the REAL codec path:
    synth WAV -> RIFF parse -> sign-of-delta fingerprint must match an
    independent Python mirror byte-for-byte, and the banded Hamming
    pairs must equal brute force (pigeonhole)."""
    import hashlib
    import struct

    from pulsar_internal_spark.operators import dedup as D
    from pulsar_internal_spark.operators import multimodal as mm

    ids = list(range(90))  # 30 groups x 3 variants
    docs = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    fp_df = mm.audio_fingerprint(mm.attach_group_audio(docs, groups=30))
    got_fp = {r.doc_id: r.ahash for r in fp_df.collect()}

    def mirror(doc_id):
        g, v = doc_id % 30, doc_id % 3
        raw = (hashlib.sha256(f"aud:{g}".encode()).digest()
               + hashlib.sha256(f"aud2:{g}".encode()).digest()[:2])
        s = [struct.unpack_from("<h", raw, 2 * i)[0] for i in range(17)]
        j = g % 17
        s[j] = ((s[j] + v + 32768) % 65536) - 32768
        return mm.audio_fingerprint_bits(s)

    assert got_fp == {i: mirror(i) for i in ids}, "codec path broke the fp"

    got = {(r.id_a, r.id_b, r.hamming)
           for r in D.hamming_banded_pairs(fp_df, max_hamming=2).collect()}
    want = set()
    for i in ids:
        for j in ids:
            if i < j:
                d = bin(mirror(i) ^ mirror(j)).count("1")
                if d <= 2:
                    want.add((i, j, d))
    assert got == want
    same_group = {(a, b) for (a, b, _) in want if a % 30 == b % 30}
    assert len(same_group) >= 25, f"too few planted audio pairs: {len(same_group)}"


def test_video_fingerprint_banded_pairs_exact_vs_brute_force(spark):
    """Video perceptual dedup exactness through the REAL codec path:
    synth AVI -> RIFF hdrl/movi parse -> per-frame aHash concat must
    match an independent Python mirror, and the frame-banded Hamming
    pairs must equal brute force (pigeonhole: one band per frame)."""
    import hashlib

    from pulsar_internal_spark.operators import dedup as D
    from pulsar_internal_spark.operators import multimodal as mm

    ids = list(range(60))  # 20 groups x 3 variants
    docs = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    fp_df = mm.video_fingerprint(mm.attach_group_video(docs, groups=20))
    got_fp = {r.doc_id: r.ahash for r in fp_df.collect()}

    def mirror(doc_id):
        g, v = doc_id % 20, doc_id % 3
        fp = 0
        for j in range(4):
            px = bytearray(
                hashlib.sha256(f"vid:{g}:{j}".encode()).digest()
                + hashlib.sha256(f"vid2:{g}:{j}".encode()).digest()[:16]
            )
            if j == g % 4:
                px[g % 48] = (px[g % 48] + v) % 256
            fp |= (mm.ahash_bits(bytes(px), 16) & 0x7FFF) << (15 * j)
        return fp

    assert got_fp == {i: mirror(i) for i in ids}, "codec path broke the fp"

    got = {(r.id_a, r.id_b, r.hamming)
           for r in D.hamming_banded_pairs(
               fp_df, bits=60, band_bits=15, max_hamming=2).collect()}
    want = set()
    for i in ids:
        for j in ids:
            if i < j:
                d = bin(mirror(i) ^ mirror(j)).count("1")
                if d <= 2:
                    want.add((i, j, d))
    assert got == want
    same_group = {(a, b) for (a, b, _) in want if a % 20 == b % 20}
    assert len(same_group) >= 20, f"too few planted video pairs: {len(same_group)}"


def test_perceptual_decoders_drop_corrupt_payloads(spark):
    """A corrupt payload costs one dropped row, never a failed job —
    the multimodal family's standing policy, extended to all three
    perceptual fingerprint decoders."""
    from pulsar_internal_spark.operators import multimodal as mm

    good_img = mm.make_bmp(2, 2, bytes(range(12)))
    good_wav = mm.make_wav([1, -2, 3, -4])
    good_avi = mm.make_avi(4, 4, [bytes(range(48))] * 4)
    garbage = b"\x00garbage not a format"
    trunc_png = mm.make_png(2, 2, bytes(range(12)))[:20]

    img_df = spark.createDataFrame(
        [(1, good_img), (2, garbage), (3, trunc_png)],
        "doc_id long, payload binary",
    )
    assert {r.doc_id for r in mm.image_ahash(img_df).collect()} == {1}

    wav_df = spark.createDataFrame(
        [(1, good_wav), (2, garbage), (3, good_wav[:10])],
        "doc_id long, payload binary",
    )
    assert {r.doc_id for r in mm.audio_fingerprint(wav_df).collect()} == {1}

    avi_df = spark.createDataFrame(
        [(1, good_avi), (2, garbage), (3, good_avi[:30])],
        "doc_id long, payload binary",
    )
    assert {r.doc_id for r in mm.video_fingerprint(avi_df).collect()} == {1}


def test_countmin_never_underestimates(spark, sf_dir):
    """Count-min sketch guarantee: estimate >= exact count, always
    (cells only ever over-count via collisions). Also pins that the
    top-10 candidate set is the true top-10 by (count desc, token)."""
    from pulsar_internal_spark.plans.queries import QUERIES

    rows = QUERIES["countmin_heavy_hitters"](spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.cms_estimate >= r.exact_count, (r.token, r.exact_count, r.cms_estimate)


def test_ivf_index_append_serves_new_vectors(spark, sf_dir, tmp_path):
    """Incremental IVF maintenance: vectors appended to a built index
    must (a) land in exactly the argmin-distance cell of the FROZEN
    centroid table — recomputed independently here — and (b) be
    immediately servable: probing with a clone of an appended vector
    returns that vector as the top neighbor. Also pins the layout:
    appends only ever add files under existing cell= directories."""
    import math
    import os

    from pyspark.sql import functions as F

    from pulsar_internal_spark.operators import similarity as S
    from pulsar_internal_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1).limit(50)
    idx = str(tmp_path / "ivf_idx")
    S.build_ivf_index(half_a, idx, num_centroids=8)

    S.ivf_index_append(spark, half_b, idx)

    from pulsar_internal_spark.operators import store_fs

    cents = {
        r.cell: r.centroid
        for r in spark.read.parquet(os.path.join(idx, "centroids")).collect()
    }
    cells = spark.read.parquet(
        store_fs.resolve_current(os.path.join(idx, "cells"))
    )
    b_ids = {r.vec_id for r in half_b.select("vec_id").collect()}
    got = {
        r.vec_id: (r.cell, r.embedding)
        for r in cells.collect()
        if r.vec_id in b_ids
    }
    assert set(got) == b_ids, "every appended vector must be in the index"
    for vid, (cell, vec) in got.items():
        dists = {
            c: sum((float(a) - b) ** 2 for a, b in zip(vec, ctr))
            for c, ctr in cents.items()
        }
        best = min(dists, key=lambda c: (dists[c], c))
        assert cell == best, (vid, cell, best)

    probe_vec = next(iter(got.values()))[1]
    probe_id = next(iter(got))
    queries = spark.createDataFrame(
        [(999999, [float(x) for x in probe_vec])], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    top = S.ivf_index_topk(spark, idx, queries, k=3, nprobe=3).collect()
    assert top and top[0].neighbor_id == probe_id, top[:3]
    assert math.isclose(top[0].cos_sim, 1.0, abs_tol=1e-4)


def test_histogram_quantile_invariants(spark, sf_dir):
    """Estimator sanity independent of the oracle: per event type the
    histogram quantile estimates must be monotone (p50 <= p90 <= p99),
    sit inside [min, max] of the raw values, and n_values must equal
    the exact non-null count."""
    from pyspark.sql import functions as F

    from pulsar_internal_spark.plans.queries import QUERIES
    from pulsar_internal_spark.sources.tables import load_table

    est = {
        r.event_type: r
        for r in QUERIES["histogram_value_quantiles"](spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r
        for r in load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert set(est) == set(exact)
    for et, r in est.items():
        e = exact[et]
        assert r.n_values == e.n, et
        assert r.p50_est <= r.p90_est <= r.p99_est, (et, r)
        assert e.mn <= r.p50_est and r.p99_est <= e.mx, (et, r, e)


# ------------------------------------------------- PQ index health (r8)


def test_pq_residuals_zero_for_codebook_vectors(spark):
    """A vector that IS its own reconstruction (concatenated codebook
    entries) must carry a ~zero residual: cos(v, v_hat) = 1 up to one
    ulp of sqrt rounding, so the floored micro-residual is 0 or -1 —
    anything larger means the argmin or the fold is wrong."""
    from pulsar_internal_spark.operators.pq_frozen import CODEBOOKS, DSUB, M

    perfect = []
    for pick in (0, 3, 7):
        v: list[float] = []
        for j in range(M):
            v.extend(float(x) for x in CODEBOOKS[j][pick])
        perfect.append((pick, v))
    df = spark.createDataFrame(perfect, "vec_id long, embedding array<float>")
    # float32 storage rounds the double codebook constants — rebuild the
    # exact doubles the codebooks hold, as the index stores them
    df = spark.createDataFrame(perfect, "vec_id long, embedding array<double>")
    rows = sim.pq_residuals(df, CODEBOOKS).collect()
    assert len(rows) == 3
    for r in rows:
        assert -1 <= r.residual_micro <= 0, (r.vec_id, r.residual_micro)


def test_ivf_index_health_tracks_planted_drift(spark, tmp_path):
    """The persisted PQ-carrying index writes one health row per batch
    (sampled mean quantization residual vs the frozen codebooks) and
    ivf_index_health reports drift vs the build baseline: an
    in-distribution append stays near ratio 1, a planted off-
    distribution batch (heavy per-dim noise the codebooks never saw)
    rises clearly above it, and a REPLAYED explicit batch_id replaces
    its own health partition instead of double-counting — the same
    exactly-once contract as the cells write."""
    import numpy as np

    from pulsar_internal_spark.operators.pq_frozen import CODEBOOKS

    rng = np.random.default_rng(11)

    def unit_rows(start, n, noise=0.0):
        out = []
        for i in range(n):
            v = rng.normal(size=64)
            if noise:
                v = v + noise * rng.normal(size=64)
            v = v / np.linalg.norm(v)
            out.append((start + i, [float(x) for x in v]))
        return out

    idx = str(tmp_path / "pq_health_idx")
    base = spark.createDataFrame(
        unit_rows(0, 120), "vec_id long, embedding array<float>"
    )
    sim.build_ivf_index(base, idx, num_centroids=4, codebooks=CODEBOOKS)

    # batch 1: in-distribution (same generator) — residual ~ baseline
    sim.ivf_index_append(
        spark,
        spark.createDataFrame(
            unit_rows(1000, 80), "vec_id long, embedding array<float>"
        ),
        idx,
        batch_id=1,
    )
    # batch 2: planted drift — spiky sparse vectors the smooth gaussian-
    # trained codebooks cannot reconstruct (mass concentrated on a few
    # dims), well off the training distribution
    spiky = []
    for i in range(80):
        v = np.zeros(64)
        hot = rng.choice(64, size=4, replace=False)
        v[hot] = rng.normal(size=4) * 5.0
        v = v / np.linalg.norm(v)
        spiky.append((2000 + i, [float(x) for x in v]))
    drift_df = spark.createDataFrame(spiky, "vec_id long, embedding array<float>")
    sim.ivf_index_append(spark, drift_df, idx, batch_id=2)

    h = {r.batch_id: r for r in sim.ivf_index_health(spark, idx).collect()}
    assert set(h) == {0, 1, 2}
    assert h[0].drift_vs_build == 1.0
    assert h[0].n_sampled == 120 and h[1].n_sampled == 80
    assert 0.7 <= h[1].drift_vs_build <= 1.3, (
        f"in-distribution batch drifted: {h[1]}"
    )
    assert h[2].drift_vs_build > 1.5 * h[1].drift_vs_build, (
        f"planted drift not detected: {h[1]} vs {h[2]}"
    )

    # replay batch 2 (crash-recovery path): still exactly one health row
    # per batch, identical values — no double-count
    sim.ivf_index_append(spark, drift_df, idx, batch_id=2)
    h2 = sim.ivf_index_health(spark, idx).collect()
    assert len(h2) == 3
    again = {r.batch_id: r for r in h2}
    assert again[2].n_sampled == h[2].n_sampled
    assert again[2].mean_residual == h[2].mean_residual


def test_pq_retrain_cutover_drill(spark, tmp_path):
    """END-TO-END drill of the OPERATIONS.md re-train runbook — the
    answer to the index's one monitored failure mode (quantizer drift),
    previously documented but never exercised:

      era-1 index A (codebooks trained on era-1 data) ingests drifted
      batches until ivf_index_health trips the ~1.5 gate -> era-2
      codebooks trained on a CURRENT sample via the committed freeze
      recipe (tools/freeze_pq_codebooks.train_codebooks) -> index B
      built at a NEW path while A keeps serving (appends continue
      against A during the build; B catches the straggler batch up
      before cutover) -> dual-serve window: B must beat-or-match A's
      recall against an independent numpy exact oracle on drifted
      queries and carry a clean health baseline -> cut over, retire A
      (delete its tree): B's serving is byte-identical after the sweep.
    """
    import os
    import shutil
    import sys

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.freeze_pq_codebooks import train_codebooks

    rng = np.random.default_rng(7)

    def era1_rows(start, n):
        out = []
        for i in range(n):
            v = rng.normal(size=64)
            out.append((start + i, [float(x) for x in (v / np.linalg.norm(v))]))
        return out

    def era2_rows(start, n):
        # drifted era: mass concentrated on a few hot dims (the exact
        # spiky generator the planted-drift test proves trips the gate
        # against the production codebooks)
        out = []
        for i in range(n):
            v = np.zeros(64)
            hot = rng.choice(64, size=4, replace=False)
            v[hot] = rng.normal(size=4) * 5.0
            out.append((start + i, [float(x) for x in (v / np.linalg.norm(v))]))
        return out

    schema = "vec_id long, embedding array<float>"
    era1 = era1_rows(0, 160)
    b1, b2 = era2_rows(1000, 80), era2_rows(2000, 80)

    # --- era 1: index A serves the PRODUCTION codebooks (pq_frozen —
    # trained offline on the near-random fixture, the same family as
    # the gaussian era-1 corpus; test_ivf_index_health_tracks_planted_
    # drift proves the spiky era trips the gate against exactly these
    # books). Using the frozen state also keeps the drill's MLlib
    # training budget to era-2 only.
    from pulsar_internal_spark.operators.pq_frozen import CODEBOOKS as BOOKS_A

    idx_a = str(tmp_path / "idx_A")
    df_era1 = spark.createDataFrame(era1, schema)
    sim.build_ivf_index(df_era1, idx_a, num_centroids=4, codebooks=BOOKS_A)

    # --- drifted ingest: health must TRIP the runbook's gate
    sim.ivf_index_append(spark, spark.createDataFrame(b1, schema), idx_a, batch_id=1)
    sim.ivf_index_append(spark, spark.createDataFrame(b2, schema), idx_a, batch_id=2)
    health_a = {r.batch_id: r for r in sim.ivf_index_health(spark, idx_a).collect()}
    assert health_a[2].drift_vs_build > 1.5, (
        f"drill premise failed — drift gate never tripped: {health_a}"
    )

    # --- runbook step 1: re-train on a CURRENT sample (era-2 heavy)
    # via the committed freeze recipe, at the PRODUCTION shape (16
    # subspaces of 4 dims, 16 codes) — a coarser era-2 quantizer loses
    # the dual-serve to A's rich-but-drifted books on this fixture, so
    # shape parity is part of the runbook. train_codebooks pads
    # collapsed fits (mostly-zero spiky subspaces) so degenerate
    # samples cannot produce ragged books.
    current = spark.createDataFrame(b1 + b2 + era1[:40], schema)
    books_b = train_codebooks(current, max_iter=4, seed_base=142)

    # --- step 2: build B at a NEW path; appends continue against A
    idx_b = str(tmp_path / "idx_B")
    sim.build_ivf_index(
        spark.createDataFrame(era1 + b1 + b2, schema), idx_b,
        num_centroids=4, codebooks=books_b,
    )
    b3 = era2_rows(3000, 60)
    df_b3 = spark.createDataFrame(b3, schema)
    sim.ivf_index_append(spark, df_b3, idx_a, batch_id=3)  # A still live
    sim.ivf_index_append(spark, df_b3, idx_b, batch_id=1)  # B catches up

    # --- step 3: dual-serve window. Independent exact oracle in numpy.
    corpus = {i: np.array(v) for i, v in era1 + b1 + b2 + b3}
    queries = era2_rows(9000, 12)
    qdf = spark.createDataFrame(queries, schema)

    def exact_top(qv, k=5):
        sims = {
            i: float(np.dot(qv, v) / (np.linalg.norm(qv) * np.linalg.norm(v)))
            for i, v in corpus.items()
        }
        return set(sorted(sims, key=lambda i: (-sims[i], i))[:k])

    def recall(path):
        got = (
            sim.ivf_index_adc_topk(spark, path, qdf, k=5, nprobe=4)
            .collect()
        )
        by_q: dict = {}
        for r in got:
            by_q.setdefault(r.query_id, set()).add(r.neighbor_id)
        hits = total = 0
        for qid, qv in queries:
            want = exact_top(np.array(qv))
            hits += len(want & by_q.get(qid, set()))
            total += len(want)
        return hits / total

    rec_a, rec_b = recall(idx_a), recall(idx_b)
    assert rec_b >= rec_a, f"era-2 index lost the dual-serve: A={rec_a} B={rec_b}"
    assert rec_b >= 0.6, f"era-2 index recall floor: {rec_b}"
    # B's health baseline is clean — the drifted batches ARE its era
    health_b = {r.batch_id: r for r in sim.ivf_index_health(spark, idx_b).collect()}
    assert health_b[1].drift_vs_build < 1.3, (
        f"era-2 quantizer still sees its own era as drift: {health_b}"
    )

    # --- cutover + retirement sweep: A's tree goes away, B unaffected
    before = {
        (r.query_id, r.neighbor_id)
        for r in sim.ivf_index_adc_topk(spark, idx_b, qdf, k=5, nprobe=4).collect()
    }
    shutil.rmtree(idx_a)
    after = {
        (r.query_id, r.neighbor_id)
        for r in sim.ivf_index_adc_topk(spark, idx_b, qdf, k=5, nprobe=4).collect()
    }
    assert before == after and before
    with pytest.raises(Exception):
        sim.ivf_index_adc_topk(spark, idx_a, qdf, k=5).collect()


def test_ivf_index_health_sampling_is_deterministic_subset(spark, tmp_path):
    """health_sample_mod samples vec_id % mod == 0 — the sampled batch
    row must equal a full-rate health run restricted to those ids (the
    unbiased-at-1/mod-cost contract the 100 TB posture claims)."""
    import numpy as np

    from pulsar_internal_spark.operators.pq_frozen import CODEBOOKS

    rng = np.random.default_rng(3)
    rows = []
    for i in range(90):
        v = rng.normal(size=64)
        rows.append((i, [float(x) for x in (v / np.linalg.norm(v))]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    full_idx = str(tmp_path / "h_full")
    samp_idx = str(tmp_path / "h_samp")
    sim.build_ivf_index(df, full_idx, num_centroids=4, codebooks=CODEBOOKS)
    sim.build_ivf_index(
        df, samp_idx, num_centroids=4, codebooks=CODEBOOKS, health_sample_mod=3
    )
    samp = spark.read.parquet(samp_idx + "/health").collect()[0]
    assert samp.n_sampled == 30
    # recompute the expected sampled mean from the operator directly
    sub = df.filter("vec_id % 3 = 0")
    expect = (
        sim.pq_residuals(sub, CODEBOOKS)
        .agg(F.sum("residual_micro").alias("s"), F.count("*").alias("n"))
        .collect()[0]
    )
    assert samp.sum_residual_micro == expect.s
    assert samp.mean_residual == round(expect.s / (expect.n * 1e6), 6)
    # the full-rate index agrees with the operator over ALL ids too
    full = spark.read.parquet(full_idx + "/health").collect()[0]
    exp_full = (
        sim.pq_residuals(df, CODEBOOKS)
        .agg(F.sum("residual_micro").alias("s"), F.count("*").alias("n"))
        .collect()[0]
    )
    assert full.n_sampled == 90
    assert full.sum_residual_micro == exp_full.s


def test_ivfpq_recall_eval_sample_mod_is_exact_subset(spark):
    """Sampled eval mode (r8): because both eval arms are per-query
    independent, sample_mod=5 must return EXACTLY the full eval's rows
    for the sampled queries (query_id % 500 == 0) — sampling changes
    the baseline's cost, never any returned value."""
    from pulsar_internal_spark.plans.queries import QUERIES

    sf = "/root/testdata/sf0.01"
    full = {
        r.query_id: (r.n_hits, r.recall_at_5)
        for r in QUERIES["ivfpq_recall_eval"](spark, sf).collect()
    }
    sampled = {
        r.query_id: (r.n_hits, r.recall_at_5)
        for r in QUERIES["ivfpq_recall_eval"](spark, sf, sample_mod=5).collect()
    }
    assert sampled, "sample must be non-empty at sf0.01"
    assert set(sampled) == {q for q in full if q % 500 == 0}
    for q, v in sampled.items():
        assert v == full[q], (q, v, full[q])


# ------------------------------------- sink maintenance + fencing (r8)


def test_sink_compaction_and_retention(spark, tmp_path):
    """Streaming sinks are generation stores since round 8:
    compact_sink_batches folds CONSUMED batch partitions into base id 0
    (leaving unconsumed batches untouched, rows preserved exactly) and
    expire_sink_batches drops aged partitions — closing the
    thousands-of-tiny-partitions accrual between consumers (VERDICT r7
    #6). Crash windows mirror the stores': an unreferenced stale
    generation never affects reads and is swept by the next window."""
    import os

    from pulsar_internal_spark.operators import signature_store as S
    from pulsar_internal_spark.operators import store_fs

    sink = str(tmp_path / "cand_sink")
    for b in range(4):
        frame = spark.createDataFrame(
            [(10 * b + i, 10 * b + i + 1, b) for i in range(3)],
            "id_a BIGINT, id_b BIGINT, batch_id INT",
        )
        S._sink_write_batch(frame, sink)

    before = {
        (r.id_a, r.id_b) for r in S.read_candidates_sink(spark, sink).collect()
    }
    assert len(before) == 12

    # plant a pre-flip crash leftover: unreferenced generation dir
    stale = os.path.join(sink, store_fs.next_generation(store_fs.FIRST_GEN))
    os.makedirs(stale, exist_ok=True)
    open(os.path.join(stale, "_garbage"), "w").write("partial")
    assert {
        (r.id_a, r.id_b) for r in S.read_candidates_sink(spark, sink).collect()
    } == before, "unreferenced generation must not affect sink reads"

    # fold consumed batches 0..2; batch 3 is unconsumed and untouched
    assert S.compact_sink_batches(spark, sink, upto_batch=2) == 3
    assert not os.path.exists(stale), "window must sweep stale leftovers"
    after = S.read_candidates_sink(spark, sink)
    assert {
        (r.id_a, r.id_b) for r in after.collect()
    } == before, "compaction must preserve every sink row"
    got_batches = {r.batch_id for r in after.select("batch_id").distinct().collect()}
    assert got_batches == {0, 3}, got_batches

    # idempotent: nothing left to fold below the watermark
    assert S.compact_sink_batches(spark, sink, upto_batch=2) == 1

    # retention: expire the folded base, keep the live batch
    assert S.expire_sink_batches(sink, keep_from_batch=1) == [0]
    left = S.read_candidates_sink(spark, sink)
    assert {r.batch_id for r in left.select("batch_id").distinct().collect()} == {3}
    assert left.count() == 3


def test_sink_read_refuses_legacy_flat_layout(spark, tmp_path):
    """A pre-round-8 flat sink (batch_id=* dirs, no pointer) must fail
    loudly with migration guidance, never silently serve empty."""
    import pytest as _pytest

    from pulsar_internal_spark.operators import signature_store as S

    legacy = str(tmp_path / "flat_sink")
    spark.createDataFrame(
        [(1, 2, 0)], "id_a BIGINT, id_b BIGINT, batch_id INT"
    ).write.partitionBy("batch_id").parquet(legacy)
    with _pytest.raises(RuntimeError, match="pre-generation"):
        S.read_candidates_sink(spark, legacy)


def test_swap_fence_aborts_loser_under_lost_lease(spark, tmp_path):
    """Lease fencing (VERDICT r7 #7): two maintainers in the window
    under a LOST lease (simulated — local create_exclusive is actually
    atomic, S3's is not) must produce ONE winner and one LOUD abort,
    never a silent overwrite: the loser's pre-flip fence re-read sees
    the winner's pointer and raises; the winner's generation keeps
    serving; the loser's uniquely-named staging dir (per-attempt nonce)
    is inert and swept by the next window."""
    import os

    import pytest as _pytest

    from pulsar_internal_spark.operators import signature_store as S
    from pulsar_internal_spark.operators import store_fs

    store = str(tmp_path / "fence_store")
    for b in range(3):
        frame = spark.createDataFrame(
            [(100 + 10 * b + i, b % 4, f"k{i}") for i in range(4)],
            "id BIGINT, band_idx INT, band_key STRING",
        )
        S.append_banded_batch(spark, frame, store, batch_id=b)
    want = {
        (r.id, r.band_idx, r.band_key, 0)
        for r in S._read_store(spark, store).drop("batch_id").collect()
    }

    loser_dirs: list[str] = []

    def loser_write(tmp: str) -> None:
        loser_dirs.append(tmp)
        # stage the loser's generation in full...
        S._read_store(spark, store).withColumn(
            "batch_id", F.lit(0)
        ).write.mode("overwrite").partitionBy("batch_id").parquet(tmp)
        # ...then simulate the lost lease: the marker evaporates (S3
        # best-effort) and a second maintainer runs a full window
        os.remove(store + ".lease")
        assert S.compact_store(spark, store) == 3  # the winner commits

    with _pytest.raises(RuntimeError, match="pointer moved"):
        S.swap_in_generation(store, loser_write)

    # winner serves; loser never flipped
    cur = store_fs.read_pointer(store)
    assert cur is not None and os.path.join(store, cur) != loser_dirs[0]
    got = {
        (r.id, r.band_idx, r.band_key, r.batch_id)
        for r in S._read_store(spark, store).collect()
    }
    assert got == want, "winner's compacted store must serve identically"
    # the loser's uniquely-named staging dir was unreferenced from the
    # moment it was written, and the WINNER's window-start sweep already
    # reclaimed it — no manual cleanup, no second window needed
    assert not os.path.isdir(loser_dirs[0]), (
        "loser staging dir must be swept, never referenced"
    )
    assert store_fs.list_generations(store) == [cur]


def test_scrub_bloom_gate_equivalence_and_escape(spark):
    """The round-11 anchor-layer Bloom prunes (k-gram join prune +
    token-position anti-join bypass, SCRUB_DIAG/BASELINE round 11) are
    plan-only: forcing the gate on (min-kgram-rows=1) and switching it
    off (bits=0) must both produce results identical to the default
    plan for scrub AND span finding — exactness does not depend on the
    Bloom FPR because false negatives are impossible and false
    positives ride into the exact joins."""
    from pulsar_internal_spark.operators import dedup as D

    planted = " ".join(f"dup{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"a{i}" for i in range(25)) + " " + planted),
            (2, planted + " " + " ".join(f"b{i}" for i in range(25))),
            (3, " ".join(f"c{i}" for i in range(40))),
            (4, planted),  # whole doc is the duplicated span
        ],
        "doc_id long, text string",
    )

    def snap():
        scrub = sorted(
            map(tuple, D.scrub_duplicated_spans(docs, k=8).collect())
        )
        occ = sorted(
            map(
                tuple,
                D.dup_kgram_occurrences(
                    docs.select(
                        "doc_id", D.tokenized("text").alias("w")
                    ),
                    k=8,
                ).collect(),
            )
        )
        return scrub, occ

    conf = spark.conf
    base = snap()
    try:
        conf.set("spark.pulsar.scrub.bloomMinKgramRows", "1")
        assert snap() == base, "forced-gate plan changed results"
        conf.set("spark.pulsar.scrub.bloomBitsPerKey", "0")
        assert snap() == base, "bits=0 escape hatch changed results"
    finally:
        conf.unset("spark.pulsar.scrub.bloomMinKgramRows")
        conf.unset("spark.pulsar.scrub.bloomBitsPerKey")
