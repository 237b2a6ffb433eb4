"""Length-prefixed frame data source tests (the reference's TCP wire
format as a distributed read — SURVEY.md §4 optional custom source)."""

from __future__ import annotations

import struct

import pytest

from pulsar_internal_spark.sources.lpframes import (
    LengthPrefixedFrames,
    iter_frames,
    write_frames,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(LengthPrefixedFrames)
    return spark


def test_roundtrip_multiple_files(registered, tmp_path):
    spark = registered
    write_frames(str(tmp_path / "a.bin"), [b"alpha", b"beta gamma", b""])
    write_frames(str(tmp_path / "b.bin"), [b"delta"])
    df = spark.read.format("lpframes").load(str(tmp_path))
    rows = sorted(
        ((r.file, r.frame_idx, r.payload, r.n_bytes) for r in df.collect())
    )
    assert rows == [
        ("a.bin", 0, "alpha", 5),
        ("a.bin", 1, "beta gamma", 10),
        ("a.bin", 2, "", 0),
        ("b.bin", 0, "delta", 5),
    ]
    # one partition per file — the declared split unit
    assert df.rdd.getNumPartitions() == 2


def test_oversized_flagged_not_dropped(registered, tmp_path):
    spark = registered
    write_frames(str(tmp_path / "f.bin"), [b"ok", b"x" * 100])
    df = (
        spark.read.format("lpframes")
        .option("maxFrameBytes", "64")
        .load(str(tmp_path / "f.bin"))
    )
    got = {r.payload[:2]: r.oversized for r in df.collect()}
    assert got == {"ok": False, "xx": True}


def test_truncated_frame_raises(tmp_path):
    p = tmp_path / "bad.bin"
    with open(p, "wb") as f:
        f.write(struct.pack(">I", 10))
        f.write(b"short")
    with pytest.raises(ValueError, match="truncated"):
        list(iter_frames(str(p)))


def test_utf8_and_binary_tolerance(registered, tmp_path):
    spark = registered
    write_frames(str(tmp_path / "u.bin"), ["héllo wörld".encode(), b"\xff\xfe"])
    rows = spark.read.format("lpframes").load(str(tmp_path / "u.bin")).collect()
    assert rows[0].payload == "héllo wörld"
    assert rows[1].n_bytes == 2  # undecodable bytes replaced, length kept


def _drain(spark, spool, checkpoint, out_dir):
    """Run the lpframes stream for one batch into a parquet sink (the
    memory sink cannot recover from a checkpoint), then return ALL
    payloads accumulated in the sink so far."""
    q = (
        spark.readStream.format("lpframes")
        .option("path", spool)
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        return {r.payload for r in spark.read.parquet(out_dir).collect()}
    except Exception:
        return set()  # sink dir empty: no batch was committed


def test_stream_reader_incremental_and_recovery(registered, tmp_path):
    """The streaming lpframes source must (a) deliver frames from spool
    files exactly once across triggers and (b) resume AFTER the last
    committed offset on restart from the checkpoint — the reference
    FIFO's consume-once semantics (scheduler.cpp:92-99)."""
    spark = registered
    spool = tmp_path / "spool"
    spool.mkdir()
    ckpt = str(tmp_path / "ckpt")

    out = str(tmp_path / "sink")
    write_frames(str(spool / "000.bin"), [b"one", b"two"])
    got = _drain(spark, str(spool), ckpt, out)
    assert got == {"one", "two"}

    # producer appends a new spool file; restart from the SAME
    # checkpoint must deliver only the new frames (offset recovery) —
    # the sink accumulates, so exactly-once means no duplicated "one"
    write_frames(str(spool / "001.bin"), [b"three"])
    got2 = _drain(spark, str(spool), ckpt, out)
    assert got2 == {"one", "two", "three"}
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 3  # no frame delivered twice


def test_crash_replay_exactly_once_across_offset_boundary(registered, tmp_path):
    """Kill the stream AFTER the offset WAL is written but BEFORE the
    sink commits (a planted foreachBatch crash), then restart from the
    same checkpoint: the engine must replay the torn batch through
    readBetweenOffsets with the SAME offset range — every frame
    delivered exactly once, no frame drifting across the batch
    boundary, new spool files picked up after the replay."""
    import json
    import os

    spark = registered
    spool = tmp_path / "spool3"
    spool.mkdir()
    ckpt = str(tmp_path / "ck3")
    outdir = tmp_path / "batches"
    outdir.mkdir()
    crash = {"armed": False}

    def sink(df, bid):
        rows = sorted((r.file, r.frame_idx, r.payload) for r in df.collect())
        if crash["armed"]:
            crash["armed"] = False
            raise RuntimeError("planted crash: offsets written, commit not")
        (outdir / f"batch-{bid}.json").write_text(json.dumps(rows))

    def run_once():
        q = (
            spark.readStream.format("lpframes")
            .option("path", str(spool))
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        except Exception:
            pass  # the planted crash surfaces as a StreamingQueryException

    write_frames(str(spool / "000.bin"), [b"a1", b"a2"])
    run_once()  # batch 0 commits normally

    write_frames(str(spool / "001.bin"), [b"b1", b"b2"])
    crash["armed"] = True
    run_once()  # batch 1: offsets WAL written, sink crash, no commit
    assert not (outdir / "batch-1.json").exists(), "crashed batch must not commit"

    write_frames(str(spool / "002.bin"), [b"c1"])
    run_once()  # restart: replays batch 1 from the WAL (only — the
    # availableNow plan ends at the WAL'd offset)
    run_once()  # next run picks up 002.bin as batch 2

    batches = {
        f: json.loads((outdir / f).read_text()) for f in os.listdir(outdir)
    }
    # the replayed batch keeps its pre-crash offset range: exactly 001.bin
    assert [r[2] for r in batches["batch-1.json"]] == ["b1", "b2"], batches
    assert [r[2] for r in batches["batch-2.json"]] == ["c1"], batches
    all_rows = [t for b in sorted(batches) for t in batches[b]]
    assert sorted(r[2] for r in all_rows) == ["a1", "a2", "b1", "b2", "c1"]
    assert len(all_rows) == len({(r[0], r[1]) for r in all_rows}), "frame doubled"


def test_stream_reader_empty_spool_no_rows(registered, tmp_path):
    spark = registered
    spool = tmp_path / "empty_spool"
    spool.mkdir()
    got = _drain(spark, str(spool), str(tmp_path / "ck2"), str(tmp_path / "sink2"))
    assert got == set()


def test_distributed_writer_roundtrip_append_overwrite(registered, tmp_path):
    """The writer side: each partition becomes one staged-then-renamed
    epoch-prefixed .bin; roundtrip recovers every payload; append adds
    a second job's files without clobbering the first (epoch-unique
    names); overwrite replaces everything; no staging litter survives."""
    import os

    from pyspark.sql import functions as F

    spark = registered
    out = str(tmp_path / "wire_out")

    def payload_df(prefix, n, parts):
        return spark.range(0, n, 1, parts).select(
            F.concat(F.lit(prefix), F.col("id").cast("string")).alias("payload")
        )

    payload_df("msg-", 100, 4).write.format("lpframes").mode("append").save(out)
    files1 = sorted(f for f in os.listdir(out) if f.endswith(".bin"))
    assert len(files1) == 4 and not any(
        f.endswith(".staging") for f in os.listdir(out)
    )

    back = spark.read.format("lpframes").load(out)
    assert back.rdd.getNumPartitions() == 4
    assert {r.payload for r in back.collect()} == {f"msg-{i}" for i in range(100)}

    # append: second job's epoch sorts after the first, nothing clobbered
    payload_df("more-", 10, 2).write.format("lpframes").mode("append").save(out)
    files2 = sorted(f for f in os.listdir(out) if f.endswith(".bin"))
    assert len(files2) == 6 and files2[:4] == files1
    got = {r.payload for r in spark.read.format("lpframes").load(out).collect()}
    assert got == {f"msg-{i}" for i in range(100)} | {f"more-{i}" for i in range(10)}

    # overwrite: only the new job's files remain
    payload_df("fresh-", 5, 1).write.format("lpframes").mode("overwrite").save(out)
    files3 = [f for f in os.listdir(out) if f.endswith(".bin")]
    assert len(files3) == 1
    got = {r.payload for r in spark.read.format("lpframes").load(out).collect()}
    assert got == {f"fresh-{i}" for i in range(5)}


def test_writer_refuses_oversized_frames(registered, tmp_path):
    """A payload above the cap must fail the job (the reference kills
    the connection, server.cpp:84-85) and leave no committed file."""
    import os

    from pyspark.sql import functions as F

    spark = registered
    out = str(tmp_path / "wire_bad")
    df = spark.range(0, 2).select(
        F.rpad(F.lit("x"), 200, "x").alias("payload")
    )
    with pytest.raises(Exception, match="exceeds cap"):
        df.write.format("lpframes").mode("append").option(
            "maxFrameBytes", "64"
        ).save(out)
    leftover = sorted(os.listdir(out)) if os.path.isdir(out) else []
    committed = [f for f in leftover if not f.startswith(".")]
    assert committed == [], committed


def test_stream_reader_legacy_count_offsets(tmp_path):
    """Checkpoints written by the old count-based offset format
    ({"files": n}) must keep working against the name-based reader —
    same slice semantics, no skip, no double-read."""
    from pulsar_internal_spark.sources.lpframes import _LPFrameStreamReader

    for i, payloads in enumerate([[b"a"], [b"b1", b"b2"], [b"c"]]):
        write_frames(str(tmp_path / f"{i:03d}.bin"), payloads)
    r = _LPFrameStreamReader({"path": str(tmp_path)})

    # legacy start offset: 1 file consumed -> remaining two files
    rows, end = r.read({"files": 1})
    assert [t[2] for t in rows] == ["b1", "b2", "c"]
    assert end == {"last": "002.bin"}  # end is upgraded to name form

    # legacy replay range [1 file, 3 files) -> files 001 and 002
    replay = list(r.readBetweenOffsets({"files": 1}, {"files": 3}))
    assert [t[2] for t in replay] == ["b1", "b2", "c"]

    # mixed: legacy start, name end
    replay = list(r.readBetweenOffsets({"files": 0}, {"last": "001.bin"}))
    assert [t[2] for t in replay] == ["a", "b1", "b2"]

    # name-based steady state: nothing new after the last file
    rows, end = r.read({"last": "002.bin"})
    assert list(rows) == [] and end == {"last": "002.bin"}


def test_commit_preserves_foreign_staging_and_orders_epochs(registered, tmp_path):
    """A committing job must not sweep another job's in-progress staging
    files, and commit-time epochs must sort after everything already
    published (publish order == name order)."""
    import os

    from pyspark.sql import functions as F

    spark = registered
    out = str(tmp_path / "wire_conc")
    os.makedirs(out)
    # a concurrent job's in-progress staged file (foreign job tag)
    foreign = os.path.join(out, ".job-deadbeef-00000.a7.staging")
    with open(foreign, "wb") as f:
        f.write(b"\x00\x00\x00\x01x")

    df = spark.range(0, 10, 1, 2).select(
        F.concat(F.lit("p-"), F.col("id").cast("string")).alias("payload")
    )
    df.write.format("lpframes").mode("append").save(out)
    assert os.path.exists(foreign), "foreign staging must survive commit"

    first_files = sorted(f for f in os.listdir(out) if f.endswith(".bin"))
    df.write.format("lpframes").mode("append").save(out)
    second_files = sorted(f for f in os.listdir(out) if f.endswith(".bin"))
    new = [f for f in second_files if f not in first_files]
    # every newly published name sorts after every previously published
    assert all(n > max(first_files) for n in new), (first_files, new)


def test_overwrite_commit_never_drops_both_generations(registered, tmp_path):
    """Overwrite publishes the new files BEFORE deleting the old ones —
    verified by the final state containing exactly the new generation
    (rename-first ordering is asserted in the writer; here we pin the
    end state and that old data survives an aborted overwrite)."""
    import os

    from pyspark.sql import functions as F

    spark = registered
    out = str(tmp_path / "wire_ow")
    ok = spark.range(0, 5, 1, 1).select(
        F.concat(F.lit("old-"), F.col("id").cast("string")).alias("payload")
    )
    ok.write.format("lpframes").mode("append").save(out)

    # failed overwrite (oversized frame): old generation must survive
    bad = spark.range(0, 2).select(F.rpad(F.lit("x"), 200, "x").alias("payload"))
    with pytest.raises(Exception, match="exceeds cap"):
        bad.write.format("lpframes").mode("overwrite").option(
            "maxFrameBytes", "64"
        ).save(out)
    got = {r.payload for r in spark.read.format("lpframes").load(out).collect()}
    assert got == {f"old-{i}" for i in range(5)}, "old data lost on failed overwrite"

    # successful overwrite: only the new generation remains
    new = spark.range(0, 3, 1, 1).select(
        F.concat(F.lit("new-"), F.col("id").cast("string")).alias("payload")
    )
    new.write.format("lpframes").mode("overwrite").save(out)
    got = {r.payload for r in spark.read.format("lpframes").load(out).collect()}
    assert got == {f"new-{i}" for i in range(3)}


def test_binary_payload_roundtrips_through_wire(registered, tmp_path):
    """Binary frames must survive the reader byte-exact via payload_bin
    (the text `payload` column is a lossy UTF-8 decode): a PNG written
    with write_frames reads back and parses successfully, and the sink
    prefers payload_bin over payload so binary writes roundtrip too."""
    from pulsar_internal_spark.operators.multimodal import make_png, parse_png
    from pulsar_internal_spark.sources.lpframes import write_frames

    spark = registered
    png = make_png(2, 2, bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 8, 7]))
    spool = tmp_path / "binwire"
    spool.mkdir()
    write_frames(str(spool / "000.bin"), [png, b"\x00\xff\xfe plain"])

    df = spark.read.format("lpframes").load(str(spool))
    rows = {r.frame_idx: r for r in df.collect()}
    assert bytes(rows[0].payload_bin) == png
    parsed = parse_png(bytes(rows[0].payload_bin))
    assert (parsed["width"], parsed["height"]) == (2, 2)
    assert bytes(rows[1].payload_bin) == b"\x00\xff\xfe plain"
    # the text decode is lossy for these bytes — that's what payload_bin fixes
    assert rows[1].n_bytes == len(b"\x00\xff\xfe plain")

    # sink side: writing the frame back out preserves the exact bytes
    out = str(tmp_path / "binwire_out")
    df.select("payload", "payload_bin").write.format("lpframes").mode(
        "append"
    ).save(out)
    back = {bytes(r.payload_bin) for r in
            spark.read.format("lpframes").load(out).collect()}
    assert back == {png, b"\x00\xff\xfe plain"}


def test_empty_zero_partition_commit_succeeds(registered, tmp_path):
    """A 0-partition write runs no tasks, so no task ever created the
    directory — commit() must still publish an (empty) generation
    instead of crashing on the missing dir."""
    import os

    spark = registered
    out = str(tmp_path / "empty_gen")
    empty = spark.createDataFrame([], "payload string").repartition(1).limit(0)
    # force an actually-empty plan: rdd with 0 partitions via filter
    empty.write.format("lpframes").mode("append").save(out)
    assert os.path.isdir(out)
    assert spark.read.format("lpframes").load(out).count() == 0


def test_concurrent_commits_keep_name_order(registered, tmp_path):
    """Two writers committing concurrently must serialize through the
    commit lock so epochs are assigned in publish order — no later-
    visible file may carry a lower epoch than an earlier-visible one.
    Simulated by interleaving two writer objects' commit phases."""
    import os

    from pulsar_internal_spark.sources.lpframes import (
        _LPFrameCommit,
        _LPFrameWriter,
        iter_frames,
    )

    out = str(tmp_path / "race")
    os.makedirs(out)

    def stage(writer, tag):
        staged = os.path.join(out, f".job-{writer.job}-00000.a0.staging")
        import struct as _s
        with open(staged, "wb") as f:
            body = tag.encode()
            f.write(_s.pack(">I", len(body)))
            f.write(body)
        return [_LPFrameCommit(staged, 0, 1)]

    a = _LPFrameWriter({"path": out}, overwrite=False)
    b = _LPFrameWriter({"path": out}, overwrite=False)
    ma, mb = stage(a, "from-a"), stage(b, "from-b")
    # B commits first, then A: A's epoch must still sort AFTER B's
    b.commit(mb)
    names_after_b = sorted(f for f in os.listdir(out) if f.endswith(".bin"))
    a.commit(ma)
    names_after_a = sorted(f for f in os.listdir(out) if f.endswith(".bin"))
    new = [n for n in names_after_a if n not in names_after_b]
    assert len(new) == 1 and new[0] > max(names_after_b)
    assert not os.path.exists(os.path.join(out, ".commit.lock"))


def test_commit_lock_blocks_second_committer(tmp_path):
    """While one job holds the commit lock, a second job's commit spins
    until release — and a stale lock is broken after the timeout."""
    import os
    import threading
    import time

    from pulsar_internal_spark.sources.lpframes import _LPFrameWriter

    out = str(tmp_path / "lockdir")
    os.makedirs(out)
    w = _LPFrameWriter({"path": out}, overwrite=False)
    lock = os.path.join(out, ".commit.lock")
    open(lock, "w").close()

    acquired = []

    def contender():
        got = w._acquire_commit_lock(timeout_s=5.0)
        acquired.append(got)
        os.remove(got)

    t = threading.Thread(target=contender)
    t.start()
    time.sleep(0.2)
    assert not acquired, "lock acquired while held"
    os.remove(lock)  # holder releases
    t.join(timeout=5)
    assert acquired, "contender never acquired after release"

    # stale-lock break: a lock whose mtime is ancient is removed
    open(lock, "w").close()
    old = time.time() - 120
    os.utime(lock, (old, old))
    got = w._acquire_commit_lock(timeout_s=60.0)
    os.remove(got)
