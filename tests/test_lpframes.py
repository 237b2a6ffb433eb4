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
