"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Generalizes the reference's compressed-bytecode envelope (SURVEY.md D6,
bytecode.cpp:130-155): a binary column plus a struct of metadata, with
decode/feature steps as Arrow-batched mapInPandas stages.

The container has no image/audio codecs, so the decode step is a
deterministic STUB (documented): it "decodes" payload bytes into a fake
fixed-shape feature vector derived from sha256, keeping the Spark-side
plumbing (schema, batching, partitioning) real and testable. Swap
`_stub_decode` for a real codec (PIL/torchaudio/decord) in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MODALITIES = ("image", "audio", "video")

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("payload_len", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter: manufacture a binary payload column + metadata
    struct from the text fixture (real pipelines read true bytes)."""
    payload = F.encode(F.col(text_col), "utf-8")
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.col(id_col) % len(MODALITIES) + 1).cast("int"),
    )
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            modality.alias("modality"),
            F.length(payload).alias("payload_len"),
            F.substring(F.sha2(payload, 256), 1, 16).alias("checksum"),
        ).alias("meta"),
    )


def _stub_decode(payload: bytes, dim: int = 8) -> list[float]:
    """STUB decoder — deterministic fake features from sha256 bytes.
    Replace with a real codec in production; raises if dim > 32."""
    if dim > 32:
        raise NotImplementedError("real codecs not available in this container")
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:dim]]


def extract_features(df: DataFrame, dim: int = 8, batch_size_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches of (payload, meta) ->
    fixed-dim float features. The per-batch loop is the pattern a real
    decoder plugs into; partition count follows the input, no shuffle."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "payload_len": [m["payload_len"] for m in pdf["meta"]],
                    "feature": [_stub_decode(p, dim) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(decode_batches, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("resized_len", LongType()),
    ]
)


def resize(df: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """STUB resize stage: real pipelines decode + PIL/ffmpeg-resize the
    payload; the container has no codecs, so the stub derives the
    "resized" byte length deterministically (width*height*3 capped by the
    source length) while keeping the mapInPandas plumbing — batch shape,
    schema, and partition passthrough — production-real."""
    if width > 4096 or height > 4096:
        raise NotImplementedError("real codecs not available in this container")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = width * height * 3
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "width": width,
                    "height": height,
                    "resized_len": [min(n, max(len(p), 1) * 3) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA_MM = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_checksum", StringType()),
    ]
)


def frame_sample(df: DataFrame, every_k: int = 4, max_frames: int = 8) -> DataFrame:
    """STUB frame sampler for video payloads: treats the payload as a
    sequence of fixed-size pseudo-frames, emits every k-th (bounded) with
    a per-frame checksum. One input row fans out to <= max_frames rows —
    the real decode swaps into the same mapInPandas loop."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frame_bytes = 256
        for pdf in it:
            ids, idxs, sums = [], [], []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                if meta["modality"] != "video":
                    continue
                n_frames = max(len(payload) // frame_bytes, 1)
                for j, f in enumerate(range(0, n_frames, every_k)):
                    if j >= max_frames:
                        break
                    chunk = bytes(payload[f * frame_bytes : (f + 1) * frame_bytes])
                    ids.append(doc_id)
                    idxs.append(f)
                    sums.append(hashlib.sha256(chunk).hexdigest()[:16])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_checksum": sums}
            )

    return df.mapInPandas(batches, FRAME_SCHEMA_MM)
