"""RSB1 compressed-envelope codec (reference D6).

Byte-exact reimplementation of the envelope format observed in
module/internal/env/helpers/bytecode/bytecode.cpp:129-155 (decode
direction; encode is our inverse, the reference only decodes):

  layout: [4B masked key][4B LE uint32 decompressed size][zstd frame]
  key unmask:  key[i] = buf[i] ^ 'RSB1'[i]; key[i] -= i*41  (u8 wrap)
  body unmask: buf[i] ^= key[i%4] + i*41                    (u8 wrap)
  (the reference also calls XXH32(buf, 42) and DISCARDS the result —
  a no-op we faithfully omit)

zstd via pyarrow's bundled codec (no external deps). These run
driver-side or inside Arrow-batched UDFs; per-value compression is not
a hot path at scale — columnar codecs (parquet zstd) cover storage.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

MAGIC = b"RSB1"


def _key_schedule(masked: bytes) -> bytes:
    return bytes((masked[i] ^ MAGIC[i]) - i * 41 & 0xFF for i in range(4))


def _mask_key(key: bytes) -> bytes:
    # inverse of _key_schedule: masked[i] = (key[i] + i*41) ^ MAGIC[i]
    return bytes(((key[i] + i * 41) & 0xFF) ^ MAGIC[i] for i in range(4))


def _xor_body(buf: bytearray, key: bytes) -> None:
    for i in range(len(buf)):
        buf[i] ^= (key[i % 4] + i * 41) & 0xFF


def rsb1_decode(envelope: bytes) -> bytes:
    """Unmask + zstd-decompress an RSB1 envelope (bytecode.cpp:129-155)."""
    if len(envelope) < 8:
        raise ValueError("envelope too short")
    key = _key_schedule(envelope[:4])
    buf = bytearray(envelope)
    _xor_body(buf, key)
    size = int.from_bytes(buf[4:8], "little")
    out = pa.Codec("zstd").decompress(bytes(buf[8:]), size, asbytes=True)
    return out


def rsb1_envelope_hex(text: str) -> str:
    """Hex RSB1 envelope of a text payload with a content-derived 4-byte
    key (sha256 prefix) — the golden-oracle form used by the
    rsb1_envelope_nation query. Deterministic: fixed zstd codec +
    deterministic key."""
    import hashlib

    key = hashlib.sha256(text.encode("utf-8")).digest()[:4]
    return rsb1_encode(text.encode("utf-8"), key=key).hex()


def rsb1_roundtrip_ok(text: str, envelope_hex: str) -> bool:
    return rsb1_decode(bytes.fromhex(envelope_hex)) == text.encode("utf-8")


def make_rsb1_udfs():
    """(envelope_udf, roundtrip_udf) as Arrow-batched pandas UDFs.
    Built lazily so this module stays importable without pyspark."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType, StringType

    @pandas_udf(StringType())
    def envelope_udf(s: pd.Series) -> pd.Series:
        return s.map(rsb1_envelope_hex)

    @pandas_udf(BooleanType())
    def roundtrip_udf(text: pd.Series, env: pd.Series) -> pd.Series:
        return pd.Series(
            [rsb1_roundtrip_ok(t, e) for t, e in zip(text, env)]
        )

    return envelope_udf, roundtrip_udf


def rsb1_encode(payload: bytes, key: bytes = b"\x00\x00\x00\x00") -> bytes:
    """Inverse of rsb1_decode: compress, prepend LE size + masked key,
    apply the XOR stream. rsb1_decode(rsb1_encode(p)) == p for any key."""
    if len(key) != 4:
        raise ValueError("key must be 4 bytes")
    comp = pa.Codec("zstd").compress(payload, asbytes=True)
    buf = bytearray(4 + 4 + len(comp))
    buf[4:8] = len(payload).to_bytes(4, "little")
    buf[8:] = comp
    _xor_body(buf, key)  # positions 0-3 are overwritten next
    buf[0:4] = _mask_key(key)
    return bytes(buf)
