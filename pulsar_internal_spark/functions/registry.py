"""Function registration under reference alias names.

The reference registers every function under 2-18 alias names
(module/internal/env/utils.hpp:16-52; e.g. crypt.hpp:501-535 registers
base64 encode as `crypt.base64encode`, `base64encode`, `base64_encode`,
`base64.encode`, ...). The Spark analogue is `spark.udf.register` for the
parity UDFs plus SQL aliases for built-ins, so `spark.sql` text (the
engine's loadstring path) can call them by any reference name.
"""

from __future__ import annotations

import base64 as _b64

from pyspark.sql import SparkSession

from .compression import lz4_block_compress, lz4_block_decompress
from .encoding import rsb1_decode, rsb1_encode, rsb1_envelope_hex
from .hashing import (
    blake2_lookalike,
    derive_bytes,
    djb2_hex,
    xor_crypt,
    xor_decrypt,
)


def _b64encode(s: str) -> str:
    return _b64.b64encode(s.encode("utf-8")).decode("ascii")


def _b64decode(s: str) -> str:
    # whitespace-tolerant, like the reference decoder (crypt.hpp:121-184)
    return _b64.b64decode("".join(s.split())).decode("utf-8", errors="replace")


def _rsb1_decode_hex(envelope_hex: str) -> str:
    return rsb1_decode(bytes.fromhex(envelope_hex)).decode("utf-8", errors="replace")


# alias -> implementation. The reference registers every entry point
# under 2-18 names (utils.hpp:16-52; crypt.hpp:501-535 alone registers
# base64 encode as crypt.base64encode / base64encode / base64_encode /
# base64.encode / ...). Dots are not legal in Spark function names, so
# `crypt.hash` becomes `crypt_hash` etc. (documented rename).
_PARITY_ALIASES = {
    # crypt.hash (djb2, crypt.hpp:346-369)
    "crypt_hash": djb2_hex,
    "djb2": djb2_hex,
    # crypt.derive (crypt.hpp:371-398)
    "crypt_derive": lambda v: derive_bytes(v, 32),
    "derive32": lambda v: derive_bytes(v, 32),
    # script fingerprint (script.hpp:40-72)
    "scripthash": blake2_lookalike,
    "blake2_lookalike": blake2_lookalike,
    # base64 family (crypt.hpp:72-222 + alias block :501-535)
    "base64encode": _b64encode,
    "base64_encode": _b64encode,
    "crypt_base64encode": _b64encode,
    "base64decode": _b64decode,
    "base64_decode": _b64decode,
    "crypt_base64decode": _b64decode,
    # crypt.encrypt/decrypt (XOR-IV stream, crypt.hpp:224-309),
    # deterministic-IV mode, hex ciphertext
    "crypt_encrypt": xor_crypt,
    "crypt_decrypt": lambda ct, key: xor_decrypt(ct, key).decode(
        "utf-8", errors="replace"
    ),
    # RSB1 envelope codec (bytecode.cpp:129-155)
    "rsb1_encode": lambda s: rsb1_encode(s.encode("utf-8")).hex(),
    "rsb1_encode_keyed": rsb1_envelope_hex,
    "rsb1_decode": _rsb1_decode_hex,
    "dumpstring": _rsb1_decode_hex,
    # lz4compress/lz4decompress (crypt.hpp:400-470); SQL surface carries
    # the block as hex (Spark SQL strings are not byte-safe)
    "lz4compress": lambda s: lz4_block_compress(s.encode("utf-8")).hex(),
    "lz4_compress": lambda s: lz4_block_compress(s.encode("utf-8")).hex(),
    "lz4decompress": lambda h: lz4_block_decompress(
        bytes.fromhex(h), 1 << 20
    ).decode("utf-8", errors="replace"),
    "lz4_decompress": lambda h: lz4_block_decompress(
        bytes.fromhex(h), 1 << 20
    ).decode("utf-8", errors="replace"),
}


def register_all_functions(spark: SparkSession) -> list[str]:
    """Register parity scalars under their alias sets. Returns the names.

    Note: these row-at-a-time registrations exist for SQL-text ergonomics
    (loadstring parity). DataFrame plans use the Arrow-batched pandas UDFs
    in functions.hashing/encoding instead — keep hot paths on those.
    """
    from pyspark.sql.types import StringType

    for name, fn in _PARITY_ALIASES.items():
        spark.udf.register(name, fn, StringType())
    return sorted(_PARITY_ALIASES)
