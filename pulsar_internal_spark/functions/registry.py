"""Function registration under reference alias names.

The reference registers every function under 2-18 alias names
(module/internal/env/utils.hpp:16-52; e.g. crypt.hpp:501-535 registers
base64 encode as `crypt.base64encode`, `base64encode`, `base64_encode`,
`base64.encode`, ...). The Spark analogue is `spark.udf.register` for the
parity UDFs plus SQL aliases for built-ins, so `spark.sql` text (the
engine's loadstring path) can call them by any reference name.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .hashing import (
    blake2_lookalike,
    derive_bytes,
    djb2_hex,
)

# alias -> implementation; dots are not legal in Spark function names, so
# `crypt.hash` becomes `crypt_hash` (documented rename).
_PARITY_ALIASES = {
    "crypt_hash": djb2_hex,
    "djb2": djb2_hex,
    "crypt_derive": lambda v: derive_bytes(v, 32),
    "derive32": lambda v: derive_bytes(v, 32),
    "scripthash": blake2_lookalike,
    "blake2_lookalike": blake2_lookalike,
}


def register_all_functions(spark: SparkSession) -> list[str]:
    """Register parity scalars under their alias sets. Returns the names.

    Note: these row-at-a-time registrations exist for SQL-text ergonomics
    (loadstring parity). DataFrame plans use the Arrow-batched pandas UDFs
    in functions.hashing instead — keep hot paths on those.
    """
    from pyspark.sql.types import StringType

    for name, fn in _PARITY_ALIASES.items():
        spark.udf.register(name, fn, StringType())
    return sorted(_PARITY_ALIASES)
