from .hashing import (
    blake2_lookalike,
    derive_bytes,
    djb2_hex,
    xor_crypt,
    xor_decrypt,
)
from .registry import register_all_functions

__all__ = [
    "blake2_lookalike",
    "derive_bytes",
    "djb2_hex",
    "xor_crypt",
    "xor_decrypt",
    "register_all_functions",
]
