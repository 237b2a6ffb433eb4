"""Dynamic query compilation — the engine's `loadstring`/`loadfile`.

Reference lifecycle (SURVEY.md §3B, closures.hpp:253-344): take source
text, REJECT raw bytecode (IsLuauBytecode heuristic, closures.hpp:
229-251), compile, return a callable. `loadfile` (filesys.hpp:446-507)
reads the source from disk first, under a 100 MiB cap (filesys.hpp:146).

Spark restatement: SQL text -> `spark.sql()` -> Catalyst plan -> a
DataFrame the caller executes when ready. The bytecode-reject heuristic
becomes a binary-content check on the SQL text (same constants: first
byte <= 10, or > 20% non-printables in the first 100 bytes); the
capability stamping / sandboxing of the reference maps to the session
itself (one SparkSession == one sandboxed environment).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import register_views

MAX_SOURCE_BYTES = 100 * 1024 * 1024  # filesys.hpp:146-150


class BinarySourceError(ValueError):
    """Raised for non-text input — the IsLuauBytecode reject
    (closures.hpp:283-287)."""


def looks_binary(text: str) -> bool:
    """closures.hpp:229-251: first char code <= 10, or > 20% of the first
    100 chars outside printable ASCII."""
    if not text:
        return False
    if ord(text[0]) <= 10:
        return True
    head = text[:100]
    nonprint = sum(1 for ch in head if not (0x20 <= ord(ch) <= 0x7E or ch in "\t\n\r"))
    return nonprint / max(len(head), 1) > 0.2


def loadstring(
    spark: SparkSession, source: str, sf_dir: str | None = None
) -> DataFrame:
    """Compile SQL text into a (lazy) DataFrame. If ``sf_dir`` is given,
    the fixture tables are registered as views first so the text can
    reference them by name."""
    if looks_binary(source):
        raise BinarySourceError("raw binary is not accepted; pass SQL text")
    if sf_dir is not None:
        register_views(spark, sf_dir)
    return spark.sql(source)


def loadfile(
    spark: SparkSession, path: str, sf_dir: str | None = None
) -> DataFrame:
    """Read a SQL file (size-capped) and compile it — `loadfile` =
    readfile + loadstring (filesys.hpp:446-507)."""
    size = os.path.getsize(path)
    if size > MAX_SOURCE_BYTES:
        raise ValueError(f"source file exceeds {MAX_SOURCE_BYTES} bytes: {size}")
    with open(path, encoding="utf-8") as f:
        return loadstring(spark, f.read(), sf_dir=sf_dir)
