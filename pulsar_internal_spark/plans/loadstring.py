"""Dynamic query compilation — the engine's `loadstring`/`loadfile`.

Reference lifecycle (SURVEY.md §3B, closures.hpp:253-344): take source
text, REJECT raw bytecode (IsLuauBytecode heuristic, closures.hpp:
229-251), compile, return a callable. `loadfile` (filesys.hpp:446-507)
reads the source from disk first, under a 100 MiB cap (filesys.hpp:146).

Spark restatement: SQL text -> `spark.sql()` -> Catalyst plan -> a
DataFrame the caller executes when ready. The bytecode-reject heuristic
becomes a binary-content check on the SQL text (exact reference
semantics — see ``looks_binary``); the capability stamping / sandboxing
of the reference maps to the session itself (one SparkSession == one
sandboxed environment).
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
    """Exact IsLuauBytecode parity (closures.hpp:229-251): inputs
    shorter than 4 chars are never binary; otherwise flag only when the
    first char code is <= 10 AND the input is longer than 8 chars AND
    more than head_len/5 (integer division, head_len = min(len, 100)) of
    the head chars are control chars below 0x20 other than tab/LF/CR.
    Both conditions are required — a mostly-printable text that merely
    starts with a control byte, or text rich in non-ASCII codepoints,
    is accepted, matching the reference."""
    if len(text) < 4:
        return False
    if ord(text[0]) > 10:
        return False
    if len(text) <= 8:
        return False
    head = text[:100]
    nonprint = sum(1 for ch in head if ord(ch) < 32 and ch not in "\t\n\r")
    return nonprint > len(head) // 5


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


_SCRIPT_MEMO: dict[str, DataFrame] = {}


def loadstring_memoized(
    spark: SparkSession, source: str, sf_dir: str | None = None
) -> DataFrame:
    """Script-hash memoization (script.hpp:30,127-129: `ScriptHashes`
    map caches each script's fingerprint; repeated submissions reuse
    it). Spark restatement: key = sha256 of the whitespace-normalized
    source; first compile `.cache()`es the DataFrame, so repeated
    submissions of the same text reuse BOTH the Catalyst plan object
    and (after first materialization) the InMemoryRelation blocks."""
    import hashlib

    key = hashlib.sha256(" ".join(source.split()).encode("utf-8")).hexdigest()
    df = _SCRIPT_MEMO.get(key)
    if df is None:
        df = loadstring(spark, source, sf_dir=sf_dir)
        df.cache()
        _SCRIPT_MEMO[key] = df
    return df


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
