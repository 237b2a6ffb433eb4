"""Validated write sinks — the reference's sandboxed filesystem surface.

Reference semantics (SURVEY.md §2.1):
  - `writefile` (filesys.hpp:180-221): create/overwrite under a sandbox
    root, refusing a blocklist of executable/archive extensions
    (filesys.hpp:10-43; checked at :86-105).
  - `appendfile` (filesys.hpp:223-267): append.
  - path normalization (filesys.hpp:50-84): separator rewrite + base-path
    prefixing so writes can't escape the root.

Spark restatement: `df.write` with mode overwrite/append; the blocklist
and sandbox become a validation rule on the sink path; storage codecs
(zstd/lz4 — the reference's per-value LZ4/ZSTD libs, crypt.hpp:400-470 &
bytecode.cpp) become columnar parquet compression, which is where
compression belongs at 100 TB.

NOTE: the reference's blocklist has a missing-comma bug merging ".pptm"
and ".svg" into one dead entry (filesys.hpp:28-30) — we list both,
fixing the bug rather than reproducing it.
"""

from __future__ import annotations

import os
import posixpath

from pyspark.sql import DataFrame

# filesys.hpp:10-43 (representative set; the reference targets Windows
# executables/scripts/archives)
BLOCKED_EXTENSIONS: frozenset[str] = frozenset(
    {
        ".exe", ".dll", ".com", ".scr", ".bat", ".cmd", ".ps1", ".psm1",
        ".vbs", ".vbe", ".js", ".jse", ".wsf", ".wsh", ".msi", ".msp",
        ".hta", ".cpl", ".jar", ".zip", ".rar", ".7z", ".tar", ".gz",
        ".lnk", ".url", ".reg", ".pptm", ".svg",
    }
)

SUPPORTED_CODECS = ("zstd", "lz4", "snappy", "gzip", "none")


class BlockedExtensionError(ValueError):
    pass


class SandboxEscapeError(ValueError):
    pass


def normalize_sink_path(path: str, base_dir: str) -> str:
    """Normalize separators, resolve the path under ``base_dir``, and
    refuse escapes — the filesys.hpp:50-84 rule with the direction of the
    separator rewrite flipped for POSIX."""
    rel = path.replace("\\", "/").lstrip("/")
    full = posixpath.normpath(posixpath.join(base_dir, rel))
    base = posixpath.normpath(base_dir)
    if full != base and not full.startswith(base + "/"):
        raise SandboxEscapeError(f"path escapes sandbox root: {path!r}")
    return full


def validate_extension(path: str) -> None:
    ext = os.path.splitext(path)[1].lower()
    if ext in BLOCKED_EXTENSIONS:
        raise BlockedExtensionError(f"extension {ext!r} is blocked for writes")


# ---------------------------------------------------------------------------
# Filesystem predicates & mutations (filesys.hpp:269-326,379-444) — the
# sandboxed utility surface around the sinks. Every path goes through
# normalize_sink_path, so nothing can escape base_dir.
# ---------------------------------------------------------------------------


def isfile(path: str, base_dir: str) -> bool:
    """`isfile` (filesys.hpp:269-287): predicate, sandboxed."""
    return os.path.isfile(normalize_sink_path(path, base_dir))


def isfolder(path: str, base_dir: str) -> bool:
    """`isfolder` (filesys.hpp:289-306): predicate, sandboxed."""
    return os.path.isdir(normalize_sink_path(path, base_dir))


def makefolder(path: str, base_dir: str) -> str:
    """`makefolder` (filesys.hpp:308-326): recursive mkdir under the
    sandbox root (parents created, existing ok). Returns the resolved
    path."""
    full = normalize_sink_path(path, base_dir)
    os.makedirs(full, exist_ok=True)
    return full


def delfile(path: str, base_dir: str) -> None:
    """`delfile` (filesys.hpp:379-394): delete one file; refuses
    directories."""
    full = normalize_sink_path(path, base_dir)
    if os.path.isdir(full):
        raise IsADirectoryError(f"delfile target is a folder: {path!r}")
    os.remove(full)


def delfolder(path: str, base_dir: str) -> None:
    """`delfolder` (filesys.hpp:396-427): RECURSIVE folder delete, the
    reference's walk-and-unlink loop via shutil. Refuses the sandbox
    root itself."""
    import shutil

    full = normalize_sink_path(path, base_dir)
    if full == posixpath.normpath(base_dir):
        raise SandboxEscapeError("refusing to delete the sandbox root")
    shutil.rmtree(full)


def listfiles(path: str, base_dir: str) -> list[str]:
    """`listfiles` (filesys.hpp:328-377): NON-recursive listing of
    sandbox-relative paths, sorted for determinism."""
    full = normalize_sink_path(path, base_dir)
    base = posixpath.normpath(base_dir)
    return sorted(
        posixpath.relpath(posixpath.join(full, name), base)
        for name in os.listdir(full)
    )


def write_table(
    df: DataFrame,
    path: str,
    base_dir: str,
    fmt: str = "parquet",
    codec: str = "zstd",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> str:
    """`writefile`: validated overwrite write. Returns the resolved path.

    ``codec`` maps to the columnar compression codec — zstd for cold
    storage ratio, lz4/snappy for hot-path speed. ``partition_by`` is the
    100 TB lever: partition columns prune at read time.
    """
    if codec not in SUPPORTED_CODECS:
        raise ValueError(f"codec must be one of {SUPPORTED_CODECS}")
    full = normalize_sink_path(path, base_dir)
    validate_extension(full)
    writer = df.write.mode(mode).format(fmt)
    if fmt == "parquet":
        writer = writer.option("compression", codec)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(full)
    return full


def append_table(
    df: DataFrame,
    path: str,
    base_dir: str,
    fmt: str = "parquet",
    codec: str = "zstd",
) -> str:
    """`appendfile`: validated append write."""
    return write_table(df, path, base_dir, fmt=fmt, codec=codec, mode="append")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Bucketed managed table — the co-located-join lever.

    Two tables bucketed on the same keys with the same bucket count join
    WITHOUT shuffling either side (Spark matches bucket files 1:1). At
    100 TB this converts the recurring fact-fact shuffle into a one-time
    write-side cost; pick ``num_buckets`` ~ cluster cores x small factor.
    """
    writer = df.write.mode(mode).format(fmt).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
