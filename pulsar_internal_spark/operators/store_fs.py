"""Filesystem routing for incremental-store maintenance.

The four persisted stores (signature, sketch, span, IVF) implement
their crash posture — orphan guard, staged generation swap, batch
expiry — with directory probes, renames and recursive deletes. Those
operations must hit the SAME filesystem the store lives on: an
os-level call against an ``hdfs://`` URI silently answers "no such
directory", which would no-op the orphan guard and build compaction
generations on the driver's local disk while the real store sat
untouched (the silent-no-op hazard the pre-round-6 loud-failure guard
existed to stop).

Routing rule: a path WITH a URI scheme (``file://``, ``hdfs://``,
``s3a://``, ...) goes through the Hadoop FileSystem API of the active
SparkSession's JVM — the same client Spark's own reads/writes use, so
probes and renames see exactly what ``spark.read.parquet`` sees. A
plain path (no scheme) keeps the os-level fast path: no JVM
round-trips, and usable before any session exists.

Atomicity note, kept honest: HDFS (and local ``file://``) rename is
atomic, so the staged swap's crash windows are the same as the local
path's. Object stores (``s3a://``) emulate rename with copy+delete —
O(data) and non-atomic — so on S3 the swap degrades to
eventually-correct-with-manual-recovery: each generation directory is
still internally complete (parquet job commit), and the orphan guard
still detects a died-mid-swap store, but the swap itself is not a
metadata operation there. A production S3 deployment should place the
store on a manifest-committing table layer instead; nothing here hides
that.
"""

from __future__ import annotations

from typing import Callable


def has_scheme(path: str) -> bool:
    """True when ``path`` carries a URI scheme (``scheme://...``)."""
    head = path.split("://", 1)
    return len(head) == 2


def _hadoop(path: str):
    """(FileSystem, Path-class) for ``path`` via the active session's
    JVM. Maintenance on a remote store requires a live SparkSession —
    the same precondition as reading the store at all."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            f"store maintenance on URI {path!r} needs an active "
            "SparkSession (the Hadoop FileSystem client lives in its JVM); "
            "start the session first"
        )
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jvm.org.apache.hadoop.fs.Path


def is_dir(path: str) -> bool:
    """Directory-existence probe on the store's own filesystem."""
    if has_scheme(path):
        fs, mk = _hadoop(path)
        p = mk(path)
        return bool(fs.exists(p) and fs.getFileStatus(p).isDirectory())
    import os

    return os.path.isdir(path)


def rename(src: str, dst: str) -> None:
    """Rename ``src`` to ``dst`` (dst must not exist — both swap
    renames operate on just-cleared targets). Raises on failure rather
    than returning Hadoop's boolean false, so a half-done swap is loud."""
    if has_scheme(src) or has_scheme(dst):
        fs, mk = _hadoop(src)
        if not fs.rename(mk(src), mk(dst)):
            raise OSError(f"Hadoop FileSystem rename failed: {src!r} -> {dst!r}")
        return
    import os

    os.replace(src, dst)


def delete_dir(path: str, ignore_missing: bool = False) -> None:
    """Recursive directory delete on the store's filesystem. With
    ``ignore_missing`` a vanished path is fine (crash-leftover sweeps);
    otherwise a failed delete surfaces (see swap_in_generation's strict
    final cleanup)."""
    if has_scheme(path):
        fs, mk = _hadoop(path)
        p = mk(path)
        if not fs.exists(p):
            if ignore_missing:
                return
            raise FileNotFoundError(path)
        if not fs.delete(p, True):
            raise OSError(f"Hadoop FileSystem recursive delete failed: {path!r}")
        return
    import shutil

    if ignore_missing:
        shutil.rmtree(path, ignore_errors=True)
    else:
        shutil.rmtree(path)


def list_subdirs(path: str) -> list[str]:
    """Immediate child directory NAMES (not paths), sorted — the shape
    the hive-partition expiry sweeps consume."""
    if has_scheme(path):
        fs, mk = _hadoop(path)
        return sorted(
            st.getPath().getName()
            for st in fs.listStatus(mk(path))
            if st.isDirectory()
        )
    import os

    return sorted(
        d for d in os.listdir(path) if os.path.isdir(os.path.join(path, d))
    )


def create_exclusive(path: str) -> bool:
    """Atomically create an empty marker file; False if it already
    exists. The primitive under maintenance leases: atomic on local
    filesystems (O_CREAT|O_EXCL) and HDFS (namenode-serialized
    createNewFile); on S3 the create is NOT exclusive-atomic — a lease
    there is advisory-best-effort, consistent with store_fs's stated
    S3 degradation."""
    if has_scheme(path):
        fs, mk = _hadoop(path)
        return bool(fs.createNewFile(mk(path)))
    import os

    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    os.close(fd)
    return True


def delete_file(path: str) -> None:
    """Remove a marker file; a missing file is fine (idempotent
    release)."""
    if has_scheme(path):
        fs, mk = _hadoop(path)
        p = mk(path)
        if fs.exists(p):
            fs.delete(p, False)
        return
    import os

    try:
        os.remove(path)
    except FileNotFoundError:
        pass


def join(path: str, *parts: str) -> str:
    """Path join that keeps URI schemes intact (os.path.join is fine
    for both shapes on posix, but be explicit about the contract)."""
    out = path.rstrip("/")
    for part in parts:
        out += "/" + part.strip("/")
    return out


def expire_prefixed_partitions(
    path: str, prefix: str, drop: Callable[[str], bool]
) -> list[str]:
    """Shared retention sweep over a hive-partitioned store directory:
    delete child partitions ``{prefix}{value}`` where ``drop(value)``,
    returning the removed partition names. Directory-level deletes on
    the store's own filesystem — O(#partitions) metadata work locally
    and on HDFS (per-object deletes on S3)."""
    removed = []
    for d in list_subdirs(path):
        if not d.startswith(prefix):
            continue
        if drop(d[len(prefix):]):
            delete_dir(join(path, d))
            removed.append(d)
    return removed
