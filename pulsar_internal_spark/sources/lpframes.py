"""Length-prefixed frame data source — the reference's wire format.

The reference's TCP server reads messages framed as a 4-byte BIG-ENDIAN
length followed by that many UTF-8 bytes, with an 8 MiB per-message cap
(misc/server/server.cpp:39-67 read loop, :84-85 cap). This module
implements that exact framing as a PySpark Python Data Source
(SURVEY.md §4 named it the one optional custom-source candidate), so
frame logs captured from the wire can be read distributively:

    spark.dataSource.register(LengthPrefixedFrames)
    df = spark.read.format("lpframes").load("/path/to/frames-dir")
    # -> (file, frame_idx, payload, n_bytes, oversized)

Partitioning: one partition per .bin file — frames are variable-length
and not seekable mid-file, so the file is the natural split unit (the
100 TB layout is many capped frame files, e.g. one per producer epoch,
not one giant file). Each partition streams its file; oversized frames
are FLAGGED (the reference kills the connection; we keep the evidence
and let a declarative filter drop them).
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAX_FRAME_BYTES = 8 * 1024 * 1024  # server.cpp:84-85

# ``payload`` is the UTF-8 decode (lossy for binary frames — errors are
# replaced); ``payload_bin`` carries the exact wire bytes, so binary
# frames (BMP/PNG/WAV multimodal payloads) survive the reader intact.
FRAME_SCHEMA = StructType(
    [
        StructField("file", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("payload", StringType()),
        StructField("payload_bin", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("oversized", BooleanType()),
    ]
)


def write_frames(path: str, payloads: list[bytes]) -> None:
    """Producer-side helper: frame payloads into one .bin file with the
    reference's 4-byte BE length prefix (server.cpp framing)."""
    with open(path, "wb") as f:
        for p in payloads:
            f.write(struct.pack(">I", len(p)))
            f.write(p)


def iter_frames(path: str, cap: int = MAX_FRAME_BYTES) -> Iterator[tuple[int, bytes, bool]]:
    """Yield (frame_idx, payload, oversized) from one framed file.
    An oversized frame is still consumed (the length is trusted for
    framing) but flagged; a truncated trailing frame raises."""
    idx = 0
    with open(path, "rb") as f:
        while True:
            hdr = f.read(4)
            if not hdr:
                return
            if len(hdr) < 4:
                raise ValueError(f"{path}: truncated length header at frame {idx}")
            n = struct.unpack(">I", hdr)[0]
            body = f.read(n)
            if len(body) < n:
                raise ValueError(f"{path}: truncated frame {idx} (want {n}, got {len(body)})")
            yield idx, body, n > cap
            idx += 1


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _LPFrameReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("lpframes: 'path' option (or load(path)) is required")
        self.cap = int(options.get("maxframebytes", MAX_FRAME_BYTES))

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith(".bin")
            )
        else:
            files = [self.path]
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        fname = os.path.basename(partition.path)
        for idx, body, oversized in iter_frames(partition.path, self.cap):
            yield (
                fname,
                idx,
                body.decode("utf-8", errors="replace"),
                body,
                len(body),
                oversized,
            )


class _LPFrameStreamReader(SimpleDataSourceStreamReader):
    """STREAMING reader over a spool directory of framed .bin files —
    the reference's live TCP ingest (D3: ExecutionRequests FIFO,
    scheduler.cpp:157-164) as a Structured Streaming source. A producer
    appends whole frame files (one per connection/epoch, like the batch
    layout); the offset is {"last": name} = the greatest spool-file name
    fully consumed, in sorted-name order — NAME-based, not count-based,
    so a concurrent multi-file publish that momentarily exposes a
    non-prefix subset cannot skip or double-read a file (producers must
    use ascending names, which the distributed writer's epoch prefix
    guarantees; a file sorting below the watermark is ignored rather
    than corrupting the stream). Offsets are checkpointed by the
    engine, so restart resumes exactly after the last committed file —
    the at-most-once-per-trigger semantics the FIFO consumer has
    (scheduler.cpp:92-99). Frames inside a file keep arrival order.

    SimpleDataSourceStreamReader reads on the driver — the right
    tradeoff for an ingest FRONT DOOR whose per-trigger volume is
    bounded (the 8 MiB cap is per frame; file count per trigger is the
    producer's batch); the heavy lifting downstream is distributed."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("lpframes: 'path' option is required")
        self.cap = int(options.get("maxframebytes", MAX_FRAME_BYTES))

    def _spool_files(self) -> list[str]:
        if not os.path.isdir(self.path):
            return []
        return sorted(f for f in os.listdir(self.path) if f.endswith(".bin"))

    @staticmethod
    def _after(files: list[str], offset: dict) -> list[str]:
        """Names strictly above the offset watermark. Tolerates the
        legacy count-based {"files": n} form from old checkpoints."""
        if "files" in offset:
            return files[int(offset["files"]) :]
        last = offset.get("last", "")
        return [f for f in files if f > last]

    def initialOffset(self) -> dict:
        return {"last": ""}

    def latestOffset(self) -> dict:
        files = self._spool_files()
        return {"last": files[-1] if files else ""}

    def read(self, start: dict):
        files = self._spool_files()
        new = self._after(files, start)
        end = {"last": new[-1]} if new else dict(start)
        # Contract quirk of the prefetching wrapper
        # (pyspark/sql/datasource_internal.py): non-empty batches are
        # cached and later copy.copy'd — a generator fails there, a
        # list works; an EMPTY batch (end == start) is probed with
        # next(it) — a list fails there, an iterator works. Return a
        # list when the offset advanced, an empty iterator otherwise.
        rows = self._rows(new)
        return (rows if rows else iter(())), end

    def readBetweenOffsets(self, start: dict, end: dict):
        # the executor-side replay path requires an iterator return
        files = self._spool_files()
        above = self._after(files, start)
        if "files" in end:
            upper = files[: int(end["files"])]
            names = [f for f in above if f <= upper[-1]] if upper else []
        else:
            names = [f for f in above if f <= end.get("last", "")]
        return iter(self._rows(names))

    def _rows(self, names: list[str]) -> list[tuple]:
        out = []
        for fname in names:
            for idx, body, oversized in iter_frames(
                os.path.join(self.path, fname), self.cap
            ):
                out.append(
                    (
                        fname,
                        idx,
                        body.decode("utf-8", errors="replace"),
                        body,
                        len(body),
                        oversized,
                    )
                )
        return out


class _LPFrameCommit(WriterCommitMessage):
    def __init__(self, staged: str, pid: int, n_frames: int):
        self.staged = staged
        self.pid = pid
        self.n_frames = n_frames


class _LPFrameWriter(DataSourceWriter):
    """Distributed frame SINK: each task writes its partition's rows as
    one length-prefixed .bin into a hidden job-tagged staging name; the
    driver-side commit assigns the EPOCH prefix **at commit time** and
    renames staged files into place in ascending final-name order — so
    publish order equals name order even across concurrently appending
    jobs (whichever job commits first gets the lower epoch), which is
    the invariant the streaming reader's name watermark needs to never
    skip a file. Abort deletes this job's staged files only. Rows need
    a ``payload`` string column; frames exceeding the cap are refused
    at write time (the reference server would kill the connection,
    server.cpp:84-85 — a writer must not produce them).

    Concurrency/semantics:
      - ``append`` never clobbers other jobs' files: the commit-time
        epoch is max(now_ns, greatest existing epoch + 1), unique-tagged;
      - ``overwrite`` renames the new files into place FIRST, then
        removes the pre-existing .bin files — a crash mid-commit can
        leave a mixed directory (recoverable) but never loses both
        generations;
      - staged names carry the JOB tag and TASK ATTEMPT id, so a
        speculative/retried attempt never interleaves bytes with a
        zombie first attempt, and sweeps touch only THIS job's litter
        (a concurrent job's in-progress staging is untouchable)."""

    def __init__(self, options: dict, overwrite: bool):
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("lpframes: 'path' option (or save(path)) is required")
        self.cap = int(options.get("maxframebytes", MAX_FRAME_BYTES))
        self.overwrite = overwrite
        # driver-side job tag, shipped to every task (NOT the epoch —
        # that is assigned at commit time so it reflects commit order)
        self.job = uuid.uuid4().hex[:8]

    def write(self, iterator) -> _LPFrameCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        attempt = ctx.taskAttemptId()
        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(
            self.path, f".job-{self.job}-{pid:05d}.a{attempt}.staging"
        )
        n = 0
        with open(staged, "wb") as f:
            for row in iterator:
                # binary-exact path first (payload_bin), else UTF-8 text
                bin_val = getattr(row, "payload_bin", None)
                if bin_val is not None:
                    body = bytes(bin_val)
                else:
                    body = (getattr(row, "payload", None) or "").encode("utf-8")
                if len(body) > self.cap:
                    raise ValueError(
                        f"frame of {len(body)} bytes exceeds cap {self.cap}"
                    )
                f.write(struct.pack(">I", len(body)))
                f.write(body)
                n += 1
        return _LPFrameCommit(staged, pid, n)

    def _sweep_staging(self) -> None:
        """Remove THIS job's leftover staging files only — a concurrent
        job's in-progress staging must never be touched."""
        prefix = f".job-{self.job}-"
        if os.path.isdir(self.path):
            for f in os.listdir(self.path):
                if f.startswith(prefix) and f.endswith(".staging"):
                    os.remove(os.path.join(self.path, f))

    def _commit_epoch(self) -> str:
        """Epoch assigned at COMMIT time: greater than every published
        epoch in the directory, so publish order == name order even when
        concurrent jobs constructed their writers out of order (or
        driver clocks skew)."""
        import time
        import uuid

        floor_ns = time.time_ns()
        for f in os.listdir(self.path):
            if f.startswith("part-") and f.endswith(".bin"):
                try:
                    existing = int(f.split("-")[1])
                except (IndexError, ValueError):
                    continue
                floor_ns = max(floor_ns, existing + 1)
        return f"{floor_ns:020d}-{uuid.uuid4().hex[:6]}"

    def _acquire_commit_lock(self, timeout_s: float = 60.0) -> str:
        """Serialize the epoch-assignment + rename window across
        concurrently committing jobs with an O_CREAT|O_EXCL lock file.
        Without it, job A (lower epoch) could publish AFTER job B
        (higher epoch) became visible; a streaming reader polling in
        between would advance its name watermark past A's epoch and A's
        frames would be silently skipped forever. A stale lock (holder
        crashed mid-commit) is broken after ``timeout_s`` by mtime."""
        import time

        lock = os.path.join(self.path, ".commit.lock")
        deadline = time.monotonic() + timeout_s
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                # sweep renamed-away stale locks (best effort, tiny)
                for f in os.listdir(self.path):
                    if f.startswith(".commit.lock.stale-"):
                        try:
                            os.remove(os.path.join(self.path, f))
                        except OSError:
                            pass
                return lock
            except FileExistsError:
                try:
                    age = time.time() - os.path.getmtime(lock)
                except OSError:
                    continue  # holder just released; retry immediately
                if age > timeout_s:
                    # stale: holder died mid-commit — break the lock by
                    # RENAME, not remove: exactly one waiter wins the
                    # rename, so a loser cannot delete a lock another
                    # waiter just freshly re-acquired (remove-based
                    # breaking has that TOCTOU: A removes + recreates,
                    # then B's queued remove deletes A's live lock)
                    import uuid as _uuid

                    try:
                        os.replace(lock, f"{lock}.stale-{_uuid.uuid4().hex[:8]}")
                    except OSError:
                        pass  # someone else broke it first
                    continue
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"lpframes: commit lock {lock} held > {timeout_s}s"
                    )
                time.sleep(0.02)

    def commit(self, messages) -> None:
        # a 0-partition write runs no tasks, so the directory may not
        # exist yet — committing an empty generation must still succeed
        os.makedirs(self.path, exist_ok=True)
        lock = self._acquire_commit_lock()
        try:
            pre_existing = [
                f for f in os.listdir(self.path) if f.endswith(".bin")
            ]
            epoch = self._commit_epoch()
            # ascending final-name order: a concurrent lister sees a prefix
            for m in sorted(
                (m for m in messages if m is not None), key=lambda m: m.pid
            ):
                final = os.path.join(self.path, f"part-{epoch}-{m.pid:05d}.bin")
                os.replace(m.staged, final)
            if self.overwrite:
                # only after the new generation is fully published
                for f in pre_existing:
                    p = os.path.join(self.path, f)
                    if os.path.exists(p):
                        os.remove(p)
        finally:
            try:
                os.remove(lock)
            except OSError:
                pass
        self._sweep_staging()  # this job's losing attempts

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)
        # tasks killed mid-write never returned a commit message but may
        # have created their staged file — sweep this job's pattern too
        self._sweep_staging()


class LengthPrefixedFrames(DataSource):
    """spark.read.format("lpframes") / spark.readStream.format("lpframes")
    — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "lpframes"

    def schema(self) -> StructType:
        return FRAME_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _LPFrameReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _LPFrameStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _LPFrameWriter(self.options, overwrite)
