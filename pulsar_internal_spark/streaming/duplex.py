"""Full-duplex framed socket client — the WebSocket analogue.

The reference's WebSocket library (websocket.hpp:310-359) gives a
script three capabilities: OnMessage (server→client frames fire an
event), Send (client→server), and OnClose (a termination event). This
module rebuilds that triangle with Spark semantics, over the SAME wire
format as the rest of the repo (the 4-byte big-endian length framing of
sources/lpframes.py, server.cpp:39-67, 8 MiB cap):

- **OnMessage** → :class:`FrameSocketClient` receives frames on a
  background thread and SPOOLS them as lpframes ``.bin`` files, so the
  existing ``spark.readStream.format("lpframes")`` source (with its
  checkpointed exactly-once offsets) is the event stream — the client
  is a bridge from a live socket to the durable landing zone, not a
  second streaming source implementation to maintain.
- **Send** → :meth:`FrameSocketClient.send` for imperative use, and
  :func:`sink_to_socket` for the streaming direction: a foreachBatch
  sink that frames a query's ``payload``/``payload_bin`` rows out the
  socket (per-batch, ordered within a batch).
- **OnClose** → when the peer closes, the client commits a final
  ``close.marker`` file into the spool; :func:`with_close_flag` joins
  that marker so a consumer sees the termination event in-stream
  (the reference fires OnClose exactly once — the marker is idempotent
  by name).

Dev/test-grade by the same standard as the line-socket source: no
reconnect, single connection. Durability lives in the spool, which IS
the production landing-zone pattern.
"""

from __future__ import annotations

import os
import socket
import struct
import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.lpframes import MAX_FRAME_BYTES

CLOSE_MARKER = "close.marker"


class FrameSocketClient:
    """Connects to a length-prefixed frame server; spools received
    frames for the lpframes streaming source and sends frames back."""

    def __init__(
        self,
        host: str,
        port: int,
        spool_dir: str,
        cap: int = MAX_FRAME_BYTES,
        frames_per_file: int = 64,
    ):
        self.spool_dir = spool_dir
        self.cap = cap
        self.frames_per_file = frames_per_file
        os.makedirs(spool_dir, exist_ok=True)
        self._sock = socket.create_connection((host, port))
        self._send_lock = threading.Lock()
        # resume ABOVE any previously published epoch: a restarted
        # client writing part-0000... again would both clobber earlier
        # spool files and sort below the streaming reader's checkpointed
        # name watermark — silently losing every new frame (the same
        # invariant _LPFrameWriter._commit_epoch maintains)
        self._epoch = 0
        for f in os.listdir(spool_dir):
            if f.startswith("part-") and f.endswith("-rx.bin"):
                try:
                    self._epoch = max(self._epoch, int(f.split("-")[1]) + 1)
                except (IndexError, ValueError):
                    continue
        self.closed = threading.Event()
        self._rx = threading.Thread(target=self._recv_loop, daemon=True)
        self._rx.start()

    # -- Send (websocket.hpp:256-265) -----------------------------------
    def send(self, payload: bytes) -> None:
        if len(payload) > self.cap:
            raise ValueError(f"frame of {len(payload)} bytes exceeds cap {self.cap}")
        with self._send_lock:
            self._sock.sendall(struct.pack(">I", len(payload)) + payload)

    # -- OnMessage (websocket.hpp:175-225): socket -> spool --------------
    def _recv_exact(self, n: int) -> bytes | None:
        buf = b""
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return buf

    def _publish(self, frames: list[bytes]) -> None:
        """Write one spool file atomically (tmp + rename) with an
        ascending name, so the streaming reader's name watermark holds."""
        name = f"part-{self._epoch:020d}-rx.bin"
        self._epoch += 1
        tmp = os.path.join(self.spool_dir, f".{name}.tmp")
        with open(tmp, "wb") as f:
            for p in frames:
                f.write(struct.pack(">I", len(p)) + p)
        os.replace(tmp, os.path.join(self.spool_dir, name))

    def _recv_loop(self) -> None:
        pending: list[bytes] = []
        try:
            while True:
                hdr = self._recv_exact(4)
                if hdr is None:
                    break  # peer closed
                n = struct.unpack(">I", hdr)[0]
                body = self._recv_exact(n)
                if body is None:
                    break  # truncated final frame: close, keep what's whole
                pending.append(body)
                if len(pending) >= self.frames_per_file:
                    self._publish(pending)
                    pending = []
        finally:
            if pending:
                self._publish(pending)
            # -- OnClose (websocket.hpp:211-225): exactly-once marker ----
            marker = os.path.join(self.spool_dir, CLOSE_MARKER)
            if not os.path.exists(marker):
                with open(marker, "w") as f:
                    f.write("closed\n")
            self.closed.set()

    def close(self) -> None:
        try:
            self._sock.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        self._sock.close()
        self._rx.join(timeout=10)


def sink_to_socket(client: FrameSocketClient, max_rows_per_batch: int = 100_000):
    """foreachBatch sink: frame each micro-batch's rows out the client
    socket — the streaming form of Send. Rows need ``payload_bin``
    (binary, preferred) or ``payload`` (utf-8 text). Batch-local order
    is the collected order; cross-batch order is the trigger order —
    matching the reference's per-event Send sequencing.

    **Driver-throughput bound (by design):** there is ONE ordered socket
    connection, so every batch is collected to the driver and written
    sequentially — throughput is capped by driver memory and the single
    socket's bandwidth, exactly like the reference's one-connection Send
    (websocket.hpp:256-265). This is a control/egress channel, not a data
    sink; bulk egress belongs in a distributed writer (parquet/lpframes
    spool). ``max_rows_per_batch`` makes the bound explicit: a batch
    whose row count exceeds it fails fast (mirroring the lpframes
    oversized-frame policy) instead of silently OOMing the driver."""

    def sink(batch_df, batch_id: int) -> None:
        cols = [c for c in ("payload_bin", "payload") if c in batch_df.columns]
        # count() is distributed and cheap relative to a runaway collect;
        # fail loudly BEFORE pulling the batch to the driver
        n = batch_df.count()
        if n > max_rows_per_batch:
            raise ValueError(
                f"batch {batch_id} has {n} rows > max_rows_per_batch="
                f"{max_rows_per_batch}; sink_to_socket is a single-connection "
                "driver-side egress channel — route bulk data to a "
                "distributed sink instead"
            )
        for r in batch_df.select(*cols).collect():
            # per-ROW fallback (a mixed stream may carry payload_bin for
            # binary rows and null there for text rows — same contract
            # as the lpframes writer)
            bin_val = getattr(r, "payload_bin", None)
            if bin_val is not None:
                client.send(bytes(bin_val))
            else:
                client.send((getattr(r, "payload", None) or "").encode("utf-8"))

    return sink


def stream_closed(spool_dir: str) -> bool:
    """True once the peer closed the connection (the OnClose marker is
    committed). Streaming consumers probe this inside foreachBatch (a
    plan-time literal would freeze the value); batch consumers call
    :func:`with_close_flag` for an annotated read."""
    return os.path.exists(os.path.join(spool_dir, CLOSE_MARKER))


def with_close_flag(frames: DataFrame, spool_dir: str) -> DataFrame:
    """Annotate a BATCH read of ``spool_dir`` with a ``stream_closed``
    column (plan-time literal — correct for batch, where the spool is
    immutable during the read). One os.path probe, no data movement."""
    return frames.withColumn("stream_closed", F.lit(stream_closed(spool_dir)))
