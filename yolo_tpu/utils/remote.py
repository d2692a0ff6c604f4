"""Remote inference client: a served model as a drop-in YOLO backend.

TPU-native analog of the reference's Triton remote backend
(ref: ultralytics/utils/triton.py TritonRemoteModel + the ``triton://`` row in
nn/autobackend.py:79-98): where the reference lets ``YOLO("http://host/model")``
route every predict through a Triton Inference Server, here
``YOLO("tcp://host:port/<model_id>")`` routes predicts through a
yolo_tpu.serve.DetectionServer — one process owns the jitted TPU program(s);
any number of client processes stream frames over the length-prefixed binary
protocol (serve.py, protocol v2) and get fixed-shape detections back.

The client is deliberately dependency-free (stdlib socket/struct only) so it
can be vendored into thin edge processes, mirroring the reference's
zero-copy-paste C++ clients.
"""

from __future__ import annotations

import socket
import struct

import numpy as np

MAGIC_REQ = b"YTP2"
MAGIC_RES = b"YTPR"
PROTOCOL_VERSION = 2


class RemoteInferenceError(RuntimeError):
    """Server-side failure reported through a protocol error frame."""

    def __init__(self, status: int, message: str):
        super().__init__(f"remote inference failed (status {status}): {message}")
        self.status = status


class RemoteModel:
    """Client for one model lane of a DetectionServer.

    >>> rm = RemoteModel("tcp://127.0.0.1:8777/0")
    >>> dets = rm(frame_bgr)        # (n, 6) float32: x1,y1,x2,y2,conf,cls
    Coordinates are in the ORIGINAL frame's pixel space (the server applies
    and inverts its own letterbox), matching Results.boxes.data[:, :6].
    """

    def __init__(self, url: str, timeout: float = 300.0):
        self.url = url
        self.host, self.port, self.model_id = self._parse(url)
        self.timeout = timeout
        self._conn: socket.socket | None = None

    @staticmethod
    def _parse(url: str) -> tuple[str, int, int]:
        if not url.startswith("tcp://"):
            raise ValueError(f"remote model url must be tcp://host:port[/model_id], got {url!r}")
        rest = url[len("tcp://"):]
        addr, _, mid = rest.partition("/")
        host, _, port = addr.rpartition(":")
        if not host or not port.isdigit():
            raise ValueError(f"remote model url must be tcp://host:port[/model_id], got {url!r}")
        return host, int(port), int(mid) if mid else 0

    # --- connection lifecycle ---------------------------------------------------

    def _connect(self) -> socket.socket:
        if self._conn is None:
            self._conn = socket.create_connection((self.host, self.port), timeout=self.timeout)
            self._conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        return self._conn

    def close(self):
        if self._conn is not None:
            try:
                self._conn.close()
            finally:
                self._conn = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # --- protocol ----------------------------------------------------------------

    def _recv_exact(self, conn: socket.socket, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("server closed the connection")
            buf += chunk
        return buf

    def _roundtrip(self, frame: np.ndarray) -> np.ndarray:
        conn = self._connect()
        h, w, c = frame.shape
        conn.sendall(
            MAGIC_REQ
            + struct.pack("<HHIII", PROTOCOL_VERSION, self.model_id, h, w, c)
            + frame.tobytes()
        )
        if self._recv_exact(conn, 4) != MAGIC_RES:
            raise ConnectionError("bad response magic — protocol desync")
        _ver, status, n = struct.unpack("<HHI", self._recv_exact(conn, 8))
        if status != 0:
            raise RemoteInferenceError(status, self._recv_exact(conn, n).decode("utf-8", "replace"))
        raw = self._recv_exact(conn, n * 24)
        return np.frombuffer(raw, np.float32).reshape(n, 6).copy() if n else np.zeros((0, 6), np.float32)

    def __call__(self, frame: np.ndarray) -> np.ndarray:
        """Run one BGR (or single-channel) uint8 HWC frame; returns (n, 6) dets."""
        frame = np.ascontiguousarray(frame, dtype=np.uint8)
        if frame.ndim == 2:
            frame = frame[..., None]
        if frame.ndim != 3 or frame.shape[-1] not in (1, 3):
            raise ValueError(f"frame must be HxW[x1|x3] uint8, got shape {frame.shape}")
        try:
            return self._roundtrip(frame)
        except (ConnectionError, socket.timeout):
            # one transparent reconnect: servers restart, TCP streams break
            self.close()
            return self._roundtrip(frame)
