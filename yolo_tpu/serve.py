"""Detection serving daemon: a TCP frame-in / detections-out server.

TPU-native replacement for the reference's per-engine native deployment path
(ref: examples/YOLO11-Triton-CPP client + nn/autobackend.py runtime matrix):
one serving process owns the jitted model(s); any client — the C++ example
under examples/cpp_client, another process, another host — streams frames over
a length-prefixed binary protocol and gets fixed-shape detections back.

Protocol v2 (little-endian):
  request:  magic 'YTP2' | u16 version (=2) | u16 model_id
            | u32 height | u32 width | u32 channels | u8[h*w*c] BGR frame
  response: magic 'YTPR' | u16 version | u16 status (0=ok)
            | u32 n | n × (f32 x1, y1, x2, y2, conf, cls)
            status != 0 → u32 msg_len | utf-8 message instead of detections
Protocol v1 ('YTPU' | u32 h | u32 w | u32 c | frame → 'YTPR' | u32 n | dets)
is still accepted for old clients.

Multi-model: construct with {model_id: source} (or `name=source` CLI specs);
each model gets its own predictor + batching queue, so heterogeneous streams
share the chip without blocking each other's shapes.

Batching: frames arriving within `batch_window_ms` coalesce into one device
call (snap-to-power-of-two padding), so many client streams share the chip.
"""

from __future__ import annotations

import argparse
import socket
import struct
import threading
import time

import numpy as np

from yolo_tpu.utils import LOGGER

MAGIC_REQ_V1 = b"YTPU"
MAGIC_REQ_V2 = b"YTP2"
MAGIC_RES = b"YTPR"
PROTOCOL_VERSION = 2

STATUS_OK = 0
STATUS_BAD_MODEL = 1
STATUS_BAD_REQUEST = 2
STATUS_INTERNAL = 3


class _ModelLane:
    """One model's predictor + coalescing queue."""

    def __init__(self, source: str, conf, iou, imgsz, max_det):
        self.conf, self.iou, self.imgsz, self.max_det = conf, iou, imgsz, max_det
        self.queue: list = []
        self.predictor = None
        self.yolo = None
        self.error: str | None = None  # set if load/build/warmup failed (lane out of service)
        try:
            # load inside the out-of-service envelope: a bad model source must
            # take ONE lane out, not crash the whole multi-model server
            from yolo_tpu import YOLO

            self.yolo = YOLO(source)
            self.yolo.fuse()
        except Exception as e:
            self.error = f"model '{source}' failed to load: {e}"
            LOGGER.warning(self.error)

    def build(self):
        if self.yolo is None:
            raise RuntimeError(self.error or "model not loaded")
        from yolo_tpu.engine.predictor import BasePredictor

        self.predictor = BasePredictor(
            self.yolo.model, self.yolo.params,
            overrides={"conf": self.conf, "iou": self.iou, "imgsz": self.imgsz, "max_det": self.max_det, "verbose": False},
            names=self.yolo.names,
        )
        self.predictor.warmup((1, self.imgsz, self.imgsz, 3))


class DetectionServer:
    def __init__(self, models, host: str = "127.0.0.1", port: int = 8777, conf: float = 0.25,
                 iou: float = 0.7, imgsz: int = 640, max_det: int = 300, batch_window_ms: float = 4.0):
        if isinstance(models, str):
            models = {0: models}
        self.lanes = {int(k): _ModelLane(v, conf, iou, imgsz, max_det) for k, v in models.items()}
        self.host, self.port = host, port
        self.batch_window = batch_window_ms / 1e3
        self._lock = threading.Lock()
        self._event = threading.Event()
        self._stop = False

    # --- device worker ----------------------------------------------------------

    def _worker(self):
        LOGGER.info("warming up device program(s)...")
        for mid, lane in self.lanes.items():
            try:
                lane.build()
                LOGGER.info(f"model {mid} ready ({lane.yolo.overrides.get('model')})")
            except Exception as e:  # one broken lane must not brick the server
                lane.error = f"model {mid} failed to build: {e}"
                LOGGER.warning(lane.error)
        LOGGER.info("server ready")
        while not self._stop:
            self._event.wait(timeout=0.1)
            time.sleep(self.batch_window)  # coalesce
            with self._lock:
                grabbed = {mid: lane.queue for mid, lane in self.lanes.items() if lane.queue}
                for mid in grabbed:
                    self.lanes[mid].queue = []
                self._event.clear()
            for mid, jobs in grabbed.items():
                lane = self.lanes[mid]
                try:
                    results = lane.predictor([j[0] for j in jobs], verbose=False)
                    for (frame, done, out), r in zip(jobs, results):
                        dets = r.boxes.data[:, :6] if len(r.boxes) else np.zeros((0, 6), np.float32)
                        out.append((STATUS_OK, dets))
                        done.set()
                except Exception as e:  # a bad batch must not kill the worker
                    LOGGER.warning(f"inference failed for model {mid}: {e}")
                    for frame, done, out in jobs:
                        out.append((STATUS_INTERNAL, str(e)))
                        done.set()

    # --- socket handling -----------------------------------------------------------

    def _recv_exact(self, conn, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("client closed")
            buf += chunk
        return buf

    def _send_error(self, conn, status: int, msg: str, version: int = PROTOCOL_VERSION):
        """Error response in the CLIENT's framing. The v1 protocol has no
        status field, so a v1 client gets a valid zero-detection frame (and
        the error is logged server-side) — sending v2 error frames would be
        parsed as a detection count and desync the stream."""
        if version == 1:
            LOGGER.warning(f"v1 client error (reported as empty result): {msg}")
            conn.sendall(MAGIC_RES + struct.pack("<I", 0))
            return
        data = msg.encode()
        conn.sendall(MAGIC_RES + struct.pack("<HHI", PROTOCOL_VERSION, status, len(data)) + data)

    def _drain_payload(self, conn, h: int, w: int, c: int):
        """Consume a rejected request's frame bytes so the stream stays in
        sync for the next request (recoverable-error semantics). Absurd
        geometries are unbounded — close instead of draining gigabytes."""
        n = h * w * c
        if n > 8192 * 8192 * 4:
            raise ValueError(f"unrecoverable geometry {h}x{w}x{c}")
        self._recv_exact(conn, n)

    def _handle_client(self, conn, addr):
        LOGGER.info(f"client {addr} connected")
        try:
            while True:
                magic = self._recv_exact(conn, 4)
                if magic == MAGIC_REQ_V1:
                    version, mid = 1, 0
                elif magic == MAGIC_REQ_V2:
                    version, mid = struct.unpack("<HH", self._recv_exact(conn, 4))
                    if version != PROTOCOL_VERSION:
                        h, w, c = struct.unpack("<III", self._recv_exact(conn, 12))
                        self._drain_payload(conn, h, w, c)
                        self._send_error(conn, STATUS_BAD_REQUEST, f"unsupported protocol version {version}")
                        continue
                else:
                    raise ValueError(f"bad magic {magic!r}")
                h, w, c = struct.unpack("<III", self._recv_exact(conn, 12))
                if not (0 < h <= 8192 and 0 < w <= 8192 and c in (1, 3)):
                    self._drain_payload(conn, h, w, c)
                    self._send_error(conn, STATUS_BAD_REQUEST, f"bad frame geometry {h}x{w}x{c}", version)
                    continue
                raw = self._recv_exact(conn, h * w * c)
                if mid not in self.lanes:
                    self._send_error(conn, STATUS_BAD_MODEL, f"unknown model id {mid} (have {sorted(self.lanes)})", version)
                    continue
                if self.lanes[mid].error:
                    self._send_error(conn, STATUS_INTERNAL, self.lanes[mid].error, version)
                    continue
                frame = np.frombuffer(raw, np.uint8).reshape(h, w, c)
                if c == 1:
                    frame = np.repeat(frame, 3, axis=-1)
                done, out = threading.Event(), []
                with self._lock:
                    self.lanes[mid].queue.append((frame, done, out))
                    self._event.set()
                if not done.wait(timeout=300.0):  # worker died/stuck — fail the request, keep the stream
                    self._send_error(conn, STATUS_INTERNAL, "inference timed out", version)
                    continue
                status, payload = out[0]
                if status != STATUS_OK:
                    self._send_error(conn, status, str(payload), version)
                    continue
                dets = payload.astype(np.float32)
                if version == 1:  # legacy framing: no version/status fields
                    conn.sendall(MAGIC_RES + struct.pack("<I", len(dets)) + dets.tobytes())
                else:
                    conn.sendall(
                        MAGIC_RES + struct.pack("<HHI", PROTOCOL_VERSION, STATUS_OK, len(dets)) + dets.tobytes()
                    )
        except (ConnectionError, ValueError) as e:
            LOGGER.info(f"client {addr} gone: {e}")
        finally:
            conn.close()

    def serve_forever(self, ready_event: threading.Event | None = None):
        worker = threading.Thread(target=self._worker, daemon=True)
        worker.start()
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((self.host, self.port))
        srv.listen(16)
        self._srv = srv
        self.port = srv.getsockname()[1]  # resolve port 0 → chosen port
        LOGGER.info(f"listening on {self.host}:{self.port}")
        if ready_event is not None:
            ready_event.set()
        try:
            while not self._stop:
                srv.settimeout(0.5)
                try:
                    conn, addr = srv.accept()
                except socket.timeout:
                    continue
                threading.Thread(target=self._handle_client, args=(conn, addr), daemon=True).start()
        finally:
            srv.close()

    def shutdown(self):
        self._stop = True


def main(argv=None):
    p = argparse.ArgumentParser(description="yolo_tpu detection server")
    p.add_argument("models", nargs="*", default=["yolov8-small.yaml"],
                   help="model sources; 'id=source' pairs for multi-model, bare source = id 0")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8777)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.7)
    p.add_argument("--imgsz", type=int, default=640)
    args = p.parse_args(argv)
    models = {}
    for i, spec in enumerate(args.models):
        if "=" in spec:
            k, v = spec.split("=", 1)
            models[int(k)] = v
        else:
            models[i] = spec
    DetectionServer(models, args.host, args.port, args.conf, args.iou, args.imgsz).serve_forever()


if __name__ == "__main__":
    main()
