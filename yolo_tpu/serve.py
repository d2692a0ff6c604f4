"""Detection serving daemon: a TCP frame-in / detections-out server.

TPU-native replacement for the reference's per-engine native deployment path
(ref: examples/YOLO11-Triton-CPP client + nn/autobackend.py runtime matrix):
one serving process owns the jitted model; any client — the C++ example under
examples/cpp_client, another process, another host — streams frames over a
trivial length-prefixed binary protocol and gets fixed-shape detections back.

Protocol (little-endian):
  request:  magic 'YTPU' | u32 height | u32 width | u32 channels | u8[h*w*c] BGR frame
  response: magic 'YTPR' | u32 n | n × (f32 x1, y1, x2, y2, conf, cls)

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

MAGIC_REQ = b"YTPU"
MAGIC_RES = b"YTPR"


class DetectionServer:
    def __init__(self, model_source: str, host: str = "127.0.0.1", port: int = 8777, conf: float = 0.25, iou: float = 0.7, imgsz: int = 640, max_det: int = 300, batch_window_ms: float = 4.0):
        from yolo_tpu import YOLO

        self.yolo = YOLO(model_source)
        self.yolo.fuse()
        self.host, self.port = host, port
        self.conf, self.iou, self.imgsz, self.max_det = conf, iou, imgsz, max_det
        self.batch_window = batch_window_ms / 1e3
        self._queue: list = []
        self._lock = threading.Lock()
        self._event = threading.Event()
        self._stop = False

    # --- device worker ----------------------------------------------------------

    def _worker(self):
        from yolo_tpu.engine.predictor import BasePredictor

        predictor = BasePredictor(
            self.yolo.model, self.yolo.params,
            overrides={"conf": self.conf, "iou": self.iou, "imgsz": self.imgsz, "max_det": self.max_det, "verbose": False},
            names=self.yolo.names,
        )
        LOGGER.info("warming up the device program...")
        predictor.warmup((1, self.imgsz, self.imgsz, 3))
        LOGGER.info("server ready")
        while not self._stop:
            self._event.wait(timeout=0.1)
            time.sleep(self.batch_window)  # coalesce
            with self._lock:
                jobs, self._queue = self._queue, []
                self._event.clear()
            if not jobs:
                continue
            frames = [j[0] for j in jobs]
            results = predictor(frames, verbose=False)
            for (frame, done, out), r in zip(jobs, results):
                dets = r.boxes.data[:, :6] if len(r.boxes) else np.zeros((0, 6), np.float32)
                out.append(dets)
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

    def _handle_client(self, conn, addr):
        LOGGER.info(f"client {addr} connected")
        try:
            while True:
                magic = self._recv_exact(conn, 4)
                if magic != MAGIC_REQ:
                    raise ValueError(f"bad magic {magic!r}")
                h, w, c = struct.unpack("<III", self._recv_exact(conn, 12))
                raw = self._recv_exact(conn, h * w * c)
                frame = np.frombuffer(raw, np.uint8).reshape(h, w, c)
                done, out = threading.Event(), []
                with self._lock:
                    self._queue.append((frame, done, out))
                    self._event.set()
                done.wait()
                dets = out[0].astype(np.float32)
                conn.sendall(MAGIC_RES + struct.pack("<I", len(dets)) + dets.tobytes())
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
    p.add_argument("model", nargs="?", default="yolov8-small.yaml")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8777)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.7)
    p.add_argument("--imgsz", type=int, default=640)
    args = p.parse_args(argv)
    DetectionServer(args.model, args.host, args.port, args.conf, args.iou, args.imgsz).serve_forever()


if __name__ == "__main__":
    main()
