"""Local-web live inference view — stdlib replacement for the reference's
streamlit UI (ref: solutions/streamlit_inference.py Inference: model picker +
live annotated stream in a browser).

Streamlit isn't installable on a zero-egress host, so this serves the same
experience from `http.server`: an HTML page with an MJPEG `<img>` that streams
annotated frames from any predictor source (video file, webcam id, stream URL).

    from yolo_tpu.solutions.web_inference import WebInference
    WebInference(model="yolov8-small.yaml", source="video.mp4").serve(port=8080)
    # → open http://127.0.0.1:8080
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from yolo_tpu.utils import LOGGER

_PAGE = b"""<!doctype html>
<html><head><title>yolo_tpu live inference</title>
<style>body{background:#111;color:#eee;font-family:sans-serif;text-align:center}
img{max-width:96vw;border:1px solid #444;margin-top:1em}</style></head>
<body><h2>yolo_tpu live inference</h2><img src="/stream"/></body></html>"""


class WebInference:
    """Serve annotated predictions over HTTP (MJPEG)."""

    def __init__(self, model: str = "yolov8-small.yaml", source=0, conf: float = 0.25,
                 iou: float = 0.7, track: bool = False, max_frames: int | None = None):
        self.model_source = model
        self.source = source
        self.conf, self.iou = conf, iou
        self.track = track
        self.max_frames = max_frames
        self._jpeg_lock = threading.Lock()
        self._jpeg: bytes | None = None
        self._stop = False

    # --- inference loop ---------------------------------------------------------
    def _run(self):
        import cv2

        from yolo_tpu import YOLO

        try:
            model = YOLO(self.model_source)
            fn = model.track if self.track else model.predict
            n = 0
            for r in fn(self.source, stream=True, conf=self.conf, iou=self.iou, verbose=False):
                frame = r.plot()
                ok, jpg = cv2.imencode(".jpg", frame, [cv2.IMWRITE_JPEG_QUALITY, 80])
                if ok:
                    with self._jpeg_lock:
                        self._jpeg = jpg.tobytes()
                n += 1
                if self._stop or (self.max_frames and n >= self.max_frames):
                    break
        except Exception as e:
            # surface the error and release serve() — a dead worker must not
            # leave the server streaming a blank page forever
            self.error = e
            LOGGER.warning(f"web inference worker failed: {e}")
        finally:
            self._stop = True

    # --- http -------------------------------------------------------------------
    def serve(self, host: str = "127.0.0.1", port: int = 8080, ready_event=None):
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path == "/stream":
                    self.send_response(200)
                    self.send_header("Content-Type", "multipart/x-mixed-replace; boundary=frame")
                    self.end_headers()
                    import time

                    while not outer._stop:
                        with outer._jpeg_lock:
                            jpg = outer._jpeg
                        if jpg:
                            try:
                                self.wfile.write(b"--frame\r\nContent-Type: image/jpeg\r\n\r\n" + jpg + b"\r\n")
                            except (BrokenPipeError, ConnectionResetError):
                                return
                        time.sleep(0.03)
                else:
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(_PAGE)

        worker = threading.Thread(target=self._run, daemon=True)
        worker.start()
        httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = httpd.server_address[1]
        LOGGER.info(f"web inference at http://{host}:{self.port}")
        if ready_event is not None:
            ready_event.set()
        httpd.timeout = 0.25  # handle_request returns periodically so _stop/shutdown take effect
        try:
            while not self._stop:
                httpd.handle_request()
        finally:
            httpd.server_close()
        if getattr(self, "error", None) is not None:
            raise RuntimeError(f"web inference worker failed: {self.error}") from self.error

    def shutdown(self):
        self._stop = True
