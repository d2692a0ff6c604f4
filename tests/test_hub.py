"""Hub client: HTTP transport against a local server + local-recording
fallback (ref: hub/session.py HUBTrainingSession, hub/utils.py smart_request)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class _HubServer:
    def __init__(self):
        self.requests = []
        outer = self

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                outer.requests.append((self.path, dict(self.headers), body))
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps({"token": "tok-123"}).encode())

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.port = self.httpd.server_address[1]
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()

    def close(self):
        self.httpd.shutdown()


def test_http_transport_roundtrip(tmp_path):
    from yolo_tpu.hub import HUBTrainingSession

    srv = _HubServer()
    try:
        s = HUBTrainingSession("org/model1", api_key="k", run_dir=tmp_path,
                               api_root=f"http://127.0.0.1:{srv.port}")
        assert s.auth.id_token == "tok-123"
        s.upload_metrics(0, {"mAP50": 0.5})
        w = tmp_path / "best.npz"
        np.savez(w, a=np.zeros(3))
        s.upload_model(1, w, is_best=True, final=True)
        s.stop()
        paths = [p for p, _, _ in srv.requests]
        assert "/v1/auth" in paths
        assert "/v1/models/org/model1/session_start" in paths
        assert "/v1/models/org/model1/metrics" in paths
        assert "/v1/models/org/model1/upload" in paths
        # bearer token attached after auth
        auth_headers = [h.get("authorization") for p, h, _ in srv.requests if "metrics" in p]
        assert auth_headers and auth_headers[0] == "Bearer tok-123"
        # checkpoint bytes arrived
        up = [b for p, _, b in srv.requests if p.endswith("/upload")][0]
        assert len(up) == w.stat().st_size
    finally:
        srv.close()


def test_local_recording_without_endpoint(tmp_path, monkeypatch):
    monkeypatch.delenv("YOLO_TPU_HUB_API", raising=False)
    from yolo_tpu.hub import HUBTrainingSession

    s = HUBTrainingSession("m2", api_key="k", run_dir=tmp_path)
    s.upload_metrics(0, {"fitness": 0.1})
    events = [json.loads(l) for l in (tmp_path / "m2" / "events.jsonl").read_text().splitlines()]
    assert [e["event"] for e in events] == ["session_start", "metrics"]


def test_smart_request_retries_then_gives_up(monkeypatch):
    from yolo_tpu.hub import smart_request

    calls = {"n": 0}

    class FakeResp:
        status_code = 503

    import requests

    def fake(method, url, **kw):
        calls["n"] += 1
        return FakeResp()

    monkeypatch.setattr(requests, "request", fake)
    monkeypatch.setattr("time.sleep", lambda s: None)
    r = smart_request("POST", "http://x/y", retries=3)
    assert r is None and calls["n"] == 3


def test_unknown_model_raises_hub_model_error(tmp_path):
    """A definite 404 on the model-existence probe raises HUBModelError (ref
    hub/session.py load_model); unreachable hubs still never raise."""
    import pytest

    from yolo_tpu.hub import HUBTrainingSession
    from yolo_tpu.utils.errors import HUBModelError

    srv = _HubServer()
    # teach the server GET: 404 for the "missing" model, 200 otherwise
    outer_handler = srv.httpd.RequestHandlerClass

    def do_GET(self):
        code = 404 if "missing" in self.path else 200
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(b"{}")

    outer_handler.do_GET = do_GET
    try:
        with pytest.raises(HUBModelError):
            HUBTrainingSession("org/missing", api_key="k", run_dir=tmp_path,
                               api_root=f"http://127.0.0.1:{srv.port}")
        s = HUBTrainingSession("org/model2", api_key="k", run_dir=tmp_path,
                               api_root=f"http://127.0.0.1:{srv.port}")
        s.stop()
    finally:
        srv.close()
