"""Hub client (ref: ultralytics/hub/ HUBTrainingSession:~40, auth.py Auth,
utils.py smart_request).

Two transports behind one session API:

  - **HTTP** (the reference behavior): when a hub endpoint is configured
    (``YOLO_TPU_HUB_API`` env or ``api_root=``), lifecycle events — auth,
    metric heartbeats, checkpoint uploads — POST to it with the reference's
    retry/backoff pattern. Tested against a local HTTP server.
  - **local recording**: with no endpoint (e.g. this zero-egress host), the
    same events append to ``runs/hub/<model>/events.jsonl`` so nothing is
    lost; point the env var at a real service to go live.
"""

from __future__ import annotations

import json
import os
import threading
import time
from pathlib import Path

from yolo_tpu.utils import LOGGER


def _api_root() -> str | None:
    return os.getenv("YOLO_TPU_HUB_API") or None


def smart_request(method: str, url: str, *, payload: dict | None = None, data: bytes | None = None,
                  headers: dict | None = None, retries: int = 3, timeout: float = 30.0):
    """HTTP request with exponential-backoff retries (ref: hub/utils.py
    smart_request:~70). Returns the response or None after exhausting retries
    (hub failures must never kill training)."""
    import requests

    for attempt in range(retries):
        if hasattr(data, "seek"):
            data.seek(0)  # file-like body: a failed attempt leaves it at EOF
        try:
            r = requests.request(method, url, json=payload, data=data, headers=headers, timeout=timeout)
            if r.status_code < 500:
                return r
            LOGGER.warning(f"hub: {url} -> {r.status_code}, retry {attempt + 1}/{retries}")
        except Exception as e:
            LOGGER.warning(f"hub: {url} failed ({e}), retry {attempt + 1}/{retries}")
        if attempt + 1 < retries:  # no dead-time sleep after the final attempt
            time.sleep(2**attempt)
    return None


class Auth:
    """API-key auth (ref: hub/auth.py Auth). With an endpoint the key is
    validated via POST /v1/auth; locally a deterministic token is issued."""

    def __init__(self, api_key: str | None = None, api_root: str | None = None):
        if not api_key:
            api_key = os.getenv("YOLO_TPU_HUB_KEY")
        if not api_key:  # `yolo login KEY` persists it (cfg handle_yolo_hub)
            try:
                from yolo_tpu.utils.settings import get_settings

                api_key = get_settings().get("api_key") or None
            except Exception:
                api_key = None
        self.api_key = api_key
        self.api_root = api_root or _api_root()
        self.id_token = None

    def authenticate(self) -> bool:
        if not self.api_key:
            LOGGER.warning("hub auth: no api key set")
            return False
        if self.api_root:
            r = smart_request("POST", f"{self.api_root}/v1/auth", headers={"x-api-key": self.api_key})
            if r is None or r.status_code != 200:
                LOGGER.warning("hub auth: endpoint rejected the key")
                return False
            self.id_token = r.json().get("token")
            return True
        import hashlib

        # hashlib, not hash(): Python's str hash is salted per process
        # (PYTHONHASHSEED), which would break the documented determinism
        self.id_token = f"local-{hashlib.sha256(self.api_key.encode()).hexdigest()[:8]}"
        return True

    @property
    def header(self) -> dict:
        return {"authorization": f"Bearer {self.id_token}"} if self.id_token else {}


class HUBTrainingSession:
    """Training-session client (ref: hub/session.py HUBTrainingSession).

    Emits the same lifecycle event set as the reference — session start,
    per-epoch metric heartbeats, checkpoint uploads (best/final flags) — over
    HTTP when configured, into a local JSONL otherwise.
    """

    def __init__(self, identifier: str, api_key: str | None = None, run_dir="runs/hub",
                 api_root: str | None = None, heartbeat_s: float = 0.0):
        self.model_id = identifier
        self.api_root = api_root or _api_root()
        self.auth = Auth(api_key, api_root=self.api_root)
        if self.api_root:
            self.auth.authenticate()
            # model-existence probe (ref: hub/session.py load_model → HUBModelError
            # on a bad model URL). Only a definite 404 raises — an unreachable or
            # erroring hub must never kill training (same policy as smart_request).
            r = smart_request("GET", f"{self.api_root}/v1/models/{identifier}",
                              headers=self.auth.header, retries=1)
            if r is not None and r.status_code == 404:
                from yolo_tpu.utils.errors import HUBModelError

                raise HUBModelError(f"model '{identifier}' not found on the hub")
        self.run_dir = Path(run_dir) / identifier.replace("/", "_")
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.metrics_queue: dict = {}
        self.alive = True
        self._log = self.run_dir / "events.jsonl"
        self._emit("session_start", {"model": identifier})
        self._hb_thread = None
        if self.api_root and heartbeat_s > 0:  # agent heartbeat (ref session.py _start_heartbeat)
            self._hb_thread = threading.Thread(target=self._heartbeat, args=(heartbeat_s,), daemon=True)
            self._hb_thread.start()

    # --- transport -------------------------------------------------------------
    def _emit(self, event: str, payload: dict):
        record = {"t": time.time(), "event": event, **payload}
        with open(self._log, "a", encoding="utf-8") as f:
            f.write(json.dumps(record, default=str) + "\n")
        if self.api_root:
            smart_request(
                "POST", f"{self.api_root}/v1/models/{self.model_id}/{event}",
                payload=payload, headers=self.auth.header,
            )

    def _heartbeat(self, interval: float):
        while self.alive:
            smart_request("POST", f"{self.api_root}/v1/agent/heartbeat",
                          payload={"model": self.model_id}, headers=self.auth.header, retries=1)
            time.sleep(interval)

    # --- lifecycle --------------------------------------------------------------
    def upload_metrics(self, epoch: int, metrics: dict):
        self.metrics_queue[epoch] = metrics
        self._emit("metrics", {"epoch": epoch, "metrics": metrics})

    def upload_model(self, epoch: int, weights_path, is_best: bool = False, final: bool = False):
        self._emit("model", {"epoch": epoch, "weights": str(weights_path), "best": is_best, "final": final})
        if self.api_root and Path(weights_path).exists():
            with open(weights_path, "rb") as f:  # stream — no whole-checkpoint RAM spike
                smart_request(
                    "POST", f"{self.api_root}/v1/models/{self.model_id}/upload",
                    data=f,
                    headers={**self.auth.header, "x-epoch": str(epoch), "x-final": str(final).lower()},
                )

    def stop(self):
        self.alive = False

    def callbacks(self) -> dict:
        """Trainer callbacks mirroring the reference hub callback set."""

        def on_fit_epoch_end(trainer):
            self.upload_metrics(trainer.epoch, trainer.metrics or {})

        def on_model_save(trainer):
            self.upload_model(trainer.epoch, trainer.wdir / "last.npz", is_best=False)

        def on_train_end(trainer):
            self.upload_model(trainer.epoch, trainer.wdir / "best.npz", is_best=True, final=True)

        return {
            "on_fit_epoch_end": [on_fit_epoch_end],
            "on_model_save": [on_model_save],
            "on_train_end": [on_train_end],
        }
