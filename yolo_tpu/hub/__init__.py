"""Hub client (ref: ultralytics/hub/ HUBTrainingSession, auth).

The reference's hub layer talks to a SaaS backend over HTTP. This environment
is zero-egress, so the client is a well-formed local stub: the session records
the same lifecycle events (model upload slots, metric heartbeats, checkpoint
registration) into a local run directory, and the auth layer accepts/persists a
key without network validation. Swap `HUB_API_ROOT` and the `_post` transport
for the real service.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from yolo_tpu.utils import LOGGER

HUB_API_ROOT = "https://api.example.invalid"  # no egress in this environment


class Auth:
    """API-key holder; persists to the user settings dir."""

    def __init__(self, api_key: str | None = None):
        self.api_key = api_key
        self.id_token = None

    def authenticate(self) -> bool:
        if not self.api_key:
            LOGGER.warning("hub auth: no api key set")
            return False
        self.id_token = f"local-{hash(self.api_key) & 0xFFFFFFFF:08x}"
        return True


class HUBTrainingSession:
    """Local-recording stand-in for the reference HUBTrainingSession (hub/session.py)."""

    def __init__(self, identifier: str, api_key: str | None = None, run_dir="runs/hub"):
        self.model_id = identifier
        self.auth = Auth(api_key)
        self.run_dir = Path(run_dir) / identifier.replace("/", "_")
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.metrics_queue: dict = {}
        self.alive = True
        self._log = self.run_dir / "events.jsonl"
        self._emit("session_start", {"model": identifier})

    def _emit(self, event: str, payload: dict):
        with open(self._log, "a", encoding="utf-8") as f:
            f.write(json.dumps({"t": time.time(), "event": event, **payload}) + "\n")

    def upload_metrics(self, epoch: int, metrics: dict):
        self.metrics_queue[epoch] = metrics
        self._emit("metrics", {"epoch": epoch, "metrics": metrics})

    def upload_model(self, epoch: int, weights_path, is_best: bool = False, final: bool = False):
        self._emit("model", {"epoch": epoch, "weights": str(weights_path), "best": is_best, "final": final})

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
