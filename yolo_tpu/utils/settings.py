"""Persisted user settings (ref: utils/__init__.py SettingsManager:1264 → SETTINGS:1417).

A versioned JSON dict at ``$YOLO_TPU_CONFIG_DIR/settings.json`` (default
``~/.config/yolo_tpu``) holding machine-level preferences — dataset/weights/run
directories and integration flags. Schema-version mismatch or corruption
resets to defaults, matching the reference's ``_validate_settings`` behavior.
The CLI surface is ``yolo settings [reset | key=value ...]``
(ref: cfg/__init__.py handle_yolo_settings:594).
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from pathlib import Path

from yolo_tpu.utils import LOGGER

SETTINGS_VERSION = "0.0.6"  # same schema version string as the reference

CONFIG_DIR = Path(os.getenv("YOLO_TPU_CONFIG_DIR", Path.home() / ".config" / "yolo_tpu"))
SETTINGS_FILE = CONFIG_DIR / "settings.json"


def _defaults(file: Path) -> dict:
    # RELATIVE defaults: an untouched settings file keeps runs/datasets
    # resolving against the current working directory (absolutizing at
    # first-creation time pinned every later run to a stale cwd); an explicit
    # `yolo settings runs_dir=/abs/path` is honored as-is by get_save_dir
    return {
        "settings_version": SETTINGS_VERSION,
        "datasets_dir": "datasets",
        "weights_dir": "weights",
        "runs_dir": "runs",
        # anonymized machine id, same derivation as the reference (sha256 of the MAC)
        "uuid": hashlib.sha256(str(uuid.getnode()).encode()).hexdigest(),
        "sync": True,
        "api_key": "",
        # integration flags read by utils/integrations.py guarded imports
        "clearml": True,
        "comet": True,
        "dvc": True,
        "hub": True,
        "mlflow": True,
        "neptune": True,
        "raytune": True,
        "tensorboard": False,
        "wandb": False,
    }


class SettingsManager(dict):
    """Dict-backed settings with JSON persistence and schema validation."""

    def __init__(self, file: Path | None = None, version: str = SETTINGS_VERSION):
        super().__init__()
        self.file = Path(file if file is not None else SETTINGS_FILE)
        self.version = version
        self.defaults = _defaults(self.file)
        super().update(self.defaults)  # bootstrap without persisting (file not read yet)
        try:
            if self.file.is_file():
                stored = json.loads(self.file.read_text())
                if not isinstance(stored, dict):
                    raise ValueError("settings root is not an object")
                self.update({k: v for k, v in stored.items() if k in self.defaults})
            else:
                self.save()
        except Exception as e:  # corrupted → reset (ref _validate_settings)
            LOGGER.warning(f"settings file unreadable ({e}); resetting to defaults")
            self.reset()
        self._validate()

    def _validate(self):
        if self.get("settings_version") != self.version or set(self) != set(self.defaults):
            LOGGER.warning("settings schema changed — resetting to defaults (ref SettingsManager._validate_settings)")
            keep = {k: self[k] for k in ("datasets_dir", "weights_dir", "runs_dir") if k in self}
            self.reset()
            self.update(keep)
            self.save()

    def save(self):
        self.file.parent.mkdir(parents=True, exist_ok=True)
        self.file.write_text(json.dumps(dict(self), indent=2))

    def update(self, *args, **kwargs):
        """Validated update that persists immediately (reference behavior —
        JSONDict.update saves on every mutation, ref SettingsManager:1264)."""
        new = dict(*args, **kwargs)
        unknown = {k for k in new if k not in self.defaults} if self.defaults else set()
        if unknown:
            raise KeyError(f"unknown settings key(s) {sorted(unknown)}; valid: {sorted(self.defaults)}")
        super().update(new)
        if self.defaults and new:  # skip the pre-defaults bootstrap call
            self.save()

    def reset(self):
        self.clear()
        super().update(self.defaults)
        self.save()


# module singleton, created lazily so importing yolo_tpu never writes to $HOME
_SETTINGS: SettingsManager | None = None


def get_settings() -> SettingsManager:
    global _SETTINGS
    if _SETTINGS is None:
        _SETTINGS = SettingsManager()
    return _SETTINGS
