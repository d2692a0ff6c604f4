"""TensorBoard callback integration (ref: utils/callbacks/tensorboard.py).

Writes scalars with the pure-python TensorBoard event format via
orbax/tensorboardX if available; falls back to a JSONL event log so training
telemetry is always captured.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

_writers: dict = {}  # keyed by log dir — a 2nd run in one process gets its own


def _get_writer(log_dir):
    key = str(log_dir)
    if key in _writers:
        return _writers[key]
    _writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter  # torch cpu ships one

        _writer = SummaryWriter(str(log_dir))
    except Exception:
        class JsonlWriter:
            def __init__(self, d):
                self.path = Path(d) / "events.jsonl"
                self.path.parent.mkdir(parents=True, exist_ok=True)

            def add_scalar(self, tag, value, step):
                with open(self.path, "a", encoding="utf-8") as f:
                    f.write(json.dumps({"t": time.time(), "tag": tag, "value": float(value), "step": int(step)}) + "\n")

            def flush(self):
                pass

        _writer = JsonlWriter(log_dir)
    _writers[key] = _writer
    return _writer


def on_fit_epoch_end(trainer):
    w = _get_writer(trainer.save_dir / "tb")
    for k, v in (trainer.metrics or {}).items():
        w.add_scalar(f"metrics/{k}", v, trainer.epoch)
    w.flush()


def on_train_end(trainer):
    w = _get_writer(trainer.save_dir / "tb")
    w.flush()


callbacks = {"on_fit_epoch_end": on_fit_epoch_end, "on_train_end": on_train_end}
