"""Progress bar + console capture (ref: ultralytics/utils/tqdm.py:18 custom
zero-dep TQDM, utils/logger.py:21 ConsoleLogger)."""

from __future__ import annotations

import sys
import time
from pathlib import Path


class TQDM:
    """Minimal dependency-free progress bar with rate + ETA."""

    def __init__(self, iterable=None, total=None, desc: str = "", unit: str = "it", disable: bool = False, file=None, ncols: int = 80):
        self.iterable = iterable
        self.total = total if total is not None else (len(iterable) if hasattr(iterable, "__len__") else None)
        self.desc = desc
        self.unit = unit
        self.disable = disable
        self.file = file or sys.stderr
        self.n = 0
        self.start = time.time()
        self._last_render = 0.0

    def __iter__(self):
        for x in self.iterable:
            yield x
            self.update(1)
        self.close()

    def update(self, n: int = 1):
        self.n += n
        now = time.time()
        if not self.disable and (now - self._last_render > 0.1 or self.n == self.total):
            self._render(now)
            self._last_render = now

    def _render(self, now):
        elapsed = now - self.start
        rate = self.n / elapsed if elapsed > 0 else 0
        if self.total:
            frac = self.n / self.total
            bar_w = 24
            filled = int(bar_w * frac)
            bar = "█" * filled + "░" * (bar_w - filled)
            eta = (self.total - self.n) / rate if rate > 0 else 0
            line = f"\r{self.desc} {frac * 100:3.0f}%|{bar}| {self.n}/{self.total} [{elapsed:.0f}s<{eta:.0f}s, {rate:.1f}{self.unit}/s]"
        else:
            line = f"\r{self.desc} {self.n}{self.unit} [{elapsed:.0f}s, {rate:.1f}{self.unit}/s]"
        print(line, end="", file=self.file, flush=True)

    def set_description(self, desc: str):
        self.desc = desc

    def close(self):
        if not self.disable:
            self._render(time.time())
            print(file=self.file)

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class ConsoleLogger:
    """Tee stdout/stderr to a file (ref: ConsoleLogger:21)."""

    def __init__(self, destination):
        self.destination = Path(destination)
        self.destination.parent.mkdir(parents=True, exist_ok=True)
        self._file = None
        self._stdout = None
        self._stderr = None

    class _Tee:
        def __init__(self, stream, f):
            self.stream, self.f = stream, f

        def write(self, data):
            self.stream.write(data)
            self.f.write(data)

        def flush(self):
            self.stream.flush()
            self.f.flush()

    def start_capture(self):
        self._file = open(self.destination, "a", encoding="utf-8")
        self._stdout, self._stderr = sys.stdout, sys.stderr
        sys.stdout = self._Tee(self._stdout, self._file)
        sys.stderr = self._Tee(self._stderr, self._file)

    def stop_capture(self):
        if self._stdout is not None:
            sys.stdout = self._stdout
            sys.stderr = self._stderr
            self._file.close()
            self._file = None

    def __enter__(self):
        self.start_capture()
        return self

    def __exit__(self, *a):
        self.stop_capture()


# default console-capture destination (ref: utils/logger.py:16 DEFAULT_LOG_PATH)
DEFAULT_LOG_PATH = Path("train.log")


class SystemLogger:
    """Dynamic host + accelerator metrics for training monitoring
    (ref: utils/logger.py:229 SystemLogger).

    The reference polls pynvml for per-GPU usage/memory/temp/power; the TPU
    analog reports per-device HBM occupancy from the live JAX backend's
    ``device.memory_stats()`` (no NVML on TPU hosts). Host metrics (cpu, ram,
    cumulative disk/network I/O since init) keep the reference's schema so
    platform consumers parse both.
    """

    def __init__(self):
        import psutil

        self._psutil = psutil
        self.net_start = psutil.net_io_counters()
        self.disk_start = psutil.disk_io_counters()

    def _tpu_metrics(self) -> dict:
        """Per-device HBM stats from an already-initialized JAX backend.

        Never *initializes* a backend: a metrics poll must not pay (or
        trigger) device bootstrap mid-training.
        """
        import sys as _sys

        jax = _sys.modules.get("jax")
        if jax is None:
            return {}
        out = {}
        try:
            for i, dev in enumerate(jax.local_devices()):
                stats = dev.memory_stats() or {}
                limit = stats.get("bytes_limit") or 0
                in_use = stats.get("bytes_in_use") or 0
                out[str(i)] = {
                    "kind": dev.device_kind,
                    "memory": round(100.0 * in_use / limit, 3) if limit else 0.0,
                    "hbm_used_mb": round(in_use / (1 << 20), 3),
                    "hbm_limit_mb": round(limit / (1 << 20), 3),
                }
        except Exception:
            return {}
        return out

    def get_metrics(self) -> dict:
        """cpu/ram %, cumulative disk+network MB, per-TPU HBM % (ref :279)."""
        psutil = self._psutil
        net = psutil.net_io_counters()
        disk = psutil.disk_io_counters()
        memory = psutil.virtual_memory()
        import shutil

        disk_usage = shutil.disk_usage("/")
        return {
            "cpu": round(psutil.cpu_percent(), 3),
            "ram": round(memory.percent, 3),
            "disk": {
                "read_mb": round((disk.read_bytes - self.disk_start.read_bytes) / (1 << 20), 3),
                "write_mb": round((disk.write_bytes - self.disk_start.write_bytes) / (1 << 20), 3),
                "used_gb": round(disk_usage.used / (1 << 30), 3),
            },
            "network": {
                "recv_mb": round((net.bytes_recv - self.net_start.bytes_recv) / (1 << 20), 3),
                "sent_mb": round((net.bytes_sent - self.net_start.bytes_sent) / (1 << 20), 3),
            },
            "tpus": self._tpu_metrics(),
        }
