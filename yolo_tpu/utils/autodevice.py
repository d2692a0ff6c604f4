"""Idle-accelerator discovery and selection.

TPU-native analog of the reference's NVML-based GPU picker
(ref: ultralytics/utils/autodevice.py GPUInfo:11 / select_idle_gpu — NVML
utilization + free-memory ranking): there is no NVML on TPU hosts, but the
PJRT client exposes per-device memory statistics (`Device.memory_stats()`),
which is the signal that matters for co-tenanted chips — a busy chip is a
chip whose HBM is already committed to another program's buffers.

`TPUInfo` collects per-device stats; `select_idle_device` ranks devices by
free HBM and returns the most idle ones, falling back to simple enumeration
on backends that don't report memory stats (e.g. the CPU mesh used in tests).
"""

from __future__ import annotations

from typing import Any

from yolo_tpu.utils import LOGGER


class TPUInfo:
    """Per-device accelerator stats via the PJRT client (no NVML on TPU)."""

    def __init__(self):
        self.device_stats: list[dict[str, Any]] = []
        self.refresh_stats()

    def refresh_stats(self):
        import jax

        self.device_stats = []
        for d in jax.devices():
            stats: dict[str, Any] = {
                "index": d.id,
                "name": f"{d.platform}:{d.id} ({getattr(d, 'device_kind', '?')})",
            }
            try:
                m = d.memory_stats() or {}
            except Exception:  # backends without memory stats (CPU mesh)
                m = {}
            limit = m.get("bytes_limit") or m.get("bytes_reservable_limit") or 0
            used = m.get("bytes_in_use", 0)
            stats["memory_total"] = limit
            stats["memory_used"] = used
            stats["memory_free"] = max(limit - used, 0) if limit else None
            self.device_stats.append(stats)
        return self.device_stats

    def print_status(self):
        if not self.device_stats:
            LOGGER.info("no accelerator devices visible")
            return
        LOGGER.info(f"{'idx':>3} {'device':<28} {'used MiB':>9} {'total MiB':>9} {'free MiB':>9}")
        for s in self.device_stats:
            mib = lambda b: f"{b / 2**20:.0f}" if b is not None and s["memory_total"] else "n/a"  # noqa: E731
            LOGGER.info(
                f"{s['index']:>3} {s['name']:<28} {mib(s['memory_used']):>9} {mib(s['memory_total']):>9} {mib(s['memory_free']):>9}"
            )

    def select_idle_device(self, count: int = 1, min_memory_fraction: float = 0.0):
        """Return up to `count` jax devices, most-free-HBM first.

        Devices with less than `min_memory_fraction` of their HBM free are
        excluded (ref: select_idle_gpu's min_memory_fraction contract). When
        the backend reports no memory stats every device ranks equal and the
        first `count` are returned.
        """
        import jax

        self.refresh_stats()
        by_id = {d.id: d for d in jax.devices()}
        eligible = []
        for s in self.device_stats:
            if s["memory_free"] is None or not s["memory_total"]:
                eligible.append((0, s["index"]))  # unknown → neutral rank, stable order
            elif s["memory_free"] / s["memory_total"] >= min_memory_fraction:
                eligible.append((-s["memory_free"], s["index"]))
        eligible.sort()
        picked = [by_id[i] for _, i in eligible[:count]]
        if len(picked) < count:
            LOGGER.warning(f"requested {count} idle devices, only {len(picked)} eligible")
        return picked


def select_idle_device(count: int = 1, min_memory_fraction: float = 0.0):
    """Module-level convenience mirroring the reference's free function use."""
    return TPUInfo().select_idle_device(count=count, min_memory_fraction=min_memory_fraction)
