"""Multi-host initialization (replaces the reference's DDP launcher, ref:
ultralytics/utils/dist.py generate_ddp_command:79 + engine/trainer.py:240-251).

On TPU pods there is no subprocess re-launch and no process group: every host
runs the same script, calls :func:`init_distributed` once, and builds a global
mesh over all devices. Collectives are compiled into the jitted step by XLA.
"""

from __future__ import annotations

import os

from yolo_tpu.utils import LOGGER


def init_distributed(coordinator_address: str | None = None, num_processes: int | None = None, process_id: int | None = None) -> dict:
    """Initialize jax.distributed if running multi-host; no-op single-host.

    Env autodetection mirrors common TPU launchers (JAX reads the TPU metadata
    itself); explicit args override. Returns topology info.
    """
    import jax

    multi = num_processes is not None or os.environ.get("JAX_COORDINATOR_ADDRESS") or coordinator_address
    if multi:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    info = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
    if info["process_index"] == 0:
        LOGGER.info(f"distributed: {info}")
    return info


def is_main_process() -> bool:
    """Replaces the reference's RANK in {-1, 0} checks."""
    import jax

    return jax.process_index() == 0


def global_mesh(axis: str = "batch"):
    """Mesh over ALL global devices (multi-host pods included)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def local_batch_slice(global_batch: int) -> int:
    """Per-host batch share for host-local data loading (reference DistributedSampler role)."""
    import jax

    assert global_batch % jax.process_count() == 0, "global batch must divide process count"
    return global_batch // jax.process_count()
