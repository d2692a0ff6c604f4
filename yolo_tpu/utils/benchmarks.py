"""Benchmark helpers (ref: ultralytics/utils/benchmarks.py benchmark:53,
ProfileModels:368).

On TPU the "format matrix" collapses to the native jit program at several
batch sizes + dtypes; `profile_model` reports sigma-clipped latency/throughput
like the reference's ProfileModels.
"""

from __future__ import annotations

import time

import numpy as np

from yolo_tpu.utils import LOGGER


def _time_fn(fn, args, n_warmup: int = 2, n_runs: int = 10, sigma_clip: float = 2.0):
    import jax

    for _ in range(n_warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    t = np.array(times)
    mu, sd = t.mean(), t.std()
    keep = t[np.abs(t - mu) <= sigma_clip * sd] if sd > 0 else t
    return float(keep.mean()), float(keep.std())


def profile_model(model, params, imgsz=(640, 640), batches=(1, 8, 32), dtypes=("bfloat16", "float32"), n_runs: int = 10):
    """Latency/throughput table over batch × dtype for the fused predict program."""
    import jax
    import jax.numpy as jnp

    h, w = (imgsz, imgsz) if isinstance(imgsz, int) else imgsz
    rows = []
    for dtype_name in dtypes:
        dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

        for b in batches:
            fn = jax.jit(lambda p, x, d=dtype: model.predict(p, x.astype(d) / 255.0, dtype=d))
            x = jnp.zeros((b, h, w, 3), jnp.uint8)
            mean_t, std_t = _time_fn(fn, (params, x), n_runs=n_runs)
            rows.append(
                {
                    "batch": b,
                    "dtype": dtype_name,
                    "latency_ms": round(mean_t * 1e3, 2),
                    "std_ms": round(std_t * 1e3, 2),
                    "fps": round(b / mean_t, 1),
                }
            )
            LOGGER.info(f"profile: batch={b} {dtype_name}: {mean_t * 1e3:.2f}±{std_t * 1e3:.2f} ms ({b / mean_t:.1f} fps)")
    return rows


def benchmark(model, imgsz: int = 640, half: bool = True, device=None, **kwargs):
    """Facade-level benchmark (ref: benchmark:53): native program at batch 1/8/32."""
    rows = profile_model(model.model, model.params, imgsz=imgsz, dtypes=("bfloat16",) if half else ("float32",))
    best = max(rows, key=lambda r: r["fps"])
    LOGGER.info(f"best: batch={best['batch']} {best['dtype']} {best['fps']} fps")
    return rows
