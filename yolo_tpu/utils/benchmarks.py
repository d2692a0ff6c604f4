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


def benchmark_formats(model, params, imgsz: int = 640, batch: int = 1, workdir=None):
    """Export-format matrix benchmark (ref: benchmarks.py benchmark:53 — the
    reference exports to each of its 16 engines and times val; our matrix is
    the TPU-appropriate artifact set): for each format, export → reload →
    time the fused predict. Returns reference-style rows
    [{format, status, size_MB, latency_ms, fps}]."""
    import tempfile
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    workdir = Path(workdir or tempfile.mkdtemp(prefix="yolo_bench_"))
    h = w = imgsz if isinstance(imgsz, int) else max(imgsz)
    x = jnp.zeros((batch, h, w, 3), jnp.uint8)
    rows = []

    def _predict_fn(m, p):
        return jax.jit(lambda pp, xx: m.predict(pp, xx.astype(jnp.float32) / 255.0)), p

    def _try(fmt, export_reload):
        try:
            fn, p, size = export_reload()
            mean_t, _ = _time_fn(fn, (p, x), n_runs=5)
            rows.append({"format": fmt, "status": "✅", "size_MB": round(size / 1e6, 1),
                         "latency_ms": round(mean_t * 1e3, 2), "fps": round(batch / mean_t, 1)})
        except Exception as e:  # a broken exporter shows up in the table, not as a crash
            rows.append({"format": fmt, "status": f"❌ {type(e).__name__}", "size_MB": 0, "latency_ms": 0, "fps": 0})
            LOGGER.warning(f"benchmark {fmt} failed: {e}")

    def _native():
        fn, p = _predict_fn(model, params)
        return fn, p, 0

    def _npz():
        from yolo_tpu.engine.exporter import load_npz, save_npz

        f = save_npz(model, params, workdir / "bench.npz")
        m2, p2, _ = load_npz(f)
        fn, p = _predict_fn(m2, p2)
        return fn, p, f.stat().st_size

    def _orbax():
        from yolo_tpu.engine.exporter import load_orbax, save_orbax

        d = save_orbax(model, params, workdir / "bench_orbax")
        m2, p2, _ = load_orbax(d)
        fn, p = _predict_fn(m2, p2)
        size = sum(f.stat().st_size for f in Path(d).rglob("*") if f.is_file())
        return fn, p, size

    def _stablehlo():
        from jax import export as jax_export

        from yolo_tpu.engine.exporter import export_stablehlo

        f = export_stablehlo(model, params, imgsz=(h, w), batch=batch, filename=workdir / "bench.stablehlo")
        exported = jax_export.deserialize(f.read_bytes())
        fn = jax.jit(exported.call)
        return fn, params, f.stat().st_size

    for fmt, maker in [("native-jit", _native), ("npz", _npz), ("orbax", _orbax), ("stablehlo", _stablehlo)]:
        _try(fmt, maker)
    width = max(len(r["format"]) for r in rows)
    for r in rows:
        LOGGER.info(f"{r['format']:<{width}}  {r['status']:<6} {r['size_MB']:>8} MB  {r['latency_ms']:>8} ms  {r['fps']:>8} fps")
    return rows
