"""Tracing/profiling hooks (SURVEY §5: jax.profiler traces + per-stage timers).

Replaces the reference's CUDA-synchronized Profile + thop FLOPs counters
(ref: utils/ops.py Profile:18, torch_utils.py get_flops:412, profile_ops:819)
with XLA-native equivalents: TensorBoard-consumable device traces and
cost-analysis-based FLOPs.
"""

from __future__ import annotations

from contextlib import contextmanager
from pathlib import Path

from yolo_tpu.utils import LOGGER


@contextmanager
def trace(log_dir="runs/profile"):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        LOGGER.info(f"trace written to {log_dir}")


def start_profiler_server(port: int = 9999):
    """Expose the live profiler (connect with TensorBoard's capture button)."""
    import jax

    jax.profiler.start_server(port)
    LOGGER.info(f"profiler server on :{port}")


def get_flops(model, params, imgsz=640, batch: int = 1) -> float:
    """Analytical FLOPs of the fused predict program (ref: get_flops:412).

    Uses XLA's cost analysis on the lowered computation — exact for the compiled
    graph, no thop-style module hooks needed.
    """
    import jax
    import jax.numpy as jnp

    h, w = (imgsz, imgsz) if isinstance(imgsz, int) else imgsz
    lowered = jax.jit(model.predict).lower(params, jnp.zeros((batch, h, w, 3), jnp.float32))
    try:
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception as e:
        LOGGER.warning(f"cost analysis unavailable: {e}")
        return 0.0


def model_info(model, params, imgsz=640, verbose: bool = True) -> dict:
    """Layer/param/FLOPs summary (ref: torch_utils.py model_info:323)."""
    n_params = model.param_count(params)
    flops = get_flops(model, params, imgsz)
    info = {
        "layers": len(model.layers),
        "parameters": int(n_params),
        "GFLOPs": round(flops / 1e9, 2),
        "stride": getattr(model, "stride", None),
    }
    if verbose:
        LOGGER.info(f"model: {info['layers']} layers, {info['parameters']:,} params, {info['GFLOPs']} GFLOPs @ {imgsz}")
    return info


def profile_per_layer(model, params, imgsz=640, batch: int = 1, dtype=None, n: int = 3, verbose: bool = True,
                      roofline: tuple[float, float] | None = None, channels: int = 3):
    """Per-layer wall time + FLOPs + params table (ref: nn/tasks.py
    _profile_one_layer:199 and torch_utils.py profile_ops:819).

    One eager graph walk captures each layer's live inputs; each layer is then
    jitted and timed in isolation (compile excluded), with FLOPs from XLA's
    cost analysis of the per-layer program. Returns a list of row dicts
    [{i, type, ms, gflops, params}] sorted by graph order.

    With ``roofline=(peak_tflops, peak_gbps)`` each row also carries the
    layer's HBM traffic estimate (read inputs + write output + read weights,
    at the given dtype) and its speed-of-light time
    ``bound_ms = max(flops/peak_flops, bytes/peak_bw)`` — the per-layer
    hardware bound that a perfectly-fused kernel could not beat. Summing
    ``bound_ms`` gives an optimistic roofline for the whole forward.

    CAVEAT (tunneled transports): through a remote/relayed device link each
    per-layer dispatch pays the link's round-trip latency (~11 ms measured on
    this environment's relay — larger than most layers' compute), so isolated
    per-layer times are only meaningful with a local PCIe/DMA device. Use the
    whole-program cost analysis (demos/roofline.py) on relayed setups.
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_tpu.nn import modules as M

    h, w = (imgsz, imgsz) if isinstance(imgsz, int) else imgsz
    dtype = dtype or jnp.float32
    ctx = M.Ctx(train=False, dtype=dtype)
    x = jnp.zeros((batch, h, w, channels), dtype)
    mp = params["model"]

    # eager walk, recording each layer's input(s)
    inputs, y = {}, {}
    for spec in model.layers:
        f = spec.f

        def src(j):
            return x if j == -1 else y[j if j >= 0 else spec.i + j]

        x_in = [src(j) for j in f] if isinstance(f, list) else src(f)
        inputs[spec.i] = x_in
        out = spec.module(mp[str(spec.i)], x_in, ctx, f"model/{spec.i}")
        if spec.i in model.save:
            y[spec.i] = out
        x = out if not isinstance(out, list) else x

    dt_size = jnp.dtype(dtype).itemsize

    def _leaf_bytes(tree):
        return sum(int(np.prod(np.shape(a))) * dt_size for a in jax.tree_util.tree_leaves(tree))

    rows = []
    for spec in model.layers:
        lp, x_in = mp[str(spec.i)], inputs[spec.i]
        fn = jax.jit(lambda p, z, m=spec.module, i=spec.i: m(p, z, M.Ctx(train=False, dtype=dtype), f"model/{i}"))
        try:
            lowered = fn.lower(lp, x_in)
            cost = lowered.compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            gflops = float(cost.get("flops", 0.0)) / 1e9
        except Exception:
            gflops = 0.0
        def sync(res):
            # block_until_ready is not a true barrier through a tunneled
            # transport — downloading one element is
            leaf = jax.tree_util.tree_leaves(res)[0]
            return np.asarray(leaf.ravel()[0])

        r = fn(lp, x_in)  # compile + warm
        sync(r)
        r = fn(lp, x_in)
        sync(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(lp, x_in)
        sync(r)
        ms = (time.perf_counter() - t0) / n * 1e3
        n_par = sum(int(np.prod(np.shape(a))) for a in jax.tree_util.tree_leaves(lp))
        row = {"i": spec.i, "type": spec.type, "ms": round(ms, 3), "gflops": round(gflops, 3), "params": n_par}
        if roofline:
            peak_tflops, peak_gbps = roofline
            mbytes = (_leaf_bytes(x_in) + _leaf_bytes(r) + n_par * dt_size) / 1e6
            # GF / (TF/s) = ms;  MB / (GB/s) = ms
            flops_ms = gflops / peak_tflops
            bw_ms = mbytes / peak_gbps
            row.update({
                "mbytes": round(mbytes, 2),
                "bound_ms": round(max(flops_ms, bw_ms), 4),
                "bound_by": "flops" if flops_ms >= bw_ms else "bw",
            })
        rows.append(row)
    if verbose:
        extra = f" {'MB':>8} {'bound':>8} {'lim':>5}" if roofline else ""
        LOGGER.info(f"{'idx':>4} {'ms':>9} {'GFLOPs':>8} {'params':>10}{extra}  type")
        for row in rows:
            e = f" {row['mbytes']:>8.2f} {row['bound_ms']:>8.3f} {row['bound_by']:>5}" if roofline else ""
            LOGGER.info(f"{row['i']:>4} {row['ms']:>9.3f} {row['gflops']:>8.3f} {row['params']:>10,}{e}  {row['type']}")
        e = f" {sum(r['mbytes'] for r in rows):>8.2f} {sum(r['bound_ms'] for r in rows):>8.3f}      " if roofline else ""
        LOGGER.info(f"{'':>4} {sum(r['ms'] for r in rows):>9.3f} {sum(r['gflops'] for r in rows):>8.3f} "
                    f"{sum(r['params'] for r in rows):>10,}{e}  TOTAL (per-layer, excludes fusion wins)")
    return rows


def autobatch(model, params, imgsz: int = 640, start: int = 8, max_batch: int = 512) -> int:
    """Largest power-of-two batch that compiles+runs (ref: autobatch.py:46).

    TPU analog of the 60%-VRAM binary search: double until the device refuses
    (RESOURCE_EXHAUSTED), return the last good batch.
    """
    import jax
    import jax.numpy as jnp

    good = 0
    b = start
    while b <= max_batch:
        try:
            fn = jax.jit(model.predict)
            out = fn(params, jnp.zeros((b, imgsz, imgsz, 3), jnp.float32))
            jax.block_until_ready(out)
            good = b
            b *= 2
        except Exception as e:
            LOGGER.info(f"autobatch: batch {b} failed ({type(e).__name__}); using {good}")
            break
    LOGGER.info(f"autobatch: selected batch {good}")
    return good or start


def hbm_buffer_table(compiled, top: int = 20, min_mb: float = 0.5):
    """Physical (layout-padded) buffer sizes of the largest instructions in a
    compiled XLA executable — the tool that localizes HBM traffic on a
    bandwidth-bound program (per-op timing is useless through a high-latency
    dispatch link; whole-program cost_analysis says *how much* traffic but
    not *where*).

    Parses the executable's HLO text: each instruction's result shape with
    its layout `{minor-to-major:T(s,l)}`, applying the tile padding to the
    two minor-most dims (e.g. `bf16[512,128,160,64]{0,3,2,1:T(8,128)}` is
    batch-minor: batch rides the 128-lane axis, channels the 8-sublane axis).
    This is how the DFL-softmax f32 materialization was found (see
    nn/modules.py dfl_project) — three (B, A, 4, 16) f32 tensors dwarfing
    every conv activation.

    Args:
        compiled: result of ``jax.jit(f).lower(*args).compile()``.
        top: max rows to return.
        min_mb: drop instructions below this physical size (MB).
    Returns: list of dicts {mb, dtype, shape, layout, op, source} sorted
    descending by physical MB; covers the ENTRY computation only (fusion
    bodies don't materialize to HBM).
    """
    import re

    txt = compiled.as_text()
    entry = txt.split("ENTRY ", 1)[-1]
    pat = re.compile(r"(\w+)\[([\d,]*)\]\{([\d,]+)(?::T\(([\d,]+)\))?")
    dt_bytes = {"f32": 4, "bf16": 2, "s32": 4, "u8": 1, "s8": 1, "pred": 1, "u32": 4, "f16": 2, "s16": 2, "u16": 2, "f64": 8, "s64": 8}
    rows = []
    for line in entry.splitlines():
        if "=" not in line or line.lstrip().startswith("//"):
            continue
        m = pat.search(line.split("=", 1)[1])
        if not m:
            continue
        dt, dims_s, order_s, tile_s = m.groups()
        if dt not in dt_bytes:
            continue
        dims = [int(x) for x in dims_s.split(",")] if dims_s else []
        padded = list(dims)
        if tile_s and dims:
            tiles = [int(x) for x in tile_s.split(",")]
            minor = [int(x) for x in order_s.split(",")][: len(tiles)]
            for i, t in enumerate(reversed(tiles)):
                d = minor[i]
                padded[d] = -(-padded[d] // t) * t
        n = dt_bytes[dt]
        for x in padded:
            n *= x
        if n / 1e6 < min_mb:
            continue
        opm = re.search(r"=\s+\S+\s+(\w[\w-]*)\(", line)
        srcm = re.search(r'source_file="([^"]+)" source_line=(\d+)', line)
        rows.append(
            {
                "mb": round(n / 1e6, 2),
                "dtype": dt,
                "shape": dims,
                "layout": m.group(0).split("{", 1)[1],
                "op": opm.group(1) if opm else "?",
                "source": f"{srcm.group(1)}:{srcm.group(2)}" if srcm else "",
            }
        )
    rows.sort(key=lambda r: -r["mb"])
    return rows[:top]
