#!/usr/bin/env python3
"""Forward-pass segment analysis on the real chip (round-4 VERDICT #2).

The r3 per-layer table timed each layer as its own dispatch (useless absolute
numbers through the relay). This instead times PREFIXES of the real fused
forward — same ctx, same gray-folded fused params, same neck fold — so
successive differences give true in-program segment costs, plus the compiled
whole-program cost analysis and the physical HBM buffer table.

    python demos/fwd_analysis.py            # chunk=512 default
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_TFLOPS = float(os.getenv("PEAK_TFLOPS", "197"))
PEAK_GBPS = float(os.getenv("PEAK_GBPS", "819"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.getenv("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from bench import make_clip
    from yolo_tpu.nn import modules as M
    from yolo_tpu.nn.tasks import DetectionModel
    from yolo_tpu.pipeline import FusedDetectTrack
    from yolo_tpu.utils.profilers import hbm_buffer_table

    chunk = int(os.getenv("BENCH_CHUNK", "512"))
    h, w = 512, 640
    reps = int(os.getenv("REPS", "4"))

    model = DetectionModel("yolov8-small.yaml")
    params = model.fuse(model.init(0))
    ft = FusedDetectTrack(model, params, frame_hw=(h, w), channels=1, chunk=chunk,
                          conf=0.15, iou=0.6, n_max=64, d_max=16)
    p_dev = ft.params
    dtype = jnp.bfloat16
    clip = make_clip(chunk, h, w)
    dev_frames = jax.device_put(clip)
    _ = np.asarray(dev_frames[0, 0, 0])

    def tree_sum(t):
        leaves = jax.tree_util.tree_leaves(t)
        return sum(x.astype(jnp.float32).sum() for x in leaves)

    def prefix_fn(upto):
        def f(p, frames):
            x = frames.astype(dtype) if ft.norm_folded else frames.astype(dtype) / 255.0
            ctx = M.Ctx(train=False, dtype=dtype, neck_opt=ft.neck_opt)
            out, y, _ = model._walk(p, x, ctx, upto=upto)
            # keep every live value (saves + out) so nothing upstream is DCE'd
            acc = tree_sum(out) + tree_sum(list(y.values()))
            return acc
        return jax.jit(f)

    def timeit(fn, *args, n=reps):
        r = fn(*args)
        jax.block_until_ready(r)
        r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(*args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / n * 1e3

    # segment cut points (layer i means "run layers < i"); with neck_opt the
    # Upsample/Concat layers fold into the C2f after them
    cuts = [2, 3, 5, 7, 9, 10, 13, 16, 19, 22, 25, 26]
    names = {2: "stem 0-1", 3: "C2f 2 (P2)", 5: "3-4 (P3 conv+C2f)", 7: "5-6 (P4 conv+C2f)",
             9: "7-8 (P5 conv+C2f)", 10: "SPPF 9", 13: "neck C2f12 (P4)",
             16: "neck C2f15 (P3)", 19: "neck C2f18 (P2)", 22: "19-21 (down P4)",
             25: "22-24 (down P5)", 26: "Detect 25"}
    log(f"== forward prefix timing @ chunk={chunk}, {h}x{w} gray, bf16, neck_opt={ft.neck_opt} ==")
    prev = 0.0
    rows = []
    for c in cuts:
        ms = timeit(prefix_fn(c), p_dev, dev_frames)
        rows.append({"upto": c, "ms": round(ms, 2), "seg_ms": round(ms - prev, 2), "name": names[c]})
        log(f"  upto {c:>2} {names[c]:<22} cum {ms:8.2f} ms  seg {ms - prev:8.2f} ms")
        prev = ms

    # full parts forward (decode included) for the roofline numbers
    def fwd_parts(p, frames):
        x = frames.astype(dtype) if ft.norm_folded else frames.astype(dtype) / 255.0
        b, s = model.predict_parts(p, x, dtype=dtype, neck_opt=ft.neck_opt)
        return b.sum() + s.sum()

    jf = jax.jit(fwd_parts)
    ms_full = timeit(jf, p_dev, dev_frames)
    log(f"  full parts fwd (incl. decode): {ms_full:.2f} ms ({chunk / ms_full * 1e3:.1f} fps)")

    lowered = jf.lower(p_dev, dev_frames)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    bytes_ = float(ca.get("bytes accessed", 0.0))
    gf_frame = flops / chunk / 1e9
    mb_frame = bytes_ / chunk / 1e6
    tflops = flops / (ms_full / 1e3) / 1e12
    gbps = bytes_ / (ms_full / 1e3) / 1e9
    log(f"== roofline: {gf_frame:.2f} GF/frame, {mb_frame:.1f} MB/frame | "
        f"{tflops:.1f} TF/s = {tflops / PEAK_TFLOPS * 100:.1f}% MFU | "
        f"{gbps:.0f} GB/s = {gbps / PEAK_GBPS * 100:.1f}% HBM peak ==")

    log("== top HBM buffers (physical, entry computation) ==")
    table = hbm_buffer_table(compiled, top=25, min_mb=8.0)
    for r in table:
        log(f"  {r['mb']:9.1f} MB  {r['dtype']:>5} {str(r['shape']):>28} {r['layout']:<16} {r['op'][:60]}")

    print(json.dumps({"chunk": chunk, "segments": rows, "ms_full_parts": round(ms_full, 2),
                      "gf_frame": round(gf_frame, 2), "mb_frame": round(mb_frame, 1),
                      "mfu_pct": round(tflops / PEAK_TFLOPS * 100, 1),
                      "hbm_pct": round(gbps / PEAK_GBPS * 100, 1),
                      "fps": round(chunk / ms_full * 1e3, 1),
                      "buffers": table[:12]}))


if __name__ == "__main__":
    main()
