#!/usr/bin/env python3
"""A/B the Pallas fusion kernels + neck fold against the XLA baseline on the
real chip. One command, one table; double-warm + element-download barriers per
the relay measurement discipline (README "Benchmarking on the dev tunnel").

    python demos/pallas_ab.py                 # chunk 512, all variants
    VARIANTS=base,head BENCH_CHUNK=256 python demos/pallas_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.getenv("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from bench import make_clip
    from yolo_tpu.nn.tasks import DetectionModel
    from yolo_tpu.pipeline import FusedDetectTrack

    chunk = int(os.getenv("BENCH_CHUNK", "512"))
    h, w = 512, 640
    model = DetectionModel("yolov8-small.yaml")
    params = model.fuse(model.init(0))
    clip = make_clip(chunk * 3, h, w)

    VARIANTS = {
        "base": {"neck_opt": False},  # neck_opt defaults ON for fused params now
        "head": {"pallas_head": True},
        "c2f": {"pallas_c2f": True},
        "neck": {"neck_opt": True},
        "neck+c2f": {"neck_opt": True, "pallas_c2f": True},
        "all": {"pallas_head": True, "neck_opt": True, "pallas_c2f": True},
    }
    pick = os.getenv("VARIANTS")
    names = [n.strip() for n in pick.split(",")] if pick else list(VARIANTS)

    bufs = [jax.device_put(clip[i * chunk : (i + 1) * chunk]) for i in range(3)]
    _ = [np.asarray(b[0, 0, 0]) for b in bufs]  # barrier

    results = {}
    for name in names:
        kw = VARIANTS[name]
        t0 = time.time()
        ft = FusedDetectTrack(
            model, params, frame_hw=(h, w), channels=1, chunk=chunk,
            conf=0.15, iou=0.6, max_lost_frames=150, min_hits=1, iou_threshold=0.1,
            n_max=64, d_max=16, **kw,
        )
        state, st = ft.state, ft.stats
        try:
            for b in bufs[:2]:  # compile + executable-staging warmup
                state, st, _p = ft._fused(ft.params, state, st, b)
                _ = int(np.asarray(st["frames"]))
            t_compile = time.time() - t0
            t0 = time.time()
            for b in bufs:
                state, st, _p = ft._fused(ft.params, state, st, b)
            _ = int(np.asarray(st["frames"]))
            fps = 3 * chunk / (time.time() - t0)
            results[name] = {"fps": round(fps, 1), "compile_s": round(t_compile, 1)}
            print(f"{name:10s} {fps:8.1f} fps  (compile {t_compile:.0f}s)", file=sys.stderr, flush=True)
        except Exception as e:  # record Mosaic/compile failures and keep going
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
            print(f"{name:10s} FAILED: {str(e)[:200]}", file=sys.stderr, flush=True)

    print(json.dumps({"chunk": chunk, "variants": results}))


if __name__ == "__main__":
    main()
