#!/usr/bin/env python3
"""Roofline of the jitted data-parallel train step on the real chip
(VERDICT r3 next#7 — the training twin of demos/roofline.py).

Times exactly the step `DetectionTrainer.train` runs (built by `_build_step`,
fwd + bwd + optimizer + BN-stat apply + EMA, state donated) at the IR recipe
batch, then pulls XLA's cost analysis off the same lowered executable to place
it against the chip's MXU/HBM roofs, and prints the top HBM buffers so the
next optimisation target is named, not guessed.

    python demos/roofline_train.py              # batch 16 (train_small_targets recipe)
    BATCH=32 python demos/roofline_train.py

Ref counterpart: the reference trains via engine/trainer.py:389 (_do_train
batch loop); its perf evidence is wall-clock epochs — this is the per-step
hardware placement of ours.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# v5e (per chip): 197 TFLOP/s bf16, 819 GB/s HBM.
PEAK_TFLOPS = float(os.getenv("PEAK_TFLOPS", "197"))
PEAK_GBPS = float(os.getenv("PEAK_GBPS", "819"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.getenv("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from yolo_tpu.engine.trainer import DetectionTrainer
    from yolo_tpu.nn.tasks import DetectionModel

    batch = int(os.getenv("BATCH", "16"))
    h, w = 512, 640
    n_lab = 16
    reps = int(os.getenv("REPS", "10"))

    model = DetectionModel("yolov8-small.yaml", ch=1, nc=1)
    params = model.init(0)
    # REMAT=1: per-layer jax.checkpoint (cfg remat=True) — trades recompute
    # for stored-activation HBM, the knob that decides the max single-chip batch
    tr = DetectionTrainer(
        {"model": "yolov8-small.yaml", "imgsz": 640, "remat": os.getenv("REMAT", "0") == "1"},
        model=model,
        params=params,
    )
    tr.opt = tr.build_optimizer(iterations=100)
    step = tr._build_step(mesh=None)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (batch, h, w, 1), np.uint8)
    cx = rng.uniform(0.1, 0.9, (batch, n_lab)).astype(np.float32)
    cy = rng.uniform(0.1, 0.9, (batch, n_lab)).astype(np.float32)
    wh = rng.uniform(0.01, 0.05, (batch, n_lab, 2)).astype(np.float32)
    bb = np.stack([cx, cy, wh[..., 0], wh[..., 1]], axis=-1)
    bb[:, 8:] = 0.0
    b = {
        "img": jnp.asarray(imgs),
        "cls": jnp.zeros((batch, n_lab), jnp.float32),
        "bboxes": jnp.asarray(bb),
    }
    opt_state = tr.opt.init(tr.params)
    ema = jax.tree_util.tree_map(lambda x: x, tr.params)
    ema_n = jnp.zeros((), jnp.float32)
    p = tr.params

    # cost analysis BEFORE running: donation invalidates the host handles
    flops = bytes_acc = 0.0
    compiled = None
    try:
        lowered = step.lower(p, opt_state, ema, ema_n, b, 1e-3, 0.9, 1e-3)
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        bytes_acc = float(cost.get("bytes accessed", 0.0))
    except Exception as e:
        log(f"cost analysis unavailable: {e}")

    t0 = time.time()
    for _ in range(2):  # compile reuse + executable staging
        p, opt_state, ema, ema_n, comps = step(p, opt_state, ema, ema_n, b, 1e-3, 0.9, 1e-3)
        _ = np.asarray(comps[0] if isinstance(comps, (tuple, list)) else comps)
    compile_s = time.time() - t0

    best = float("inf")
    for _ in range(max(2, reps // 5)):
        t0 = time.time()
        for _ in range(5):
            p, opt_state, ema, ema_n, comps = step(p, opt_state, ema, ema_n, b, 1e-3, 0.9, 1e-3)
        jax.block_until_ready(comps)
        best = min(best, (time.time() - t0) / 5)
    ms = best * 1e3

    ach_tf = flops / best / 1e12 if flops else 0.0
    ach_gb = bytes_acc / best / 1e9 if bytes_acc else 0.0
    mfu = ach_tf / PEAK_TFLOPS * 100
    hbm = ach_gb / PEAK_GBPS * 100

    log(f"train step: {ms:.1f} ms @ batch {batch} ({batch / best:.1f} imgs/s)")
    log(f"flops/step: {flops / 1e12:.2f} TF, XLA bytes-accessed/step: {bytes_acc / 1e9:.2f} GB")
    log(f"achieved: {ach_tf:.1f} TFLOP/s = {mfu:.1f}% MFU; {ach_gb:.0f} GB/s = {hbm:.1f}% HBM peak")
    log("(fwd+bwd ~3x fwd FLOPs; AdamW+EMA are pure HBM traffic — a low MFU with high")
    log(" HBM% means the step is bandwidth-bound in the update/loss, not MXU-starved)")

    if compiled is not None:
        try:
            from yolo_tpu.utils.profilers import hbm_buffer_table

            log("\n== top HBM buffers (train step) ==")
            for r in hbm_buffer_table(compiled, top=15, min_mb=8.0):
                log(f"  {r['mb']:8.1f} MB  {r['dtype']:>5} {str(r['shape']):>28} {r['layout']} {r['op']}")
        except Exception as e:
            log(f"hbm table unavailable: {e}")

    print(json.dumps({
        "train_step_ms": round(ms, 1),
        "train_imgs_per_s": round(batch / best, 1),
        "batch": batch,
        "imgsz": [h, w],
        "amp": bool(tr.args.amp),
        "tflops_step": round(flops / 1e12, 2) if flops else None,
        "gbytes_step": round(bytes_acc / 1e9, 2) if bytes_acc else None,
        "mfu_pct": round(mfu, 1),
        "hbm_pct": round(hbm, 1),
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
