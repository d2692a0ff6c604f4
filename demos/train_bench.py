#!/usr/bin/env python3
"""Trainer hot-path throughput on the real chip: the jitted data-parallel
train step (fwd + bwd + AdamW/SGD update + BN-stat apply + EMA, all donated)
on yolov8-small @640x512 gray, synthetic labels. One JSON line.

    python demos/train_bench.py            # batch 16, bf16 (args.amp)
    BATCH=32 python demos/train_bench.py

This times exactly the step `DetectionTrainer.train` runs (built by
`_build_step`) — not a look-alike — so the number tracks the shipped code.
Ref counterpart: the batch loop of engine/trainer.py:389 (_do_train).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.getenv("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from yolo_tpu.engine.trainer import DetectionTrainer
    from yolo_tpu.nn.tasks import DetectionModel

    batch = int(os.getenv("BATCH", "16"))
    h, w = 512, 640
    n_lab = 16  # padded label capacity per image
    steps = int(os.getenv("STEPS", "20"))

    model = DetectionModel("yolov8-small.yaml", ch=1, nc=1)
    params = model.init(0)
    tr = DetectionTrainer({"model": "yolov8-small.yaml", "imgsz": 640}, model=model, params=params)
    tr.opt = tr.build_optimizer(iterations=100)
    step = tr._build_step(mesh=None)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (batch, h, w, 1), np.uint8)
    cx = rng.uniform(0.1, 0.9, (batch, n_lab)).astype(np.float32)
    cy = rng.uniform(0.1, 0.9, (batch, n_lab)).astype(np.float32)
    wh = rng.uniform(0.01, 0.05, (batch, n_lab, 2)).astype(np.float32)
    bb = np.stack([cx, cy, wh[..., 0], wh[..., 1]], axis=-1)
    bb[:, 8:] = 0.0  # half the slots padded-empty
    b = {
        "img": jnp.asarray(imgs),
        "cls": jnp.zeros((batch, n_lab), jnp.float32),
        "bboxes": jnp.asarray(bb),
    }
    opt_state = tr.opt.init(tr.params)
    ema = jax.tree_util.tree_map(lambda x: x, tr.params)
    ema_n = jnp.zeros((), jnp.float32)
    p = tr.params

    t0 = time.time()
    for _ in range(2):  # compile + executable staging
        p, opt_state, ema, ema_n, comps = step(p, opt_state, ema, ema_n, b, 1e-3, 0.9, 1e-3)
        _ = np.asarray(comps[0] if isinstance(comps, (tuple, list)) else comps)
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(steps):
        p, opt_state, ema, ema_n, comps = step(p, opt_state, ema, ema_n, b, 1e-3, 0.9, 1e-3)
    _ = np.asarray(comps[0] if isinstance(comps, (tuple, list)) else comps)
    dt = time.time() - t0
    ms = dt / steps * 1e3
    print(json.dumps({
        "train_step_ms": round(ms, 1),
        "train_imgs_per_s": round(batch / (dt / steps), 1),
        "batch": batch,
        "imgsz": [h, w],
        "amp": bool(tr.args.amp),
        "donate": bool(tr.args.donate),
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
