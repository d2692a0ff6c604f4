#!/usr/bin/env python3
"""On-chip numeric parity of every opt-in forward route against the XLA
baseline, at production geometry (512x640 gray). Run on the real TPU:

    python demos/chip_parity.py

This is the check that caught two chip-only kernel bugs that interpret-mode
CPU tests mask (see ops/pallas_c2f.py _cv2_prefill): Pallas TPU double-buffers
output windows, so REVISITED output blocks must be written on every visit.

Expected: neck fold bit-exact (it is pure XLA algebra); the Pallas kernel
routes at bf16 noise level (their f32 accumulation order differs across the
9 shifted dots).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from yolo_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov8-small.yaml", ch=1, nc=1)
    params = m.fuse(m.init(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (8, 512, 640, 1)).astype(np.float32))

    wb, ws = jax.jit(lambda p, x: m.predict_parts(p, x, dtype=jnp.bfloat16, neck_opt=False))(params, x)
    wb, ws = np.asarray(wb, np.float32), np.asarray(ws, np.float32)
    failures = 0
    for name, kw, tol_box, tol_score in [
        ("neck", dict(neck_opt=True), 0.0, 0.0),  # exact algebra: bit-exact
        ("pallas_head", dict(pallas_head=True, neck_opt=False), 0.02, 0.02),
        ("pallas_c2f", dict(pallas_c2f=True, neck_opt=False), 0.02, 0.02),
        ("neck+c2f", dict(neck_opt=True, pallas_c2f=True), 0.02, 0.02),
    ]:
        gb, gs = jax.jit(lambda p, x, kw=kw: m.predict_parts(p, x, dtype=jnp.bfloat16, **kw))(params, x)
        gb, gs = np.asarray(gb, np.float32), np.asarray(gs, np.float32)
        db = float(np.abs(gb - wb).max() / max(np.abs(wb).max(), 1e-6))
        ds = float(np.abs(gs - ws).max())
        ok = db <= tol_box and ds <= tol_score
        failures += not ok
        print(f"{name:12s} rel-box-err {db:.4f}  abs-score-err {ds:.4f}  {'OK' if ok else 'FAIL'}",
              file=sys.stderr, flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
