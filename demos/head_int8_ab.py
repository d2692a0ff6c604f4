"""A/B: head-only int8 vs bf16 on the fused forward.

Motivation (demos/artifacts/roofline_r4.txt): the forward is a MIXED-roof
program — the Detect head segment is MXU-bound (22.3 ms of 76.5, ~46% MFU,
53% of model FLOPs at ~5.4 MB/frame), everything else rides ~87% of the HBM
roof. Whole-model int8 lost to bf16 every round because the BODY is
bandwidth-bound and the int8 epilogue moves MORE bytes (nn/quantize.py
header); the HEAD is the one segment where int8's 2x MXU MAC rate applies
with nothing to lose: quantize ONLY the head's cv2/cv3 3x3 ConvBNAct convs
(the final 1x1 logit convs and the DFL projection stay float).

Cost side: int8 loses the merged-first-conv algebra (_branch_walk merges the
two branches' first 3x3s only for float params) and pays a quantize pass on
the 4 head inputs (~3.9 MB/frame bf16 reads). Whether 2x MAC beats that is
exactly what this measures.

Run on chip:  python demos/head_int8_ab.py            (timing A/B + numerics)
              BENCH_CHUNK=512 python demos/head_int8_ab.py

RESULT (v5e, 2026-08-19, trained weights, 512-chunk): head-int8 LOSES, 0.83x
(145.4 vs 120.8 ms in that session's window). The quantize pass on the P2
head input + the lost first-conv merge outweigh the 2x int8 MAC rate; the
keep-set still agreed 18/20 with max |Δbox| 9.8 px — acceptable numerics,
no speed to pay for them. int8 retired at every granularity for this family
(see nn/quantize.py header).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax
import jax.numpy as jnp

from bench import make_clip
from yolo_tpu.nn.quantize import _quantize_conv, calibrate_act_scales
from yolo_tpu.nn.tasks import DetectionModel
from yolo_tpu.ops.nms import non_max_suppression_parts


def quantize_head(model, params, act_scales=None, int8_flow=True):
    """Return params with ONLY the Detect head's 3x3 ConvBNAct convs in int8.

    cv2/cv3 j=0 and j=1 per level; j=2 (1x1 logits, {'weight','bias'} leaf)
    and the DFL projection stay float. j=0 gets a y_scale so j=1 consumes its
    QTensor without a requant round trip; j=1 emits bf16 for the float logits
    conv.
    """
    hi = str(model.layers[-1].i)
    head = {k: (dict(v) if isinstance(v, dict) else v) for k, v in params["model"][hi].items()}
    for br in ("cv2", "cv3"):
        head[br] = {l: dict(jv) for l, jv in head[br].items()}
        for l in head[br]:
            for j in ("0", "1"):
                node = dict(head[br][l][j])
                q = _quantize_conv(node["conv"])
                key = f"model/{hi}/{br}/{l}/{j}"
                if act_scales and key in act_scales:
                    q["x_scale"] = np.float32(max(act_scales[key], 1e-12))
                if int8_flow and j == "0" and act_scales and f"OUT::{key}" in act_scales:
                    q["y_scale"] = np.float32(max(act_scales[f"OUT::{key}"], 1e-12))
                node["conv"] = q
                head[br][l][j] = node
    out = dict(params)
    out["model"] = dict(params["model"])
    out["model"][hi] = head
    return out


def main():
    chunk = int(os.getenv("BENCH_CHUNK", "512"))
    h, w = 512, 640
    model = DetectionModel("yolov8-small.yaml")
    best = Path(__file__).parent / "artifacts/train/weights/best.npz"
    if best.exists():  # trained weights → meaningful activation ranges
        from yolo_tpu.engine.exporter import load_npz

        model, params, _ = load_npz(str(best))
        params = model.fuse(params)
        print("using trained weights", best)
    else:
        params = model.fuse(model.init(0))
        print("using random init")

    # grayscale stem fold (same algebra as pipeline/fused.py): 1ch frames
    stem = params["model"]["0"]["conv"]
    if np.asarray(stem["weight"]).shape[2] == 3:
        params = dict(params)
        params["model"] = dict(params["model"])
        params["model"]["0"] = {
            **params["model"]["0"],
            "conv": {**stem, "weight": np.asarray(stem["weight"]).sum(axis=2, keepdims=True)},
        }

    clip = make_clip(chunk, h, w)
    x_cal = jnp.asarray(clip[:8].astype(np.float32) / 255.0)
    scales = calibrate_act_scales(model, params, x_cal)
    qparams = quantize_head(model, params, scales)

    bdt = jnp.bfloat16

    @jax.jit
    def fwd_bf16(p, frames):
        b, s = model.predict_parts(p, frames.astype(bdt) / 255.0, dtype=bdt, neck_opt=True)
        return b.sum(), s.sum()

    @jax.jit
    def fwd_q(p, frames):
        b, s = model.predict_parts(p, frames.astype(bdt) / 255.0, dtype=bdt, neck_opt=True)
        return b.sum(), s.sum()

    dev = jax.devices()[0]
    buf = jax.device_put(clip, dev)
    _ = np.asarray(buf[0, 0, 0])

    def bench(f, p, label):
        r = f(p, buf)
        _ = [np.asarray(v) for v in r]
        best_t = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = f(p, buf)
            _ = [np.asarray(v) for v in r]
            best_t = min(best_t, time.perf_counter() - t0)
        print(f"{label:24s} {best_t * 1e3:8.2f} ms/chunk   {chunk / best_t:8.1f} fps")
        return best_t

    t_b = bench(fwd_bf16, params, "bf16 forward")
    t_q = bench(fwd_q, qparams, "head-int8 forward")
    print(f"speedup: {t_b / t_q:.3f}x")

    # numerics: decoded boxes/scores deltas + NMS keep-set agreement
    @jax.jit
    def parts(p, frames):
        return model.predict_parts(p, frames.astype(bdt) / 255.0, dtype=bdt, neck_opt=True)

    fb = clip[:16]
    bb, sb = [np.asarray(v, np.float32) for v in parts(params, jnp.asarray(fb))]
    bq, sq = [np.asarray(v, np.float32) for v in parts(qparams, jnp.asarray(fb))]
    print(f"max |Δbox| px: {np.abs(bb - bq).max():.3f}   max |Δscore|: {np.abs(sb - sq).max():.4f}")

    def keep(b, s):
        det = non_max_suppression_parts(jnp.asarray(b), jnp.asarray(s), conf_thres=0.15, iou_thres=0.6, max_det=16)
        v = np.asarray(det["valid"], bool)
        return [set(map(tuple, np.asarray(det["boxes"])[i][v[i]].round(0).astype(int).tolist())) for i in range(len(v))]

    kb, kq = keep(bb, sb), keep(bq, sq)
    agree = sum(len(a & b) for a, b in zip(kb, kq))
    total = max(1, sum(len(a) for a in kb))
    print(f"NMS keep-set agreement (boxes within 1px after round): {agree}/{total}")


if __name__ == "__main__":
    main()
