"""Post-training int8 quantization for inference.

TPU-native perf path with no reference counterpart (the reference reaches
int8 via per-engine exporters — TensorRT/TFLite/CoreML int8 flags in
engine/exporter.py); on TPU the int8 MXU path doubles the MAC rate over
bf16, so quantization is a params-level transform on the SAME graph:

  - weights: symmetric per-OUTPUT-CHANNEL int8 (w_int8 HWIO + w_scale (K,)),
    BN folded first;
  - activations: dynamic symmetric per-tensor int8 at each conv input
    (scale computed on device per call — one reduction, no calibration set
    needed);
  - everything else (concats, upsamples, SiLU, decode, NMS, tracking) stays
    f32/bf16 — only ConvBNAct layers flip to the int8 kernel.

Usage:
    params = model.fuse(model.init(0))        # or imported weights
    qparams = quantize_params(params)         # conv leaves → int8
    model.predict(qparams, imgs)              # same graph, int8 MXU convs
"""

from __future__ import annotations

import numpy as np


def _quantize_conv(conv: dict) -> dict:
    """{'weight' (H, W, I, K) f32, 'bias' (K,)} → int8 + per-channel scales."""
    w = np.asarray(conv["weight"], np.float32)
    k = w.shape[-1]
    scale = np.abs(w).reshape(-1, k).max(0) / 127.0
    scale = np.maximum(scale, 1e-12).astype(np.float32)
    w_int8 = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {
        "w_int8": w_int8,
        "w_scale": scale,
        "bias": np.asarray(conv.get("bias", np.zeros((k,), np.float32)), np.float32),
    }


def quantize_params(params, min_channels: int = 16):
    """Walk the param tree; every fused ConvBNAct leaf ({'conv': {weight, bias}}
    without 'bn') becomes an int8 conv. Layers with fewer than `min_channels`
    output channels stay f32 (their quantization error is large relative to
    their cost — e.g. the 3-channel stem input side is unaffected anyway).

    Run `model.fuse(params)` first: BN must already be folded.
    """

    def walk(node):
        if not isinstance(node, dict):
            return node
        if "conv" in node and isinstance(node["conv"], dict) and "weight" in node["conv"] and "bn" not in node:
            w = np.asarray(node["conv"]["weight"])
            if w.ndim == 4 and "bias" in node["conv"] and w.shape[-1] >= min_channels:
                out = dict(node)
                out["conv"] = _quantize_conv(node["conv"])
                return out
        return {k: walk(v) for k, v in node.items()}

    return walk(params)
