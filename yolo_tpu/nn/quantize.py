"""Post-training int8 quantization for inference.

TPU-native perf path with no reference counterpart (the reference reaches
int8 via per-engine exporters — TensorRT/TFLite/CoreML int8 flags in
engine/exporter.py); on TPU the int8 MXU path doubles the MAC rate over
bf16, so quantization is a params-level transform on the SAME graph.

PERF MEASUREMENT (v5e, yolov8-small-n @640×512, 2026-08-17): at this model's
channel widths (16-192) every int8 variant LOSES to bf16 on the forward —
dynamic scales 3833 fps, static scales 4044 fps, int8-resident activations
(QTensor flow, 1 byte/elt in HBM) 4044 fps, vs bf16 4518 fps. The forward is
HBM-bound (71% of peak BW), and XLA materializes the conv's int32 accumulator
before the dequant+SiLU+requant epilogue, so the int8 graph moves MORE bytes
than bf16's fully-fused conv+SiLU despite the smaller activations. bf16 stays
the default; this module remains correct + tested for wider-channel models
where the int8 MXU rate wins (measured 1.56x on 3×3×256×256 convs).

HEAD-ONLY VARIANT (v5e, 2026-08-19, demos/head_int8_ab.py): the round-4
roofline showed the Detect head segment alone is MXU-bound (46% MFU), so the
one remaining int8 hypothesis was quantizing ONLY the head's cv2/cv3 3x3
convs (body stays bf16 — nothing bandwidth-bound touches int8). Measured
0.83x vs bf16 @512-chunk: the activation-quantize pass on the P2 head input
plus losing the merged-first-conv algebra (_branch_walk merges only float
params) costs more than the 2x MAC rate returns at these channel widths
(64/“nc”-wide outputs underfill the int8 MXU exactly as they do the bf16
one). int8 is now retired for this model family in every granularity.

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


def calibrate_act_scales(model, params, imgs, dtype=None):
    """Run ONE representative batch through the float model and return
    {module_path: activation_scale} for every ConvBNAct input (max |x| / 127).

    Static scales remove the per-call max reduction (a full extra HBM pass per
    conv) from the int8 path; the usual PTQ tradeoff applies — inputs beyond
    the calibration range clip at 127. imgs: (B, H, W, C) float in [0, 1] (the
    model's normalized input).
    """
    import jax
    import jax.numpy as jnp

    from yolo_tpu.nn import modules as M

    dtype = dtype or jnp.bfloat16

    def run(p, x):
        ctx = M.Ctx(train=False, dtype=dtype)
        ctx.calib = {}
        model.forward_features(p, x, ctx)
        return ctx.calib

    amax = jax.jit(run)(params, imgs)
    # module paths carry input scales; "OUT::<path>" keys carry output scales
    # (post-activation amax), consumed as per-conv y_scale for the
    # int8-resident activation flow (modules.QTensor)
    return {k: float(np.asarray(v)) / 127.0 for k, v in amax.items()}


def quantize_params(params, min_channels: int = 16, act_scales: dict | None = None, int8_flow: bool = True, flow_paths: set | None = None):
    """Walk the param tree; every fused ConvBNAct leaf ({'conv': {weight, bias}}
    without 'bn') becomes an int8 conv. Layers with fewer than `min_channels`
    output channels stay f32 (their quantization error is large relative to
    their cost — e.g. the 3-channel stem input side is unaffected anyway).

    Run `model.fuse(params)` first: BN must already be folded. With
    `act_scales` (from calibrate_act_scales) each conv also gets a static
    `x_scale`, eliminating the dynamic per-call activation-max reduction, AND
    a `y_scale` (from the calibrated output amax, the `OUT::` keys) that
    switches the conv to EMIT int8 — the int8-resident activation flow
    (modules.QTensor): activations live in HBM as 1 byte/element through
    concat/split/upsample/maxpool, halving the traffic of the HBM-bound
    forward. Disable with int8_flow=False to keep bf16 activations.

    `flow_paths` (from model.int8_flow_paths()) restricts QTensor EMISSION to
    convs whose enclosing module natively handles int8 payloads — pass it for
    any architecture beyond the yolov8 family so uncovered blocks (C3,
    attention, v9/v12 exotics) never see a QTensor from their own sub-convs.
    """

    def walk(node, path=""):
        if not isinstance(node, dict):
            return node
        if "conv" in node and isinstance(node["conv"], dict) and "weight" in node["conv"] and "bn" not in node:
            w = np.asarray(node["conv"]["weight"])
            if w.ndim == 4 and "bias" in node["conv"] and w.shape[-1] >= min_channels:
                out = dict(node)
                out["conv"] = _quantize_conv(node["conv"])
                if act_scales and path in act_scales:
                    out["conv"]["x_scale"] = np.float32(max(act_scales[path], 1e-12))
                if int8_flow and act_scales and f"OUT::{path}" in act_scales and (flow_paths is None or path in flow_paths):
                    out["conv"]["y_scale"] = np.float32(max(act_scales[f"OUT::{path}"], 1e-12))
                return out
        return {k: walk(v, f"{path}/{k}" if path else str(k)) for k, v in node.items()}

    return walk(params)
