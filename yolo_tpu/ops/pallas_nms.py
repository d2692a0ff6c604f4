"""Pallas TPU kernel: greedy NMS suppression.

The suppression stage is the one data-dependent-looking part of the detection
pipeline (ref: ultralytics/utils/nms.py → torchvision nms). The XLA fallback
(ops/nms.py) expresses it as a fori_loop over rows of a K×K IoU matrix; this
kernel keeps the whole candidate set — boxes, scores, IoU matrix, suppression
mask — resident in VMEM for the entire sequential pass, so the loop touches no
HBM at all: one (K,4)+(K,) load, K predicated vector steps on the VPU, one
(K,) store.

Grid = batch: one program instance per image. K is static (256/1024 candidate
slots); padded slots carry score<0 and never suppress anything real.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _nms_kernel(boxes_ref, scores_ref, keep_ref, *, iou_threshold: float):
    boxes = boxes_ref[0]  # (K, 4) xyxy, score-descending
    scores = scores_ref[0, 0]  # (K,) — fed as (B, 1, K) for TPU lane tiling
    K = boxes.shape[0]

    # full IoU matrix in VMEM (K x K)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    lt_x = jnp.maximum(x1[:, None], x1[None, :])
    lt_y = jnp.maximum(y1[:, None], y1[None, :])
    rb_x = jnp.minimum(x2[:, None], x2[None, :])
    rb_y = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.clip(rb_x - lt_x, 0, None) * jnp.clip(rb_y - lt_y, 0, None)
    area = (x2 - x1) * (y2 - y1)
    iou = inter / (area[:, None] + area[None, :] - inter + 1e-7)

    col = jax.lax.broadcasted_iota(jnp.int32, (K,), 0)

    # sequential greedy pass — Mosaic TC kernels lower neither dynamic_slice nor
    # scan-with-xs, so row i is extracted with a one-hot matvec (rides the MXU);
    # the suppression vector is carried as f32 0/1 (bool loop carries trip a
    # Mosaic layout bug)
    def body(i, suppressed):
        onehot = (col == i).astype(jnp.float32)
        row_iou = jnp.dot(onehot[None, :], iou, preferred_element_type=jnp.float32)[0]
        mask = ((row_iou > iou_threshold) & (col > i)).astype(jnp.float32)
        supp_i = jnp.sum(suppressed * onehot)  # suppressed[i] as 0/1
        return jnp.maximum(suppressed, mask * (1.0 - supp_i))

    suppressed = jax.lax.fori_loop(0, K, body, jnp.zeros((K,), jnp.float32))
    keep_ref[0, 0] = (suppressed < 0.5) & (scores > 0)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def pallas_nms_keep(boxes, scores, iou_threshold: float = 0.45, interpret: bool = False):
    """Keep mask for score-sorted candidates.

    Args:
        boxes: (B, K, 4) xyxy sorted by descending score per image.
        scores: (B, K) with padded slots < 0.

    Returns:
        keep: (B, K) bool.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, K, _ = boxes.shape
    kernel = functools.partial(_nms_kernel, iou_threshold=float(iou_threshold))
    mem = pl.ANY if interpret else pltpu.VMEM
    keep = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K, 4), lambda b: (b, 0, 0), memory_space=mem),
            pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0), memory_space=mem),
        ],
        out_specs=pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0), memory_space=mem),
        out_shape=jax.ShapeDtypeStruct((B, 1, K), jnp.bool_),
        interpret=interpret,
    )(boxes, scores[:, None, :])
    return keep[:, 0, :]
