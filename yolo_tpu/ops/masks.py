"""Instance-mask assembly from prototypes + coefficients.

Reference counterpart: utils/ops.py process_mask:509-604 — masks =
sigmoid(coef @ protos), cropped to their boxes, upsampled to input size.
Jittable fixed shapes: operates on the NMS-padded (max_det) detection slots.
"""

from __future__ import annotations

import numpy as np


def crop_mask_np(masks: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """Zero mask pixels outside each box. masks (N, H, W); boxes (N, 4) in mask coords."""
    n, h, w = masks.shape
    ys = np.arange(h, dtype=np.float32)[None, :, None]
    xs = np.arange(w, dtype=np.float32)[None, None, :]
    x1, y1, x2, y2 = boxes[:, 0:1, None], boxes[:, 1:2, None], boxes[:, 2:3, None], boxes[:, 3:4, None]
    keep = (xs >= x1) & (xs < x2) & (ys >= y1) & (ys < y2)
    return masks * keep


def process_mask(protos, coefs, boxes, img_hw, upsample: bool = True):
    """Assemble per-detection masks (jax).

    Args:
        protos: (h, w, nm) prototype maps (stride-4 resolution).
        coefs: (N, nm) coefficients for N (padded) detections.
        boxes: (N, 4) xyxy in input-image pixels.
        img_hw: (H, W) input size to upsample to.

    Returns:
        masks: (N, H, W) float in [0, 1], cropped to boxes.
    """
    import jax
    import jax.numpy as jnp

    h, w, nm = protos.shape
    H, W = img_hw
    m = jax.nn.sigmoid(coefs.astype(jnp.float32) @ protos.reshape(-1, nm).T.astype(jnp.float32))  # (N, h*w)
    m = m.reshape(-1, h, w)
    if upsample:
        m = jax.image.resize(m, (m.shape[0], H, W), method="bilinear")
        scale = 1.0
    else:
        scale = h / H
    bx = boxes * scale
    ys = jnp.arange(m.shape[1], dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(m.shape[2], dtype=jnp.float32)[None, None, :]
    keep = (xs >= bx[:, 0:1, None]) & (xs < bx[:, 2:3, None]) & (ys >= bx[:, 1:2, None]) & (ys < bx[:, 3:4, None])
    return m * keep


def scale_masks_np(masks: np.ndarray, orig_hw, letterbox_hw, ratio_pad=None) -> np.ndarray:
    """Undo letterbox on (N, H, W) masks → (N, h0, w0) (ref: scale_image)."""
    import cv2

    if masks.size == 0:
        return masks.reshape(0, *orig_hw)
    H, W = letterbox_hw
    h0, w0 = orig_hw
    if ratio_pad is None:
        gain = min(H / h0, W / w0)
        pad_w = (W - w0 * gain) / 2
        pad_h = (H - h0 * gain) / 2
    else:
        gain = ratio_pad[0][0]
        pad_w, pad_h = ratio_pad[1]
    top, left = int(round(pad_h - 0.1)), int(round(pad_w - 0.1))
    bottom, right = int(round(H - pad_h + 0.1)), int(round(W - pad_w + 0.1))
    out = np.empty((masks.shape[0], h0, w0), masks.dtype)
    for i, m in enumerate(masks):
        out[i] = cv2.resize(m[top:bottom, left:right], (w0, h0), interpolation=cv2.INTER_LINEAR)
    return out
