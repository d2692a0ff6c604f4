"""Box conversion and IoU math.

Functional equivalents of the reference box ops (ref: ultralytics/utils/ops.py
xyxy/xywh converters :256-467, scale_boxes:105, clip_boxes:157; utils/metrics.py
bbox_iou:79, box_iou). Written array-library-agnostic: every function works on
numpy arrays (host tracker code) and jax arrays (device code) alike, because it
only uses ufunc-style primitives present in both namespaces.
"""

from __future__ import annotations

import math

import numpy as np


def _xp(x):
    """Pick the array namespace (numpy or jax.numpy) matching the input."""
    if isinstance(x, (np.ndarray, list, tuple, float, int)):
        return np
    import jax.numpy as jnp

    return jnp


def xyxy2xywh(x):
    """(x1,y1,x2,y2) → (cx,cy,w,h)."""
    xp = _xp(x)
    x = xp.asarray(x)
    cx = (x[..., 0] + x[..., 2]) / 2
    cy = (x[..., 1] + x[..., 3]) / 2
    w = x[..., 2] - x[..., 0]
    h = x[..., 3] - x[..., 1]
    return xp.stack([cx, cy, w, h], axis=-1)


def xywh2xyxy(x):
    """(cx,cy,w,h) → (x1,y1,x2,y2)."""
    xp = _xp(x)
    x = xp.asarray(x)
    hw = x[..., 2] / 2
    hh = x[..., 3] / 2
    return xp.stack([x[..., 0] - hw, x[..., 1] - hh, x[..., 0] + hw, x[..., 1] + hh], axis=-1)


def xywhn2xyxy(x, w: int = 640, h: int = 640, padw: float = 0.0, padh: float = 0.0):
    """Normalized (cx,cy,w,h) → pixel (x1,y1,x2,y2) with optional pad offsets."""
    xp = _xp(x)
    x = xp.asarray(x)
    return xp.stack(
        [
            w * (x[..., 0] - x[..., 2] / 2) + padw,
            h * (x[..., 1] - x[..., 3] / 2) + padh,
            w * (x[..., 0] + x[..., 2] / 2) + padw,
            h * (x[..., 1] + x[..., 3] / 2) + padh,
        ],
        axis=-1,
    )


def xyxy2xywhn(x, w: int = 640, h: int = 640, clip: bool = False, eps: float = 0.0):
    """Pixel (x1,y1,x2,y2) → normalized (cx,cy,w,h)."""
    xp = _xp(x)
    x = xp.asarray(x)
    if clip:
        x = clip_boxes(x, (h - eps, w - eps))
    return xp.stack(
        [
            (x[..., 0] + x[..., 2]) / 2 / w,
            (x[..., 1] + x[..., 3]) / 2 / h,
            (x[..., 2] - x[..., 0]) / w,
            (x[..., 3] - x[..., 1]) / h,
        ],
        axis=-1,
    )


def ltwh2xyxy(x):
    """(left,top,w,h) → (x1,y1,x2,y2)."""
    xp = _xp(x)
    x = xp.asarray(x)
    return xp.stack([x[..., 0], x[..., 1], x[..., 0] + x[..., 2], x[..., 1] + x[..., 3]], axis=-1)


def xyxy2ltwh(x):
    """(x1,y1,x2,y2) → (left,top,w,h)."""
    xp = _xp(x)
    x = xp.asarray(x)
    return xp.stack([x[..., 0], x[..., 1], x[..., 2] - x[..., 0], x[..., 3] - x[..., 1]], axis=-1)


def clip_boxes(boxes, shape):
    """Clip xyxy boxes to image bounds shape=(h, w)."""
    xp = _xp(boxes)
    boxes = xp.asarray(boxes)
    h, w = shape[0], shape[1]
    return xp.stack(
        [
            xp.clip(boxes[..., 0], 0, w),
            xp.clip(boxes[..., 1], 0, h),
            xp.clip(boxes[..., 2], 0, w),
            xp.clip(boxes[..., 3], 0, h),
        ],
        axis=-1,
    )


def scale_boxes(img1_shape, boxes, img0_shape, ratio_pad=None, padding: bool = True, xywh: bool = False):
    """Rescale boxes from letterboxed img1_shape back to original img0_shape.

    Matches the reference inverse-letterbox math (ref: utils/ops.py:105): gain is
    min(h1/h0, w1/w0); pad is round((wdiff)/2 - 0.1), round((hdiff)/2 - 0.1).
    """
    xp = _xp(boxes)
    boxes = xp.asarray(boxes)
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = (
            round((img1_shape[1] - img0_shape[1] * gain) / 2 - 0.1),
            round((img1_shape[0] - img0_shape[0] * gain) / 2 - 0.1),
        )
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]
    if padding:
        boxes = boxes - xp.asarray([pad[0], pad[1], 0 if xywh else pad[0], 0 if xywh else pad[1]], dtype=boxes.dtype)
    boxes = boxes / gain
    # xywh (cx, cy, w, h — e.g. OBB centers) must NOT be clipped: clip_boxes
    # treats columns as xyxy corners (the reference returns unclipped too)
    return boxes if xywh else clip_boxes(boxes, img0_shape)


def box_iou(box1, box2, eps: float = 1e-7):
    """Pairwise IoU matrix between (N,4) and (M,4) xyxy boxes → (N,M)."""
    xp = _xp(box1)
    box1 = xp.asarray(box1)
    box2 = xp.asarray(box2)
    lt = xp.maximum(box1[..., :, None, :2], box2[..., None, :, :2])
    rb = xp.minimum(box1[..., :, None, 2:4], box2[..., None, :, 2:4])
    wh = xp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area1 = (box1[..., 2] - box1[..., 0]) * (box1[..., 3] - box1[..., 1])
    area2 = (box2[..., 2] - box2[..., 0]) * (box2[..., 3] - box2[..., 1])
    return inter / (area1[..., :, None] + area2[..., None, :] - inter + eps)


def bbox_iou(box1, box2, xywh: bool = True, GIoU: bool = False, DIoU: bool = False, CIoU: bool = False, eps: float = 1e-7):
    """Elementwise IoU / GIoU / DIoU / CIoU between aligned boxes.

    Semantics mirror the reference (ref: utils/metrics.py bbox_iou:79); used by
    the loss (CIoU) and tracker gating.
    """
    xp = _xp(box1)
    box1 = xp.asarray(box1)
    box2 = xp.asarray(box2)
    if xywh:
        x1, y1, w1, h1 = box1[..., 0], box1[..., 1], box1[..., 2], box1[..., 3]
        x2, y2, w2, h2 = box2[..., 0], box2[..., 1], box2[..., 2], box2[..., 3]
        b1x1, b1x2, b1y1, b1y2 = x1 - w1 / 2, x1 + w1 / 2, y1 - h1 / 2, y1 + h1 / 2
        b2x1, b2x2, b2y1, b2y2 = x2 - w2 / 2, x2 + w2 / 2, y2 - h2 / 2, y2 + h2 / 2
    else:
        b1x1, b1y1, b1x2, b1y2 = box1[..., 0], box1[..., 1], box1[..., 2], box1[..., 3]
        b2x1, b2y1, b2x2, b2y2 = box2[..., 0], box2[..., 1], box2[..., 2], box2[..., 3]
        w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + eps
        w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + eps

    inter = xp.clip(xp.minimum(b1x2, b2x2) - xp.maximum(b1x1, b2x1), 0, None) * xp.clip(
        xp.minimum(b1y2, b2y2) - xp.maximum(b1y1, b2y1), 0, None
    )
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if not (GIoU or DIoU or CIoU):
        return iou

    cw = xp.maximum(b1x2, b2x2) - xp.minimum(b1x1, b2x1)  # enclosing width
    ch = xp.maximum(b1y2, b2y2) - xp.minimum(b1y1, b2y1)  # enclosing height
    if CIoU or DIoU:
        c2 = cw**2 + ch**2 + eps
        rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
        if CIoU:
            v = (4 / math.pi**2) * (xp.arctan(w2 / h2) - xp.arctan(w1 / h1)) ** 2
            if xp is np:
                alpha = v / (v - iou + (1 + eps))
            else:
                import jax

                alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
            return iou - (rho2 / c2 + v * alpha)
        return iou - rho2 / c2
    c_area = cw * ch + eps
    return iou - (c_area - union) / c_area


def _covariance_terms(boxes, xp):
    """Gaussian-box covariance entries (a, b, c) of xywhr boxes
    (ref: utils/metrics.py _get_covariance_matrix:193)."""
    a = boxes[..., 2:3] ** 2 / 12
    b = boxes[..., 3:4] ** 2 / 12
    r = boxes[..., 4:5]
    cos, sin = xp.cos(r), xp.sin(r)
    cos2, sin2 = cos**2, sin**2
    return a * cos2 + b * sin2, a * sin2 + b * cos2, (a - b) * cos * sin


def probiou(obb1, obb2, CIoU: bool = False, eps: float = 1e-7):
    """Probabilistic IoU of rotated boxes in xywhr (ref: utils/metrics.py
    probiou:213, arXiv:2106.06072). Broadcasts over leading dims; returns (..., 1)."""
    xp = _xp(obb1)
    obb1, obb2 = xp.asarray(obb1), xp.asarray(obb2)
    x1, y1 = obb1[..., 0:1], obb1[..., 1:2]
    x2, y2 = obb2[..., 0:1], obb2[..., 1:2]
    a1, b1, c1 = _covariance_terms(obb1, xp)
    a2, b2, c2 = _covariance_terms(obb2, xp)

    denom = (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps
    t1 = (((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) / denom) * 0.25
    t2 = (((c1 + c2) * (x2 - x1) * (y1 - y2)) / denom) * 0.5
    t3 = (
        xp.log(
            ((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2)
            / (4 * xp.sqrt(xp.clip(a1 * b1 - c1**2, 0, None) * xp.clip(a2 * b2 - c2**2, 0, None)) + eps)
            + eps
        )
        * 0.5
    )
    bd = xp.clip(t1 + t2 + t3, eps, 100.0)
    hd = xp.sqrt(1.0 - xp.exp(-bd) + eps)
    iou = 1 - hd
    if CIoU:  # aspect-ratio penalty only (matches reference's CIoU flag)
        w1, h1 = obb1[..., 2:3], obb1[..., 3:4]
        w2, h2 = obb2[..., 2:3], obb2[..., 3:4]
        v = (4 / math.pi**2) * (xp.arctan(w2 / h2) - xp.arctan(w1 / h1)) ** 2
        if xp is np:
            alpha = v / (v - iou + (1 + eps))
        else:
            import jax

            alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        return iou - v * alpha
    return iou


def xywhr2xyxyxyxy(x):
    """xywhr → 4 corner points (..., 4, 2) (ref: utils/ops.py xywhr2xyxyxyxy:421)."""
    xp = _xp(x)
    x = xp.asarray(x)
    ctr = x[..., :2]
    w, h, angle = x[..., 2:3], x[..., 3:4], x[..., 4:5]
    cos, sin = xp.cos(angle), xp.sin(angle)
    vec1 = xp.concatenate([w / 2 * cos, w / 2 * sin], -1)
    vec2 = xp.concatenate([-h / 2 * sin, h / 2 * cos], -1)
    pt1 = ctr + vec1 + vec2
    pt2 = ctr + vec1 - vec2
    pt3 = ctr - vec1 - vec2
    pt4 = ctr - vec1 + vec2
    return xp.stack([pt1, pt2, pt3, pt4], axis=-2)


def xyxyxyxy2xywhr(corners):
    """4 corner points (n, 8) or (n, 4, 2) → xywhr via minAreaRect, angle in
    [0, π/2) (ref: utils/ops.py xyxyxyxy2xywhr:451). Host-side numpy/cv2."""
    import cv2

    pts = np.asarray(corners, np.float32).reshape(-1, 4, 2)
    out = []
    for p in pts:
        # the reference returns minAreaRect's raw angle in radians (ref :416)
        # under cv2 4.5-4.x, whose convention is angle ∈ (0°, 90°]. cv2 5.x
        # (and <4.5) report the SAME rectangle as (h, w, angle-90) with
        # angle ∈ (-90°, 0°] — bridge it so every cv2 yields the reference's
        # (w, h, angle ∈ (0, π/2]) representation
        (cx, cy), (w, h), ang = cv2.minAreaRect(p)
        if ang <= 0:
            w, h = h, w
            ang += 90
        out.append([cx, cy, w, h, ang * math.pi / 180])
    return np.array(out, np.float32).reshape(-1, 5)
