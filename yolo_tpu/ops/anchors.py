"""Anchor-free grid generation and distance↔box transforms.

Equivalents of the reference helpers (ref: ultralytics/utils/tal.py
make_anchors:367, dist2bbox:382, bbox2dist:394). Anchors are computed from
*static* feature shapes at trace time, so inside jit they are constants folded
by XLA — no per-call grid rebuild as in the reference's shape-cache.
"""

from __future__ import annotations

import numpy as np


def make_anchors(feat_shapes, strides, grid_cell_offset: float = 0.5, dtype=np.float32):
    """Build anchor centers + per-anchor strides for a list of (h, w) feature shapes.

    Returns:
        anchor_points: (A, 2) array of (x, y) cell centers in feature-grid units.
        stride_tensor: (A, 1) array of strides.

    Row order matches the reference: x varies fastest within each level, levels
    concatenated in input order.
    """
    anchor_points, stride_tensor = [], []
    for (h, w), stride in zip(feat_shapes, strides):
        sx = np.arange(w, dtype=dtype) + grid_cell_offset
        sy = np.arange(h, dtype=dtype) + grid_cell_offset
        gy, gx = np.meshgrid(sy, sx, indexing="ij")
        anchor_points.append(np.stack((gx, gy), -1).reshape(-1, 2))
        stride_tensor.append(np.full((h * w, 1), stride, dtype=dtype))
    return np.concatenate(anchor_points), np.concatenate(stride_tensor)


def dist2bbox(distance, anchor_points, xywh: bool = True, axis: int = -1):
    """(l,t,r,b) distances from anchor → box. Works on numpy or jax arrays."""
    if isinstance(distance, np.ndarray):
        xp = np
    else:
        import jax.numpy as jnp

        xp = jnp
    lt, rb = xp.split(distance, 2, axis=axis)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return xp.concatenate([c_xy, wh], axis=axis)
    return xp.concatenate([x1y1, x2y2], axis=axis)


def bbox2dist(anchor_points, bbox, reg_max: int):
    """xyxy box → clamped (l,t,r,b) distances for DFL targets."""
    if isinstance(bbox, np.ndarray):
        xp = np
    else:
        import jax.numpy as jnp

        xp = jnp
    x1y1, x2y2 = xp.split(bbox, 2, axis=-1)
    return xp.clip(xp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1), 0, reg_max - 0.01)


def dist2rbox(distance, angle, anchor_points, axis: int = -1):
    """Decode (lt, rb) distances + angle into rotated xywh around anchors
    (ref: utils/tal.py dist2rbox:400). angle in radians, shape (..., 1)."""
    import jax.numpy as jnp

    lt, rb = jnp.split(jnp.asarray(distance), 2, axis=axis)
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    xf, yf = jnp.split((rb - lt) / 2, 2, axis=axis)
    x = xf * cos - yf * sin
    y = xf * sin + yf * cos
    xy = jnp.concatenate([x, y], axis) + anchor_points
    return jnp.concatenate([xy, lt + rb], axis)
