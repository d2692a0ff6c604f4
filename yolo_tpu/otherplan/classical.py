"""Classical (model-free) small-target detection.

Parity with the reference fallback detector (ref: otherplan/yolov11x+kalman.py
enhance_small_targets/classical_detect :151-211, same in simple_detection.py):
Top-hat(k=6 ellipse) + LoG(σ=1.2) + local contrast (σ=5 background subtract)
→ 0.5/0.3/0.2 weighted score → percentile-98 threshold → contours → geometry
filters (area ∈ [1e-6, 2e-4]·HW, circularity ≥ 0.55, aspect ≥ 0.6).

`enhance_small_targets_jax` is the batched device twin of the enhancement
(morphology via reduce_window, Gaussians via separable convs) for streaming
many frames; contours/geometry stay on host (cv2).
"""

from __future__ import annotations

import math

import numpy as np

TOPHAT_KSIZE = 6
LOG_GAUSS_SIGMA = 1.2
BINARY_PRC = 98
MIN_AREA_RATIO = 1e-6
MAX_AREA_RATIO = 2e-4
MIN_CIRCULARITY = 0.55
ASPECT_TOL = 0.6


def normalize_u8(img: np.ndarray) -> np.ndarray:
    """Linear rescale to uint8 [0, 255] (all-zero if constant)."""
    img = img.astype(np.float32)
    mn, mx = float(img.min()), float(img.max())
    if mx - mn < 1e-6:
        return np.zeros_like(img, dtype=np.uint8)
    return ((img - mn) / (mx - mn) * 255.0).clip(0, 255).astype(np.uint8)


def enhance_small_targets(gray: np.ndarray) -> np.ndarray:
    """Host (cv2) enhancement — reference-parity path."""
    import cv2

    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (TOPHAT_KSIZE, TOPHAT_KSIZE))
    toph = cv2.morphologyEx(gray, cv2.MORPH_TOPHAT, k)
    blur = cv2.GaussianBlur(gray, (0, 0), LOG_GAUSS_SIGMA)
    log_ = cv2.Laplacian(blur, cv2.CV_32F, ksize=3)
    log_pos = np.maximum(log_, 0.0)
    bg = cv2.GaussianBlur(gray, (0, 0), 5.0)
    local_contrast = cv2.subtract(gray, bg)
    score = 0.5 * normalize_u8(toph) + 0.3 * normalize_u8(log_pos) + 0.2 * normalize_u8(local_contrast)
    return normalize_u8(score)


def _gauss_kernel_1d(sigma: float):
    # cv2 auto kernel size for sigma: 2*ceil(3σ)+1 roughly (cv2 uses ((sigma*3)|1))
    radius = int(math.ceil(3 * sigma))
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-(x**2) / (2 * sigma**2))
    return k / k.sum()


def enhance_small_targets_jax(gray_batch):
    """Batched device enhancement: (B, H, W) float32 → (B, H, W) scores [0, 255].

    Same structure as the host path; morphological tophat = gray − dilate(erode)
    with an elliptical structuring element via reduce_window; per-image min/max
    normalization done with vector reductions.
    """
    import jax
    import jax.numpy as jnp

    x = gray_batch.astype(jnp.float32)

    def norm(v):
        mn = v.min(axis=(-2, -1), keepdims=True)
        mx = v.max(axis=(-2, -1), keepdims=True)
        return jnp.where(mx - mn < 1e-6, 0.0, (v - mn) / (mx - mn + 1e-12) * 255.0)

    # elliptical 6x6 structuring element (cv2.MORPH_ELLIPSE (6,6))
    import cv2

    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (TOPHAT_KSIZE, TOPHAT_KSIZE)).astype(bool)
    kh, kw = se.shape

    def morpho(v, op):
        # masked reduce over the structuring element footprint
        pads = ((0, 0), (kh // 2, (kh - 1) // 2), (kw // 2, (kw - 1) // 2))
        init = -jnp.inf if op == "max" else jnp.inf
        vp = jnp.pad(v, pads, constant_values=init if op == "max" else jnp.inf)
        stacks = []
        for i in range(kh):
            for j in range(kw):
                if se[i, j]:
                    stacks.append(vp[:, i : i + v.shape[1], j : j + v.shape[2]])
        s = jnp.stack(stacks)
        return s.max(0) if op == "max" else s.min(0)

    opened = morpho(morpho(x, "min"), "max")
    toph = x - opened

    def sep_gauss(v, sigma):
        k = jnp.asarray(_gauss_kernel_1d(sigma))
        r = (len(k) - 1) // 2
        vp = jnp.pad(v, ((0, 0), (r, r), (0, 0)), mode="edge")
        v1 = sum(k[i] * vp[:, i : i + v.shape[1], :] for i in range(len(k)))
        vp = jnp.pad(v1, ((0, 0), (0, 0), (r, r)), mode="edge")
        return sum(k[i] * vp[:, :, i : i + v.shape[2]] for i in range(len(k)))

    blur = sep_gauss(x, LOG_GAUSS_SIGMA)
    lap_k = jnp.asarray([[2.0, 0.0, 2.0], [0.0, -8.0, 0.0], [2.0, 0.0, 2.0]])  # cv2 Laplacian ksize=3
    bp = jnp.pad(blur, ((0, 0), (1, 1), (1, 1)), mode="edge")
    log_ = sum(lap_k[i, j] * bp[:, i : i + x.shape[1], j : j + x.shape[2]] for i in range(3) for j in range(3))
    log_pos = jnp.maximum(log_, 0.0)

    bg = sep_gauss(x, 5.0)
    local_contrast = jnp.maximum(x - bg, 0.0)  # cv2.subtract saturates at 0 for uint8

    score = 0.5 * norm(toph) + 0.3 * norm(log_pos) + 0.2 * norm(local_contrast)
    return norm(score)


def classical_detect(gray: np.ndarray, frame_shape=None, enhanced: np.ndarray | None = None) -> list:
    """Geometry-filtered candidate boxes [(x1, y1, x2, y2, score), ...] by score desc."""
    import cv2

    H, W = (frame_shape or gray.shape)[:2]
    enh = enhanced if enhanced is not None else enhance_small_targets(gray)
    thr_val = np.percentile(enh, BINARY_PRC)
    _, bin_ = cv2.threshold(enh, thr_val, 255, cv2.THRESH_BINARY)
    cnts, _ = cv2.findContours(bin_.astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)

    boxes = []
    min_area = int(MIN_AREA_RATIO * W * H)
    max_area = int(MAX_AREA_RATIO * W * H)
    for c in cnts:
        # parity note: cv2.contourArea returns 0 for 1-px/thin contours, so the
        # reference (yolov11x+kalman.py:187-188) rejects sub-2px blobs despite
        # MIN_AREA_RATIO admitting them — kept verbatim for pixel-exact parity
        area = cv2.contourArea(c)
        if area < max(1, min_area) or area > max_area:
            continue
        x, y, w, h = cv2.boundingRect(c)
        perim = cv2.arcLength(c, True)
        circularity = 0.0 if perim <= 1e-3 else 4.0 * math.pi * area / (perim * perim)
        if circularity < MIN_CIRCULARITY:
            continue
        aspect = min(w, h) / max(w, h)
        if aspect < ASPECT_TOL:
            continue
        score = float(enh[y : y + h, x : x + w].mean())
        boxes.append((x, y, x + w, y + h, score))
    boxes.sort(key=lambda b: b[4], reverse=True)
    return boxes
