"""Letterbox preprocessing: ratio-preserving resize + gray padding.

Host path uses cv2 (matches the reference's augment-time letterbox, ref:
ultralytics/data/augment.py LetterBox:1593 — 114 fill, centered, optional
stride-multiple 'auto' padding). Device path (`letterbox_device`) runs the same
math inside jit for fixed-size video streams, so preprocess fuses with the
backbone and frames never round-trip to host after decode.
"""

from __future__ import annotations

import numpy as np


def letterbox_params(shape, new_shape=(640, 640), auto: bool = False, stride: int = 32, scale_fill=False, scaleup: bool = True, center: bool = True):
    """Compute (ratio, (dw, dh), (new_unpad_w, new_unpad_h)) for a letterbox op.

    shape: source (h, w). new_shape: target (h, w) or int.
    """
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = (round(shape[1] * r), round(shape[0] * r))  # (w, h)
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if auto:  # pad only to a stride multiple
        dw, dh = dw % stride, dh % stride
    if center:
        dw /= 2
        dh /= 2
    return (r, r), (dw, dh), new_unpad


class LetterBox:
    """Callable host letterbox, reference-parity semantics."""

    def __init__(self, new_shape=(640, 640), auto: bool = False, scale_fill: bool = False, scaleup: bool = True, center: bool = True, stride: int = 32, padding_value: int = 114):
        self.new_shape = (new_shape, new_shape) if isinstance(new_shape, int) else tuple(new_shape)
        self.auto = auto
        self.scale_fill = scale_fill
        self.scaleup = scaleup
        self.center = center
        self.stride = stride
        self.padding_value = padding_value

    def __call__(self, image: np.ndarray, return_meta: bool = False):
        import cv2

        shape = image.shape[:2]
        new_shape = self.new_shape
        if self.scale_fill:
            ratio = (new_shape[1] / shape[1], new_shape[0] / shape[0])
            img = cv2.resize(image, (new_shape[1], new_shape[0]), interpolation=cv2.INTER_LINEAR)
            if return_meta:
                return img, (ratio, (0.0, 0.0))
            return img

        (r, _), (dw, dh), new_unpad = letterbox_params(
            shape, new_shape, auto=self.auto, stride=self.stride, scaleup=self.scaleup, center=self.center
        )
        img = image
        if shape[::-1] != new_unpad:
            img = cv2.resize(image, new_unpad, interpolation=cv2.INTER_LINEAR)
        top, bottom = int(round(dh - 0.1)) if self.center else 0, int(round(dh + 0.1))
        left, right = int(round(dw - 0.1)) if self.center else 0, int(round(dw + 0.1))
        fill = (self.padding_value,) * (3 if img.ndim == 3 else 1)
        img = cv2.copyMakeBorder(img, top, bottom, left, right, cv2.BORDER_CONSTANT, value=fill)
        if img.ndim == 2:
            img = img[..., None]
        if return_meta:
            return img, ((r, r), (dw, dh))
        return img


def letterbox_device(images, src_shape, dst_shape, padding_value: float = 114.0):
    """Jittable letterbox for a fixed (h, w) source → (H, W) target, NHWC batch.

    Uses jax.image bilinear resize (matches cv2 INTER_LINEAR within tolerance)
    then pads centered with the fill value. All shapes static → fully fused.
    """
    import jax.numpy as jnp
    import jax

    h, w = src_shape
    H, W = dst_shape
    r = min(H / h, W / w)
    new_w, new_h = round(w * r), round(h * r)
    dw, dh = (W - new_w) / 2, (H - new_h) / 2
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))

    x = images.astype(jnp.float32)
    if (new_h, new_w) != (h, w):
        x = jax.image.resize(x, (x.shape[0], new_h, new_w, x.shape[-1]), method="linear")
    x = jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)), constant_values=padding_value)
    return x, ((r, r), (dw, dh))
