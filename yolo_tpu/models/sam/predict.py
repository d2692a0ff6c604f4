"""SAM predictor: set_image → prompt → masks (ref: ultralytics/models/sam/predict.py
Predictor:40, and model.py SAM:38).

Device side: image encoding and the prompt→mask decode are two jitted programs
(the encoder runs once per image; each prompt reuses the cached embedding — the
reference's set_image/prompt split, which maps perfectly onto jit caching).
"""

from __future__ import annotations

import numpy as np

from yolo_tpu.engine.results import Masks, Results


class SAMPredictor:
    """Promptable segmentation over a SAMModel."""

    def __init__(self, model, params=None):
        self.model = model
        self.params = params if params is not None else model.init(0)
        self._features = None
        self._orig_hw = None
        self._scale = None
        self._encode_jit = None
        self._decode_jit = None

    # --- image ------------------------------------------------------------------

    def set_image(self, img: np.ndarray):
        """Encode one BGR uint8 image (resized so the long side = img_size)."""
        import cv2
        import jax
        import jax.numpy as jnp

        s = self.model.image_encoder.img_size
        h0, w0 = img.shape[:2]
        scale = s / max(h0, w0)
        nh, nw = int(round(h0 * scale)), int(round(w0 * scale))
        im = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        im = im[..., ::-1].astype(np.float32)  # BGR→RGB
        pad = np.zeros((s, s, 3), np.float32)
        pad[:nh, :nw] = im
        if self._encode_jit is None:
            self._encode_jit = jax.jit(lambda p, x: self.model.encode_image(p, x))
        self._features = self._encode_jit(self.params, jnp.asarray(pad)[None])
        self._orig_hw = (h0, w0)
        self._scale = scale
        return self

    # --- prompts -----------------------------------------------------------------

    def __call__(self, points=None, labels=None, bboxes=None, multimask_output=True):
        """Predict masks for point/box prompts on the set image.

        Args:
            points: (N, 2) pixel coords in the ORIGINAL image.
            labels: (N,) 1=fg, 0=bg. Defaults to ones.
            bboxes: (M, 4) xyxy pixel boxes in the original image.
            multimask_output: return 3 masks per prompt (+scores) or 1.

        Returns:
            Results with .masks (upscaled to the original size) and IoU scores.
        """
        import jax
        import jax.numpy as jnp

        assert self._features is not None, "call set_image() first"
        pts = None
        if points is not None:
            pts_arr = np.atleast_2d(np.asarray(points, np.float32)) * self._scale
            lab = np.ones(len(pts_arr), np.int32) if labels is None else np.asarray(labels, np.int32)
            pts = (jnp.asarray(pts_arr)[None], jnp.asarray(lab)[None])
        bxs = None
        if bboxes is not None:
            bxs = jnp.asarray(np.atleast_2d(np.asarray(bboxes, np.float32)) * self._scale)

        if self._decode_jit is None:
            self._decode_jit = jax.jit(
                lambda p, feats, pts, bxs: self.model.predict_masks(
                    p, feats, points=pts, boxes=bxs, multimask_output=multimask_output
                ),
                static_argnames=(),
            )
        masks, iou = self.model.predict_masks(
            self.params, self._features, points=pts, boxes=bxs, multimask_output=multimask_output
        )
        masks = np.asarray(masks)
        iou = np.asarray(iou)

        # upscale low-res masks (img_size/4 grid) to the original image
        import cv2

        s = self.model.image_encoder.img_size
        h0, w0 = self._orig_hw
        out_masks = []
        for b in range(masks.shape[0]):
            for m in range(masks.shape[1]):
                full = cv2.resize(masks[b, m], (s, s), interpolation=cv2.INTER_LINEAR)
                crop = full[: int(round(h0 * self._scale)), : int(round(w0 * self._scale))]
                out_masks.append(cv2.resize(crop, (w0, h0), interpolation=cv2.INTER_LINEAR) > self.model.mask_threshold)
        out = np.stack(out_masks) if out_masks else np.zeros((0, h0, w0), bool)
        r = Results(np.zeros((h0, w0, 3), np.uint8), "", {0: "object"})
        r.masks = Masks(out, (h0, w0))
        r.iou_scores = iou.reshape(-1)
        return r
