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
        self._gen_jit = None

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

        from yolo_tpu.models.sam.sam2 import SAM2Model

        mm = bool(multimask_output)
        if self._decode_jit is None or getattr(self, "_decode_mm", None) is not mm:
            if isinstance(self.model, SAM2Model):
                # SAM2 features are (embed, [s0, s1]) and its decoder also
                # returns mask tokens + object score — keep (masks, iou)
                def _decode(p, feats, pts, bxs):
                    embed, high_res = feats
                    out = self.model.predict_masks(p, embed, high_res, points=pts, boxes=bxs, multimask_output=mm)
                    return out[0], out[1]
            else:
                def _decode(p, feats, pts, bxs):
                    return self.model.predict_masks(p, feats, points=pts, boxes=bxs, multimask_output=mm)

            self._decode_jit = jax.jit(_decode)
            self._decode_mm = mm
        masks, iou = self._decode_jit(self.params, self._features, pts, bxs)
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

    # --- segment everything -------------------------------------------------------

    def generate(self, img: np.ndarray, points_stride: int = 32, points_batch_size: int = 64,
                 conf_thres: float = 0.88, stability_score_thresh: float = 0.95,
                 stability_score_offset: float = 1.0, nms_thresh: float = 0.7):
        """Segment everything via a point grid (ref: predict.py generate:329,
        single crop layer). Each grid point prompts the decoder (multimask);
        masks filter by predicted IoU and stability score, dedupe with box NMS.

        Stability and boxes are computed on the low-res mask grid (the
        reference interpolates to crop size first — equal up to resampling).

        Returns a Results with .masks (original size), .boxes, and scores.
        """
        import cv2
        import jax
        import jax.numpy as jnp

        from yolo_tpu.ops.nms import nms_numpy

        self.set_image(img)
        h0, w0 = self._orig_hw
        side = points_stride
        gy, gx = np.meshgrid((np.arange(side) + 0.5) / side, (np.arange(side) + 0.5) / side, indexing="ij")
        grid = np.stack([gx.reshape(-1) * w0, gy.reshape(-1) * h0], -1).astype(np.float32)  # (P, 2) px

        P = points_batch_size
        if self._gen_jit is None:
            import inspect

            if "high_res" in inspect.signature(self.model.predict_masks).parameters:
                raise NotImplementedError(
                    "generate() (segment-everything) currently supports SAM1/MobileSAM predictors; "
                    "SAM2's predict_masks takes the high-res feature pyramid — use point/box prompts"
                )

            def decode(p, feats, coords, labels):
                return self.model.predict_masks(p, feats, points=(coords, labels), multimask_output=True)

            self._gen_jit = jax.jit(decode)

        thr = self.model.mask_threshold
        all_masks, all_scores, all_boxes = [], [], []
        for i in range(0, len(grid), P):
            chunk = grid[i : i + P]
            if len(chunk) < P:  # pad to the compiled batch
                chunk = np.concatenate([chunk, np.zeros((P - len(chunk), 2), np.float32)])
            coords = jnp.asarray(chunk[:, None] * self._scale)  # (P, 1, 2)
            labels = jnp.ones((P, 1), jnp.int32)
            masks, iou = self._gen_jit(self.params, self._features, coords, labels)
            masks = np.asarray(masks, np.float32).reshape(-1, *masks.shape[-2:])  # (P*3, hs, ws)
            iou = np.asarray(iou, np.float32).reshape(-1)
            n_real = (min(len(grid) - i, P)) * 3
            masks, iou = masks[:n_real], iou[:n_real]
            keep = iou > conf_thres
            masks, iou = masks[keep], iou[keep]
            if not len(masks):
                continue
            # stability: IoU of (thr + off) vs (thr - off) thresholdings
            # (ref: models/sam/amg.py calculate_stability_score — full offset,
            # not half; half made the filter systematically more lenient)
            hi = (masks > thr + stability_score_offset).sum((1, 2))
            lo = (masks > thr - stability_score_offset).sum((1, 2))
            stab = hi / np.maximum(lo, 1)
            keep = stab > stability_score_thresh
            masks, iou = masks[keep] > thr, iou[keep]
            for m, s in zip(masks, iou):
                ys, xs = np.where(m)
                if not len(ys):
                    continue
                all_boxes.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
                all_masks.append(m)
                all_scores.append(float(s))
        if not all_masks:
            r = Results(np.zeros((h0, w0, 3), np.uint8), "", {0: "object"})
            r.masks = Masks(np.zeros((0, h0, w0), bool), (h0, w0))
            return r
        boxes = np.asarray(all_boxes, np.float32)
        scores = np.asarray(all_scores, np.float32)
        keep = nms_numpy(boxes, scores, nms_thresh)
        out_masks, out_boxes = [], []
        crop_h = max(int(round(h0 * self._scale / 4)), 1)
        crop_w = max(int(round(w0 * self._scale / 4)), 1)
        for k in keep:
            m = all_masks[k][:crop_h, :crop_w].astype(np.uint8)
            out_masks.append(cv2.resize(m, (w0, h0), interpolation=cv2.INTER_NEAREST) > 0)
            b = boxes[k] * np.array([w0 / crop_w, h0 / crop_h, w0 / crop_w, h0 / crop_h])
            out_boxes.append(b)
        r = Results(np.zeros((h0, w0, 3), np.uint8), "", {0: "object"})
        r.masks = Masks(np.stack(out_masks), (h0, w0))
        data = np.concatenate([np.asarray(out_boxes, np.float32), scores[keep][:, None],
                               np.zeros((len(keep), 1), np.float32)], -1)
        r.update(boxes=data)
        return r
