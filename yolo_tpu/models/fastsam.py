"""FastSAM: segment-anything via a single-class YOLOv8-seg pass + prompt filters.

Reference counterpart: ultralytics/models/fastsam/ (model.py FastSAM:14,
predict.py FastSAMPredictor:14, utils.py adjust_bboxes_to_image_border:4).
The device side is our fused seg predictor (forward+NMS+mask assembly in one
XLA program); the prompt filters (bbox / point / text) are host-side numpy over
the decoded masks, exactly mirroring the reference selection rules.
"""

from __future__ import annotations

import numpy as np

from yolo_tpu.engine.model import YOLO
from yolo_tpu.engine.segment_predictor import SegmentationPredictor

_UNSET = object()  # cache-miss sentinel (ckpt=None is a legal cached key)


def adjust_bboxes_to_image_border(boxes: np.ndarray, image_shape, threshold: int = 20) -> np.ndarray:
    """Snap near-border boxes onto the border (ref: fastsam/utils.py:4)."""
    h, w = image_shape
    boxes = boxes.copy()
    boxes[boxes[:, 0] < threshold, 0] = 0
    boxes[boxes[:, 1] < threshold, 1] = 0
    boxes[boxes[:, 2] > w - threshold, 2] = w
    boxes[boxes[:, 3] > h - threshold, 3] = h
    return boxes


class FastSAMPredictor(SegmentationPredictor):
    """Seg predictor + everything-mode postprocess + prompt selection
    (ref: fastsam/predict.py FastSAMPredictor:14)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.prompts = {}

    def set_prompts(self, prompts: dict):
        """Stash prompts applied on the next __call__ (ref :178)."""
        self.prompts = dict(prompts or {})

    def _run_batch(self, imgs, metas):
        # prompts filter BEFORE save/show/verbose (ref: prompts applied inside
        # postprocess) — run the parent silent, emit the filtered results below
        emit = {k: getattr(self.args, k, False) for k in ("save", "save_txt", "save_crop", "show", "verbose")}
        for k in emit:
            setattr(self.args, k, False)
        try:
            results = super()._run_batch(imgs, metas)
        finally:
            for k, v in emit.items():
                setattr(self.args, k, v)
        from yolo_tpu.ops.boxes import box_iou

        bboxes = self.prompts.pop("bboxes", None)
        points = self.prompts.pop("points", None)
        labels = self.prompts.pop("labels", None)
        texts = self.prompts.pop("texts", None)
        for r in results:
            if r.boxes is None or len(r.boxes) == 0:
                continue
            h, w = r.orig_shape
            snapped = adjust_bboxes_to_image_border(np.asarray(r.boxes.xyxy), (h, w))
            full = np.array([[0, 0, w, h]], np.float32)
            iou = np.asarray(box_iou(full, snapped))[0]
            data = np.asarray(r.boxes.data).copy()
            data[iou > 0.9, :4] = full[0]
            r.update(boxes=data)
        out = self.prompt(results, bboxes=bboxes, points=points, labels=labels, texts=texts)
        if emit["verbose"]:
            from yolo_tpu.utils import LOGGER

            for r, (path, _) in zip(out, metas):
                LOGGER.info(f"{path}: {len(r)} dets {r.speed['inference']:.1f}ms")
        if emit["show"]:
            self._show_results(out)
        if emit["save"] or emit["save_txt"] or emit["save_crop"]:
            self._write_results(out, metas)
        return out

    def prompt(self, results, bboxes=None, points=None, labels=None, texts=None):
        """Filter the everything-results by prompts (ref: predict.py prompt:78)."""
        if bboxes is None and points is None and texts is None:
            return results
        clip = None
        if texts is not None:
            # CLIP crop-vs-text similarity (ref: fastsam/predict.py
            # _clip_inference:152) via the native towers; pass clip_ckpt= or a
            # prebuilt clip_model= through predict kwargs for released weights
            from yolo_tpu.nn.text_model import CLIPModel

            clip = self.prompts.pop("clip_model", None)
            ckpt = self.prompts.pop("clip_ckpt", None)
            if clip is None and getattr(self, "_clip_ckpt", _UNSET) == ckpt:
                clip = self._clip  # reuse: rebuilding + re-importing per batch is seconds of waste
            if clip is None:
                clip = CLIPModel()
                if ckpt:
                    clip.load_torch(ckpt)  # warns if the BPE table is missing
                else:
                    from yolo_tpu.utils import LOGGER

                    LOGGER.warning(
                        "FastSAM text prompt: no clip_model/clip_ckpt supplied — scoring with a "
                        "RANDOMLY-initialized CLIP; pass clip_ckpt=... for meaningful selection."
                    )
                self._clip, self._clip_ckpt = clip, ckpt
        out = []
        if not isinstance(results, list):
            results = [results]
        for r in results:
            if r.masks is None or len(r.masks) == 0:
                out.append(r)
                continue
            masks = np.asarray(r.masks.data).astype(np.float32)  # (n, H, W) at orig shape
            n = masks.shape[0]
            idx = np.zeros(n, bool)
            if bboxes is not None:
                bb = np.atleast_2d(np.asarray(bboxes, np.int32))
                bbox_areas = (bb[:, 3] - bb[:, 1]) * (bb[:, 2] - bb[:, 0])
                mask_areas = np.stack([masks[:, b[1] : b[3], b[0] : b[2]].sum((1, 2)) for b in bb])  # (nb, n)
                full_areas = masks.sum((1, 2))
                union = bbox_areas[:, None] + full_areas[None] - mask_areas
                idx[np.argmax(mask_areas / np.maximum(union, 1e-7), axis=1)] = True
            if texts is not None and clip is not None:
                # best mask per text by crop-text cosine (masks < 100 px skipped)
                keep_i, crops = [], []
                boxes_xyxy = np.asarray(r.boxes.xyxy, np.int32)
                for i, b in enumerate(boxes_xyxy):
                    if masks[i].sum() <= 100:
                        continue
                    x1, y1, x2, y2 = b
                    if x2 > x1 and y2 > y1:
                        keep_i.append(i)
                        crops.append(r.orig_img[y1:y2, x1:x2, ::-1])
                if crops:
                    im_e = np.asarray(clip.encode_image(crops))  # (M, D) unit
                    tx_e = np.asarray(clip.encode_text([texts] if isinstance(texts, str) else list(texts)))
                    sim = im_e @ tx_e.T  # (M, T)
                    idx[[keep_i[j] for j in np.argmax(sim, axis=0)]] = True
            if points is not None:
                pts = np.atleast_2d(np.asarray(points, np.int32))
                lbl = np.ones(len(pts), np.int32) if labels is None else np.asarray(labels, np.int32)
                assert len(lbl) == len(pts), f"labels size {len(lbl)} != points size {len(pts)}"
                point_idx = np.ones(n, bool) if lbl.sum() == 0 else np.zeros(n, bool)
                for (px, py), l in zip(pts, lbl):
                    hit = masks[:, py, px] > 0
                    point_idx[hit] = bool(l)
                idx |= point_idx
            out.append(r[idx])
        return out


class FastSAM(YOLO):
    """FastSAM facade: YOLOv8-seg graph, single 'object' class, promptable
    (ref: fastsam/model.py FastSAM:14)."""

    def __init__(self, model="FastSAM-s.yaml", verbose: bool = False):
        name = str(model)
        if name.lower().endswith(".pt"):
            from pathlib import Path

            if not Path(name).exists():
                raise FileNotFoundError(
                    f"checkpoint '{name}' not found — pass the downloaded released checkpoint's "
                    "path, or 'FastSAM-s.yaml' for a randomly-initialized graph"
                )
            # released checkpoints are ultralytics-format yolov8-seg nc=1 —
            # route through the YOLO .pt importer (building the yaml graph
            # here silently produced RANDOM weights before)
            super().__init__(name, task="segment", verbose=verbose)
            self.model.names = {0: "object"}
        elif name.lower().startswith("fastsam"):
            # FastSAM-s == yolov8s-seg with nc=1 (the released checkpoints' graph)
            scale = "s" if "-s" in name.lower() else "x"
            from yolo_tpu.nn.tasks import SegmentationModel

            self.task = "segment"
            self.overrides = {}
            self.predictor = None
            self.trainer = None
            self.metrics = None
            self.ckpt_path = None
            self.model = SegmentationModel(f"yolov8{scale}-seg.yaml", nc=1)
            self.model.names = {0: "object"}
            self.params = self.model.init(0)
            self.overrides["model"] = name
            self.overrides["task"] = "segment"
        else:
            super().__init__(model, task="segment", verbose=verbose)

    def predict(self, source=None, stream: bool = False, bboxes=None, points=None, labels=None, texts=None,
                clip_model=None, clip_ckpt=None, **kwargs):
        """Segment everything, then filter by prompts (ref: fastsam/model.py predict:53).

        Text prompts score crops with the native CLIP towers — pass clip_ckpt
        (an OpenAI clip .pt) or a prebuilt clip_model for real weights."""
        kwargs.setdefault("conf", 0.4)
        if self.predictor is None or not isinstance(self.predictor, FastSAMPredictor):
            from yolo_tpu.cfg import DEFAULT_CFG_DICT

            args = {**self.overrides, "conf": kwargs["conf"], "batch": 1, "mode": "predict", **kwargs}
            self.predictor = FastSAMPredictor(
                self.model,
                self.params,
                overrides={k: v for k, v in args.items() if k in DEFAULT_CFG_DICT},
                names=self.model.names,
            )
        self.predictor.set_prompts(
            dict(bboxes=bboxes, points=points, labels=labels, texts=texts, clip_model=clip_model, clip_ckpt=clip_ckpt)
        )
        return super().predict(source, stream, **kwargs)
