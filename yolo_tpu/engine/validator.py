"""Detection validator: batched device inference + host metric accumulation.

Reference counterpart: engine/validator.py BaseValidator:42 +
models/yolo/detect/val.py DetectionValidator:45 (postprocess:109 NMS at
conf=0.001/iou=0.7, _process_batch:261 10-threshold IoU matching, DetMetrics).
The device side is the same fused predict+NMS program the predictor uses;
matching/AP run on host once per batch.
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

from yolo_tpu.cfg import DEFAULT_CFG_DICT, get_cfg
from yolo_tpu.data.build import build_dataloader, build_yolo_dataset
from yolo_tpu.data.dataset import check_det_dataset
from yolo_tpu.ops.boxes import scale_boxes, xywhn2xyxy
from yolo_tpu.utils import LOGGER
from yolo_tpu.utils.metrics import ConfusionMatrix, DetMetrics, match_predictions
from yolo_tpu.utils.tqdm import TQDM

_VAL_PROGRAMS: "weakref.WeakKeyDictionary" = None  # initialized lazily below


def _val_program(model, key, build):
    """Per-model cache of jitted val programs.

    trainer.validate constructs a fresh validator every epoch; a fresh
    @jax.jit closure would retrace and recompile the full forward+NMS each
    time (tens of seconds on TPU), so the compiled callable is cached on the
    model object keyed by the val config."""
    global _VAL_PROGRAMS
    import weakref

    if _VAL_PROGRAMS is None:
        _VAL_PROGRAMS = weakref.WeakKeyDictionary()
    try:
        per = _VAL_PROGRAMS.setdefault(model, {})
    except TypeError:  # model not weak-referenceable
        return build()
    if key not in per:
        per[key] = build()
    return per[key]


def validator_for(model):
    """Validator class for a model's task — the facade-side twin of
    DetectionTrainer.validate's dispatch (ref: Model.task_map val entries,
    engine/model.py:958)."""
    if getattr(model, "is_rtdetr", False):
        return RTDETRValidator
    task = getattr(model, "task", "detect")
    return {"segment": SegmentationValidator, "obb": OBBValidator, "pose": PoseValidator}.get(task, DetectionValidator)


class DetectionValidator:
    """Evaluate a detection model on a dataset split."""

    def __init__(self, args=None, data: dict | None = None):
        overrides = {k: v for k, v in (args or {}).items() if k in DEFAULT_CFG_DICT}
        self.args = get_cfg(overrides=overrides)
        if self.args.conf is None:
            self.args.conf = 0.001  # val default (ref: validator)
        self.data = data
        self.iou_thresholds = np.linspace(0.5, 0.95, 10)

    def __call__(self, model, params) -> dict:
        import jax
        import jax.numpy as jnp

        from yolo_tpu.ops.nms import non_max_suppression

        data = self.data or check_det_dataset(self.args.data)
        split = data.get(self.args.split) or data.get("val") or data.get("train")
        stride = int(max(model.stride))
        dataset = build_yolo_dataset(self.args, split, self.args.batch, data, mode="val", stride=stride)
        batch_size = min(int(self.args.batch) if self.args.batch and self.args.batch > 0 else 16, len(dataset))
        loader = build_dataloader(dataset, batch_size, workers=self.args.workers, shuffle=False, drop_last=False, overlap_mask=bool(getattr(self.args, 'overlap_mask', True)))

        conf, iou, max_det = float(self.args.conf), float(self.args.iou), int(self.args.max_det)
        dtype = jnp.bfloat16 if self.args.half else jnp.float32

        def _build_infer():
            @jax.jit
            def infer(p, imgs):
                x = imgs.astype(dtype) / 255.0  # dataset batches are already RGB (collate_batch)
                preds = model.predict(p, x, dtype=dtype)
                return non_max_suppression(preds, conf_thres=conf, iou_thres=iou, max_det=max_det)

            return infer

        infer = _val_program(model, ("det", conf, iou, max_det, dtype.__name__), _build_infer)

        metrics = DetMetrics(names=getattr(model, "names", {}))
        cm = ConfusionMatrix(nc=model.nc)
        self._json_dets = []  # COCO-style rows when save_json (ref: detect/val.py pred_to_json)
        n_img = 0
        t0 = time.time()
        # COCO-91 category remap for COCO-style datasets (ref: detect/val.py
        # is_coco + converter.py coco80_to_coco91_class)
        is_coco = bool(data) and data.get("nc", 0) == 80 and "coco" in str(data.get("path", "")).lower()
        if is_coco:
            from yolo_tpu.utils.coco_eval import coco80_to_coco91_class

            cat_map = coco80_to_coco91_class()
        else:
            cat_map = None
        for batch in TQDM(loader, desc="val", total=len(loader), unit="batch"):
            imgs = batch["img"]
            pad_to = batch_size
            if imgs.shape[0] < pad_to:  # pad last batch to keep one compiled shape
                pad = np.zeros((pad_to - imgs.shape[0],) + imgs.shape[1:], imgs.dtype)
                imgs_in = np.concatenate([imgs, pad])
            else:
                imgs_in = imgs
            out = infer(params, jnp.asarray(imgs_in))
            out = {k: np.asarray(v) for k, v in out.items()}
            H, W = imgs.shape[1:3]
            for i in range(imgs.shape[0]):
                meta = batch["meta"][i]
                valid = out["valid"][i]
                pboxes = out["boxes"][i][valid]
                pconf = out["scores"][i][valid]
                pcls = out["cls"][i][valid]
                # gts: normalized xywh on the letterboxed canvas → pixel xyxy
                m = batch["mask_gt"][i] > 0
                gt_boxes = np.asarray(xywhn2xyxy(batch["bboxes"][i][m], w=W, h=H))
                gt_cls = batch["cls"][i][m]
                tp = match_predictions(pboxes, pcls, gt_boxes, gt_cls, self.iou_thresholds)
                metrics.update(tp, pconf, pcls, gt_cls)
                cm.process_batch(pboxes, pconf, pcls, gt_boxes, gt_cls)
                if self.args.save_json:
                    # COCO-json rows match pycocotools conventions (ref:
                    # detect/val.py pred_to_json): numeric-stem image ids,
                    # boxes rescaled to ORIGINAL image pixels, and COCO-91
                    # category ids for COCO datasets — otherwise the
                    # cross-check below can never match the GT file
                    from yolo_tpu.ops.boxes import xyxy2xywh

                    stem = Path(str(meta.get("im_file") or n_img)).stem
                    image_id = int(stem) if stem.isnumeric() else stem
                    jb = pboxes
                    if meta.get("shape"):
                        jb = np.asarray(scale_boxes((H, W), np.array(pboxes, np.float64), meta["shape"], meta.get("ratio_pad")))
                    for b, s, c in zip(np.asarray(xyxy2xywh(jb)), pconf, pcls):
                        self._json_dets.append(
                            {
                                "image_id": image_id,
                                "category_id": cat_map[int(c)] if cat_map else int(c),
                                "bbox": [round(float(v), 3) for v in [b[0] - b[2] / 2, b[1] - b[3] / 2, b[2], b[3]]],
                                "score": round(float(s), 5),
                            }
                        )
                n_img += 1
        results = metrics.process()
        dt = time.time() - t0
        LOGGER.info(
            f"val: {n_img} images in {dt:.1f}s — P {results['precision']:.4f} R {results['recall']:.4f} "
            f"mAP50 {results['mAP50']:.4f} mAP50-95 {results['mAP50-95']:.4f}"
        )
        self.confusion_matrix = cm
        self.metrics = metrics
        save_dir = None  # resolved once — a second get_save_dir call would increment to valN+1
        if self.args.save_json and self._json_dets:
            import json

            from yolo_tpu.cfg import get_save_dir

            save_dir = get_save_dir(self.args, name="val")
            save_dir.mkdir(parents=True, exist_ok=True)
            (save_dir / "predictions.json").write_text(json.dumps(self._json_dets))
            LOGGER.info(f"saved {save_dir / 'predictions.json'}")
            # optional cross-check against the vendored COCOeval protocol
            # (ref: detect/val.py coco_evaluate:433; pycocotools absent here)
            anno = Path(data.get("path", ".")) / "annotations" / "instances_val2017.json"
            if anno.exists():
                from yolo_tpu.utils.coco_eval import coco_evaluate

                stats = coco_evaluate(str(anno), self._json_dets)
                LOGGER.info("COCOeval cross-check: " + " ".join(f"{k} {v:.4f}" for k, v in stats.items()))
                results.update({f"coco/{k}": v for k, v in stats.items()})
        if self.args.plots:
            try:
                from yolo_tpu.cfg import get_save_dir
                from yolo_tpu.utils.plotting import plot_confusion_matrix

                if save_dir is None:
                    save_dir = get_save_dir(self.args, name="val")
                save_dir.mkdir(parents=True, exist_ok=True)
                plot_confusion_matrix(cm.matrix, names=getattr(model, "names", {}), save_path=save_dir / "confusion_matrix.png")
            except Exception as e:
                LOGGER.warning(f"plotting failed: {e}")
        return results


class OBBValidator(DetectionValidator):
    """Rotated-box validation: probiou NMS + probiou TP matching
    (ref: models/yolo/obb/val.py OBBValidator:18)."""

    def __call__(self, model, params) -> dict:
        import jax
        import jax.numpy as jnp

        from yolo_tpu.ops.nms import non_max_suppression_rotated

        data = self.data or check_det_dataset(self.args.data)
        split = data.get(self.args.split) or data.get("val") or data.get("train")
        stride = int(max(model.stride))
        args = get_cfg(overrides={**vars(self.args), "task": "obb"})
        dataset = build_yolo_dataset(args, split, self.args.batch, data, mode="val", stride=stride)
        batch_size = min(int(self.args.batch) if self.args.batch and self.args.batch > 0 else 16, len(dataset))
        loader = build_dataloader(dataset, batch_size, workers=self.args.workers, shuffle=False, drop_last=False, overlap_mask=bool(getattr(self.args, 'overlap_mask', True)))

        conf, iou, max_det = float(self.args.conf), float(self.args.iou), int(self.args.max_det)
        dtype = jnp.bfloat16 if self.args.half else jnp.float32

        def _build_infer():
            @jax.jit
            def infer(p, imgs):
                x = imgs.astype(dtype) / 255.0  # dataset batches are already RGB (collate_batch)
                preds = model.predict(p, x, dtype=dtype)  # (B, 4+nc+1, A) with angle
                return non_max_suppression_rotated(preds, conf_thres=conf, iou_thres=iou, max_det=max_det)

            return infer

        infer = _val_program(model, ("obb", conf, iou, max_det, dtype.__name__), _build_infer)

        metrics = DetMetrics(names=getattr(model, "names", {}))
        n_img = 0
        t0 = time.time()
        for batch in TQDM(loader, desc="val", total=len(loader), unit="batch"):
            imgs = batch["img"]
            if imgs.shape[0] < batch_size:
                pad = np.zeros((batch_size - imgs.shape[0],) + imgs.shape[1:], imgs.dtype)
                imgs_in = np.concatenate([imgs, pad])
            else:
                imgs_in = imgs
            out = infer(params, jnp.asarray(imgs_in))
            out = {k: np.asarray(v) for k, v in out.items()}
            H, W = imgs.shape[1:3]
            for i in range(imgs.shape[0]):
                valid = out["valid"][i]
                pboxes = out["boxes"][i][valid]  # (n, 5) xywhr px
                pconf = out["scores"][i][valid]
                pcls = out["cls"][i][valid]
                m = batch["mask_gt"][i] > 0
                gt = batch["bboxes"][i][m]  # (n_gt, 5) normalized xywhr
                if gt.shape[-1] == 4:  # pure-background batch collates as (N, 4)
                    gt = np.concatenate([gt, np.zeros((len(gt), 1), np.float32)], -1)
                gt_boxes = gt * np.array([W, H, W, H, 1.0], np.float32)
                gt_cls = batch["cls"][i][m]
                tp = match_predictions(pboxes, pcls, gt_boxes, gt_cls, self.iou_thresholds)
                metrics.update(tp, pconf, pcls, gt_cls)
                n_img += 1
        results = metrics.process()
        LOGGER.info(
            f"val(obb): {n_img} images in {time.time() - t0:.1f}s — P {results['precision']:.4f} "
            f"R {results['recall']:.4f} mAP50 {results['mAP50']:.4f} mAP50-95 {results['mAP50-95']:.4f}"
        )
        self.metrics = metrics
        return results


class PoseValidator(DetectionValidator):
    """Box mAP + OKS keypoint mAP (ref: models/yolo/pose/val.py PoseValidator:16).

    Predictions carry decoded keypoints as NMS extra channels; OKS matching uses
    gt-box area × 0.53 (cocoeval convention, ref :199)."""

    def __call__(self, model, params) -> dict:
        import jax
        import jax.numpy as jnp

        from yolo_tpu.ops.nms import non_max_suppression
        from yolo_tpu.utils.metrics import OKS_SIGMA, kpt_iou, match_predictions_iou

        data = self.data or check_det_dataset(self.args.data)
        split = data.get(self.args.split) or data.get("val") or data.get("train")
        stride = int(max(model.stride))
        args = get_cfg(overrides={**vars(self.args), "task": "pose"})
        dataset = build_yolo_dataset(args, split, self.args.batch, data, mode="val", stride=stride)
        batch_size = min(int(self.args.batch) if self.args.batch and self.args.batch > 0 else 16, len(dataset))
        loader = build_dataloader(dataset, batch_size, workers=self.args.workers, shuffle=False, drop_last=False, overlap_mask=bool(getattr(self.args, 'overlap_mask', True)))

        nkpt, ndim = model.head.kpt_shape
        sigma = OKS_SIGMA if (nkpt, ndim) == (17, 3) else np.ones(nkpt) / nkpt
        conf, iou, max_det = float(self.args.conf), float(self.args.iou), int(self.args.max_det)
        dtype = jnp.bfloat16 if self.args.half else jnp.float32

        def _build_infer():
            @jax.jit
            def infer(p, imgs):
                x = imgs.astype(dtype) / 255.0  # dataset batches are already RGB (collate_batch)
                preds = model.predict(p, x, dtype=dtype)  # (B, 4+nc+nk, A)
                return non_max_suppression(preds, conf_thres=conf, iou_thres=iou, max_det=max_det, nc=model.nc)

            return infer

        infer = _val_program(model, ("pose", conf, iou, max_det, dtype.__name__), _build_infer)

        box_metrics = DetMetrics(names=getattr(model, "names", {}))
        pose_metrics = DetMetrics(names=getattr(model, "names", {}))
        n_img = 0
        t0 = time.time()
        for batch in TQDM(loader, desc="val", total=len(loader), unit="batch"):
            imgs = batch["img"]
            if imgs.shape[0] < batch_size:
                pad = np.zeros((batch_size - imgs.shape[0],) + imgs.shape[1:], imgs.dtype)
                imgs_in = np.concatenate([imgs, pad])
            else:
                imgs_in = imgs
            out = infer(params, jnp.asarray(imgs_in))
            out = {k: np.asarray(v) for k, v in out.items()}
            H, W = imgs.shape[1:3]
            for i in range(imgs.shape[0]):
                valid = out["valid"][i]
                pboxes = out["boxes"][i][valid]
                pconf = out["scores"][i][valid]
                pcls = out["cls"][i][valid]
                pkpts = out["extra"][i][valid].reshape(-1, nkpt, ndim)
                m = batch["mask_gt"][i] > 0
                gt_boxes = np.asarray(xywhn2xyxy(batch["bboxes"][i][m], w=W, h=H))
                gt_cls = batch["cls"][i][m]
                # a batch of pure-background images collates without 'keypoints'
                gk = batch.get("keypoints")
                if gk is None:
                    gk = np.zeros((len(batch["cls"]), batch["cls"].shape[1], nkpt, ndim), np.float32)
                gt_kpts = gk[i][m] * np.array([W, H] + [1.0] * (ndim - 2), np.float32)
                tp = match_predictions(pboxes, pcls, gt_boxes, gt_cls, self.iou_thresholds)
                box_metrics.update(tp, pconf, pcls, gt_cls)
                area = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1]) * 0.53
                oks = kpt_iou(gt_kpts, pkpts, area, sigma)
                tp_p = match_predictions_iou(pcls, gt_cls, oks, self.iou_thresholds)
                pose_metrics.update(tp_p, pconf, pcls, gt_cls)
                n_img += 1
        rb = box_metrics.process()
        rp = pose_metrics.process()
        LOGGER.info(
            f"val(pose): {n_img} images in {time.time() - t0:.1f}s — box mAP50 {rb['mAP50']:.4f} "
            f"mAP50-95 {rb['mAP50-95']:.4f} | pose mAP50 {rp['mAP50']:.4f} mAP50-95 {rp['mAP50-95']:.4f}"
        )
        results = dict(rb)
        results.update({f"pose_{k}": v for k, v in rp.items()})
        # PoseMetrics fitness = box fitness + pose fitness (ref: metrics.py PoseMetrics)
        results["fitness"] = rb.get("fitness", 0.0) + rp.get("fitness", 0.0)
        self.metrics = (box_metrics, pose_metrics)
        return results


class SegmentationValidator(DetectionValidator):
    """Box mAP + mask mAP (ref: models/yolo/segment/val.py SegmentationValidator:20).

    Masks compare at prototype (stride-4) resolution — the reference's default
    (no-upsample) comparison path; gt arrives as the collate's overlap-index map."""

    def __call__(self, model, params) -> dict:
        import jax
        import jax.numpy as jnp

        from yolo_tpu.ops.masks import crop_mask_np
        from yolo_tpu.ops.nms import non_max_suppression
        from yolo_tpu.utils.metrics import mask_iou, match_predictions_iou

        data = self.data or check_det_dataset(self.args.data)
        split = data.get(self.args.split) or data.get("val") or data.get("train")
        stride = int(max(model.stride))
        dataset = build_yolo_dataset(self.args, split, self.args.batch, data, mode="val", stride=stride)
        batch_size = min(int(self.args.batch) if self.args.batch and self.args.batch > 0 else 16, len(dataset))
        loader = build_dataloader(dataset, batch_size, workers=self.args.workers, shuffle=False, drop_last=False, overlap_mask=bool(getattr(self.args, 'overlap_mask', True)))

        conf, iou, max_det = float(self.args.conf), float(self.args.iou), int(self.args.max_det)
        dtype = jnp.bfloat16 if self.args.half else jnp.float32

        def _build_infer():
            @jax.jit
            def infer(p, imgs):
                x = imgs.astype(dtype) / 255.0  # dataset batches are already RGB (collate_batch)
                preds, protos = model.predict(p, x, dtype=dtype)
                return (
                    non_max_suppression(preds, conf_thres=conf, iou_thres=iou, max_det=max_det, nc=model.nc),
                    protos,
                )

            return infer

        infer = _val_program(model, ("seg", conf, iou, max_det, dtype.__name__), _build_infer)

        box_metrics = DetMetrics(names=getattr(model, "names", {}))
        m_metrics = DetMetrics(names=getattr(model, "names", {}))
        n_img = 0
        t0 = time.time()
        for batch in TQDM(loader, desc="val", total=len(loader), unit="batch"):
            imgs = batch["img"]
            if imgs.shape[0] < batch_size:
                pad = np.zeros((batch_size - imgs.shape[0],) + imgs.shape[1:], imgs.dtype)
                imgs_in = np.concatenate([imgs, pad])
            else:
                imgs_in = imgs
            out, protos = infer(params, jnp.asarray(imgs_in))
            out = {k: np.asarray(v) for k, v in out.items()}
            protos = np.asarray(protos, np.float32)
            H, W = imgs.shape[1:3]
            mh, mw = protos.shape[1:3]
            gt_maps = batch.get("masks")
            for i in range(imgs.shape[0]):
                valid = out["valid"][i]
                pboxes = out["boxes"][i][valid]
                pconf = out["scores"][i][valid]
                pcls = out["cls"][i][valid]
                coefs = out["extra"][i][valid]
                m = batch["mask_gt"][i] > 0
                gt_boxes = np.asarray(xywhn2xyxy(batch["bboxes"][i][m], w=W, h=H))
                gt_cls = batch["cls"][i][m]
                tp = match_predictions(pboxes, pcls, gt_boxes, gt_cls, self.iou_thresholds)
                box_metrics.update(tp, pconf, pcls, gt_cls)

                # assemble pred masks at proto resolution, crop to boxes
                pm = 1.0 / (1.0 + np.exp(-(coefs @ protos[i].reshape(-1, protos.shape[-1]).T)))
                pm = crop_mask_np(pm.reshape(-1, mh, mw), pboxes * (mh / H)) > 0.5
                if gt_maps is not None:
                    gmap = gt_maps[i]
                    idxs = np.nonzero(m)[0]
                    if gmap.ndim == 3:  # overlap_mask=False: per-instance (N, h, w) binary masks
                        gm = gmap[idxs] > 0
                        if gm.shape[1:] != (mh, mw):
                            step = (max(gm.shape[1] // mh, 1), max(gm.shape[2] // mw, 1))
                            gm = gm[:, :: step[0], :: step[1]][:, :mh, :mw]
                    else:  # overlap-index map (h, w)
                        if gmap.shape != (mh, mw):
                            step = (max(gmap.shape[0] // mh, 1), max(gmap.shape[1] // mw, 1))
                            gmap = gmap[:: step[0], :: step[1]][:mh, :mw]
                        gm = gmap[None] == (idxs + 1)[:, None, None]
                    miou = mask_iou(gm.reshape(len(idxs), -1), pm.reshape(len(pm), -1))
                    tp_m = match_predictions_iou(pcls, gt_cls, miou, self.iou_thresholds)
                else:
                    tp_m = np.zeros((len(pcls), len(self.iou_thresholds)), bool)
                m_metrics.update(tp_m, pconf, pcls, gt_cls)
                n_img += 1
        rb = box_metrics.process()
        rm = m_metrics.process()
        LOGGER.info(
            f"val(seg): {n_img} images in {time.time() - t0:.1f}s — box mAP50 {rb['mAP50']:.4f} "
            f"mAP50-95 {rb['mAP50-95']:.4f} | mask mAP50 {rm['mAP50']:.4f} mAP50-95 {rm['mAP50-95']:.4f}"
        )
        results = dict(rb)
        results.update({f"mask_{k}": v for k, v in rm.items()})
        results["fitness"] = rb.get("fitness", 0.0) + rm.get("fitness", 0.0)
        self.metrics = (box_metrics, m_metrics)
        return results


class RTDETRValidator(DetectionValidator):
    """NMS-free validation for RT-DETR: threshold the query set, box mAP
    (ref: models/rtdetr/val.py RTDETRValidator:121)."""

    def __call__(self, model, params) -> dict:
        import jax
        import jax.numpy as jnp

        from yolo_tpu.ops.boxes import xywh2xyxy as _xywh2xyxy

        data = self.data or check_det_dataset(self.args.data)
        split = data.get(self.args.split) or data.get("val") or data.get("train")
        stride = int(max(model.stride))
        dataset = build_yolo_dataset(self.args, split, self.args.batch, data, mode="val", stride=stride)
        batch_size = min(int(self.args.batch) if self.args.batch and self.args.batch > 0 else 16, len(dataset))
        loader = build_dataloader(dataset, batch_size, workers=self.args.workers, shuffle=False, drop_last=False, overlap_mask=bool(getattr(self.args, 'overlap_mask', True)))

        conf = float(self.args.conf)
        dtype = jnp.bfloat16 if self.args.half else jnp.float32

        def _build_infer():
            @jax.jit
            def infer(p, imgs):
                x = imgs.astype(dtype) / 255.0  # dataset batches are already RGB (collate_batch)
                y = model.predict(p, x, dtype=dtype)  # (B, nq, 4+nc) normalized
                H, W = imgs.shape[1], imgs.shape[2]
                boxes = _xywh2xyxy(y[..., :4]) * jnp.array([W, H, W, H], jnp.float32)
                scores = y[..., 4:]
                return boxes, scores

            return infer

        infer = _val_program(model, ("rtdetr", conf, dtype.__name__), _build_infer)

        metrics = DetMetrics(names=getattr(model, "names", {}))
        n_img = 0
        t0 = time.time()
        for batch in TQDM(loader, desc="val", total=len(loader), unit="batch"):
            imgs = batch["img"]
            if imgs.shape[0] < batch_size:
                pad = np.zeros((batch_size - imgs.shape[0],) + imgs.shape[1:], imgs.dtype)
                imgs_in = np.concatenate([imgs, pad])
            else:
                imgs_in = imgs
            boxes, scores = (np.asarray(a) for a in infer(params, jnp.asarray(imgs_in)))
            H, W = imgs.shape[1:3]
            for i in range(imgs.shape[0]):
                sc = scores[i].max(-1)
                keep = sc > conf
                pboxes = boxes[i][keep]
                pconf = sc[keep]
                pcls = scores[i].argmax(-1)[keep].astype(np.float32)
                m = batch["mask_gt"][i] > 0
                gt_boxes = np.asarray(xywhn2xyxy(batch["bboxes"][i][m], w=W, h=H))
                gt_cls = batch["cls"][i][m]
                tp = match_predictions(pboxes, pcls, gt_boxes, gt_cls, self.iou_thresholds)
                metrics.update(tp, pconf, pcls, gt_cls)
                n_img += 1
        results = metrics.process()
        LOGGER.info(
            f"val(rtdetr): {n_img} images in {time.time() - t0:.1f}s — P {results['precision']:.4f} "
            f"R {results['recall']:.4f} mAP50 {results['mAP50']:.4f} mAP50-95 {results['mAP50-95']:.4f}"
        )
        self.metrics = metrics
        return results
