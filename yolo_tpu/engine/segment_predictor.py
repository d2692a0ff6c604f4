"""Segmentation predictor (ref: models/yolo/segment/predict.py).

Extends the detection predictor: the fused device program additionally carries
mask coefficients through NMS and assembles prototype masks on device; the host
undoes the letterbox on masks and attaches a Masks container to each Results.
"""

from __future__ import annotations

import numpy as np

from yolo_tpu.engine.predictor import BasePredictor, _snap_batch
from yolo_tpu.engine.results import Masks, Results
from yolo_tpu.ops.boxes import scale_boxes
from yolo_tpu.ops.masks import scale_masks_np
from yolo_tpu.utils import Profile


class SegmentationPredictor(BasePredictor):
    def _predict_fn(self, shape):
        key = ("seg",) + tuple(shape) + (float(self.args.conf), float(self.args.iou))
        if key in self._fn_cache:
            return self._fn_cache[key]
        import jax
        import jax.numpy as jnp

        from yolo_tpu.ops.masks import process_mask
        from yolo_tpu.ops.nms import non_max_suppression

        conf, iou, max_det = float(self.args.conf), float(self.args.iou), int(self.args.max_det)
        model, dtype = self.model, self.dtype
        nc = model.nc

        @jax.jit
        def fn(params, imgs):
            x = imgs[..., ::-1].astype(dtype) / 255.0
            preds, protos = model.predict(params, x, dtype=dtype)
            out = non_max_suppression(preds, conf_thres=conf, iou_thres=iou, max_det=max_det, nc=nc)
            H, W = imgs.shape[1:3]
            # proto-resolution masks on device: upsampling every padded slot to
            # (max_det, H, W) f32 costs ~500 MB/image at 640px & max_det=300 —
            # the host upsamples only the valid detections instead
            masks = jax.vmap(lambda pr, cf, bx: process_mask(pr, cf, bx, (H, W), upsample=False))(protos, out["extra"], out["boxes"])
            out["masks"] = masks
            return out

        self._fn_cache[key] = fn
        return fn

    def _run_batch(self, imgs, metas):
        import jax

        profilers = (Profile(), Profile(), Profile())
        with profilers[0]:
            proc = [self.pre_transform(im)[0] for im in imgs]
            n = len(proc)
            B = _snap_batch(n)
            h, w, c = proc[0].shape
            batch = np.zeros((B, h, w, c), np.uint8)
            for i, pimg in enumerate(proc):
                batch[i] = pimg if pimg.ndim == 3 else pimg[..., None]
        fn = self._predict_fn(batch.shape)
        with profilers[1]:
            out = fn(self.params, batch)
            out = jax.tree_util.tree_map(lambda a: np.asarray(jax.block_until_ready(a)), out)
        with profilers[2]:
            results = []
            for i in range(n):
                valid = out["valid"][i]
                boxes = scale_boxes((h, w), out["boxes"][i][valid], imgs[i].shape[:2])
                data = np.concatenate(
                    [boxes, out["scores"][i][valid][:, None], out["cls"][i][valid][:, None].astype(np.float32)], -1
                )
                r = Results(imgs[i], metas[i][0], self.names, boxes=data)
                vm = out["masks"][i][valid]  # (n, mh, mw) proto resolution
                if getattr(self.args, "retina_masks", False):
                    # hi-res masks (ref: predict.py retina_masks →
                    # process_mask_native): strip the letterbox pad at PROTO
                    # scale and resize once, straight to the original image —
                    # one interpolation instead of proto→letterbox→original
                    masks = scale_masks_np(vm, imgs[i].shape[:2], vm.shape[1:] if len(vm) else (h, w))
                else:
                    if len(vm):
                        import cv2

                        vm = np.stack([cv2.resize(m_, (w, h), interpolation=cv2.INTER_LINEAR) for m_ in vm])
                    masks = scale_masks_np(vm.reshape(-1, h, w) if len(vm) else vm.reshape(0, h, w), imgs[i].shape[:2], (h, w))
                r.masks = Masks(masks > 0.5, imgs[i].shape[:2])
                r.speed = {
                    "preprocess": profilers[0].dt * 1e3 / n,
                    "inference": profilers[1].dt * 1e3 / n,
                    "postprocess": profilers[2].dt * 1e3 / n,
                }
                results.append(r)
        # same save/show/verbose surface as the detection predictor (this
        # override previously dropped them, so predict(save=True) on a
        # segment model silently wrote nothing)
        if self.args.verbose:
            from yolo_tpu.utils import LOGGER

            for r, (path, _) in zip(results, metas):
                LOGGER.info(f"{path}: {len(r)} dets {r.speed['inference']:.1f}ms")
        if getattr(self.args, "show", False):
            self._show_results(results)
        if self.args.save or self.args.save_txt or getattr(self.args, "save_crop", False):
            self._write_results(results, metas)
        return results
