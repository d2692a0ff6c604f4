"""Streaming predictor: host IO + one fused device program per input shape.

Reference counterpart: engine/predictor.py BasePredictor:69 (preprocess:152,
stream_inference:283). TPU re-design: the whole hot path —
uint8→fp normalize, BGR→RGB, forward, DFL decode, NMS — is ONE jitted XLA
program with static shapes (cached per (batch, H, W)). Only file/video IO and
the final pad-trim + scale_boxes run on host. Batch sizes snap to powers of two
to bound recompilation.
"""

from __future__ import annotations

import functools
import os
from pathlib import Path

import numpy as np

from yolo_tpu import native
from yolo_tpu.cfg import get_cfg
from yolo_tpu.engine.results import Results
from yolo_tpu.ops.boxes import scale_boxes
from yolo_tpu.ops.letterbox import LetterBox
from yolo_tpu.utils import LOGGER, Profile
from yolo_tpu.utils.files import imwrite as _imwrite

IMG_FORMATS = {"bmp", "dng", "jpeg", "jpg", "mpo", "png", "tif", "tiff", "webp", "pfm"}
VID_FORMATS = {"asf", "avi", "gif", "m4v", "mkv", "mov", "mp4", "mpeg", "mpg", "ts", "wmv", "webm"}


def _snap_batch(n: int) -> int:
    """Round batch up to a power of two (bounds jit cache size)."""
    b = 1
    while b < n:
        b *= 2
    return b


class BasePredictor:
    """Detection predictor over a functional model + params."""

    def __init__(self, model, params, overrides: dict | None = None, names: dict | None = None):
        self.args = get_cfg(overrides=overrides or {})
        if self.args.conf is None:
            self.args.conf = 0.25
        self.model = model
        self.params = params
        self.names = names or getattr(model, "names", {})
        self.done_warmup = False
        self._fn_cache: dict = {}
        self.callbacks = {}
        import jax.numpy as jnp

        self.dtype = jnp.bfloat16 if (self.args.half or str(self.args.compute_dtype) == "bfloat16") else jnp.float32
        self.set_params(params)

    def set_params(self, params):
        """Install (raw) params, re-applying PTQ quantization when int8 is on —
        callers that refresh params on a reused predictor (engine/model.py
        predict) must not silently revert an int8 predictor to float."""
        int8 = bool(getattr(self.args, "int8", False))
        if params is getattr(self, "_raw_params", None) and int8 == getattr(self, "_installed_int8", None):
            return  # unchanged tree + same quant mode: keep the installed params
        self._raw_params = params
        if int8:  # PTQ inference (nn/quantize.py)
            from yolo_tpu.nn.quantize import quantize_params

            params = quantize_params(self.model.fuse(params) if hasattr(self.model, "fuse") else params)
        elif hasattr(self.model, "fuse"):
            # AutoBackend parity (ref nn/autobackend.py:72 loads with
            # fuse=True): inference always runs Conv+BN folded. Exact algebra
            # (parity pinned in tests/test_model.py); the facade's raw
            # trainable params are untouched — Model.train keeps Model.params,
            # mirroring the reference fusing only the deploy copy. This also
            # turns on the neck fold below for standard float inference.
            try:
                params = self.model.fuse(params)
            except Exception as e:
                LOGGER.warning(f"Conv+BN fuse at predictor setup failed ({e}); running unfused")
        self.params = params
        self._installed_int8 = int8
        # fused float trees unlock the neck Upsample→Concat→C2f fold (the
        # on-chip A/B winner, demos/pallas_ab.py) in _predict_fn
        from yolo_tpu.nn.tasks import params_are_fused_float

        self._params_fused_float = not int8 and params_are_fused_float(params)

    # --- device program ------------------------------------------------------

    def _predict_fn(self, shape):
        """Build (or fetch) the fused jitted program for a (B, H, W, C) shape.

        The cache key carries EVERY argument the closure bakes in — conf, iou,
        agnostic, augment, classes, max_det — so changing any of them on a
        reused predictor compiles a fresh program instead of silently serving
        stale results."""
        classes_key = tuple(self.args.classes) if self.args.classes is not None else None
        key = tuple(shape) + (
            float(self.args.conf),
            float(self.args.iou),
            bool(self.args.agnostic_nms),
            bool(getattr(self.args, "augment", False)),
            classes_key,
            int(self.args.max_det),
            bool(getattr(self, "_params_fused_float", False)),
        )
        if key in self._fn_cache:
            return self._fn_cache[key]
        import jax
        import jax.numpy as jnp

        from yolo_tpu.ops.nms import non_max_suppression

        conf, iou, max_det = float(self.args.conf), float(self.args.iou), int(self.args.max_det)
        agnostic = bool(self.args.agnostic_nms)
        classes = self.args.classes
        model, dtype = self.model, self.dtype

        if getattr(model, "is_rtdetr", False):
            # RT-DETR is NMS-free: threshold + top-k over the query set
            # (ref: models/rtdetr/predict.py RTDETRPredictor.postprocess)
            from yolo_tpu.ops.boxes import xywh2xyxy

            @jax.jit
            def fn(params, imgs):
                x = imgs[..., ::-1].astype(dtype) / 255.0
                y = model.predict(params, x, dtype=dtype)  # (B, nq, 4+nc) normalized
                H, W = imgs.shape[1], imgs.shape[2]
                boxes = xywh2xyxy(y[..., :4]) * jnp.array([W, H, W, H], jnp.float32)
                scores = y[..., 4:]
                if classes is not None:
                    allowed = jnp.zeros((scores.shape[-1],), bool).at[jnp.asarray(classes)].set(True)
                    scores = jnp.where(allowed[None, None], scores, 0.0)
                sc = scores.max(-1)
                cl = scores.argmax(-1)
                sc = jnp.where(sc > conf, sc, -1.0)
                top, idx = jax.lax.top_k(sc, min(max_det, sc.shape[-1]))
                valid = top > 0
                return {
                    "boxes": jnp.where(valid[..., None], jnp.take_along_axis(boxes, idx[..., None], 1), 0.0),
                    "scores": jnp.where(valid, top, 0.0),
                    "cls": jnp.where(valid, jnp.take_along_axis(cl, idx, 1), -1),
                    "valid": valid,
                }

            self._fn_cache[key] = fn
            return fn

        task = getattr(model, "task", "detect")
        if task == "classify":
            # ref: models/yolo/classify/predict.py — probabilities, no NMS
            @jax.jit
            def fn(params, imgs):
                x = imgs[..., ::-1].astype(dtype) / 255.0
                return {"probs": model.predict(params, x, dtype=dtype)}

            self._fn_cache[key] = fn
            return fn

        if task == "pose":
            # keypoints ride the NMS `extra` channel; nc must be explicit or
            # the kpt dims would be parsed as class scores
            # (ref: models/yolo/pose/predict.py PosePredictor)
            nc_pose = model.nc

            @jax.jit
            def fn(params, imgs):
                x = imgs[..., ::-1].astype(dtype) / 255.0
                preds = model.predict(params, x, dtype=dtype)
                return non_max_suppression(
                    preds, conf_thres=conf, iou_thres=iou, classes=classes,
                    agnostic=agnostic, max_det=max_det, nc=nc_pose,
                )

            self._fn_cache[key] = fn
            return fn

        if task == "obb":
            # rotated probiou NMS; boxes come back (max_det, 5) xywhr
            # (ref: models/yolo/obb/predict.py OBBPredictor)
            from yolo_tpu.ops.nms import non_max_suppression_rotated

            nc_obb = model.nc

            @jax.jit
            def fn(params, imgs):
                x = imgs[..., ::-1].astype(dtype) / 255.0
                preds = model.predict(params, x, dtype=dtype)
                return non_max_suppression_rotated(
                    preds, conf_thres=conf, iou_thres=iou, classes=classes,
                    agnostic=agnostic, max_det=max_det, nc=nc_obb,
                )

            self._fn_cache[key] = fn
            return fn

        augment = bool(getattr(self.args, "augment", False))
        if augment and (type(model).__name__ != "DetectionModel" or getattr(model.head, "end2end", False)):
            # ref _predict_augment:445 — TTA only for plain detection models
            LOGGER.warning("model does not support augment=True, using single-scale prediction")
            augment = False

        # the neck fold applies only to fused float trees; DetectionModel
        # carries the kwarg, task subclasses with their own predict may not
        import inspect

        neck_opt = bool(getattr(self, "_params_fused_float", False)) and (
            "neck_opt" in inspect.signature(model.predict).parameters
        )

        from yolo_tpu.nn import modules as _M

        lazy = (
            os.getenv("YOLO_TPU_LAZY_DECODE", "0") == "1"
            and not augment
            and type(model).__name__ == "DetectionModel"
            and type(getattr(model, "head", None)) is _M.Detect
            and bool(getattr(self, "_params_fused_float", False))
        )
        if lazy:
            # lazy decode: top-k by score first, DFL-decode only the winners —
            # bit-identical to decode-everything + NMS (ops/nms.py
            # non_max_suppression_logits); saves the all-anchor decode traffic
            from yolo_tpu.ops.nms import non_max_suppression_logits

            @jax.jit
            def fn(params, imgs):
                x = imgs[..., ::-1].astype(dtype) / 255.0
                bins, sc, anc, strd, proj = model.predict_logits(params, x, dtype=dtype, neck_opt=neck_opt)
                return non_max_suppression_logits(
                    bins, sc, anc, strd, proj,
                    conf_thres=conf, iou_thres=iou, classes=classes, agnostic=agnostic, max_det=max_det,
                )

            self._fn_cache[key] = fn
            return fn

        @jax.jit
        def fn(params, imgs):
            # imgs: uint8 NHWC BGR (cv2 convention) → RGB fp [0,1]
            x = imgs[..., ::-1].astype(dtype) / 255.0
            preds = (
                model.predict_augment(params, x, dtype=dtype)
                if augment
                else model.predict(params, x, dtype=dtype, **({"neck_opt": True} if neck_opt else {}))
            )
            return non_max_suppression(
                preds, conf_thres=conf, iou_thres=iou, classes=classes, agnostic=agnostic, max_det=max_det
            )

        self._fn_cache[key] = fn
        return fn

    def warmup(self, imgsz=(1, 640, 640, 3)):
        import jax.numpy as jnp

        fn = self._predict_fn(imgsz)
        out = fn(self.params, jnp.zeros(imgsz, jnp.uint8))
        import jax

        jax.block_until_ready(out)
        self.done_warmup = True

    # --- host pipeline ---------------------------------------------------------

    def pre_transform(self, im: np.ndarray) -> tuple[np.ndarray, tuple]:
        """Letterbox one image to the target size; returns (img, (ratio, pad)).

        Grayscale inputs (2-D or single-channel) are expanded to 3 channels
        first — the reference's loaders do the same via cv2 GRAY2BGR, and the
        model stem expects 3; this also keeps mixed gray/color batches on one
        compiled shape."""
        if im.ndim == 2:
            im = im[..., None]
        if im.shape[-1] == 1:
            im = np.repeat(im, 3, axis=-1)
        imgsz = self.args.imgsz
        if isinstance(imgsz, int):
            imgsz = (imgsz, imgsz)
        if getattr(self.model, "task", "") == "classify":
            # classify trains/validates on square-resized images
            # (engine/classify.py ClassificationDataset); letterbox gray
            # padding at predict time would be a train/serve mismatch
            # (ref: classify/predict.py uses classify_transforms, not LetterBox)
            import cv2

            out = cv2.resize(im, (imgsz[1], imgsz[0]), interpolation=cv2.INTER_LINEAR)
            return out, ((1.0, 1.0), (0.0, 0.0))
        if im.dtype == np.uint8 and native.available() and os.environ.get("YOLO_TPU_NATIVE_PRE", "1") != "0":
            # C++ fast path (native/preprocess.cpp): same geometry as LetterBox
            # (ratio-preserving bilinear + centered 114 pad); bilinear rounding
            # may differ from cv2 by ±1 intensity level (tests/test_native.py)
            return native.letterbox(im, tuple(imgsz))
        lb = LetterBox(tuple(imgsz), auto=False, stride=max(self.model.stride))
        return lb(im, return_meta=True)

    def __call__(self, source, stream: bool = False, **kwargs):
        gen = self.stream_inference(source, **kwargs)
        return gen if stream else list(gen)

    def stream_inference(self, source, **kwargs):
        """Generator over Results (ref: stream_inference:283)."""
        for k, v in kwargs.items():
            setattr(self.args, k, v)
        frames = _iter_source(source, vid_stride=self.args.vid_stride,
                              stream_buffer=bool(getattr(self.args, "stream_buffer", False)))
        batch_imgs, batch_meta = [], []
        max_b = max(1, int(self.args.batch)) if self.args.batch and self.args.batch > 0 else 16
        try:
            for img, path, frame_info in frames:
                batch_imgs.append(img)
                batch_meta.append((path, frame_info))
                if len(batch_imgs) >= max_b:
                    yield from self._run_batch(batch_imgs, batch_meta)
                    batch_imgs, batch_meta = [], []
            if batch_imgs:
                yield from self._run_batch(batch_imgs, batch_meta)
        finally:
            self.close()

    def _run_batch(self, imgs: list[np.ndarray], metas: list):
        import jax

        profilers = (Profile(), Profile(), Profile())
        with profilers[0]:
            proc, lb_meta = [], []
            for im in imgs:
                p, meta = self.pre_transform(im)
                proc.append(p)
                lb_meta.append(meta)
            n = len(proc)
            B = _snap_batch(n)
            h, w, c = proc[0].shape
            batch = np.zeros((B, h, w, c), np.uint8)
            for i, p in enumerate(proc):
                batch[i] = p if p.ndim == 3 else p[..., None]

        fn = self._predict_fn(batch.shape)
        with profilers[1]:
            out = fn(self.params, batch)
            out = jax.tree_util.tree_map(lambda a: np.asarray(jax.block_until_ready(a)), out)
        if getattr(self.args, "visualize", False) and hasattr(self.model, "_walk"):
            self._visualize_features(batch[:1])

        with profilers[2]:
            results = []
            for i in range(n):
                path, frame_info = metas[i]
                if "probs" in out:  # classify: probabilities, no boxes
                    from yolo_tpu.engine.results import Probs

                    r = Results(imgs[i], path, self.names, boxes=None)
                    r.probs = Probs(out["probs"][i])
                    r.speed = {
                        "preprocess": profilers[0].dt * 1e3 / n,
                        "inference": profilers[1].dt * 1e3 / n,
                        "postprocess": profilers[2].dt * 1e3 / n,
                    }
                    results.append(r)
                    continue
                valid = out["valid"][i]
                boxes = out["boxes"][i][valid]
                scores = out["scores"][i][valid]
                cls = out["cls"][i][valid]
                if boxes.shape[-1] == 5:  # obb: xywhr — scale centers/wh, keep angle
                    from yolo_tpu.engine.results import OBBoxes

                    xywh = scale_boxes((h, w), boxes[:, :4], imgs[i].shape[:2], ratio_pad=lb_meta[i], xywh=True)
                    data = np.concatenate(
                        [xywh, boxes[:, 4:5], scores[:, None], cls[:, None].astype(np.float32)], axis=-1
                    )
                    r = Results(imgs[i], path, self.names, boxes=None)
                    r.obb = OBBoxes(data, imgs[i].shape[:2])
                    r.speed = {
                        "preprocess": profilers[0].dt * 1e3 / n,
                        "inference": profilers[1].dt * 1e3 / n,
                        "postprocess": profilers[2].dt * 1e3 / n,
                    }
                    results.append(r)
                    continue
                boxes = scale_boxes((h, w), boxes, imgs[i].shape[:2], ratio_pad=lb_meta[i])
                data = np.concatenate([boxes, scores[:, None], cls[:, None].astype(np.float32)], axis=-1)
                r = Results(imgs[i], path, self.names, boxes=data)
                if "extra" in out and getattr(self.model, "task", "") == "pose":
                    # keypoints: inverse-letterbox xy, clip, keep conf column
                    from yolo_tpu.engine.results import Keypoints

                    K, nd = self.model.head.kpt_shape
                    kd = out["extra"][i][valid].reshape(-1, K, nd).copy()
                    (gain, _), pad = lb_meta[i][0], lb_meta[i][1]
                    H0, W0 = imgs[i].shape[:2]
                    kd[..., 0] = np.clip((kd[..., 0] - pad[0]) / gain, 0, W0)
                    kd[..., 1] = np.clip((kd[..., 1] - pad[1]) / gain, 0, H0)
                    r.keypoints = Keypoints(kd, imgs[i].shape[:2])
                r.speed = {
                    "preprocess": profilers[0].dt * 1e3 / n,
                    "inference": profilers[1].dt * 1e3 / n,
                    "postprocess": profilers[2].dt * 1e3 / n,
                }
                results.append(r)
        if self.args.verbose:
            for r, (path, _) in zip(results, metas):
                LOGGER.info(f"{path}: {r.verbose()}{r.speed['inference']:.1f}ms")
        if getattr(self.args, "show", False):
            self._show_results(results)
        if self.args.save or self.args.save_txt or getattr(self.args, 'save_crop', False):
            self._write_results(results, metas)
        return results

    def _show_results(self, results):
        """Live window display (ref: predictor show:368); degrades to a logged
        warning on headless hosts instead of crashing."""
        import cv2

        for r in results:
            try:
                cv2.imshow("yolo_tpu", r.plot(**self._plot_kwargs()))
                cv2.waitKey(1)
            except cv2.error as e:
                if not getattr(self, "_show_warned", False):
                    LOGGER.warning(f"show=True unavailable (headless?): {e}")
                    self._show_warned = True
                self.args.show = False
                return

    def _visualize_features(self, imgs):
        """Per-layer feature-map dumps for image 0 of the batch (ref:
        predictor.py:179 visualize= → tasks.py:183 feature_visualization).
        Eager (unjitted) graph walk — a debug feature, not the hot path."""
        import jax.numpy as jnp

        from yolo_tpu.cfg import get_save_dir
        from yolo_tpu.nn.modules import Ctx
        from yolo_tpu.utils.plotting import feature_visualization

        if getattr(self, "save_dir", None) is None:
            self.save_dir = get_save_dir(self.args)
            self.save_dir.mkdir(parents=True, exist_ok=True)
            self._vid_writers = {}
        x = imgs[..., ::-1].astype(np.float32) / 255.0
        model = self.model
        _, _, col = model._walk(
            self.params, jnp.asarray(x), Ctx(train=False, dtype=jnp.float32),
            collect={s.i for s in model.layers},
        )
        for spec in model.layers:
            out = col.get(spec.i)
            if out is None or not hasattr(out, "shape"):
                continue
            feature_visualization(
                np.asarray(out), type(spec.module).__name__, spec.i, save_dir=self.save_dir
            )

    def _plot_kwargs(self):
        """Annotation flags from args (ref: predictor save_preds → plot(:446):
        boxes=show_boxes, conf=show_conf, labels=show_labels)."""
        return {
            "line_width": self.args.line_width,
            "labels": self.args.show_labels,
            "conf": getattr(self.args, "show_conf", True),
            "boxes": getattr(self.args, "show_boxes", True),
        }

    def _write_results(self, results, metas):
        """Persist annotated media / txt labels (ref: predictor write_results:368)."""
        import cv2

        from yolo_tpu.cfg import get_save_dir

        if getattr(self, "save_dir", None) is None:
            self.save_dir = get_save_dir(self.args)
            self.save_dir.mkdir(parents=True, exist_ok=True)
            self._vid_writers = {}
        for r, (path, frame_idx) in zip(results, metas):
            stem = Path(str(path)).stem or "image"
            is_vid = Path(str(path)).suffix.lower().lstrip(".") in VID_FORMATS
            if self.args.save_txt:
                # video frames get per-frame files, ref predictor:
                # txt_path + f'_{frame}' for non-image sources
                txt_stem = f"{stem}_{frame_idx}" if is_vid else stem
                r.save_txt(self.save_dir / "labels" / f"{txt_stem}.txt", save_conf=self.args.save_conf)
            if getattr(self.args, "save_crop", False):
                # per-class detection crops (ref: plotting.py save_one_box:626,
                # gain 1.02 + 10px pad, square off)
                H, W = r.orig_img.shape[:2]
                for j, b in enumerate(np.asarray(r.boxes.xyxy)):
                    cx, cy = (b[0] + b[2]) / 2, (b[1] + b[3]) / 2
                    side = max(b[2] - b[0], b[3] - b[1]) * 1.02 / 2 + 10
                    x1, y1 = max(int(cx - side), 0), max(int(cy - side), 0)
                    x2, y2 = min(int(cx + side), W), min(int(cy + side), H)
                    if x2 <= x1 or y2 <= y1:
                        continue
                    cname = self.names.get(int(r.boxes.cls[j]), str(int(r.boxes.cls[j])))
                    d = self.save_dir / "crops" / str(cname)
                    d.mkdir(parents=True, exist_ok=True)
                    _imwrite(str(d / f"{stem}_{frame_idx}_{j}.jpg"), r.orig_img[y1:y2, x1:x2])
            if self.args.save:
                annotated = r.plot(**self._plot_kwargs())
                if is_vid and getattr(self.args, "save_frames", False):
                    # per-frame jpgs next to the video (ref: save_predicted_images:479)
                    d = self.save_dir / f"{stem}_frames"
                    d.mkdir(parents=True, exist_ok=True)
                    _imwrite(str(d / f"{frame_idx}.jpg"), annotated)
                if is_vid:  # accumulate into a video writer per source
                    if path not in self._vid_writers:
                        h, w = annotated.shape[:2]
                        out_path = str(self.save_dir / f"{stem}.mp4")
                        fps = 30.0
                        try:  # carry the source fps through (ref: save_predicted_images fps=cap fps)
                            cap = cv2.VideoCapture(str(path))
                            fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
                            cap.release()
                        except Exception:
                            pass
                        fps = max(fps / max(1, int(self.args.vid_stride or 1)), 1.0)  # stride drops frames
                        self._vid_writers[path] = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), float(fps), (w, h))
                    self._vid_writers[path].write(annotated)
                else:
                    _imwrite(str(self.save_dir / f"{stem}.jpg"), annotated)

    def close(self):
        for w in getattr(self, "_vid_writers", {}).values():
            w.release()
        self._vid_writers = {}


def _drain_loader(loader):
    """Adapt any data.loaders loader to the (bgr_image, path, frame_idx) shape."""
    from yolo_tpu.data.loaders import LoadStreams

    if isinstance(loader, LoadStreams):  # yields (sources, frames, infos) per tick
        idx = 0
        try:
            for srcs, frames_, _ in loader:
                for j, im in enumerate(frames_):
                    yield im, str(srcs[j]), idx
                idx += 1
        finally:
            loader.close()
    else:
        for path, frame, idx in loader:
            yield frame, path, idx


def _iter_source(source, vid_stride: int = 1, stream_buffer: bool = False):
    """Yield (bgr_image, path, frame_idx) from any source.

    In-memory single frames (ndarray/PIL) and mixed lists are unwrapped here;
    EVERYTHING else — tensor batches (numpy/jax/torch), paths, dirs, globs,
    videos, webcams (int or digit-string), URLs, stream lists, screen specs —
    routes through data.loaders.load_inference_source (ref: build.py:267), the
    single routing authority, so the API and CLI behave identically."""
    from yolo_tpu.data.loaders import load_inference_source

    if isinstance(source, np.ndarray) and source.ndim != 4:
        yield source, "array", 0
        return
    try:
        from PIL import Image

        if isinstance(source, Image.Image):
            yield np.asarray(source.convert("RGB"))[..., ::-1], "pil", 0
            return
    except ImportError:
        pass
    if isinstance(source, (list, tuple)):
        all_streams = len(source) > 0 and all(isinstance(s, str) and ("://" in s or str(s).isdigit()) for s in source)
        if all_streams:  # parallel multi-stream loader, not sequential starvation
            yield from _drain_loader(load_inference_source(list(source), vid_stride=vid_stride, stream_buffer=stream_buffer))
            return
        for i, s in enumerate(source):
            if isinstance(s, np.ndarray) and s.ndim != 4:
                yield s, f"array{i}", 0
            else:
                yield from _iter_source(s, vid_stride, stream_buffer)
        return
    yield from _drain_loader(load_inference_source(source, vid_stride=vid_stride, stream_buffer=stream_buffer))
