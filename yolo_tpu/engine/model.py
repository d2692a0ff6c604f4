"""YOLO model facade (ref: ultralytics/engine/model.py Model:29, models/yolo/model.py YOLO:26).

Same user surface — ``YOLO(model).predict/track/train/val/export/benchmark`` —
over the functional TPU core. Model sources:
  - ``*.yaml``  → fresh DetectionModel + random init
  - ``*.pt``    → torch checkpoint import (layout-converted into the pytree)
  - ``*.npz``   → native saved params
  - orbax dir   → native checkpoint
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from yolo_tpu.cfg import DEFAULT_CFG_DICT
from yolo_tpu.nn.tasks import DetectionModel
from yolo_tpu.utils import LOGGER


class YOLO:
    """User-facing model handle."""

    def __init__(self, model="yolov8n.yaml", task: str | None = None, verbose: bool = False):
        if isinstance(model, (list, tuple)):  # weight list → NMS ensemble (ref: nn/tasks.py attempt_load_weights + Ensemble:1267)
            self._load_ensemble([str(m) for m in model], task=task)
            return
        model = str(model)
        if model.startswith("tcp://"):  # served model as backend (ref: nn/autobackend.py:79-98 triton row + utils/triton.py)
            self._load_remote(model, task=task)
            return
        self.task = task or (
            "classify"
            if "-cls" in model
            else "segment"
            if "-seg" in model
            else "pose"
            if "-pose" in model
            else "obb"
            if "-obb" in model
            else "detect"
        )
        self.overrides: dict = {}
        self.predictor = None
        self.trainer = None
        self.metrics = None
        self.ckpt_path = None
        if model.endswith((".yaml", ".yml")):
            self._new(model, verbose=verbose)
        else:
            self._load(model)

    def _new(self, cfg: str, verbose: bool = False):
        if "rtdetr" in str(cfg).lower():
            from yolo_tpu.nn.tasks import RTDETRDetectionModel

            self.model = RTDETRDetectionModel(cfg, verbose=verbose)
            self.params = self.model.init(0)
            self.overrides["model"] = cfg
            self.overrides["task"] = self.task
            return
        if self.task == "classify":
            from yolo_tpu.nn.tasks import ClassificationModel

            self.model = ClassificationModel(cfg, verbose=verbose)
        elif self.task == "segment":
            from yolo_tpu.nn.tasks import SegmentationModel

            self.model = SegmentationModel(cfg, verbose=verbose)
        elif self.task == "pose":
            from yolo_tpu.nn.tasks import PoseModel

            self.model = PoseModel(cfg, verbose=verbose)
        elif self.task == "obb":
            from yolo_tpu.nn.tasks import OBBModel

            self.model = OBBModel(cfg, verbose=verbose)
        else:
            self.model = DetectionModel(cfg, verbose=verbose)
        self.params = self.model.init(0)
        self.overrides["model"] = cfg
        self.overrides["task"] = self.task

    def _load_remote(self, url: str, task: str | None = None):
        """Route predicts through a serving daemon (ref: utils/triton.py
        TritonRemoteModel — ``YOLO("tcp://host:port/<model_id>")``).

        Only predict/track are meaningful against a remote backend; train/
        val/export need the local params tree and raise a clear error."""
        from yolo_tpu.utils.remote import RemoteModel

        self.remote = RemoteModel(url)
        self.task = task or "detect"
        self.overrides = {"model": url, "task": self.task}
        self.predictor = None
        self.trainer = None
        self.metrics = None
        self.ckpt_path = None

        class _RemoteStub:  # .names/.task surface for code that introspects the model
            pass

        self.model = _RemoteStub()
        self.model.task = self.task
        self.model.names = {}

    def _load_ensemble(self, weights: list, task: str | None = None):
        """Build an NMS ensemble from several checkpoints/yamls (ref Ensemble:1267)."""
        from yolo_tpu.nn.tasks import Ensemble

        members = []
        for w in weights:
            m = YOLO(w, task=task)
            members.append((m.model, m.params))
        self.task = task or getattr(members[0][0], "task", "detect")
        self.overrides = {"model": ",".join(weights), "task": self.task}
        self.predictor = None
        self.trainer = None
        self.metrics = None
        self.ckpt_path = None
        self.model = Ensemble(members)
        self.params = tuple(p for _, p in members)

    def _load(self, weights: str):
        path = Path(weights)
        self.ckpt_path = str(path)
        if path.suffix == ".pt":
            from yolo_tpu.nn.torch_import import load_pt

            self.model, self.params, meta = load_pt(path)
            if meta.get("names"):
                self.model.names = dict(meta["names"])
            if meta.get("train_args"):
                ta = dict(meta["train_args"])
                self.overrides = {k: v for k, v in ta.items() if k in DEFAULT_CFG_DICT and k not in ("model", "data", "device")}
        elif path.suffix == ".npz":
            from yolo_tpu.engine.exporter import load_npz

            self.model, self.params, _ = load_npz(path)
        elif path.is_dir():
            from yolo_tpu.engine.exporter import load_orbax

            self.model, self.params, _ = load_orbax(path)
        else:
            raise ValueError(f"unsupported model source: {weights}")
        # the checkpoint's own task wins over filename-substring guessing
        self.task = getattr(self.model, "task", self.task)
        self.overrides["model"] = str(weights)
        self.overrides["task"] = self.task

    @property
    def names(self):
        return self.model.names

    @property
    def stride(self):
        return self.model.stride

    def fuse(self):
        """Fold BN into convs for inference (ref: BaseModel.fuse)."""
        self.params = self.model.fuse(self.params)
        return self

    def __call__(self, source=None, stream: bool = False, **kwargs):
        return self.predict(source, stream, **kwargs)

    def predict(self, source=None, stream: bool = False, predictor=None, **kwargs):
        """Run inference (ref: engine/model.py predict:498)."""
        custom = {"conf": 0.25, "batch": 1, "save": False, "mode": "predict"}
        args = {**self.overrides, **custom, **kwargs}
        if getattr(self, "remote", None) is not None:  # served backend (ref: autobackend triton row)
            from yolo_tpu.engine.remote_predictor import RemotePredictor

            if self.predictor is None:
                self.predictor = RemotePredictor(
                    self.remote, overrides={k: v for k, v in args.items() if k in DEFAULT_CFG_DICT}, names=self.model.names
                )
            else:
                for k, v in kwargs.items():
                    if k in DEFAULT_CFG_DICT:
                        setattr(self.predictor.args, k, v)
            return self.predictor(source, stream=stream)
        if self.predictor is None or predictor is not None:
            if predictor is None:
                if self.task == "segment":
                    from yolo_tpu.engine.segment_predictor import SegmentationPredictor as predictor_cls
                else:
                    from yolo_tpu.engine.predictor import BasePredictor as predictor_cls
            else:
                predictor_cls = predictor
            self.predictor = predictor_cls(
                self.model, self.params, overrides={k: v for k, v in args.items() if k in DEFAULT_CFG_DICT}, names=self.model.names
            )
        else:
            for k, v in kwargs.items():
                if k in DEFAULT_CFG_DICT:
                    setattr(self.predictor.args, k, v)
            # args are updated above BEFORE set_params so an int8 toggle is honored
            self.predictor.set_params(self.params)
        return self.predictor(source, stream=stream)

    def track(self, source=None, stream: bool = False, persist: bool = False, **kwargs):
        """Track objects (ref: engine/model.py track:559 — conf defaults low to 0.1)."""
        kwargs.setdefault("conf", 0.1)
        kwargs.setdefault("batch", 1)
        kwargs["mode"] = "track"
        results = self.predict(source, stream=stream, **kwargs)
        from yolo_tpu.trackers.track import attach_tracker

        return attach_tracker(self, results, persist=persist, stream=stream, tracker_cfg=kwargs.get("tracker"))

    def _require_local(self, mode: str):
        if getattr(self, "remote", None) is not None:
            raise RuntimeError(
                f"{mode} needs the local params tree; a tcp:// remote model only supports predict/track "
                f"(load the checkpoint locally instead of {self.overrides.get('model')})"
            )

    def train(self, trainer=None, **kwargs):
        """Train the model (ref: engine/model.py train:738)."""
        self._require_local("train")
        overrides = {**self.overrides, **kwargs, "mode": "train"}
        overrides.setdefault("model", self.overrides.get("model"))
        if trainer is None:
            if self.task == "classify":
                from yolo_tpu.engine.classify import ClassificationTrainer as trainer
            else:
                from yolo_tpu.engine.trainer import DetectionTrainer as trainer
        self.trainer = trainer(overrides=overrides, model=self.model, params=self.params)
        self.trainer.train()
        self.model = self.trainer.model  # trainer may rebuild for the dataset's nc
        self.params = self.trainer.best_params if self.trainer.best_params is not None else self.trainer.params
        self.predictor = None  # stale jit cache references the old model
        self.metrics = getattr(self.trainer, "metrics", None)
        return self.metrics

    def val(self, validator=None, **kwargs):
        """Validate on a dataset (ref: engine/model.py val:603).

        Dispatches the task's validator (segment/pose/obb/rtdetr/classify),
        mirroring DetectionTrainer.validate — the reference routes through
        task_map the same way."""
        self._require_local("val")
        args = {**self.overrides, **kwargs, "mode": "val"}
        if validator is None:
            if self.task == "classify":
                from yolo_tpu.engine.classify import ClassificationValidator

                validator = ClassificationValidator
            else:
                from yolo_tpu.engine.validator import validator_for

                validator = validator_for(self.model)
        v = validator(args=args)
        self.metrics = v(model=self.model, params=self.params)
        return self.metrics

    def export(self, **kwargs):
        self._require_local("export")
        """Export params/graph (ref: engine/model.py export:690)."""
        from yolo_tpu.engine.exporter import Exporter

        args = {**self.overrides, **kwargs, "mode": "export"}
        return Exporter(args=args)(model=self.model, params=self.params)

    def tune(self, iterations: int = 10, use_ray: bool = False, **kwargs):
        """Hyperparameter evolution (ref: engine/model.py tune:810 → Tuner;
        use_ray=True routes to the Ray Tune ASHA search, ref tune:835)."""
        if use_ray:
            from yolo_tpu.engine.tuner import run_ray_tune

            return run_ray_tune(self, max_samples=iterations, **kwargs)
        from yolo_tpu.engine.tuner import Tuner

        args = {**self.overrides, **kwargs, "mode": "train"}
        return Tuner(args=args)(model=self, iterations=iterations, **kwargs)

    def benchmark(self, **kwargs):
        from yolo_tpu.utils.benchmarks import benchmark

        return benchmark(model=self, **kwargs)

    def save(self, filename="model.npz"):
        from yolo_tpu.engine.exporter import save_npz

        return save_npz(self.model, self.params, filename)

    def info(self, verbose: bool = True):
        n_params = self.model.param_count(self.params)
        n_layers = len(self.model.layers)
        msg = f"model: {n_layers} layers, {n_params:,} params, strides {self.model.stride}"
        if verbose:
            LOGGER.info(msg)
        return {"layers": n_layers, "parameters": n_params, "stride": self.model.stride}

    def embed(self, source=None, layers=None, imgsz: int = 640, **kwargs):
        """Pooled image embeddings (ref: engine/model.py embed:467 — a predict
        wrapper returning per-image feature vectors from the neck output by
        default)."""
        import jax
        import jax.numpy as jnp

        from yolo_tpu.engine.predictor import _iter_source
        from yolo_tpu.nn.modules import Ctx
        from yolo_tpu.ops.letterbox import LetterBox

        lb = LetterBox((imgsz, imgsz), auto=False)
        ctx = Ctx(train=False, dtype=jnp.float32)
        # cache the jitted program per (layers, imgsz) — a fresh jit wrapper
        # per call would recompile the full forward every invocation
        key = (tuple(layers) if layers else None, imgsz)
        cache = getattr(self, "_embed_cache", None) or {}
        fn = cache.get(key)
        if fn is None:
            fn = jax.jit(lambda p, x: self.model.embed_features(p, x, ctx, idx=layers))
            cache[key] = fn
            self._embed_cache = cache
        out = []
        for img, _path, _ in _iter_source(source):
            x = jnp.asarray(lb(img)[None, ..., ::-1].astype(np.float32) / 255.0)
            out.append(np.asarray(fn(self.params, x))[0])
        return out


class RTDETR(YOLO):
    """RT-DETR facade (ref: models/rtdetr/model.py RTDETR:20) — same Model API,
    NMS-free query-based predictions."""

    def __init__(self, model="rtdetr-l.yaml", verbose: bool = False):
        super().__init__(model, task="detect", verbose=verbose)


class YOLOWorld(YOLO):
    """YOLO-World open-vocabulary facade (ref: models/yolo/model.py YOLOWorld).

    Text classes: `set_classes(["person", ...])` runs the native CLIP text
    tower (yolo_tpu.nn.text_model; exact with an imported clip checkpoint),
    or pass precomputed embeddings via `set_text_features(feats)`."""

    def __init__(self, model="yolov8s-world.yaml", verbose: bool = False):
        from yolo_tpu.nn.tasks import WorldModel

        self.task = "detect"
        self.overrides = {}
        self.predictor = None
        self.trainer = None
        self.metrics = None
        self.ckpt_path = None
        self.model = WorldModel(str(model), verbose=verbose)
        self.params = self.model.init(0)
        self.overrides["model"] = str(model)
        self.overrides["task"] = "detect"

    def set_classes(self, classes, **kwargs):
        """End-to-end text prompting via the native CLIP text tower
        (pass clip_ckpt=<openai clip .pt> for released-weight embeddings)."""
        self.model.set_classes(classes, **kwargs)
        self.predictor = None  # class count changed → new jit cache

    def set_text_features(self, txt_feats, names=None):
        self.model.set_text_features(txt_feats)
        if names:
            self.model.names = dict(enumerate(names))
        self.predictor = None  # class count changed → new jit cache


class YOLOE(YOLO):
    """YOLOE open-vocabulary facade (ref: models/yolo/model.py YOLOE).

    Prompt classes with precomputed text embeddings (set_text_features) or
    visual prompt masks (get_visual_pe/set_visual_pe)."""

    def __init__(self, model="yoloe-11s.yaml", verbose: bool = False):
        from yolo_tpu.nn.tasks import YOLOEModel

        self.task = "detect"
        self.overrides = {}
        self.predictor = None
        self.trainer = None
        self.metrics = None
        self.ckpt_path = None
        self.model = YOLOEModel(str(model), verbose=verbose)
        self.params = self.model.init(0)
        self.overrides["model"] = str(model)
        self.overrides["task"] = "detect"

    def set_classes(self, classes, **kwargs):
        """Text prompting via the native CLIP text tower (MobileCLIP-layout
        checkpoints import the same way; pass clip_ckpt=)."""
        self.model.set_classes(classes, params=self.params, **kwargs)
        self.predictor = None

    def set_text_features(self, txt_feats, names=None):
        self.model.set_text_features(self.params, txt_feats)
        if names:
            self.model.names = dict(enumerate(names))
        self.predictor = None

    def set_visual_prompts(self, image, prompt_masks, names=None):
        """Derive class prompts from (1, Q, H/8, W/8) masks on `image`."""
        import jax.numpy as jnp
        import numpy as np

        from yolo_tpu.ops.letterbox import LetterBox

        im = LetterBox((640, 640), auto=False)(image) if image.shape[:2] != (640, 640) else image
        x = jnp.asarray(im[None, ..., ::-1].astype(np.float32) / 255.0)
        vpe = self.model.get_visual_pe(self.params, x, jnp.asarray(prompt_masks))
        self.model.set_visual_pe(np.asarray(vpe))
        if names:
            self.model.names = dict(enumerate(names))
        self.predictor = None


class NAS(YOLO):
    """YOLO-NAS facade (ref: models/nas/model.py NAS:20).

    The reference wraps super_gradients' pickled deploy model; here the
    DEPLOY-form architecture (fused QARepVGG blocks, ReLU, SPP context, PAN
    neck, anchor-free DFL head) is native to the graph compiler — see
    cfg/models/nas/yolo_nas.yaml. Accepts 'yolo_nas_{s,m,l}' names, the
    unified yaml, or a saved .npz/orbax checkpoint.
    """

    def __init__(self, model: str = "yolo_nas_s", verbose: bool = False):
        name = str(model)
        if name.endswith(".pt"):
            raise ValueError(
                "super_gradients pickled checkpoints are not importable here; "
                "export the state_dict and load via yaml + torch_import instead"
            )
        if not name.endswith((".yaml", ".yml", ".npz")) and "yolo_nas" in name:
            name = f"{name}.yaml"
        super().__init__(name, task="detect", verbose=verbose)
