"""Classification task: dataset, trainer, validator, predict.

Reference counterparts: models/yolo/classify/{train,val,predict}.py +
data/dataset.py ClassificationDataset:714. Compact single-file task: folder-per-
class datasets, cross-entropy training on the shared optimizer stack, top1/top5
validation.
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

from yolo_tpu.cfg import DEFAULT_CFG_DICT, get_cfg, get_save_dir
from yolo_tpu.nn.tasks import ClassificationModel
from yolo_tpu.utils import LOGGER, yaml_save

IMG_EXTS = {".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".webp"}


class ClassificationDataset:
    """root/<class_name>/*.jpg layout (torchvision ImageFolder convention)."""

    def __init__(self, root, imgsz: int = 224, augment: bool = False, fliplr: float = 0.5,
                 erasing: float = 0.0, auto_augment: str | None = None):
        root = Path(root)
        classes = sorted(d.name for d in root.iterdir() if d.is_dir())
        if not classes:
            raise FileNotFoundError(f"no class folders under {root}")
        self.names = dict(enumerate(classes))
        self.samples = []
        for ci, c in enumerate(classes):
            for f in sorted((root / c).rglob("*")):
                if f.suffix.lower() in IMG_EXTS:
                    self.samples.append((str(f), ci))
        self.imgsz = imgsz
        self.augment = augment
        self.fliplr = fliplr
        self.erasing = erasing
        self.auto_augment = auto_augment

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        import cv2

        path, cls = self.samples[i]
        from yolo_tpu.utils.files import imread
        img = imread(path)
        if img is None:
            raise FileNotFoundError(f"unreadable image {path}")
        img = cv2.resize(img, (self.imgsz, self.imgsz), interpolation=cv2.INTER_LINEAR)
        if self.augment:
            if self.auto_augment:
                from yolo_tpu.data.augment import rand_augment

                img = rand_augment(img, np.random)
            if np.random.random() < self.fliplr:
                img = np.fliplr(img)
            if self.erasing > 0 and np.random.random() < self.erasing:
                # random erasing (ref classify_augmentations erasing=0.4;
                # torchvision RandomErasing defaults: area 2-33%, aspect 0.3-3.3)
                img = np.ascontiguousarray(img)
                H, W = img.shape[:2]
                for _ in range(10):
                    area = np.random.uniform(0.02, 0.33) * H * W
                    ar = np.exp(np.random.uniform(np.log(0.3), np.log(3.3)))
                    eh, ew = int(round(np.sqrt(area * ar))), int(round(np.sqrt(area / ar)))
                    if eh < H and ew < W:
                        y0, x0 = np.random.randint(0, H - eh), np.random.randint(0, W - ew)
                        img[y0 : y0 + eh, x0 : x0 + ew] = 0
                        break
        return np.ascontiguousarray(img), cls

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0, epoch: int = 0, drop_last: bool = True):
        """With drop_last=False the trailing partial batch is PADDED to
        batch_size (one compiled shape) and yielded with labels=-1 on the pad
        rows, so validation scores every image instead of silently skipping
        the tail (len % batch images)."""
        idx = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed + epoch).shuffle(idx)
        end = len(idx) if not drop_last else len(idx) - batch_size + 1
        for s in range(0, max(end, 1 if not drop_last and len(idx) else 0), batch_size):
            sel = idx[s : s + batch_size]
            if not len(sel):
                break
            imgs = np.stack([self[i][0] for i in sel])
            labels = np.array([self.samples[i][1] for i in sel], np.int32)
            if len(sel) < batch_size:  # pad; -1 labels never match predictions
                pad = batch_size - len(sel)
                imgs = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
                labels = np.concatenate([labels, np.full((pad,), -1, np.int32)])
            yield imgs, labels


class ClassificationTrainer:
    """Cross-entropy training of a ClassificationModel."""

    def __init__(self, overrides: dict | None = None, model=None, params=None):
        overrides = {k: v for k, v in (overrides or {}).items() if k in DEFAULT_CFG_DICT}
        self.args = get_cfg(overrides=overrides)
        self.save_dir = get_save_dir(self.args)
        self.model = model
        self.params = params
        self.metrics = None
        self.best_params = None

    def train(self):
        import jax
        import jax.numpy as jnp

        from yolo_tpu.nn.modules import Ctx
        from yolo_tpu.utils.optim import AdamW

        args = self.args
        root = Path(args.data)
        train_ds = ClassificationDataset(
            root / "train" if (root / "train").exists() else root, imgsz=args.imgsz, augment=True,
            fliplr=args.fliplr, erasing=float(getattr(args, "erasing", 0.0) or 0.0),
            auto_augment=getattr(args, "auto_augment", None),
        )
        val_dir = root / "val" if (root / "val").exists() else (root / "train" if (root / "train").exists() else root)
        val_ds = ClassificationDataset(val_dir, imgsz=args.imgsz)
        nc = len(train_ds.names)
        if self.model is None:
            self.model = ClassificationModel(args.model or "yolov8n-cls.yaml", nc=nc)
            self.params = self.model.init(args.seed)
        elif getattr(self.model, "nc", None) != nc:
            # rebuild for the dataset's class count (the facade always passes a
            # model, so without this the head would keep the yaml default nc
            # while names shrank — DetectionTrainer does the same rebuild)
            cfg = self.model.yaml if isinstance(getattr(self.model, "yaml", None), (str, dict)) else args.model or "yolov8n-cls.yaml"
            self.model = ClassificationModel(cfg, nc=nc)
            self.params = self.model.init(args.seed)
        self.model.names = train_ds.names
        model = self.model

        opt = AdamW(weight_decay=args.weight_decay)
        opt_state = opt.init(self.params)
        dtype = jnp.bfloat16 if args.amp else jnp.float32

        dropout = float(getattr(args, "dropout", 0.0) or 0.0)

        def loss_fn(p, imgs, labels, key):
            ctx = Ctx(train=True, dtype=dtype, dropout=dropout, rng=key)
            x = imgs[..., ::-1].astype(dtype) / 255.0
            logits = model.forward_features(p, x, ctx)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()
            return nll, ctx.stats

        from yolo_tpu.utils.optim import apply_bn_stats as apply_stats

        @jax.jit
        def step(p, opt_state, imgs, labels, lr, key):
            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, imgs, labels, key)
            p, opt_state = opt.update(grads, opt_state, p, lr, 0.9)
            p = apply_stats(p, stats)
            return p, opt_state, loss

        params = self.params
        best_top1 = -1.0
        self.save_dir.mkdir(parents=True, exist_ok=True)
        yaml_save(self.save_dir / "args.yaml", vars(args))
        t0 = time.time()
        for epoch in range(args.epochs):
            lr = args.lr0 * ((1 - epoch / args.epochs) * (1 - args.lrf) + args.lrf)
            losses = []
            for bi, (imgs, labels) in enumerate(train_ds.batches(min(args.batch, len(train_ds)), seed=args.seed, epoch=epoch)):
                key = jax.random.PRNGKey(args.seed * 100003 + epoch * 9973 + bi)  # dropout rng
                params, opt_state, loss = step(params, opt_state, imgs, labels, lr, key)
                losses.append(float(loss))
            self.metrics = self.validate(params, val_ds)
            LOGGER.info(
                f"epoch {epoch + 1}/{args.epochs} loss {np.mean(losses):.4f} "
                f"top1 {self.metrics['top1']:.3f} top5 {self.metrics['top5']:.3f}"
            )
            if self.metrics["top1"] > best_top1:
                best_top1 = self.metrics["top1"]
                self.best_params = jax.device_get(params)
        self.params = jax.device_get(params)
        if self.best_params is None:
            self.best_params = self.params
        if args.save:
            from yolo_tpu.engine.exporter import save_npz

            (self.save_dir / "weights").mkdir(exist_ok=True)
            save_npz(self.model, self.best_params, self.save_dir / "weights" / "best.npz")
        LOGGER.info(f"classify training done in {time.time() - t0:.1f}s; best top1 {best_top1:.3f}")
        self.metrics["fitness"] = best_top1
        return self.metrics

    def validate(self, params, dataset) -> dict:
        import jax
        import jax.numpy as jnp

        model = self.model
        infer = getattr(self, "_val_infer", None)
        if infer is None:  # compile once, not per epoch
            @jax.jit
            def infer(p, imgs):
                return model.predict(p, imgs[..., ::-1].astype(jnp.float32) / 255.0)

            self._val_infer = infer

        top1 = top5 = n = 0
        for imgs, labels in dataset.batches(min(self.args.batch, len(dataset)), shuffle=False, drop_last=False):
            probs = np.asarray(infer(params, imgs))
            real = labels >= 0  # padded tail rows carry label -1
            order = np.argsort(-probs, axis=-1)
            top1 += ((order[:, 0] == labels) & real).sum()
            top5 += (np.any(order[:, :5] == labels[:, None], axis=-1) & real).sum()
            n += int(real.sum())
        return {"top1": top1 / max(n, 1), "top5": top5 / max(n, 1)}


class ClassificationValidator:
    """Standalone top1/top5 evaluation with the validator call convention
    (Model.val dispatches here for classify; ref: models/yolo/classify/val.py
    ClassificationValidator:23). Reuses ClassificationTrainer.validate's
    cached compiled program."""

    def __init__(self, args=None, data=None):
        overrides = {k: v for k, v in (args or {}).items() if k in DEFAULT_CFG_DICT}
        self.args = get_cfg(overrides=overrides)

    def __call__(self, model, params) -> dict:
        root = Path(self.args.data)
        val_dir = root / "val" if (root / "val").exists() else (root / "train" if (root / "train").exists() else root)
        ds = ClassificationDataset(val_dir, imgsz=self.args.imgsz)
        t = ClassificationTrainer(overrides=vars(self.args), model=model, params=params)
        metrics = t.validate(params, ds)
        LOGGER.info(f"classify val: top1 {metrics['top1']:.3f} top5 {metrics['top5']:.3f} ({len(ds)} images)")
        metrics["fitness"] = metrics["top1"]
        return metrics
