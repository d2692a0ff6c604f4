"""Detection trainer: one jitted data-parallel train step over a device mesh.

Reference counterpart: engine/trainer.py BaseTrainer:60/_do_train:345 +
models/yolo/detect/train.py. TPU re-design:

  - train step = pure fn (params, opt_state, ema, batch, lr, momentum) → updated
    state; jitted once; gradients all-reduce via shardings (no DDP, no GradScaler —
    bf16 on TPU needs no loss scaling).
  - BN running stats are collected functionally (ctx.stats) and folded into
    params inside the step (momentum 0.03, unbiased var — torch semantics).
  - Reference training recipe preserved: 3-group optimizer (decay only on conv
    weights), 'auto' optimizer selection, per-iter warmup interp of lr/momentum
    (ref :393-403), linear|cosine epoch LR, EMA decay ramp 0.9999·(1−e^(−t/2000)),
    close_mosaic, early stopping on fitness, results.csv, best/last checkpoints.
"""

from __future__ import annotations

import math
import os
import time
from pathlib import Path

import numpy as np

from yolo_tpu.cfg import DEFAULT_CFG_DICT, get_cfg, get_save_dir
from yolo_tpu.data.build import build_dataloader, build_yolo_dataset
from yolo_tpu.data.dataset import check_det_dataset
from yolo_tpu.nn.tasks import DetectionModel
from yolo_tpu.utils import LOGGER, yaml_save
from yolo_tpu.utils.callbacks import default_callbacks, run_callbacks
from yolo_tpu.utils.loss import v8DetectionLoss


class EarlyStopping:
    """Stop when fitness hasn't improved for `patience` epochs (ref: torch_utils.py:905)."""

    def __init__(self, patience: int = 100):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")

    def __call__(self, epoch: int, fitness: float | None) -> bool:
        if fitness is None:
            return False
        if fitness >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fitness
        stop = (epoch - self.best_epoch) >= self.patience
        if stop:
            LOGGER.info(f"early stopping at epoch {epoch} (best epoch {self.best_epoch})")
        return stop


def _transfer_matching(old, new):
    """Copy every leaf from `old` into `new` where the path exists and the
    shape matches (the reference's intersect_dicts, ref torch_utils.py:318) —
    used when the dataset's nc/kpt_shape forces a head rebuild so pretrained
    backbone/neck weights survive. Returns (tree, n_kept, n_total)."""
    import jax

    kept = total = 0

    def walk(o, n):
        nonlocal kept, total
        out = {}
        for k, v in n.items():
            ov = o.get(k) if isinstance(o, dict) else None
            if isinstance(v, dict):
                out[k] = walk(ov, v) if isinstance(ov, dict) else v
                if not isinstance(ov, dict):
                    total += len(jax.tree_util.tree_leaves(v))
            else:
                total += 1
                if ov is not None and not isinstance(ov, dict) and getattr(ov, "shape", None) == v.shape:
                    out[k] = ov
                    kept += 1
                else:
                    out[k] = v
        return out

    return walk(old, new), kept, total


class DetectionTrainer:
    """Trains a DetectionModel on a YOLO-format dataset."""

    def __init__(self, overrides: dict | None = None, model=None, params=None):
        overrides = {k: v for k, v in (overrides or {}).items() if k in DEFAULT_CFG_DICT}
        self.args = get_cfg(overrides=overrides)
        self.save_dir = get_save_dir(self.args)
        self.wdir = self.save_dir / "weights"
        from yolo_tpu.utils.callbacks import add_integration_callbacks

        # TB + experiment-tracker integrations (ref: trainer.py:~150
        # callbacks.add_integration_callbacks(self)); guarded imports make
        # missing SDKs a no-op
        self.callbacks = add_integration_callbacks(dict(default_callbacks()))
        self.metrics = None
        self.best_fitness = 0.0
        self.best_params = None
        self.epoch_time = None

        # data
        self.data = check_det_dataset(self.args.data) if self.args.data else None
        nc = self.data["nc"] if self.data else None

        # model
        pretrained = model is not None and params is not None
        if model is not None:
            self.model = model
            self.params = params if params is not None else model.init(self.args.seed)
        else:
            self.model = DetectionModel(self.args.model or "yolov8n.yaml", nc=nc)
            self.params = self.model.init(self.args.seed)
        if isinstance(getattr(self.args, "pretrained", None), str):
            # pretrained=<path>: initialize from a checkpoint's weights with
            # shape-matched transfer (ref trainer get_model weights= /
            # intersect_dicts) — the model arch still comes from args.model
            from yolo_tpu.engine.model import YOLO

            src = YOLO(self.args.pretrained)
            self.params, kept, total = _transfer_matching(src.params, self.params)
            LOGGER.info(f"transferred {kept}/{total} tensors from pretrained {self.args.pretrained}")
            pretrained = True
        if self.data and self.model.nc != self.data["nc"]:
            old_params = self.params
            self.model = type(self.model)(self.model.yaml, nc=self.data["nc"])  # keep task subclass
            self.params = self.model.init(self.args.seed)
            if pretrained:
                # reference intersect_dicts: keep every pretrained tensor whose
                # shape survives the nc change (only the nc-dependent head
                # convs re-initialize) — without this, fine-tuning a .pt on a
                # different-nc dataset silently trained from scratch
                self.params, kept, total = _transfer_matching(old_params, self.params)
                LOGGER.info(f"transferred {kept}/{total} pretrained tensors (nc {self.model.nc} head re-initialized)")
        if (
            self.data
            and self.data.get("kpt_shape")
            and getattr(getattr(self.model, "head", None), "kpt_shape", None) not in (None, tuple(self.data["kpt_shape"]))
        ):
            # dataset kpt_shape overrides the model yaml (ref: pose/train.py get_model)
            yaml_d = dict(self.model.yaml) if isinstance(self.model.yaml, dict) else self.model.yaml
            if isinstance(yaml_d, dict):
                yaml_d["kpt_shape"] = list(self.data["kpt_shape"])
            old_params = self.params
            self.model = type(self.model)(yaml_d, nc=self.data["nc"])
            self.params = self.model.init(self.args.seed)
            if pretrained:
                self.params, kept, total = _transfer_matching(old_params, self.params)
                LOGGER.info(f"transferred {kept}/{total} pretrained tensors (kpt head re-initialized)")
        if self.data:
            self.model.names = self.data["names"]
        self.loss_fn = self._make_loss()
        self.stopper = EarlyStopping(self.args.patience)
        self.start_epoch = 0
        self._check_resume()

        # AFTER resume — _check_resume may replace self.model/self.params with
        # the checkpoint's (whose constructor installs placeholder txt_feats),
        # which would discard embeddings applied earlier
        clip_ckpt = getattr(self.args, "clip_ckpt", None)  # real CLIP weights if provided (else a loud random-tower warning)
        if self.data and getattr(self.model, "is_world", False):
            # world fine-tuning (ref: models/yolo/world/train.py WorldTrainer
            # preprocess_batch:168): the close-set class names embed once via
            # the text tower and ride the forward as the region-text guide
            self.model.set_classes(list(self.data["names"].values()), clip_ckpt=clip_ckpt)
        if self.data and getattr(self.model, "is_yoloe", False):
            # yoloe fine-tuning (ref: models/yolo/yoloe/train.py): text prompts
            # through the head's SwiGLU residual become the class embeddings
            self.model.set_classes(list(self.data["names"].values()), params=self.params, clip_ckpt=clip_ckpt)

    def _check_resume(self):
        """Resume params/epoch from last.npz (ref: trainer.py check_resume:762).

        Optimizer/EMA state restart fresh — on TPU the cost of re-warming Adam
        moments is negligible next to re-running epochs; params + epoch counter
        are what matter for continuing a run.
        """
        resume = self.args.resume
        if not resume:
            return
        from yolo_tpu.engine.exporter import load_npz

        ckpt = resume if isinstance(resume, str) and resume not in ("True", "true") else self.wdir / "last.npz"
        ckpt = Path(ckpt)
        if not ckpt.exists():
            raise FileNotFoundError(f"resume checkpoint not found: {ckpt}")
        self.model, self.params, meta = load_npz(ckpt)
        self.loss_fn = self._make_loss()
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        LOGGER.info(f"resuming from {ckpt} at epoch {self.start_epoch}")

    def _make_loss(self):
        if getattr(self.model, "is_rtdetr", False):
            from yolo_tpu.utils.detr_loss import RTDETRDetectionLoss

            return RTDETRDetectionLoss(self.model, self.args)
        task = getattr(self.model, "task", "detect")
        if task == "segment":
            from yolo_tpu.utils.loss import v8SegmentationLoss

            return v8SegmentationLoss(self.model, self.args)
        if task == "pose":
            from yolo_tpu.utils.loss import v8PoseLoss

            return v8PoseLoss(self.model, self.args)
        if task == "obb":
            from yolo_tpu.utils.loss import v8OBBLoss

            return v8OBBLoss(self.model, self.args)
        if getattr(getattr(self.model, "head", None), "end2end", False) and type(self.model.head).__name__ == "v10Detect":
            from yolo_tpu.utils.loss import E2EDetectLoss

            return E2EDetectLoss(self.model, self.args)
        return v8DetectionLoss(self.model, self.args)

    # --- optimizer ----------------------------------------------------------------

    def build_optimizer(self, iterations: int):
        """Auto SGD/AdamW with the reference's selection + grouping rules."""
        from yolo_tpu.utils.optim import build_optimizer

        name = self.args.optimizer
        lr0, momentum = self.args.lr0, self.args.momentum
        if name == "auto":
            nc = self.model.nc
            lr_fit = round(0.002 * 5 / (4 + nc), 6)
            name, lr0, momentum = ("SGD", 0.01, 0.9) if iterations > 10000 else ("AdamW", lr_fit, 0.9)
            self.args.warmup_bias_lr = 0.0
            LOGGER.info(f"optimizer=auto → {name}(lr={lr0}, momentum={momentum})")
        self.args.lr0, self.args.momentum = lr0, momentum

        # effective weight decay scaled like reference (batch*accumulate/nbs)
        accumulate = max(round(self.args.nbs / max(self.args.batch, 1)), 1)
        decay = self.args.weight_decay * self.args.batch * accumulate / self.args.nbs
        return build_optimizer(name, decay)

    def lr_lambda(self, epoch: int) -> float:
        """Epoch LR factor: cosine or linear to lrf (ref :232)."""
        e, lrf = self.args.epochs, self.args.lrf
        if self.args.cos_lr:
            return ((1 - math.cos(epoch * math.pi / e)) / 2) * (lrf - 1) + 1
        return (1 - epoch / e) * (1.0 - lrf) + lrf

    # --- jitted step -----------------------------------------------------------------

    def _build_step(self, mesh):
        import jax
        import jax.numpy as jnp

        model, loss_fn = self.model, self.loss_fn
        dtype = jnp.bfloat16 if self.args.amp else jnp.float32

        # s2d packed stem for the TRAIN forward (nn/s2d.py stem_apply_train):
        # at small batch the P1 activation lane-pads 8x (r4 train roofline's
        # 335.5 MB x4 buffer); the packed form pads 2x. Won the on-chip A/B
        # (274.6 vs 256.6 imgs/s @b16 recipe, 2026-08-21) — DEFAULT ON for
        # TPU backends with a qualifying stem (standard yolov8 3x3/s2, no
        # skip consumer of layers 0-1). YOLO_TPU_TRAIN_S2D=0 kills; =4 forces
        # on other backends (CPU tests keep the standard walk by default to
        # hold the suite's compile budget).
        import os as _os

        import jax as _jax

        _s2d_default = "4" if _jax.default_backend() == "tpu" else "0"
        s2d_r = int(_os.getenv("YOLO_TPU_TRAIN_S2D", _s2d_default) or 0)
        if s2d_r:
            try:
                from yolo_tpu.nn.s2d import validate_stem

                assert s2d_r == 4, f"train s2d supports r=4 only, got {s2d_r}"
                validate_stem(model)
                assert not any(i < 2 for i in model.save), "layers 0-1 are skip sources"
                assert not bool(getattr(self.args, "multi_scale", False)), "multi_scale resizes per step"
            except Exception as e:
                LOGGER.warning(f"train s2d stem disabled: {e}")
                s2d_r = 0

        def forward_loss(params, batch):
            from yolo_tpu.nn.modules import Ctx

            ctx = Ctx(train=True, dtype=dtype, remat=bool(getattr(self.args, "remat", False)))
            if "dn_cls" in batch:  # RT-DETR contrastive denoising (utils/cdn.py)
                from yolo_tpu.utils.cdn import cdn_attn_mask

                D = batch["dn_cls"].shape[1]
                N = batch["cls"].shape[1]
                ctx.dn = {
                    "dn_cls": batch["dn_cls"],
                    "dn_bbox": batch["dn_bbox"],
                    "dn_valid": batch["dn_valid"],
                    "attn_mask": cdn_attn_mask(D // (2 * N), N, model.head.nq),
                }
            if s2d_r:
                from yolo_tpu.nn.s2d import pack_input, stem_apply_train

                # pack the uint8 frames FIRST (byte shuffle), so the cast and
                # /255 land on the dense packed layout — the full-resolution
                # (B, H, W, C) float input never materializes
                xp = pack_input(batch["img"], s2d_r).astype(dtype) / 255.0
                act = stem_apply_train(params["model"]["0"], params["model"]["1"], xp, ctx)
                feats = model.forward_features(params, act, ctx, start=2)
            else:
                x = batch["img"].astype(dtype) / 255.0
                feats = model.forward_features(params, x, ctx)
            total, comps = loss_fn(feats, batch)
            return total, (comps, ctx.stats)

        from yolo_tpu.utils.optim import apply_bn_stats

        opt = self.opt

        # frozen layers (ref: trainer.py:261-267 freeze_layer_names): int n =
        # first n layer indices, or an explicit index list. The frozen
        # subtrees are restored after the optimizer step — masking grads alone
        # would still let weight decay / momentum drift them (torch
        # requires_grad=False freezes both). BN running stats keep updating,
        # like frozen torch BN modules left in train mode.
        fz = getattr(self.args, "freeze", None)
        if isinstance(fz, str):  # CLI "freeze=10" / "freeze=4,6,9"
            fz = [int(x) for x in fz.replace("[", "").replace("]", "").split(",") if x.strip()]
        frozen = frozenset(
            str(int(i))
            for i in (range(int(fz)) if isinstance(fz, (int, float)) else fz or [])
        )
        if frozen:
            LOGGER.info(f"freezing layers {sorted(frozen, key=int)}")

        def train_step(params, opt_state, ema_params, ema_updates, batch, lr, mom, lr_bias):
            (total, (comps, stats)), grads = jax.value_and_grad(forward_loss, has_aux=True)(params, batch)
            new_params, opt_state = opt.update(grads, opt_state, params, lr, mom, lr_bias=lr_bias)
            if frozen:
                new_params = {
                    **new_params,
                    "model": {
                        k: (params["model"][k] if k in frozen else v)
                        for k, v in new_params["model"].items()
                    },
                }
            params = apply_bn_stats(new_params, stats)
            # EMA with reference ramp (ref: torch_utils.py ModelEMA:646)
            ema_updates = ema_updates + 1
            d = 0.9999 * (1 - jnp.exp(-ema_updates / 2000.0))
            ema_params = jax.tree_util.tree_map(lambda e, p: d * e + (1 - d) * p, ema_params, params)
            return params, opt_state, ema_params, ema_updates, comps

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P(mesh.axis_names[0]))  # cfg mesh_axes
            # donation audit: params/opt_state/ema_params alias their outputs
            # (in-place update, halves peak param memory); ema_updates (3) is a
            # clean scalar alias; the batch (4) is fresh every step and never
            # read after the call, so its HBM is freed for scratch during the
            # step instead of surviving until the next upload
            return jax.jit(
                train_step,
                in_shardings=(repl, repl, repl, repl, data, None, None),
                out_shardings=(repl, repl, repl, repl, repl),
                donate_argnums=(0, 1, 2, 3, 4) if self.args.donate else (),
            )
        # no-mesh path: the batch arrives as host numpy (not donatable — jax
        # would warn every compile), so only the state args are donated here
        return jax.jit(train_step, donate_argnums=(0, 1, 2, 3) if self.args.donate else ())

    # --- training loop ---------------------------------------------------------------

    def train(self):
        import jax
        import jax.numpy as jnp

        args = self.args
        if self.data is None:
            raise ValueError("trainer needs data=<dataset.yaml>")
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.wdir.mkdir(parents=True, exist_ok=True)
        yaml_save(self.save_dir / "args.yaml", vars(args))

        stride = int(max(self.model.stride))
        if args.batch == -1:  # autobatch: largest power-of-two that fits (ref: utils/autobatch.py)
            from yolo_tpu.utils.profilers import autobatch

            imgsz = args.imgsz if isinstance(args.imgsz, int) else max(args.imgsz)
            args.batch = autobatch(self.model, self.params, imgsz=imgsz)
        trainset = build_yolo_dataset(args, self.data["train"], args.batch, self.data, mode="train", stride=stride)
        if args.plots:  # dataset label statistics (ref: trainer plot_training_labels)
            try:
                from yolo_tpu.utils.plotting import plot_labels

                all_b = np.concatenate([lb["bboxes"] for lb in trainset.labels]) if trainset.labels else np.zeros((0, 4))
                all_c = np.concatenate([lb["cls"] for lb in trainset.labels]) if trainset.labels else np.zeros((0,))
                self.save_dir.mkdir(parents=True, exist_ok=True)
                plot_labels(all_b, all_c, names=self.data.get("names", {}), save_path=self.save_dir / "labels.png")
            except Exception as e:
                LOGGER.warning(f"label plot failed: {e}")
        self.train_loader = build_dataloader(
            trainset, args.batch, workers=args.workers, shuffle=True, seed=args.seed,
            drop_last=len(trainset) > args.batch,
            overlap_mask=bool(getattr(args, "overlap_mask", True)),  # seg gt encoding (ref Format overlap)
            mask_ratio=int(getattr(args, "mask_ratio", 4) or 4),
        )
        nb = max(len(self.train_loader), 1)
        # auto-optimizer selection counts nominal-batch iterations, NOT loader
        # steps (ref: trainer build_optimizer — ceil(len(ds)/max(batch, nbs)) *
        # epochs); using nb*epochs overstated it 4x at batch 16/nbs 64 and
        # flipped small-dataset runs from AdamW to SGD at 100x the lr
        iterations = math.ceil(len(trainset) / max(args.batch, args.nbs)) * args.epochs
        self.opt = self.build_optimizer(iterations)

        # bf16 numeric sanity run before enabling mixed precision (ref:
        # utils/checks.py check_amp:735 runs a real fwd compare and falls back
        # to fp32 when the halved path disagrees). Env kill-switch for test
        # speed: YOLO_TPU_SKIP_AMP_CHECK=1.
        if args.amp and os.environ.get("YOLO_TPU_SKIP_AMP_CHECK") != "1":
            from yolo_tpu.utils.checks import check_amp

            try:
                if not check_amp(self.model, self.params):
                    LOGGER.warning("AMP sanity check failed — training with float32")
                    args.amp = False
            except Exception as e:  # unsupported predict signature (e.g. prompts) → keep amp
                LOGGER.warning(f"AMP sanity check skipped: {e}")

        n_dev = args.n_devices or 1
        mesh = None
        if n_dev > 1:
            from yolo_tpu.parallel.mesh import get_mesh

            mesh = get_mesh(n_dev, axis=str(getattr(args, "mesh_axes", "batch") or "batch"))
            LOGGER.info(f"data-parallel over mesh {mesh}")
        step_fn = self._build_step(mesh)

        params = self.params
        opt_state = self.opt.init(params)
        # real copy — params and EMA are both donated by the step, so they must
        # not alias the same device buffers
        ema_params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
        ema_updates = jnp.zeros((), jnp.float32)
        state_dir = self.wdir / "train_state"
        if self.args.resume and (state_dir / "state").exists():
            # full resume: optimizer moments + EMA + step counter (the npz-based
            # _check_resume already restored params/epoch as a fallback)
            from yolo_tpu.engine.exporter import load_train_state

            st = load_train_state(
                state_dir,
                {"params": params, "opt_state": opt_state, "ema_params": ema_params, "ema_updates": ema_updates},
            )
            params, opt_state = st["params"], st["opt_state"]
            ema_params, ema_updates = st["ema_params"], st["ema_updates"]
            LOGGER.info(f"restored full train state (optimizer + EMA) from {state_dir}")
        if mesh is not None:
            from yolo_tpu.parallel.mesh import replicate

            params, opt_state, ema_params = replicate((params, opt_state, ema_params), mesh)

        nw = max(round(args.warmup_epochs * nb), 100) if args.warmup_epochs > 0 else -1
        # integrations (wandb/mlflow/clearml/comet/dvc) initialize their runs
        # on this hook (ref: every callbacks/*.py registers on_pretrain_routine_start)
        run_callbacks(self.callbacks, "on_pretrain_routine_start", self)
        run_callbacks(self.callbacks, "on_train_start", self)
        csv_rows = []
        t_train = time.time()
        ni = self.start_epoch * nb
        task = getattr(self.model, "task", "detect")
        comp_names = {
            "segment": ["box", "seg", "cls", "dfl"],
            "pose": ["box", "pose", "kobj", "cls", "dfl"],
        }.get(task, ["box", "cls", "dfl"])
        if getattr(self.model, "is_rtdetr", False):
            comp_names = ["giou", "cls", "l1"]
        from yolo_tpu.utils.loss import E2EDetectLoss

        if isinstance(self.loss_fn, E2EDetectLoss):  # v10 dual branches logged separately (ref E2EDetectLoss:790)
            comp_names = [f"{n}_o2m" for n in comp_names] + [f"{n}_o2o" for n in comp_names]
        n_comp = len(comp_names)
        last_comps = np.zeros(n_comp)
        for epoch in range(self.start_epoch, args.epochs):
            run_callbacks(self.callbacks, "on_train_epoch_start", self)
            self.epoch = epoch
            # >= (not ==): a resume that lands past the threshold must still
            # close mosaic for the remaining clean fine-tune epochs
            if args.close_mosaic and epoch >= max(args.epochs - args.close_mosaic, 0) \
                    and getattr(trainset.transforms, "mosaic_enabled", False):
                LOGGER.info("closing mosaic/mixup augmentation")
                trainset.close_mosaic()
            self.train_loader.set_epoch(epoch)
            lr_epoch = args.lr0 * self.lr_lambda(epoch)
            t0 = time.time()
            epoch_losses = []
            from yolo_tpu.utils.tqdm import TQDM

            pbar = TQDM(total=nb, desc=f"epoch {epoch + 1}/{args.epochs}", unit="batch")
            for batch in self.train_loader:
                # first-epoch train-batch mosaics (ref: trainer plot_training_samples)
                if args.plots and epoch == self.start_epoch and ni - self.start_epoch * nb < 3:
                    try:
                        from yolo_tpu.utils.plotting import plot_images

                        plot_images(batch, fname=self.save_dir / f"train_batch{ni - self.start_epoch * nb}.jpg",
                                    names=getattr(self.model, "names", {}))
                    except Exception as e:
                        LOGGER.warning(f"train-batch plot failed: {e}")
                # warmup interpolation (per iteration, ref :393-403)
                if ni <= nw:
                    xi = [0, nw]
                    lr = float(np.interp(ni, xi, [0.0, lr_epoch]))
                    # biases warm from warmup_bias_lr, not 0 (ref :397 — the
                    # j==0 param group is the bias group)
                    lr_bias = float(np.interp(ni, xi, [args.warmup_bias_lr, lr_epoch]))
                    mom = float(np.interp(ni, xi, [args.warmup_momentum, args.momentum]))
                else:
                    lr, mom, lr_bias = lr_epoch, args.momentum, lr_epoch
                dev_batch = {k: v for k, v in batch.items() if k != "meta"}
                if getattr(args, "multi_scale", False) and "masks" not in dev_batch:
                    # TPU multi-scale: the reference rescales to a random size
                    # per batch (detect/train.py :105) — dynamic shapes would
                    # recompile unboundedly under jit, so sizes come from a
                    # STATIC ladder (5 entries -> 5 cached executables); labels
                    # are normalized, only pixels move (host cv2 resize)
                    import cv2

                    bh, bw = dev_batch["img"].shape[1], dev_batch["img"].shape[2]
                    # one uniform scale factor per batch (ref detect/train.py:105
                    # sf = sz / max(shape)) — both dims scale together, stride-
                    # rounded per dim, so rectangular batches keep their aspect.
                    # NOTE: names must not shadow `nw` (the warmup horizon).
                    ladder = (0.5, 0.75, 1.0, 1.25, 1.5)  # static → bounded jit cache
                    sf = ladder[np.random.default_rng(ni).integers(len(ladder))]
                    sh = max(int(bh * sf) // stride * stride, stride)
                    sw = max(int(bw * sf) // stride * stride, stride)
                    if (sh, sw) != (bh, bw):
                        # cv2.resize drops a trailing 1-channel axis — re-expand
                        dev_batch["img"] = np.stack(
                            [r[..., None] if r.ndim == 2 else r for r in (cv2.resize(im, (sw, sh)) for im in dev_batch["img"])]
                        )
                if getattr(self.model, "is_rtdetr", False):
                    from yolo_tpu.utils.cdn import make_cdn_batch

                    dn = make_cdn_batch(dev_batch, self.model.nc)
                    dev_batch.update({k: dn[k] for k in ("dn_cls", "dn_bbox", "dn_valid")})
                if mesh is not None:
                    from yolo_tpu.parallel.mesh import shard_batch

                    dev_batch = shard_batch(dev_batch, mesh)
                params, opt_state, ema_params, ema_updates, comps = step_fn(
                    params, opt_state, ema_params, ema_updates, dev_batch, lr, mom, lr_bias
                )
                epoch_losses.append(comps)
                ni += 1
                pbar.update(1)
            pbar.close()
            if epoch_losses:
                last_comps = np.mean([np.asarray(jax.device_get(c)) for c in epoch_losses], axis=0)
            self.epoch_time = time.time() - t0

            # validation on EMA params
            fitness = None
            if args.val:
                self.metrics = self.validate(ema_params)
                fitness = self.metrics.get("fitness", 0.0)
                if fitness >= self.best_fitness:
                    self.best_fitness = fitness
                    self.best_params = jax.device_get(ema_params)
                    self.save_checkpoint(self.wdir / "best.npz", ema_params)
            comp_str = " ".join(f"{nme} {v:.4f}" for nme, v in zip(comp_names, last_comps))
            LOGGER.info(
                f"epoch {epoch + 1}/{args.epochs} {comp_str} lr {lr_epoch:.5f} {self.epoch_time:.1f}s"
                + (f" fitness {fitness:.4f}" if fitness is not None else "")
            )
            row = {
                "epoch": epoch,
                "time": time.time() - t_train,
                **{f"train/{nme}_loss": float(v) for nme, v in zip(comp_names, last_comps)},
                "lr": lr_epoch,
                **{f"metrics/{k}": v for k, v in (self.metrics or {}).items()},
            }
            self._last_row = row  # consumed by the tracker integrations
            csv_rows.append(row)
            self._write_csv(csv_rows)
            if args.save:
                self.save_checkpoint(self.wdir / "last.npz", ema_params, extra={"epoch": epoch})
                from yolo_tpu.engine.exporter import save_train_state

                save_train_state(
                    self.wdir / "train_state",
                    {"params": params, "opt_state": opt_state, "ema_params": ema_params, "ema_updates": ema_updates},
                )
                if args.save_period > 0 and (epoch + 1) % args.save_period == 0:
                    self.save_checkpoint(self.wdir / f"epoch{epoch}.npz", ema_params)
                # checkpoint hook (ref: trainer.py save_model → on_model_save;
                # the hub session uploads last.npz from it)
                run_callbacks(self.callbacks, "on_model_save", self)
            run_callbacks(self.callbacks, "on_fit_epoch_end", self)
            if self.stopper(epoch, fitness):
                break

        self.params = jax.device_get(params)
        self.ema_params = jax.device_get(ema_params)
        if self.best_params is None:
            self.best_params = self.ema_params
        run_callbacks(self.callbacks, "on_train_end", self)
        LOGGER.info(f"training done in {(time.time() - t_train) / 3600:.2f}h; best fitness {self.best_fitness:.4f}")
        return self.metrics

    def validate(self, params):
        if getattr(self.model, "task", "detect") == "segment":
            from yolo_tpu.engine.validator import SegmentationValidator

            v = SegmentationValidator(args={**vars(self.args), "mode": "val"}, data=self.data)
            return v(model=self.model, params=params)
        if getattr(self.model, "is_rtdetr", False):
            from yolo_tpu.engine.validator import RTDETRValidator

            v = RTDETRValidator(args={**vars(self.args), "mode": "val"}, data=self.data)
            return v(model=self.model, params=params)
        if getattr(self.model, "task", "detect") == "obb":
            from yolo_tpu.engine.validator import OBBValidator

            v = OBBValidator(args={**vars(self.args), "mode": "val"}, data=self.data)
            return v(model=self.model, params=params)
        if getattr(self.model, "task", "detect") == "pose":
            from yolo_tpu.engine.validator import PoseValidator

            v = PoseValidator(args={**vars(self.args), "mode": "val"}, data=self.data)
            return v(model=self.model, params=params)
        from yolo_tpu.engine.validator import DetectionValidator

        v = DetectionValidator(args={**vars(self.args), "mode": "val"}, data=self.data)
        return v(model=self.model, params=params)

    def save_checkpoint(self, path, params, extra: dict | None = None):
        import jax

        from yolo_tpu.engine.exporter import save_npz

        save_npz(self.model, jax.device_get(params), path, meta={"args": vars(self.args), **(extra or {})})

    def _write_csv(self, rows):
        import csv

        keys = sorted({k for r in rows for k in r}, key=lambda k: (k != "epoch", k))
        with open(self.save_dir / "results.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(rows)
