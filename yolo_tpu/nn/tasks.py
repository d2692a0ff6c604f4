"""YAML→model compiler and task models.

Re-implements the reference graph compiler semantics (ref: ultralytics/nn/tasks.py
parse_model:1524, DetectionModel:374, yaml_model_load:1703) as a *build-time*
constructor emitting a static list of functional layers. At runtime the forward
is a plain Python loop over that list — traced once by jit, so the whole graph
(plus decode+NMS) compiles into a single XLA program. No nn.Module graph walk,
no save-list dict lookups at runtime.

Model scale math is identical to the reference so YAML files (including the
fork's yolov8-small.yaml P2 model) load unchanged:
  c2 = make_divisible(min(c2, max_channels) * width, 8); n = max(round(n*depth), 1).

Stride calibration is static: strides propagate through the graph spec
(Conv s=2 doubles, Upsample×2 halves) instead of the reference's dummy forward
(ref: nn/tasks.py:407-421) — exact for all conv-net YAMLs and free at trace time.
"""

from __future__ import annotations

import math
import os
import re
from pathlib import Path

import jax
import jax.numpy as jnp

from yolo_tpu.nn import modules as M
from yolo_tpu.utils import LOGGER, yaml_load

MODULE_MAP = {
    "Conv": M.ConvBNAct,
    "DWConv": M.DWConv,
    "C2f": M.C2f,
    "SPPF": M.SPPF,
    "SPP": M.SPP,
    "Bottleneck": M.Bottleneck,
    "Concat": M.Concat,
    "Detect": M.Detect,
    "nn.Upsample": M.Upsample,
    "nn.MaxPool2d": M.MaxPool2d,
    # YOLO11 family
    "C3": M.C3,
    "C2": M.C2,
    "C3k": M.C3k,
    "C3Ghost": M.C3Ghost,
    "GhostConv": M.GhostConv,
    "GhostBottleneck": M.GhostBottleneck,
    "ResNetLayer": M.ResNetLayer,
    "TorchVision": M.TorchVision,
    "NASCSP": M.NASCSP,
    "C3k2": M.C3k2,
    "SCDown": M.SCDown,
    "C2PSA": M.C2PSA,
    "PSABlock": M.PSABlock,
    "Classify": M.Classify,
    # YOLOv9/v10
    "RepConv": M.RepConv,
    "RepCSP": M.RepCSP,
    "RepNCSPELAN4": M.RepNCSPELAN4,
    "ELAN1": M.ELAN1,
    "AConv": M.AConv,
    "ADown": M.ADown,
    "SPPELAN": M.SPPELAN,
    "CIB": M.CIB,
    "C2fCIB": M.C2fCIB,
    "PSA": M.PSA,
    "v10Detect": M.v10Detect,
    "Segment": M.Segment,
    "Pose": M.Pose,
    "OBB": M.OBB,
    # YOLOv9-e aux branch / misc
    "nn.Identity": M.Identity,
    "nn.ZeroPad2d": M.ZeroPad2d,
    "CBLinear": M.CBLinear,
    "CBFuse": M.CBFuse,
    "nn.ConvTranspose2d": M.ConvTranspose,
    "ConvTranspose": M.ConvTranspose,
    # YOLO12 area attention
    "A2C2f": M.A2C2f,
    "ABlock": M.ABlock,
    "AAttn": M.AAttn,
    # RT-DETR (HGNetV2 backbone + hybrid encoder + deformable decoder)
    "HGStem": M.HGStem,
    "HGBlock": M.HGBlock,
    "LightConv": M.LightConv,
    "RepC3": M.RepC3,
    # YOLO-World open-vocab
    "C2fAttn": M.C2fAttn,
    "ImagePoolingAttn": M.ImagePoolingAttn,
    "WorldDetect": M.WorldDetect,
    # YOLOE open-vocab (text + visual prompts)
    "YOLOEDetect": M.YOLOEDetect,
    "YOLOESegment": M.YOLOESegment,
}


def _neck_opt_flag(explicit: bool) -> bool:
    """Resolve the neck Upsample→Concat→C2f fold flag: YOLO_TPU_NECK_OPT=0/1
    force-overrides the caller (kill switch for the shipped-default fold)."""
    env = os.getenv("YOLO_TPU_NECK_OPT")
    if env == "0":
        return False
    if env == "1":
        return True
    return explicit


def params_are_fused_float(params) -> bool:
    """True when no conv in the tree still carries a separate BN group or an
    int8-quantized weight — the precondition for the neck fold
    (C2f.call_upconcat) and the Pallas fusion kernels."""
    found = {"ok": True}

    def walk(t):
        if not found["ok"] or not isinstance(t, dict):
            return
        if "bn" in t or ("conv" in t and isinstance(t["conv"], dict) and "w_int8" in t["conv"]):
            found["ok"] = False
            return
        for v in t.values():
            walk(v)

    walk(params)
    return found["ok"]


def _lazy_rtdetr():
    from yolo_tpu.nn import transformer as T

    MODULE_MAP.setdefault("AIFI", T.AIFI)
    MODULE_MAP.setdefault("RTDETRDecoder", T.RTDETRDecoder)


_lazy_rtdetr()

HEAD_TYPES = (M.Detect,)


def make_divisible(x, divisor: int = 8):
    """Round channel count up to the nearest multiple of divisor (ref: utils/ops.py)."""
    return math.ceil(x / divisor) * divisor


def yaml_model_load(path) -> dict:
    """Load a model YAML, inferring scale from a trailing n/s/m/l/x letter."""
    path = Path(path)
    stem = re.sub(r"(\d+)([nslmx])6(.+)?$", r"\1\2-p6\3", path.stem)  # yolov5n6 → yolov5n-p6 (ref :1715)
    if stem != path.stem:
        path = path.with_name(stem + path.suffix)
    m = re.search(r"(\d+)([nslmx])(.*)$", stem)  # scale letter right after version digits
    nas = re.fullmatch(r"yolo_nas_([sml])", stem)  # yolo_nas_s → yolo_nas.yaml scale s
    unified = path
    scale = ""
    if nas and not path.exists():
        scale = nas.group(1)
        unified = path.with_name(f"yolo_nas{path.suffix}")
    elif m and not path.exists():
        scale = m.group(2)
        unified = path.with_name(f"{stem[: m.start(2)]}{m.group(3)}{path.suffix}")
    if not unified.exists():
        from yolo_tpu.cfg import find_model_yaml

        # exact per-scale file wins over the unified one — some families
        # (yolov10, yolov9) have a distinct graph per scale letter
        found = find_model_yaml(str(path)) or find_model_yaml(str(unified))
        if found is None:
            raise FileNotFoundError(f"model yaml '{path}' not found")
        unified = found
    d = yaml_load(unified, append_filename=True)
    d["scale"] = d.get("scale") or scale
    return d


def guess_model_scale(model_path) -> str:
    m = re.search(r"yolo[a-z]*\d+([nslmx])", Path(model_path).stem)
    return m.group(1) if m else ""


class LayerSpec:
    """Static record of one graph node: (index, from, module, is_output_saved)."""

    __slots__ = ("i", "f", "module", "type")

    def __init__(self, i, f, module, type_):
        self.i, self.f, self.module, self.type = i, f, module, type_


def parse_model(d: dict, ch: int = 3, verbose: bool = False):
    """Compile a model dict into (layers, save_list). Mirrors reference scale math."""
    max_channels = float("inf")
    nc, scales = d.get("nc"), d.get("scales")
    depth, width = d.get("depth_multiple", 1.0), d.get("width_multiple", 1.0)
    if scales:
        scale = d.get("scale")
        if not scale:
            scale = tuple(scales.keys())[0]
            LOGGER.warning(f"no model scale passed, assuming scale='{scale}'")
        depth, width, max_channels = scales[scale]

    ch = [ch]
    layers, save = [], []
    # yaml-level activation override (e.g. yolov6 `activation: torch.nn.ReLU()`,
    # ref :1552); applied only while constructing THIS model's modules — the
    # reference mutates Conv.default_act globally and leaks it across builds
    act = d.get("activation")
    prev_act = M.ConvBNAct.DEFAULT_ACT
    if act:
        name = str(act).lower()
        M.ConvBNAct.DEFAULT_ACT = (
            "relu" if "relu" in name else "gelu" if "gelu" in name else "silu"
        )
    try:
        return _parse_rows(d, ch, nc, depth, width, max_channels)
    finally:
        M.ConvBNAct.DEFAULT_ACT = prev_act


def _parse_rows(d, ch, nc, depth, width, max_channels):
    layers, save = [], []
    # v10/v11-era modules switch Detect to its depthwise cls branch (ref :1643-1673)
    legacy = not any(row[2] in ("C3k2", "A2C2f", "C2fCIB") for row in d["backbone"] + d["head"])
    for i, (f, n, mname, args) in enumerate(d["backbone"] + d["head"]):
        if mname not in MODULE_MAP:
            raise NotImplementedError(f"module '{mname}' not supported yet")
        mcls = MODULE_MAP[mname]
        args = [
            (nc if a == "nc" else True if a == "True" else False if a == "False" else None if a == "None" else a)
            if isinstance(a, str)
            else a
            for a in args
        ]
        n = max(round(n * depth), 1) if n > 1 else n

        if mcls is M.ResNetLayer:
            c2 = args[1] if args[3] else args[1] * 4  # is_first -> c2 else 4*c2 (ref :1660)
            layers.append(LayerSpec(i, f, mcls(*args), mname))
            save.extend(x % i for x in ([f] if isinstance(f, int) else f) if x != -1)
            if i == 0:
                ch = []
            ch.append(c2)
            continue
        if mcls is M.TorchVision:
            c2 = args[0]  # declared output channels, not width-scaled (ref :1682)
            layers.append(LayerSpec(i, f, mcls(*args), mname))
            save.extend(x % i for x in ([f] if isinstance(f, int) else f) if x != -1)
            if i == 0:
                ch = []
            ch.append(c2)
            continue
        if mcls in (M.ConvBNAct, M.DWConv, M.C2f, M.SPPF, M.SPP, M.Bottleneck, M.C3, M.C2, M.C3k, M.C3k2, M.NASCSP, M.C3Ghost, M.GhostConv, M.GhostBottleneck, M.SCDown, M.C2PSA, M.Classify, M.RepConv, M.RepCSP, M.RepNCSPELAN4, M.ELAN1, M.AConv, M.ADown, M.SPPELAN, M.CIB, M.C2fCIB, M.PSA, M.A2C2f, M.ConvTranspose, M.RepC3):
            c1, c2 = ch[f], args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            args = [c1, c2, *args[1:]]
            if mcls in (M.C2f, M.C3, M.C2, M.C3k, M.C3k2, M.NASCSP, M.C3Ghost, M.C2PSA, M.RepCSP, M.C2fCIB, M.A2C2f, M.RepC3):
                args.insert(2, n)
                n = 1
            if mcls is M.C3k2 and d.get("scale") in ("m", "l", "x"):
                args[3] = True  # deeper scales use C3k inner blocks (ref :1643)
            if mcls is M.A2C2f and d.get("scale") in ("l", "x"):
                args.extend((True, 1.2))  # residual gamma + mlp 1.2 (ref :1646)
            if mname == "nn.ConvTranspose2d":  # raw torch module: no BN, no act
                args = args[:5] + [False, False]
        elif mcls is M.C2fAttn:
            c1, c2 = ch[f], args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            # ec width-scales capped at max_channels/2; nh scales when >1 (ref :1632)
            args[1] = make_divisible(min(args[1], max_channels // 2) * width, 8)
            args[2] = int(max(round(min(args[2], max_channels // 2 // 32)) * width, 1) if args[2] > 1 else args[2])
            args = [c1, c2, n, *args[1:]]
            n = 1
        elif mcls is M.ImagePoolingAttn:
            args.append([ch[x] for x in f])
            c2 = None
        elif mcls in (M.WorldDetect, M.YOLOEDetect, M.YOLOESegment):
            if mcls is M.YOLOESegment:  # npr width-scales like Segment (ref :1671)
                args[2] = make_divisible(min(args[2], max_channels) * width, 8)
            args.append([ch[x] for x in f])
            args.append(legacy)
            c2 = None
        elif mcls in (M.HGStem, M.HGBlock):
            c1, cm, c2 = ch[f], args[0], args[1]
            args = [c1, cm, c2, *args[2:]]
            if mcls is M.HGBlock:
                args.insert(4, n)  # repeats
                n = 1
        elif mname == "AIFI":
            c2 = ch[f]
            args = [ch[f], *args]
        elif mname == "RTDETRDecoder":
            args.insert(1, [ch[x] for x in f])
            c2 = None
        elif mcls is M.CBLinear:
            c2 = args[0]  # list of split channel sizes, not width-scaled (ref :1676)
            args = [ch[f], c2, *args[1:]]
        elif mcls is M.CBFuse:
            c2 = ch[f[-1]]
        elif mcls is M.Concat:
            c2 = sum(ch[x] for x in f)
        elif mcls in (M.Detect, M.Segment, M.Pose, M.OBB, M.v10Detect):
            if mcls is M.Segment:  # npr width-scales (ref parse_model Segment branch)
                args[2] = make_divisible(min(args[2], max_channels) * width, 8)
            if mcls is M.Pose and d.get("kpt_shape"):
                args = [args[0], tuple(d["kpt_shape"]), *args[2:]]
            args.append([ch[x] for x in f])
            args.append(legacy)
            c2 = None
        elif mcls in (M.Upsample, M.MaxPool2d):
            c2 = ch[f]
        else:
            c2 = ch[f]

        # non-repeat modules with n>1 become a Sequential of n identical copies
        # (ref: tasks.py :1682 — e.g. yolov3 Bottleneck ×2, yolov6 Conv ×9)
        module = M._SeqN(*(mcls(*args) for _ in range(n))) if n > 1 else mcls(*args)
        t = mname
        layers.append(LayerSpec(i, f, module, t))
        save.extend(x % i for x in ([f] if isinstance(f, int) else f) if x != -1)
        if i == 0:
            ch = []
        ch.append(c2)
    return layers, sorted(set(save))


def _compute_strides(layers):
    """Statically propagate spatial strides through the graph to the Detect head."""
    stride = {}
    strides = []
    for spec in layers:
        f = spec.f
        src_idx = f if isinstance(f, int) else f[0]
        if src_idx < 0:
            src_idx = spec.i + src_idx
        src = stride.get(src_idx, 1) if not isinstance(spec.module, M.Detect) else None
        if isinstance(spec.module, M.ConvBNAct):
            s = src * spec.module.s
        elif isinstance(spec.module, (M.AConv, M.ADown, M.SCDown)):
            s = src * 2
        elif isinstance(spec.module, M.Upsample):
            s = src // spec.module.scale
        elif isinstance(spec.module, M.MaxPool2d):
            s = src * spec.module.s
        elif isinstance(spec.module, M.CBFuse):
            s = stride[f[-1] if f[-1] >= 0 else spec.i + f[-1]]
        elif isinstance(spec.module, M.ConvTranspose):
            s = max(src // spec.module.s, 1)
        elif isinstance(spec.module, M._SeqN):
            s = src
            for sub in spec.module.mods:
                if isinstance(sub, M.ConvBNAct):
                    s *= sub.s
        elif isinstance(spec.module, M.HGStem):  # two stride-2 convs
            s = src * 4
        elif isinstance(spec.module, (M.ResNetLayer, M.TorchVision)):
            s = src * spec.module.s_total
        elif isinstance(spec.module, (M.GhostConv, M.GhostBottleneck)):
            s = src * spec.module.s
        elif type(spec.module).__name__ == "RTDETRDecoder":
            s = None  # head; its stride list is preset in __init__
        elif isinstance(spec.module, M.Detect):  # Segment subclasses Detect
            spec.module.stride = [stride[x] for x in f]
            s = None
        else:
            s = src
        stride[spec.i] = s
        strides.append(s)
    return strides


class BaseModel:
    """Functional model: static layer list + pure forward over a params pytree."""

    def __init__(self):
        self.layers: list[LayerSpec] = []
        self.save: list[int] = []

    def init(self, seed: int = 0):
        """Initialize the full parameter tree {'model': {str(i): layer_params}}.

        Params are host numpy arrays — init stays off-device (critical when the
        TPU sits behind a remote tunnel where eager per-op dispatch is slow);
        the first jitted call uploads the tree once.
        """
        import numpy as np

        rng = np.random.default_rng(seed)
        return {"model": {str(spec.i): spec.module.init(rng) for spec in self.layers}}

    def _walk(self, params, x, ctx: M.Ctx, upto: int | None = None, collect=None, start: int = 0):
        """THE graph walk with skip connections (ref: nn/tasks.py
        _predict_once:159) — single implementation shared by
        forward_features / embed_features / _head_inputs so remat, guide
        threading and save-list semantics can never diverge.

        Negative `from` entries are relative (-1 = previous layer's output held
        in `x`, -2 and below resolve through the save dict, like the reference).
        `start > 0` enters the graph mid-way with `x` as the layer start-1
        output (the s2d packed stem computes layers 0..start-1 out-of-graph);
        valid only when no skipped layer is in the save list.
        Returns (last_out, save_dict, {i: out for i in collect})."""
        if start:
            assert not any(i < start for i in self.save), f"layers <{start} are skip sources; cannot start there"
        if ctx.neck_opt and not hasattr(self, "_upconcat"):
            self._build_neck_opt()
        y = {}
        mp = params["model"]
        out = None
        collected = {}
        for spec in self.layers[start:upto]:
            if ctx.neck_opt and spec.i in self._neck_skip:
                continue  # folded into the downstream C2f (call_upconcat)
            if ctx.neck_opt and spec.i in self._upconcat:
                j, scale = self._upconcat[spec.i]
                out = spec.module.call_upconcat(mp[str(spec.i)], x, y[j], scale, ctx, f"model/{spec.i}")
                if spec.i in self.save:
                    y[spec.i] = out
                if collect and spec.i in collect:
                    collected[spec.i] = out
                x = out
                continue
            f = spec.f

            def src(j, x=x, spec=spec):
                return x if j == -1 else y[j if j >= 0 else spec.i + j]

            x_in = [src(j) for j in f] if isinstance(f, list) else src(f)
            out = self._apply_layer(spec, mp[str(spec.i)], x_in, ctx)
            if spec.i in self.save:
                y[spec.i] = out
            if collect and spec.i in collect:
                collected[spec.i] = out
            x = out if not isinstance(out, list) else x
        return out, y, collected

    def _build_neck_opt(self):
        """Find Upsample→Concat→C2f chains foldable by C2f.call_upconcat:
        nearest-2x Upsample(-1) feeding a two-input Concat([-1, skip]) feeding
        a plain C2f(-1), with neither intermediate in the save list (true for
        every v8-family neck). Populates _upconcat {c2f_idx: (skip_idx, scale)}
        and _neck_skip (the folded Upsample/Concat indices)."""
        self._upconcat, self._neck_skip = {}, set()
        for a, b, c in zip(self.layers, self.layers[1:], self.layers[2:]):
            if (
                isinstance(a.module, M.Upsample)
                and a.f == -1
                and type(b.module) is M.Concat
                and isinstance(b.f, list)
                and len(b.f) == 2
                and b.f[0] == -1
                and b.f[1] >= 0
                and type(c.module) is M.C2f
                and c.f == -1
                and a.i not in self.save
                and b.i not in self.save
            ):
                self._upconcat[c.i] = (b.f[1], a.module.scale)
                self._neck_skip |= {a.i, b.i}

    def forward_features(self, params, x, ctx: M.Ctx, start: int = 0):
        """Head output from a full walk, or — with `start=k` — from a
        precomputed layer-(k-1) activation `x` (the trainer's s2d packed stem
        computes layers 0-1 out-of-graph, see nn/s2d.py stem_apply_train)."""
        out, _, _ = self._walk(params, x, ctx, start=start)
        return out  # head output

    def _apply_layer(self, spec, p, x_in, ctx: M.Ctx):
        """Apply one graph layer; under ctx.remat, checkpoint the layer so its
        activations are recomputed (not stored) for the backward pass.

        Heads and guide-mutating modules stay un-checkpointed: heads are the
        loss boundary (nothing downstream to save memory for) and
        ImagePoolingAttn rewrites ctx.guide, a traced value that cannot escape
        a remat region through the Python context object."""
        import jax

        path = f"model/{spec.i}"
        if not isinstance(spec.module, M.QTENSOR_MODULES):
            # int8-resident flow: layers without a native QTensor path get
            # dense inputs (deq is a passthrough for plain arrays) — see
            # modules.int8_flow_paths for the producer-side restriction
            x_in = [M.deq(v, ctx.dtype) for v in x_in] if isinstance(x_in, list) else M.deq(x_in, ctx.dtype)
        skip = isinstance(spec.module, (M.Detect, M.ImagePoolingAttn)) or type(spec.module).__name__ == "RTDETRDecoder"
        if not (ctx.remat and ctx.train) or skip:
            return spec.module(p, x_in, ctx, path)

        static_n = {}  # BN counts are trace-time Python ints; escape via closure

        def layer_fn(lp, xin):
            sub = M.Ctx(train=ctx.train, dtype=ctx.dtype, guide=ctx.guide, guide0=ctx.guide0, dn=ctx.dn)
            o = spec.module(lp, xin, sub, path)
            static_n.update({k: v[2] for k, v in sub.stats.items()})
            return o, {k: (v[0], v[1]) for k, v in sub.stats.items()}

        out, stats = jax.checkpoint(layer_fn)(p, x_in)
        ctx.stats.update({k: (m, v, static_n[k]) for k, (m, v) in stats.items()})
        return out

    def embed_features(self, params, x, ctx: M.Ctx, idx=None):
        """Pooled intermediate embeddings (ref: nn/tasks.py _predict_once embed
        branch + engine/model.py embed:467): walk the graph, mean-pool the
        selected layers' NHWC outputs to (B, C), concatenate. Default layer =
        the second-to-last (the neck output feeding the head)."""
        idx = sorted(set(idx or [len(self.layers) - 2]))
        _, _, col = self._walk(params, x, ctx, upto=max(idx) + 1, collect=set(idx))
        embeds = [
            (o.mean(axis=(1, 2)) if o.ndim == 4 else o)
            for i in idx
            if not isinstance((o := col[i]), (list, tuple))
        ]
        return jnp.concatenate(embeds, axis=-1)

    def param_count(self, params) -> int:
        return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))

    def int8_flow_paths(self) -> set:
        """Param paths whose convs may emit int8-resident activations
        (QTensor) — pass to quantize_params(flow_paths=...) so uncovered
        blocks never receive QTensors from their own sub-convs."""
        paths = set()
        for spec in self.layers:
            paths |= M.int8_flow_paths(spec.module, f"model/{spec.i}")
        return paths


class DetectionModel(BaseModel):
    """YOLO detection model (ref: nn/tasks.py DetectionModel:374).

    >>> model = DetectionModel("yolov8-small.yaml", nc=1)
    >>> params = model.init(0)
    >>> preds = model.predict(params, images_nhwc)  # (B, 4+nc, A)
    """

    task = "detect"

    def __init__(self, cfg="yolov8n.yaml", ch: int = 3, nc: int | None = None, verbose: bool = False):
        super().__init__()
        self.yaml = cfg if isinstance(cfg, dict) else yaml_model_load(cfg)
        if nc and nc != self.yaml.get("nc"):
            LOGGER.info(f"overriding model.yaml nc={self.yaml.get('nc')} with nc={nc}")
            self.yaml["nc"] = nc
        self.nc = self.yaml["nc"]
        self.names = {i: f"{i}" for i in range(self.nc)}
        self.layers, self.save = parse_model(self.yaml, ch=ch, verbose=verbose)
        _compute_strides(self.layers)
        self.head: M.Detect = self.layers[-1].module
        self.stride = self.head.stride
        if verbose:
            LOGGER.info(f"DetectionModel: {len(self.layers)} layers, strides {self.stride}")

    # --- functional API ---------------------------------------------------

    def raw_forward(self, params, x, train: bool = False, dtype=jnp.float32):
        """Per-level head outputs, NHWC: list[(B, H_l, W_l, 4*reg_max+nc)]."""
        ctx = M.Ctx(train=train, dtype=dtype)
        outs = self.forward_features(params, x, ctx)
        return outs, ctx.stats

    def predict(self, params, x, dtype=jnp.float32, neck_opt: bool = False):
        """Decoded predictions — (B, 4+nc, A) for NMS heads; v10Detect (end2end)
        returns final (B, max_det, 6) [x, y, w, h, conf, cls] with no NMS.

        neck_opt folds Upsample→Concat→C2f chains (fused float params only;
        see predict_parts). Env YOLO_TPU_NECK_OPT=0/1 force-overrides."""
        ctx = M.Ctx(train=False, dtype=dtype, neck_opt=_neck_opt_flag(neck_opt))
        outs = self.forward_features(params, x, ctx)
        if isinstance(self.head, M.v10Detect):
            return outs  # decoded inside the head (eval path)
        return self.head.decode(params["model"][str(self.layers[-1].i)], outs)

    def predict_parts(
        self,
        params,
        x,
        dtype=jnp.float32,
        pallas_head: bool = False,
        pallas_interpret: bool = False,
        neck_opt: bool = False,
        pallas_c2f: bool = False,
        pallas_head2: bool = False,
        pallas_head2_levels=None,
    ):
        """Decoded (boxes (B, A, 4) px-xywh, scores (B, A, nc)) — the
        anchors-major hot path for fused NMS (ops/nms.py
        non_max_suppression_parts); `predict` wraps the same decode into the
        reference's transposed (B, 4+nc, A) layout.

        pallas_head=True routes the whole Detect head (both conv branches +
        DFL) through the fused VMEM-resident Pallas kernel
        (ops/pallas_head.py) instead of the XLA conv walk — also enabled
        globally by YOLO_TPU_PALLAS_HEAD=1. neck_opt=True folds the neck's
        Upsample→Concat→C2f chains (C2f.call_upconcat exact algebra; env
        YOLO_TPU_NECK_OPT=1)."""
        ctx = M.Ctx(
            train=False,
            dtype=dtype,
            neck_opt=_neck_opt_flag(neck_opt),
            pallas_c2f=pallas_c2f or os.getenv("YOLO_TPU_PALLAS_C2F") == "1",
            pallas_interpret=pallas_interpret,
        )
        assert not isinstance(self.head, M.v10Detect), "v10 end2end head decodes in-head; use predict()"
        hp = params["model"][str(self.layers[-1].i)]
        if pallas_head or os.getenv("YOLO_TPU_PALLAS_HEAD") == "1":
            spec = self.layers[-1]
            assert type(self.head) is M.Detect, "pallas head kernel covers plain Detect heads"
            _, _, col = self._walk(params, x, ctx, upto=spec.i, collect=set(spec.f))
            return self.head.decode_feats_pallas(
                hp, [col[j] for j in spec.f], interpret=pallas_interpret, dtype=dtype
            )
        if pallas_head2 or os.getenv("YOLO_TPU_PALLAS_HEAD2") == "1":
            # channel-major fused head kernel (ops/pallas_head2.py, round 5)
            spec = self.layers[-1]
            assert type(self.head) is M.Detect, "pallas head2 kernel covers plain Detect heads"
            if pallas_head2_levels is None:
                lv = os.getenv("YOLO_TPU_PALLAS_HEAD2_LEVELS", "")
                pallas_head2_levels = tuple(int(v) for v in lv.split(",") if v != "") or None
            _, _, col = self._walk(params, x, ctx, upto=spec.i, collect=set(spec.f))
            return self.head.decode_from_inputs_cm(
                hp, [col[j] for j in spec.f], ctx, interpret=pallas_interpret,
                levels=pallas_head2_levels,
            )
        if type(self.head) is M.Detect:
            # enter the head from its INPUTS so branches + DFL decode fuse
            # without the per-level box|cls concat (Detect.decode_from_inputs)
            spec = self.layers[-1]
            _, _, col = self._walk(params, x, ctx, upto=spec.i, collect=set(spec.f))
            return self.head.decode_from_inputs(hp, [col[j] for j in spec.f], ctx)
        outs = self.forward_features(params, x, ctx)
        assert isinstance(outs, list), (
            f"{type(self.head).__name__} produces structured outputs (masks/keypoints/angles); "
            "the parts fast path handles plain Detect heads — use predict()"
        )
        return self.head.decode_parts(hp, outs)

    def predict_logits(self, params, x, dtype=jnp.float32, neck_opt: bool = False):
        """Lazy-decode hot path: raw reg bins + scores, no box decode — pair
        with ops/nms.non_max_suppression_logits, which DFL-decodes only the
        top-k winners (the all-anchor decode intermediates never exist; see
        Detect.logits_from_inputs). Plain fused Detect heads only.
        Returns (bins, scores (B, A, nc) f32, anchors (A, 2), strides (A, 1),
        proj (reg_max,)) where bins is a PER-LEVEL TUPLE of (B, A_l, 4*reg_max)
        views (bitcast per level; never concatenated — that round trip is the
        traffic this path removes). non_max_suppression_logits accepts the
        tuple directly."""
        ctx = M.Ctx(train=False, dtype=dtype, neck_opt=_neck_opt_flag(neck_opt))
        assert type(self.head) is M.Detect, "lazy decode covers plain Detect heads — use predict()"
        spec = self.layers[-1]
        _, _, col = self._walk(params, x, ctx, upto=spec.i, collect=set(spec.f))
        return self.head.logits_from_inputs(params["model"][str(spec.i)], [col[j] for j in spec.f], ctx)

    def predict_sparse_det(
        self,
        params,
        x,
        conf_thres: float = 0.25,
        iou_thres: float = 0.45,
        max_det: int = 300,
        max_nms: int = 1024,
        dtype=jnp.float32,
        neck_opt: bool = False,
        classes=None,
        agnostic: bool = False,
    ):
        """Sparse-box-head detection: dense cls branch -> global top-k by
        score -> cv2 regression chain + DFL computed ONLY on gathered 5x5
        patches at the k winning anchors -> suppression tail. Output dict is
        the float-tolerance twin of
        non_max_suppression_parts(predict_parts(...)) — the selection, decode
        math and suppression are identical op-for-op; only the dense
        regression maps and the all-anchor DFL chain never materialize (see
        Detect.sparse_candidates for the accounting, tests/test_sparse_head.py
        for the pinned parity). Plain fused Detect heads only."""
        from yolo_tpu.ops.nms import non_max_suppression_sparse

        ctx = M.Ctx(train=False, dtype=dtype, neck_opt=_neck_opt_flag(neck_opt))
        assert type(self.head) is M.Detect, "sparse box head covers plain Detect heads — use predict()"
        spec = self.layers[-1]
        _, _, col = self._walk(params, x, ctx, upto=spec.i, collect=set(spec.f))
        b, c, conf = self.head.sparse_candidates(
            params["model"][str(spec.i)], [col[j] for j in spec.f], ctx,
            conf_thres=conf_thres, max_nms=max_nms, classes=classes, agnostic=agnostic,
        )
        return non_max_suppression_sparse(b, c, conf, iou_thres=iou_thres, max_det=max_det, agnostic=agnostic)

    def predict_s2d(self, params, x, dtype=jnp.float32, parts: bool = False):
        """Decoded predictions from a space-to-depth packed input (nn/s2d.py).

        `params` must carry the packed-stem group under "s2d" (fold_stem of the
        FUSED params) and `x` must be pack_input(frames, r) — float, already
        normalized. The stem runs as two 2x2/s1 convs on lane-dense layouts and
        the graph is entered at layer 2 with the standard P2 activation;
        everything downstream (incl. head decode) is byte-identical to
        predict(). This is the HBM-traffic fix for the (H, W, 1) -> (H/2, W/2,
        16) stem whose activations pad the 128-lane layout at 8-128x waste."""
        from yolo_tpu.nn.s2d import S2D_KEY, stem_apply, validate_stem

        validate_stem(self)  # trace-time only; guards stride-1/relu stems
        z = stem_apply(params[S2D_KEY], x, dtype, c1=self.layers[1].module.c2)
        ctx = M.Ctx(train=False, dtype=dtype)
        outs, _, _ = self._walk(params, z, ctx, start=2)
        if isinstance(self.head, M.v10Detect):
            return outs
        hp = params["model"][str(self.layers[-1].i)]
        return self.head.decode_parts(hp, outs) if parts else self.head.decode(hp, outs)

    def predict_augment(self, params, x, dtype=jnp.float32):
        """Test-time augmentation: 3 scales x lr-flip merged (ref: nn/tasks.py
        DetectionModel._predict_augment:445 + _descale_pred:456 +
        _clip_augmented:478). Each scale is its own static shape, so jit
        compiles exactly three programs."""
        H, W = x.shape[1], x.shape[2]
        gs = int(max(self.stride))
        scales = (1.0, 0.83, 0.67)
        flips = (None, "lr", None)
        ys = []
        for ratio, fl in zip(scales, flips):
            xi = x[:, :, ::-1] if fl == "lr" else x
            xi = _scale_img(xi, ratio, gs)
            yi = self.predict(params, xi, dtype=dtype)  # (B, 4+nc, A) px xywh
            bx = yi[:, 0:1] / ratio
            by = yi[:, 1:2] / ratio
            bwh = yi[:, 2:4] / ratio
            if fl == "lr":
                bx = W - bx
            ys.append(jnp.concatenate([bx, by, bwh, yi[:, 4:]], axis=1))
        # clip augmented tails (ref :478): drop the largest-stride anchors of
        # the full-scale pass and the smallest-stride anchors of the last pass
        nl = len(self.stride)
        g = sum(4**k for k in range(nl))
        i0 = (ys[0].shape[-1] // g) * 1
        ys[0] = ys[0][..., :-i0]
        i2 = (ys[-1].shape[-1] // g) * 4 ** (nl - 1)
        ys[-1] = ys[-1][..., i2:]
        return jnp.concatenate(ys, axis=-1)

    def fuse(self, params):
        """Return params with all Conv+BN folded (exact inference speedup)."""
        return {"model": {str(s.i): _fuse_module(s.module, params["model"][str(s.i)]) for s in self.layers}}


def _scale_img(x, ratio: float, gs: int):
    """Bilinear rescale + pad to a gs-multiple with the 0.447 ImageNet-mean
    gray (ref: torch_utils.py scale_img). NHWC."""
    if ratio == 1.0:
        return x
    B, H, W, C = x.shape
    h, w = int(H * ratio), int(W * ratio)
    xi = jax.image.resize(x, (B, h, w, C), "bilinear")
    ph = -h % gs
    pw = -w % gs
    return jnp.pad(xi, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=0.447)


def _fuse_child(m, k: str):
    """Resolve a params key to the owning module's child: attribute name,
    sequence index (lists/tuples), or a _Seq/_SeqN `.mods` slot."""
    if m is None:
        return None
    if k.isdigit():
        seq = getattr(m, "mods", m if isinstance(m, (list, tuple)) else None)
        if seq is not None and int(k) < len(seq):
            return seq[int(k)]
        return None
    return getattr(m, k, None)


def _fuse_module(m, p):
    """Recursively fold BN into convs across the module tree.

    GENERIC walk instead of a per-class registry (the registry silently left
    new block types unfused and dropped extra head param groups like
    Segment's proto / v10's one2one branches): modules that define `fuse`
    (ConvBNAct, RepConv) fold themselves; every other params key recurses
    into the structurally-matching child and unknown groups pass through
    verbatim."""
    if callable(getattr(m, "fuse", None)):
        return m.fuse(p)
    if not isinstance(p, dict):
        return p
    out = {}
    for k, v in p.items():
        child = _fuse_child(m, k)
        out[k] = _fuse_module(child, v) if child is not None else v
    return out





class ClassificationModel(BaseModel):
    """YOLO classification model (ref: nn/tasks.py ClassificationModel:613)."""

    task = "classify"

    def __init__(self, cfg="yolov8n-cls.yaml", ch: int = 3, nc: int | None = None, verbose: bool = False):
        super().__init__()
        self.yaml = cfg if isinstance(cfg, dict) else yaml_model_load(cfg)
        if nc and nc != self.yaml.get("nc"):
            LOGGER.info(f"overriding model.yaml nc={self.yaml.get('nc')} with nc={nc}")
            self.yaml["nc"] = nc
        self.nc = self.yaml["nc"]
        self.names = {i: f"{i}" for i in range(self.nc)}
        self.layers, self.save = parse_model(self.yaml, ch=ch, verbose=verbose)
        self.stride = [1]  # no multi-scale head

    def predict(self, params, x, dtype=jnp.float32):
        """Class probabilities (B, nc) — softmax over head logits."""
        ctx = M.Ctx(train=False, dtype=dtype)
        logits = self.forward_features(params, x, ctx)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    def raw_forward(self, params, x, train: bool = False, dtype=jnp.float32):
        ctx = M.Ctx(train=train, dtype=dtype)
        logits = self.forward_features(params, x, ctx)
        return logits, ctx.stats


class SegmentationModel(DetectionModel):
    """YOLO segmentation model (ref: nn/tasks.py SegmentationModel:536)."""

    task = "segment"

    def __init__(self, cfg="yolov8n-seg.yaml", ch: int = 3, nc: int | None = None, verbose: bool = False):
        super().__init__(cfg, ch=ch, nc=nc, verbose=verbose)

    def predict(self, params, x, dtype=jnp.float32):
        """(preds (B, 4+nc+nm, A), protos (B, h, w, nm))."""
        ctx = M.Ctx(train=False, dtype=dtype)
        outs = self.forward_features(params, x, ctx)
        head_params = params["model"][str(self.layers[-1].i)]
        return self.head.decode_with_masks(head_params, outs)


class PoseModel(DetectionModel):
    """YOLO pose model (ref: nn/tasks.py PoseModel:570)."""

    task = "pose"

    def __init__(self, cfg="yolov8n-pose.yaml", ch: int = 3, nc: int | None = None, verbose: bool = False):
        super().__init__(cfg, ch=ch, nc=nc, verbose=verbose)

    def predict(self, params, x, dtype=jnp.float32):
        ctx = M.Ctx(train=False, dtype=dtype)
        outs = self.forward_features(params, x, ctx)
        return self.head.decode_with_kpts(params["model"][str(self.layers[-1].i)], outs)


class WorldModel(DetectionModel):
    """YOLO-World open-vocabulary model (ref: nn/tasks.py WorldModel:833).

    Class scores come from region-text similarity: text embeddings (B, nc, 512)
    enter via Ctx.guide/guide0. `set_classes` wants a CLIP text encoder — this
    zero-egress environment cannot fetch its weights, so it raises with guidance;
    `set_text_features` accepts precomputed embeddings (the parity tests and any
    offline-export workflow use this)."""

    task = "detect"
    is_world = True

    def __init__(self, cfg="yolov8s-world.yaml", ch: int = 3, nc: int | None = None, verbose: bool = False):
        super().__init__(cfg, ch=ch, nc=nc, verbose=verbose)
        rng = __import__("numpy").random.default_rng(0)
        self.txt_feats = rng.normal(0, 1, (1, self.nc, 512)).astype("float32")  # placeholder (ref :868)

    def set_text_features(self, txt_feats):
        """Install precomputed text embeddings (1, n_classes, 512) and resize nc."""
        import numpy as np

        self.txt_feats = np.asarray(txt_feats, np.float32)
        self.nc = self.txt_feats.shape[1]
        self.head.nc = self.nc  # nc can change per text set (ref: head.py :526)
        self.head.no = self.nc + self.head.reg_max * 4

    def set_classes(self, text, text_model=None, clip_ckpt=None, **kwargs):
        """Open-vocabulary class prompts via the native CLIP text tower
        (ref: tasks.py WorldModel.set_classes:~860 → nn/text_model.py CLIP).

        With a `clip_ckpt` (OpenAI clip .pt) or a pre-built `text_model`, the
        embeddings match the reference; with neither, the randomly-initialized
        tower still yields a working end-to-end pipeline (documented for
        weight-less environments)."""
        import numpy as np

        from yolo_tpu.nn.text_model import build_text_model

        tm = text_model or build_text_model()
        if clip_ckpt:
            tm.load_torch(clip_ckpt)
        elif text_model is None:
            LOGGER.warning(
                "set_classes: no text_model/clip_ckpt supplied — embedding class names with a "
                "RANDOMLY-initialized CLIP text tower. The pipeline runs, but open-vocab alignment "
                "is meaningless until real CLIP weights are loaded (pass clip_ckpt=... or text_model=...)."
            )
        feats = np.asarray(tm.encode_text(list(text)), np.float32)[None]  # (1, n, 512)
        self.set_text_features(feats)
        self.names = dict(enumerate(text))

    def forward_features(self, params, x, ctx: M.Ctx, txt_feats=None):
        tf = jnp.asarray(self.txt_feats if txt_feats is None else txt_feats, jnp.float32)
        if tf.shape[0] != x.shape[0]:
            tf = jnp.broadcast_to(tf, (x.shape[0],) + tf.shape[1:])
        ctx.guide = tf
        ctx.guide0 = tf
        return super().forward_features(params, x, ctx)

    def predict(self, params, x, dtype=jnp.float32, txt_feats=None):
        ctx = M.Ctx(train=False, dtype=dtype)
        outs = self.forward_features(params, x, ctx, txt_feats=txt_feats)
        return self.head.decode(params["model"][str(self.layers[-1].i)], outs)


class YOLOEModel(DetectionModel):
    """YOLOE open-vocabulary model (ref: nn/tasks.py YOLOEModel:969).

    Class prompts are embeddings: text prompts pass through the head's residual
    SwiGLU (get_tpe); visual prompts come from SAVPE over P3-grid masks
    (get_vpe). CLIP/MobileCLIP text encoding needs downloaded weights, so
    set_classes raises offline — use set_text_features / get_visual_pe."""

    task = "detect"
    is_yoloe = True

    def __init__(self, cfg="yoloe-11s.yaml", ch: int = 3, nc: int | None = None, verbose: bool = False):
        super().__init__(cfg, ch=ch, nc=nc, verbose=verbose)
        rng = __import__("numpy").random.default_rng(0)
        self.cls_pe = rng.normal(0, 1, (1, self.nc, 512)).astype("float32")

    def set_classes(self, text, params=None, text_model=None, clip_ckpt=None, **kwargs):
        """Text class prompts via the native CLIP text tower (ref: tasks.py
        YOLOEModel.set_classes → get_text_pe; the reference uses MobileCLIP-BLT,
        we accept any CLIP-layout checkpoint via clip_ckpt)."""
        import numpy as np

        from yolo_tpu.nn.text_model import build_text_model

        assert params is not None, "pass params= (text prompts run through the head's SwiGLU)"
        tm = text_model or build_text_model()
        if clip_ckpt:
            tm.load_torch(clip_ckpt)
        elif text_model is None:
            LOGGER.warning(
                "set_classes: no text_model/clip_ckpt supplied — embedding class names with a "
                "RANDOMLY-initialized CLIP text tower. The pipeline runs, but open-vocab alignment "
                "is meaningless until real CLIP weights are loaded (pass clip_ckpt=... or text_model=...)."
            )
        feats = np.asarray(tm.encode_text(list(text)), np.float32)[None]
        self.set_text_features(params, feats)
        self.names = dict(enumerate(text))

    def set_text_features(self, params, txt_feats):
        """Install raw text embeddings (1, n, embed): processed via head.get_tpe."""
        import numpy as np

        hp = params["model"][str(self.layers[-1].i)]
        self.cls_pe = np.asarray(self.head.get_tpe(hp, jnp.asarray(txt_feats, jnp.float32)))
        self.nc = self.cls_pe.shape[1]
        self.head.nc = self.nc
        self.head.no = self.nc + self.head.reg_max * 4

    def _head_inputs(self, params, x, ctx):
        """Walk the graph up to (not including) the head → its input features."""
        _, y, _ = self._walk(params, x, ctx, upto=len(self.layers) - 1)
        return [y[j] for j in self.layers[-1].f]

    def get_visual_pe(self, params, x, vp, dtype=jnp.float32):
        """Visual prompt embeddings for (B, Q, H/8, W/8) prompt masks."""
        ctx = M.Ctx(train=False, dtype=dtype)
        xs = self._head_inputs(params, x, ctx)
        return self.head.get_vpe(params["model"][str(self.layers[-1].i)], xs, vp, ctx)

    def set_vocab(self, params, texts, text_model=None, clip_ckpt=None):
        """Prompt-free re-parameterization (ref: nn/tasks.py YOLOEModel
        set_vocab:1057 + get_vocab:1086): fuse `texts` prompts into per-level
        vocabulary linears, and the model's CURRENT class prompts (typically
        the 1-class 'object' prompt the -pf checkpoints train with) into the
        region-proposal filter. Returns updated params."""
        import numpy as np

        from yolo_tpu.nn.text_model import build_text_model

        hi = str(self.layers[-1].i)
        hp = params["model"][hi]
        tm = text_model or build_text_model()
        if clip_ckpt:
            tm.load_torch(clip_ckpt)
        feats = np.asarray(tm.encode_text(list(texts)), np.float32)
        tpe = np.asarray(self.head.get_tpe(hp, jnp.asarray(feats[None])))[0]  # (nc_v, embed)
        new_hp = dict(hp)
        new_hp["lrpc"] = {
            "vocab": self.head.fuse_text(hp, tpe),
            "pf": self.head.fuse_text(hp, np.asarray(self.cls_pe)[0]),
        }
        params = dict(params)
        pm = dict(params["model"])
        pm[hi] = new_hp
        params["model"] = pm
        self.names = dict(enumerate(texts))
        self.nc = len(texts)
        self.head.nc = self.nc
        self.head.no = self.nc + self.head.reg_max * 4
        return params

    def predict_lrpc(self, params, x, conf: float = 0.001, dtype=jnp.float32):
        """Prompt-free inference (ref: head.py forward_lrpc:731) →
        ((B, 4+nc, A) decoded preds, (B, A) proposal keep mask)."""
        ctx = M.Ctx(train=False, dtype=dtype)
        xs = self._head_inputs(params, x, ctx)
        hp = params["model"][str(self.layers[-1].i)]
        outs, keep = self.head.forward_lrpc(hp, xs, ctx, conf=conf)
        return self.head.decode(hp, outs), keep

    def set_visual_pe(self, vpe):
        """Use visual prompt embeddings (B, Q, embed) as the class prompts."""
        import numpy as np

        self.cls_pe = np.asarray(vpe, np.float32)
        self.nc = self.cls_pe.shape[1]
        self.head.nc = self.nc
        self.head.no = self.nc + self.head.reg_max * 4

    def forward_features(self, params, x, ctx: M.Ctx, cls_pe=None):
        pe = jnp.asarray(self.cls_pe if cls_pe is None else cls_pe, jnp.float32)
        if pe.shape[0] != x.shape[0]:
            pe = jnp.broadcast_to(pe, (x.shape[0],) + pe.shape[1:])
        ctx.guide0 = pe
        return super().forward_features(params, x, ctx)

    def predict(self, params, x, dtype=jnp.float32, cls_pe=None):
        ctx = M.Ctx(train=False, dtype=dtype)
        outs = self.forward_features(params, x, ctx, cls_pe=cls_pe)
        if isinstance(self.head, M.YOLOESegment):
            return self.head.decode_with_masks(params["model"][str(self.layers[-1].i)], outs)
        return self.head.decode(params["model"][str(self.layers[-1].i)], outs)


class RTDETRDetectionModel(DetectionModel):
    """RT-DETR detection model (ref: nn/tasks.py RTDETRDetectionModel:758).

    The head is a query-based deformable decoder — predict returns the decoder's
    (B, nq, 4+nc) output directly (normalized xywh + sigmoid scores, no NMS)."""

    task = "detect"
    is_rtdetr = True

    def __init__(self, cfg="rtdetr-l.yaml", ch: int = 3, nc: int | None = None, verbose: bool = False):
        super().__init__(cfg, ch=ch, nc=nc, verbose=verbose)

    def predict(self, params, x, dtype=jnp.float32):
        ctx = M.Ctx(train=False, dtype=dtype)
        return self.forward_features(params, x, ctx)  # (B, nq, 4+nc)


class OBBModel(DetectionModel):
    """YOLO oriented-bounding-box model (ref: nn/tasks.py OBBModel:502)."""

    task = "obb"

    def __init__(self, cfg="yolov8n-obb.yaml", ch: int = 3, nc: int | None = None, verbose: bool = False):
        super().__init__(cfg, ch=ch, nc=nc, verbose=verbose)

    def predict(self, params, x, dtype=jnp.float32):
        ctx = M.Ctx(train=False, dtype=dtype)
        outs = self.forward_features(params, x, ctx)
        return self.head.decode_with_angle(params["model"][str(self.layers[-1].i)], outs)


def guess_model_task(cfg: dict) -> str:
    """Infer the task from a model yaml's head module (ref: nn/tasks.py
    guess_model_task:1743)."""
    rows = list(cfg.get("head", [])) or list(cfg.get("backbone", []))
    head = str(rows[-1][2]) if rows else "Detect"
    if head in ("Classify",):
        return "classify"
    if head in ("Segment", "YOLOESegment"):
        return "segment"
    if head in ("Pose",):
        return "pose"
    if head in ("OBB",):
        return "obb"
    return "detect"


def model_class_for(cfg: dict, task: str | None = None):
    """Task/architecture → model class, used by every checkpoint loader so a
    saved Segmentation/Pose/OBB/RTDETR model round-trips as its own subclass
    (not the DetectionModel base)."""
    rows = list(cfg.get("head", []))
    head = str(rows[-1][2]) if rows else "Detect"
    if head == "RTDETRDecoder":
        return RTDETRDetectionModel
    if head in ("WorldDetect",):
        return WorldModel
    if head in ("YOLOEDetect", "YOLOESegment"):
        return YOLOEModel
    task = task or guess_model_task(cfg)
    return {
        "classify": ClassificationModel,
        "segment": SegmentationModel,
        "pose": PoseModel,
        "obb": OBBModel,
    }.get(task, DetectionModel)


class Ensemble:
    """NMS-ensemble of detection models (ref: nn/tasks.py Ensemble:1267).

    The reference concatenates each member's decoded predictions along the
    anchor axis and lets NMS merge them ("nms ensemble", ref :1305). Members
    must share nc; strides/names come from the first member. The params pytree
    is a tuple of member param trees, so the whole ensemble jits as one
    program through the standard predictor path.
    """

    def __init__(self, members):
        assert members, "Ensemble needs at least one (model, params) member"
        self.models = [m for m, _ in members]
        ncs = {getattr(m, "nc", None) for m in self.models}
        assert len(ncs) == 1, f"ensemble members disagree on nc: {ncs}"
        first = self.models[0]
        self.nc = first.nc
        self.names = first.names
        self.task = getattr(first, "task", "detect")
        # predictor snaps imgsz to the coarsest stride across members
        self.stride = [max(int(max(m.stride)) for m in self.models)]
        self.yaml = first.yaml

    def init(self, seed: int = 0):
        return tuple(m.init(seed + i) for i, m in enumerate(self.models))

    def fuse(self, params):
        return tuple(m.fuse(p) for m, p in zip(self.models, params))

    def predict(self, params, x, dtype=jnp.float32):
        ys = [m.predict(p, x, dtype=dtype) for m, p in zip(self.models, params)]
        return jnp.concatenate(ys, axis=-1)  # (B, 4+nc, sum A)
