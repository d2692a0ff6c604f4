"""Functional JAX modules for the YOLO graph.

TPU-first re-design of the reference's torch modules (ref:
ultralytics/nn/modules/conv.py Conv:39, block.py C2f:294/SPPF:216/Bottleneck:470/
DFL:58, head.py Detect:26). Differences by design:

  - **Functional**: a module is a static-config object with ``init(key) -> params``
    and ``__call__(params, x, ctx) -> y``; params are nested dicts (pytrees).
  - **NHWC / HWIO** layouts (TPU-native), bfloat16 compute via ``ctx.dtype``.
  - **Param tree keys mirror torch submodule names** (cv1/cv2/m/0/conv/bn/weight…)
    so a torch state_dict maps onto the tree by name, enabling checkpoint import
    and oracle parity tests without any torch code in the hot path.
  - BatchNorm batch-statistics in train mode are *collected* into ``ctx.stats``
    (path-keyed) and merged into params by the trainer — keeping apply pure.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3  # torch BatchNorm2d default eps used by the reference
BN_MOMENTUM = 0.03  # reference trainer sets bn momentum=0.03 (engine/trainer.py via torch defaults)


def autopad(k: int, p: int | None = None, d: int = 1) -> int:
    """'same'-style padding for odd kernels (ref: nn/modules/conv.py autopad:30)."""
    if d > 1:
        k = d * (k - 1) + 1
    return k // 2 if p is None else p


@dataclass
class Ctx:
    """Per-call context threaded through module applies."""

    train: bool = False
    dtype: Any = jnp.float32  # activation/compute dtype
    stats: dict = field(default_factory=dict)  # path -> (batch_mean, batch_var, n)
    # rematerialize per-layer activations in the backward pass (jax.checkpoint)
    # — trades recompute FLOPs for HBM, enabling larger batch/imgsz training
    remat: bool = False
    # open-vocab guide state (YOLO-World): text embeddings threaded to
    # C2fAttn/WorldDetect; ImagePoolingAttn refreshes `guide` mid-walk while
    # WorldDetect always reads the original `guide0` (ref: tasks.py WorldModel:908)
    guide: Any = None
    guide0: Any = None
    # RT-DETR denoising group (utils/cdn.py make_cdn_batch output + attn_mask)
    dn: Any = None
    # int8 PTQ calibration: when set to a dict, every ConvBNAct records the
    # max |input| under its module path (consumed by nn/quantize.py
    # calibrate_act_scales to bake static activation scales)
    calib: Any = None
    # neck algebra rewrite (inference): compute Upsample→Concat→C2f chains
    # without materializing the upsampled map or the concat — the 1x1 cv1
    # commutes with nearest upsample (see C2f.call_upconcat)
    neck_opt: bool = False
    # route plain C2f blocks through the fused VMEM-resident Pallas kernel
    # (ops/pallas_c2f.py); inference with fused params only
    pallas_c2f: bool = False
    pallas_interpret: bool = False
    # classify-head dropout on the pooled features (ref head.py Classify:427
    # nn.Dropout(p)); active only when train and an rng key is supplied
    dropout: float = 0.0
    rng: Any = None


def silu(x):
    return x * jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# int8-resident activation flow (PTQ inference, nn/quantize.py)
#
# When calibration attached per-conv OUTPUT scales (y_scale), quantized convs
# return a QTensor — int8 payload + f32 scale — and downstream modules keep
# the activation in int8 through concat/split/upsample/maxpool, so HBM moves
# 1 byte/element instead of 2 (bf16). The forward is HBM-bandwidth-bound on
# v5e (measured 71% of peak at bf16), so byte halving is the perf lever; the
# int8 MXU's 2x MAC rate comes along for free. Any module without an int8
# path just dequantizes (deq) — correctness never depends on coverage.
# ---------------------------------------------------------------------------


class QTensor(NamedTuple):
    q: Any  # int8 array, NHWC
    s: Any  # f32 scalar scale: x ≈ q * s


def deq(x, dtype):
    """QTensor → dense array in `dtype`; passthrough for plain arrays."""
    if isinstance(x, QTensor):
        return x.q.astype(dtype) * x.s.astype(dtype)
    return x


def qconcat(xs, dtype):
    """Channel-concat a mix of QTensors/arrays.

    All-QTensor inputs stay int8: everything is rescaled (int8→int8, ≤0.5 LSB
    error) to the max input scale so the result has one scale. Mixed inputs
    dequantize to `dtype`.
    """
    if all(isinstance(x, QTensor) for x in xs) and len(xs) > 0:
        s = xs[0].s
        for x in xs[1:]:
            s = jnp.maximum(s, x.s)
        parts = []
        for x in xs:
            r = (x.s / s).astype(jnp.bfloat16)
            parts.append(jnp.clip(jnp.round(x.q.astype(jnp.bfloat16) * r), -127, 127).astype(jnp.int8))
        return QTensor(jnp.concatenate(parts, axis=-1), s)
    return jnp.concatenate([deq(x, dtype) for x in xs], axis=-1)


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------


class ConvBNAct:
    """Conv2d(bias=False) + BatchNorm + act (ref Conv), fusable for inference.

    act=True uses DEFAULT_ACT (normally "silu"; parse_model temporarily swaps
    it when a model yaml carries an `activation:` override, like yolov6's ReLU
    — ref: nn/tasks.py:1552, but restored after the build instead of leaking).
    An explicit string ("relu", "gelu") pins the act regardless of the default.
    """

    DEFAULT_ACT = "silu"

    def __init__(self, c1: int, c2: int, k: int = 1, s: int = 1, p: int | None = None, g: int = 1, d: int = 1, act=True):
        self.c1, self.c2, self.k, self.s, self.g, self.d = c1, c2, k, s, g, d
        self.p = autopad(k, p, d)
        self.act = ConvBNAct.DEFAULT_ACT if act is True else act if isinstance(act, str) else None

    def init(self, rng):
        # He/kaiming-uniform fan_in init matching torch Conv2d defaults.
        # numpy on host: eager per-op device dispatch at init time is expensive
        # on a remote TPU; params upload once at the first jit call instead.
        fan_in = self.c1 // self.g * self.k * self.k
        bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
        w = rng.uniform(-bound, bound, (self.k, self.k, self.c1 // self.g, self.c2)).astype(np.float32)
        return {
            "conv": {"weight": w},
            "bn": {
                "weight": np.ones((self.c2,), np.float32),
                "bias": np.zeros((self.c2,), np.float32),
                "running_mean": np.zeros((self.c2,), np.float32),
                "running_var": np.ones((self.c2,), np.float32),
            },
        }

    def __call__(self, p, x, ctx: Ctx, path: str = ""):
        if "w_int8" in p["conv"]:  # PTQ path (nn/quantize.py): int8 MXU conv
            return self._call_int8(p, x, ctx)
        x = deq(x, ctx.dtype)  # a quantized producer may feed a float conv
        if ctx.calib is not None:  # PTQ calibration: record max |input| per conv
            amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
            ctx.calib[path] = jnp.maximum(ctx.calib[path], amax) if path in ctx.calib else amax
        w = p["conv"]["weight"].astype(ctx.dtype)
        # same-dtype in/out (a mixed preferred_element_type breaks the conv
        # transpose rule under grad); the MXU still accumulates bf16 in f32.
        # BN (train/unfused) math runs in f32; the FUSED inference path stays
        # entirely in ctx.dtype — converting every conv output to f32 for the
        # bias+SiLU epilogue forced XLA to spill f32 intermediates to HBM
        # (measured 128 MB/frame accessed vs ~45 MB logical on yolov8-small;
        # the model is HBM-bound, so that epilogue cast was the bottleneck)
        y = jax.lax.conv_general_dilated(
            x.astype(ctx.dtype),
            w,
            window_strides=(self.s, self.s),
            padding=[(self.p, self.p), (self.p, self.p)],
            rhs_dilation=(self.d, self.d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.g,
        )
        if "bn" not in p:  # fused path: bias + activation in ctx.dtype
            if "bias" in p["conv"]:
                y = y + p["conv"]["bias"].astype(ctx.dtype)
            if self.act == "silu":
                y = silu(y)
            elif self.act == "relu":
                y = jnp.maximum(y, jnp.zeros((), y.dtype))
            elif self.act == "gelu":
                y = jax.nn.gelu(y)
            if ctx.calib is not None:  # output amax → int8-flow y_scale
                amax_o = jnp.max(jnp.abs(y.astype(jnp.float32)))
                key = f"OUT::{path}"
                ctx.calib[key] = jnp.maximum(ctx.calib[key], amax_o) if key in ctx.calib else amax_o
            return y
        bn = p["bn"]
        if ctx.train:
            # Batch stats accumulate in f32 via fused reductions that READ the
            # bf16 conv output directly; the normalize+activation chain then
            # runs in ctx.dtype. The previous f32 cast here had 3 consumers
            # (mean/var/normalize), so XLA materialized a full f32 copy of
            # every conv activation — under amp that inflated the training
            # forward's HBM traffic and the save-for-backward bytes (measured
            # on v5e @b16 640×512: train-mode fwd 22.3 → 19.4 ms, full train
            # step 63.4 → 59.9 ms, b32 step 107.2 → 101.4 ms). amp=False
            # keeps ctx.dtype=f32 and is numerically unchanged.
            axes = (0, 1, 2)
            y32 = y.astype(jnp.float32)
            mean = jnp.mean(y32, axes)
            var = jnp.var(y32, axes)
            n = y.shape[0] * y.shape[1] * y.shape[2]
            ctx.stats[f"{path}/bn"] = (jax.lax.stop_gradient(mean), jax.lax.stop_gradient(var), n)
        else:
            mean, var = bn["running_mean"], bn["running_var"]
            y = y.astype(jnp.float32)  # unfused eval: exact f32 BN (parity path)
        scale = (bn["weight"] * jax.lax.rsqrt(var + BN_EPS)).astype(y.dtype)
        y = (y - mean.astype(y.dtype)) * scale + bn["bias"].astype(y.dtype)
        if self.act == "silu":
            y = silu(y)
        elif self.act == "relu":
            y = jnp.maximum(y, jnp.zeros((), y.dtype))
        elif self.act == "gelu":
            y = jax.nn.gelu(y)
        return y.astype(ctx.dtype)

    def _call_int8(self, p, x, ctx: Ctx):
        """Post-training-quantized conv: int8 activations × per-output-channel
        int8 weights on the MXU's int8 path (2x the bf16 MAC rate on v5e).

        Input: a QTensor rides straight into the conv (no quantize pass at
        all); a dense array is quantized with the calibrated static x_scale
        (or a dynamic per-tensor max as last resort). Output: with a
        calibrated y_scale the dequant+bias+act epilogue requantizes in one
        fused pass and returns a QTensor — activations stay int8 in HBM
        end-to-end through the backbone/neck (see QTensor above)."""
        if isinstance(x, QTensor):
            xq, sx = x.q, x.s
        else:
            xs = p["conv"].get("x_scale")
            if xs is not None:
                # static calibrated scale: no per-call max reduction; bf16
                # quantize pass (integers ≤ 256 exact in bf16; ~0.4% division
                # error ≪ ±0.5 LSB quant noise)
                sx = xs
                inv = (1.0 / jnp.asarray(sx, jnp.float32)).astype(jnp.bfloat16)
                xq = jnp.clip(jnp.round(x.astype(jnp.bfloat16) * inv), -127, 127).astype(jnp.int8)
            else:
                # dynamic activation scale: symmetric per-tensor
                x = x.astype(jnp.float32)
                ax = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8)
                sx = ax / 127.0
                xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq,
            p["conv"]["w_int8"],
            window_strides=(self.s, self.s),
            padding=[(self.p, self.p), (self.p, self.p)],
            rhs_dilation=(self.d, self.d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.g,
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        y = y * (sx * p["conv"]["w_scale"]) + p["conv"]["bias"]
        if self.act == "silu":
            y = silu(y)
        elif self.act == "relu":
            y = jnp.maximum(y, 0.0)
        elif self.act == "gelu":
            y = jax.nn.gelu(y)
        ys = p["conv"].get("y_scale")
        if ys is not None:
            s_out = jnp.asarray(ys, jnp.float32)
            q = jnp.clip(jnp.round(y / s_out), -127, 127).astype(jnp.int8)
            return QTensor(q, s_out)
        return y.astype(ctx.dtype)

    def fuse(self, p):
        """Fold BN into conv weight/bias (exact, fp32) for inference.

        Uses the array namespace of the params (numpy params stay on host)."""
        if "bn" not in p:
            return p
        bn = p["bn"]
        xp = np if isinstance(bn["weight"], np.ndarray) else jnp
        scale = bn["weight"] / xp.sqrt(bn["running_var"] + BN_EPS)
        w = p["conv"]["weight"] * scale[None, None, None, :]
        b = bn["bias"] - bn["running_mean"] * scale
        return {"conv": {"weight": w, "bias": b}}


class DWConv(ConvBNAct):
    """Depth-wise Conv (ref: nn/modules/conv.py DWConv:196)."""

    def __init__(self, c1, c2, k=1, s=1, d=1, act=True):
        super().__init__(c1, c2, k, s, g=math.gcd(c1, c2), d=d, act=act)


class Conv2d:
    """Plain conv with bias (the final 1x1 heads inside Detect)."""

    def __init__(self, c1: int, c2: int, k: int = 1, s: int = 1, p: int | None = None):
        self.c1, self.c2, self.k, self.s = c1, c2, k, s
        self.p = autopad(k, p)

    def init(self, rng):
        fan_in = self.c1 * self.k * self.k
        bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
        bb = math.sqrt(1.0 / fan_in)
        return {
            "weight": rng.uniform(-bound, bound, (self.k, self.k, self.c1, self.c2)).astype(np.float32),
            "bias": rng.uniform(-bb, bb, (self.c2,)).astype(np.float32),
        }

    def __call__(self, p, x, ctx: Ctx, path: str = ""):
        # bias add stays in ctx.dtype: an f32 epilogue here materialized a
        # full-resolution f32 copy of every head map (same HBM spill the fused
        # ConvBNAct epilogue had — see the note there); the MXU already
        # accumulates in f32, and downstream decode re-ups precision where it
        # matters (dfl_project / dist2bbox run f32)
        y = jax.lax.conv_general_dilated(
            deq(x, ctx.dtype).astype(ctx.dtype),
            p["weight"].astype(ctx.dtype),
            window_strides=(self.s, self.s),
            padding=[(self.p, self.p), (self.p, self.p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + p["bias"].astype(ctx.dtype)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


class Bottleneck:
    """Standard bottleneck with optional residual (ref: block.py Bottleneck:470)."""

    def __init__(self, c1, c2, shortcut=True, g=1, k=(3, 3), e=0.5):
        c_ = int(c2 * e)
        # k entries may be ints or (kh, kw) pairs (square only, like all YOLO convs)
        k0 = k[0][0] if isinstance(k[0], (tuple, list)) else k[0]
        k1 = k[1][0] if isinstance(k[1], (tuple, list)) else k[1]
        self.cv1 = ConvBNAct(c1, c_, k0, 1)
        self.cv2 = ConvBNAct(c_, c2, k1, 1, g=g)
        self.add = shortcut and c1 == c2

    def init(self, rng):
        return {"cv1": self.cv1.init(rng), "cv2": self.cv2.init(rng)}

    def __call__(self, p, x, ctx, path=""):
        y = self.cv2(p["cv2"], self.cv1(p["cv1"], x, ctx, f"{path}/cv1"), ctx, f"{path}/cv2")
        if not self.add:
            return y
        if isinstance(x, QTensor) or isinstance(y, QTensor):
            # residual add across two int8 scales → dense; the consumer conv
            # re-quantizes with its own calibrated x_scale
            return deq(x, ctx.dtype) + deq(y, ctx.dtype)
        return x + y


class C2f:
    """Fast CSP bottleneck with 2 convs (ref: block.py C2f:294)."""

    def __init__(self, c1, c2, n=1, shortcut=False, g=1, e=0.5):
        self.c = int(c2 * e)
        self.n = n
        self.cv1 = ConvBNAct(c1, 2 * self.c, 1, 1)
        self.cv2 = ConvBNAct((2 + n) * self.c, c2, 1)
        self.m = [Bottleneck(self.c, self.c, shortcut, g, k=(3, 3), e=1.0) for _ in range(n)]

    def init(self, rng):
        return {
            "cv1": self.cv1.init(rng),
            "cv2": self.cv2.init(rng),
            "m": {str(i): m.init(rng) for i, m in enumerate(self.m)},
        }

    def __call__(self, p, x, ctx, path=""):
        if (
            ctx.pallas_c2f
            and type(self) is C2f
            and not ctx.train
            and "bn" not in p["cv1"]
            and "w_int8" not in p["cv1"]["conv"]
            and not isinstance(x, QTensor)
            and self.m
            and self.m[0].cv1.k == 3
            and self.m[0].cv2.k == 3
        ):
            from yolo_tpu.ops.pallas_c2f import fused_c2f

            return fused_c2f(
                x, p, n=len(self.m), shortcut=self.m[0].add,
                interpret=ctx.pallas_interpret, dtype=ctx.dtype,
            )
        y = self.cv1(p["cv1"], x, ctx, f"{path}/cv1")
        return self._tail(p, y, ctx, path)

    def _tail(self, p, y, ctx, path):
        """Everything after cv1: split, bottleneck chain, concat, cv2."""
        if isinstance(y, QTensor):  # int8-resident split (same scale both halves)
            parts = [QTensor(y.q[..., : self.c], y.s), QTensor(y.q[..., self.c :], y.s)]
        else:
            parts = [y[..., : self.c], y[..., self.c :]]
        for i, m in enumerate(self.m):
            parts.append(m(p["m"][str(i)], parts[-1], ctx, f"{path}/m/{i}"))
        return self.cv2(p["cv2"], qconcat(parts, ctx.dtype), ctx, f"{path}/cv2")

    def call_upconcat(self, p, small, skip, scale, ctx, path=""):
        """cv1(concat(up_nearest(small), skip)) with neither the upsampled map
        nor the concat materialized: a 1x1 conv commutes exactly with nearest
        upsample, so cv1 splits along its input channels into two matmuls —
        the `small` half runs at LOW resolution (scale² fewer FLOPs) and only
        its 2c-channel result is broadcast up, fused by XLA into the add+SiLU
        epilogue. Exact algebra; the measured win is the neck upsample
        materializations the roofline attributed ~6% of HBM traffic to
        (demos/roofline.py, README "Roofline"). Inference-only (fused params)."""
        cv1p = p["cv1"]
        assert "bn" not in cv1p and "w_int8" not in cv1p["conv"], "neck_opt needs fused float params"
        if (
            ctx.pallas_c2f
            and type(self) is C2f
            and scale == 2
            and not isinstance(small, QTensor)
            and not isinstance(skip, QTensor)
            and self.m
            and self.m[0].cv1.k == 3
            and self.m[0].cv2.k == 3
        ):
            from yolo_tpu.ops.pallas_c2f import fused_c2f_upconcat

            return fused_c2f_upconcat(
                small, skip, p, n=len(self.m), shortcut=self.m[0].add,
                interpret=ctx.pallas_interpret, dtype=ctx.dtype,
            )
        dt = ctx.dtype
        w = cv1p["conv"]["weight"]  # (1, 1, c_small + c_skip, 2c)
        cs = small.shape[-1]

        def c1x1(x, wpart):
            return jax.lax.conv_general_dilated(
                x.astype(dt), wpart.astype(dt), (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        ya = c1x1(deq(small, dt), w[:, :, :cs])  # (B, h, w, 2c) at small res
        yb = c1x1(deq(skip, dt), w[:, :, cs:])
        b, h, wd, c = ya.shape
        up = jnp.broadcast_to(ya[:, :, None, :, None, :], (b, h, scale, wd, scale, c)).reshape(
            b, h * scale, wd * scale, c
        )
        y = silu(up + yb + cv1p["conv"]["bias"].astype(dt))
        return self._tail(p, y, ctx, path)


class SPPF:
    """Spatial pyramid pooling — fast (ref: block.py SPPF:216)."""

    def __init__(self, c1, c2, k=5):
        c_ = c1 // 2
        self.k = k
        self.cv1 = ConvBNAct(c1, c_, 1, 1)
        self.cv2 = ConvBNAct(c_ * 4, c2, 1, 1)

    def init(self, rng):
        return {"cv1": self.cv1.init(rng), "cv2": self.cv2.init(rng)}

    def _pool(self, x):
        pad = self.k // 2
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, self.k, self.k, 1), (1, 1, 1, 1), [(0, 0), (pad, pad), (pad, pad), (0, 0)]
        )

    def __call__(self, p, x, ctx, path=""):
        y = [self.cv1(p["cv1"], x, ctx, f"{path}/cv1")]
        for _ in range(3):
            last = y[-1]
            if isinstance(last, QTensor):  # max is monotone in q — pool int8
                y.append(QTensor(self._pool_int8(last.q), last.s))
            else:
                y.append(self._pool(last))
        return self.cv2(p["cv2"], qconcat(y, ctx.dtype), ctx, f"{path}/cv2")

    def _pool_int8(self, q):
        pad = self.k // 2
        return jax.lax.reduce_window(
            q, jnp.int8(jnp.iinfo(jnp.int8).min), jax.lax.max, (1, self.k, self.k, 1), (1, 1, 1, 1),
            [(0, 0), (pad, pad), (pad, pad), (0, 0)]
        )


def int8_flow_paths(module, base: str) -> set:
    """Param paths under `base` whose convs may carry a `y_scale` (i.e. EMIT
    QTensor) — only convs whose enclosing module natively handles int8
    payloads qualify. quantize_params restricts the int8-resident flow to
    these paths so an uncovered block (C3, attention, v9/v12 exotics) never
    receives a QTensor from its own sub-convs; together with the graph
    walker's input dequant for non-QTENSOR_MODULES layers (tasks._apply_layer)
    this makes correctness truly independent of per-class int8 coverage."""
    if isinstance(module, C2f):  # subclasses (C3k2, ...) may carry non-Bottleneck children
        paths = {f"{base}/cv1", f"{base}/cv2"}
        for i, m in enumerate(module.m):
            paths |= int8_flow_paths(m, f"{base}/m/{i}")
        return paths
    if isinstance(module, Bottleneck):
        # with a residual shortcut the cv2 output is immediately dequantized
        # for the add — emitting int8 there only adds rounding error
        return {f"{base}/cv1"} if module.add else {f"{base}/cv1", f"{base}/cv2"}
    if isinstance(module, SPPF):
        return {f"{base}/cv1", f"{base}/cv2"}
    if isinstance(module, ConvBNAct):
        return {base}
    return set()


class Concat:
    """Channel concat (ref: conv.py Concat:655). Axis 1 in NCHW == -1 in NHWC."""

    def __init__(self, dim=1):
        assert dim == 1, "only channel concat supported"

    def init(self, rng):
        return {}

    def __call__(self, p, xs, ctx, path=""):
        return qconcat(xs, ctx.dtype)


class Upsample:
    """Nearest 2x upsample (ref YAML uses nn.Upsample [None, 2, 'nearest'])."""

    def __init__(self, size=None, scale_factor=2, mode="nearest"):
        assert mode == "nearest"
        self.scale = int(scale_factor)

    def init(self, rng):
        return {}

    def __call__(self, p, x, ctx, path=""):
        if isinstance(x, QTensor):  # nearest replication is scale-invariant
            return QTensor(self._up(x.q), x.s)
        return self._up(x)

    def _up(self, x):
        b, h, w, c = x.shape
        s = self.scale
        return jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, s, w, s, c)).reshape(b, h * s, w * s, c)


class MaxPool2d:
    """nn.MaxPool2d equivalent for YAML graphs that use it."""

    def __init__(self, kernel_size=2, stride=2, padding=0):
        self.k, self.s, self.p = kernel_size, stride, padding

    def init(self, rng):
        return {}

    def __call__(self, p, x, ctx, path=""):
        if self.p:
            pad = [(0, 0), (self.p, self.p), (self.p, self.p), (0, 0)]
            return jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, self.k, self.k, 1), (1, self.s, self.s, 1), pad
            )
        # torch MaxPool2d(p=0) floors the output size — VALID matches exactly
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, self.k, self.k, 1), (1, self.s, self.s, 1), "VALID")


class SPP:
    """Spatial pyramid pooling, parallel kernels (ref: block.py SPP)."""

    def __init__(self, c1, c2, k=(5, 9, 13)):
        c_ = c1 // 2
        self.k = tuple(k)
        self.cv1 = ConvBNAct(c1, c_, 1, 1)
        self.cv2 = ConvBNAct(c_ * (len(k) + 1), c2, 1, 1)

    def init(self, rng):
        return {"cv1": self.cv1.init(rng), "cv2": self.cv2.init(rng)}

    def __call__(self, p, x, ctx: Ctx, path=""):
        x = self.cv1(p["cv1"], x, ctx, f"{path}/cv1")
        outs = [x]
        for k in self.k:
            pad = [(0, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0)]
            outs.append(jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1), pad))
        return self.cv2(p["cv2"], jnp.concatenate(outs, -1), ctx, f"{path}/cv2")


class ZeroPad2d:
    """nn.ZeroPad2d for YAML graphs (v3-tiny pads before its stride-1 maxpool)."""

    def __init__(self, padding):
        # torch order: (left, right, top, bottom)
        self.pad = list(padding) if isinstance(padding, (list, tuple)) else [padding] * 4

    def init(self, rng):
        return {}

    def __call__(self, p, x, ctx, path=""):
        l, r, t, b = self.pad
        return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))


# ---------------------------------------------------------------------------
# Detect head
# ---------------------------------------------------------------------------


class _Seq:
    """Two-submodule sequential with torch-style child names ("0", "1")."""

    def __init__(self, m0, m1):
        self.mods = [m0, m1]

    def init(self, rng):
        return {"0": self.mods[0].init(rng), "1": self.mods[1].init(rng)}

    def __call__(self, p, x, ctx, path=""):
        x = self.mods[0](p["0"], x, ctx, f"{path}/0")
        return self.mods[1](p["1"], x, ctx, f"{path}/1")


def dfl_project(box, proj):
    """DFL expectation: softmax(box) @ arange over the last (reg_max) axis,
    written as ONE f32-accumulated matmul against [ones, arange] — so the
    max-sub/exp fuse into the dot's operand and the softmax never
    materializes. The textbook jax.nn.softmax(...astype(f32)) version was the
    single largest HBM consumer in the compiled forward: XLA materialized
    three f32 (B, A, 4, reg_max) tensors (sub/exp, reduce-window sum, div) ≈
    21 MB/frame at 27200 anchors — more than all conv activations combined
    (measured on v5e; the forward is bandwidth-bound, see demos/roofline.py).

    box: (..., 4, reg_max) raw bin logits in compute dtype (bf16 in the fused
    pipeline, f32 in parity tests); returns (..., 4) f32 expected bins.
    exp stays in the input dtype — its [0, 1] range loses ~0.4% relative in
    bf16, an order below the upstream bf16 conv noise — while the reduction
    and the final divide run in f32 (preferred_element_type)."""
    x = box - jax.lax.stop_gradient(box.max(axis=-1, keepdims=True))
    e = jnp.exp(x)
    rhs = jnp.stack([jnp.ones_like(proj), proj], axis=-1).astype(e.dtype)  # (reg_max, 2)
    nd = jax.lax.dot_general(
        e, rhs, (((e.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (..., 4, 2): [sum(e), sum(e * proj)]
    return nd[..., 1] / nd[..., 0]


class Detect:
    """Anchor-free detect head with DFL box regression (ref: head.py Detect:26).

    Uses the reference's *legacy* branch structure (cv3 = Conv,Conv,Conv2d) since
    yolov8-family YAMLs select legacy=True in parse_model (ref: nn/tasks.py:1643-1673).
    Decode (`_inference` equivalent) happens in `decode`, fused into the jit graph.
    """

    def __init__(self, nc: int = 80, ch: tuple = (), legacy: bool = True):
        self.nc = nc
        self.nl = len(ch)
        self.reg_max = 16
        self.no = nc + self.reg_max * 4
        self.stride = [8, 16, 32][: self.nl] if self.nl <= 3 else [4, 8, 16, 32]  # recalibrated at build
        self.legacy = legacy
        c2 = max(16, ch[0] // 4, self.reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = [
            [ConvBNAct(x, c2, 3), ConvBNAct(c2, c2, 3), Conv2d(c2, 4 * self.reg_max, 1)] for x in ch
        ]
        if legacy:  # v3/v5/v8/v9 branch structure (ref: head.py :96-100)
            self.cv3 = [
                [ConvBNAct(x, c3, 3), ConvBNAct(c3, c3, 3), Conv2d(c3, self.nc, 1)] for x in ch
            ]
        else:  # v10/v11 depthwise-separable cls branch (ref: head.py :101-111)
            self.cv3 = [
                [
                    _Seq(DWConv(x, x, 3), ConvBNAct(x, c3, 1)),
                    _Seq(DWConv(c3, c3, 3), ConvBNAct(c3, c3, 1)),
                    Conv2d(c3, self.nc, 1),
                ]
                for x in ch
            ]

    def init(self, rng):
        p = {"cv2": {}, "cv3": {}}
        for l in range(self.nl):
            p["cv2"][str(l)] = {}
            p["cv3"][str(l)] = {}
            for j in range(3):
                p["cv2"][str(l)][str(j)] = self.cv2[l][j].init(rng)
                p["cv3"][str(l)][str(j)] = self.cv3[l][j].init(rng)
        # DFL projection — fixed arange weights, non-trainable (ref: block.py DFL:58)
        p["dfl"] = {"conv": {"weight": np.arange(self.reg_max, dtype=np.float32).reshape(1, 1, self.reg_max, 1)}}
        return self.bias_init(p)

    def bias_init(self, p):
        """Detection bias priors (ref: head.py bias_init:191)."""
        for l, s in enumerate(self.stride):
            p["cv2"][str(l)]["2"]["bias"] = np.ones_like(np.asarray(p["cv2"][str(l)]["2"]["bias"]))
            cls_bias = math.log(5 / self.nc / (640 / s) ** 2)
            p["cv3"][str(l)]["2"]["bias"] = np.full_like(np.asarray(p["cv3"][str(l)]["2"]["bias"]), cls_bias)
        return p

    def __call__(self, p, xs, ctx, path=""):
        """Per-level raw outputs: list of (B, H, W, no) with box dist bins then cls logits."""
        outs = []
        for l, x in enumerate(xs):
            b = x
            for j in range(3):
                b = self.cv2[l][j](p["cv2"][str(l)][str(j)], b, ctx, f"{path}/cv2/{l}/{j}")
            c = x
            for j in range(3):
                c = self.cv3[l][j](p["cv3"][str(l)][str(j)], c, ctx, f"{path}/cv3/{l}/{j}")
            outs.append(jnp.concatenate([b, c], axis=-1))
        return outs

    def decode_parts(self, p, outs, xywh: bool = True):
        """Fused DFL decode → (boxes (B, A, 4) px, scores (B, A, nc) sigmoid).

        The anchors-major parts layout is what NMS actually consumes
        (ops/nms.py); the reference's transposed (B, 4+nc, A) exists only for
        API parity via `decode`. Keeping the hot path in parts form avoids a
        swapaxes→re-transpose round trip whose materialization XLA handles
        badly (measured ~26 ms/512-chunk of layout churn on v5e).
        """
        from yolo_tpu.ops.anchors import dist2bbox, make_anchors

        feat_shapes = [(o.shape[1], o.shape[2]) for o in outs]
        anchors, strides = make_anchors(feat_shapes, self.stride, 0.5)
        anchors = jnp.asarray(anchors)  # (A, 2)
        strides = jnp.asarray(strides)  # (A, 1)

        proj = p["dfl"]["conv"]["weight"].reshape(self.reg_max)
        # per-level decode: DFL + sigmoid run in each level's own NHWC layout
        # (concatenating (B, A, no) first forced layout copies of the full
        # 65-channel map; the per-level outputs here are (B, A_l, 4) / (B,
        # A_l, nc) — anchors-sized, 16x smaller than the raw map)
        dists, clss = [], []
        for o in outs:
            B, H, W, _ = o.shape
            box = o[..., : self.reg_max * 4].reshape(B, H * W, 4, self.reg_max)
            dists.append(dfl_project(box, proj))  # (B, A_l, 4) f32
            clss.append(o[..., self.reg_max * 4 :].reshape(B, H * W, self.nc))
        dist = jnp.concatenate(dists, axis=1)  # (B, A, 4)
        cls = jnp.concatenate(clss, axis=1)
        dbox = dist2bbox(dist, anchors[None], xywh=xywh, axis=-1) * strides[None]
        return dbox, jax.nn.sigmoid(cls.astype(jnp.float32))

    def decode_from_inputs(self, p, xs, ctx, xywh: bool = True):
        """Branches + DFL decode straight from the head INPUTS — the parts
        hot path. Skips __call__'s per-level concat([box64, cls], -1) that
        decode_parts immediately slices apart: at chunk 512 the 65-channel
        concat write + 64-channel slice read at four levels was ~7 MB/frame
        of pure layout traffic in the compiled forward (demos/fwd_analysis.py
        buffer table, round 4). Box bins reshape per level in their own NHWC
        layout; cls sigmoids per level."""
        from yolo_tpu.ops.anchors import dist2bbox, make_anchors

        proj = p["dfl"]["conv"]["weight"].reshape(self.reg_max)
        bins, clss, feat_shapes = self._branch_walk(p, xs, ctx)
        dists = [dfl_project(b.reshape(b.shape[0], b.shape[1], 4, self.reg_max), proj) for b in bins]
        clss = [jax.nn.sigmoid(c.astype(jnp.float32)) for c in clss]
        anchors, strides = make_anchors(feat_shapes, self.stride, 0.5)
        dist = jnp.concatenate(dists, axis=1)  # (B, A, 4)
        cls = jnp.concatenate(clss, axis=1)
        dbox = dist2bbox(dist, jnp.asarray(anchors)[None], xywh=xywh, axis=-1) * jnp.asarray(strides)[None]
        return dbox, cls

    def logits_from_inputs(self, p, xs, ctx):
        """The lazy-decode hot path: raw reg bins + sigmoid scores, NO box
        decode. NMS ranks candidates by score alone, so the DFL projection and
        the anchor arithmetic only need to run on the top-k winners — the
        all-anchor exp/dot intermediates ((B, A, 4, 2) f32 + (B, A, 4) boxes,
        ~560 MB/512-chunk at P2 scale) never exist. Pair with
        ops/nms.non_max_suppression_logits, which gathers the k winning bin
        rows and reproduces decode_from_inputs' math op-for-op on them.
        Bins stay a PER-LEVEL tuple: each level's (B, A_l, 4*reg_max) is a
        free bitcast view of its conv output, while a cross-level concat
        would materialize a fresh (B, A, 64) buffer (~0.9 GB/512-chunk —
        measured 11% slower than the parts route on chip, the whole win
        inverted). The NMS gathers per level with offset arithmetic instead.
        Returns (bins tuple[(B, A_l, 4*reg_max)] compute-dtype,
        scores (B, A, nc) f32, anchors (A, 2) f32, strides (A, 1) f32,
        proj (reg_max,) f32)."""
        from yolo_tpu.ops.anchors import make_anchors

        proj = p["dfl"]["conv"]["weight"].reshape(self.reg_max).astype(jnp.float32)
        bins, clss, feat_shapes = self._branch_walk(p, xs, ctx)
        anchors, strides = make_anchors(feat_shapes, self.stride, 0.5)
        cls = jnp.concatenate([jax.nn.sigmoid(c.astype(jnp.float32)) for c in clss], axis=1)
        return (
            tuple(bins),
            cls,
            jnp.asarray(anchors),
            jnp.asarray(strides),
            proj,
        )

    def _branch_walk(self, p, xs, ctx, levels=None):
        """Shared cv2/cv3 conv walk from the head inputs: per level returns
        raw reg bins (B, A_l, 4*reg_max), raw cls logits (B, A_l, nc), and the
        feature shapes. Merges the two branches' first 3x3 convs into one conv
        when params allow (exact algebra; one read of x). `levels` restricts
        the walk to those level indices (xs then lists just their inputs)."""
        bins, clss = [], []
        feat_shapes = []
        for l, x in zip(levels if levels is not None else range(len(xs)), xs):
            p2, p3 = p["cv2"][str(l)]["0"], p["cv3"][str(l)]["0"]
            merged = (
                self.legacy
                and "bn" not in p2 and "bn" not in p3
                and "w_int8" not in p2["conv"] and "w_int8" not in p3["conv"]
                and not isinstance(x, QTensor)
            )
            if merged:
                # both branches' first 3x3 convs read the SAME input — run them
                # as one conv with output channels concatenated (exact algebra;
                # one read of x and one fused epilogue instead of two)
                w = jnp.concatenate(
                    [p2["conv"]["weight"].astype(ctx.dtype), p3["conv"]["weight"].astype(ctx.dtype)], axis=3
                )
                bias = jnp.concatenate(
                    [p2["conv"]["bias"].astype(ctx.dtype), p3["conv"]["bias"].astype(ctx.dtype)]
                )
                y = jax.lax.conv_general_dilated(
                    x.astype(ctx.dtype), w, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                y = silu(y + bias)
                c2o = p2["conv"]["weight"].shape[3]
                b, c = y[..., :c2o], y[..., c2o:]
                j0 = 1
            else:
                b, c, j0 = x, x, 0
            for j in range(j0, 3):
                b = self.cv2[l][j](p["cv2"][str(l)][str(j)], b, ctx, f"head/cv2/{l}/{j}")
            for j in range(j0, 3):
                c = self.cv3[l][j](p["cv3"][str(l)][str(j)], c, ctx, f"head/cv3/{l}/{j}")
            B, H, W, _ = b.shape
            feat_shapes.append((H, W))
            bins.append(b.reshape(B, H * W, 4 * self.reg_max))
            clss.append(c.reshape(B, H * W, self.nc))
        return bins, clss, feat_shapes

    def sparse_candidates(self, p, xs, ctx, conf_thres: float, max_nms: int, classes=None, agnostic: bool = False):
        """Sparse box branch: the TPU-native inversion of the reference's
        dense `_inference` (ref: head.py:152) for NMS-bound deployment.

        The dense Detect head spends ~70% of its FLOPs and nearly all of its
        HBM traffic on the 64-channel cv2 regression branch + all-anchor DFL
        decode — yet NMS only ever consumes boxes for the top `max_nms`
        candidates, which are ranked by SCORE alone. So: run only the cheap
        cv3 classification branch densely, pick the global top-k anchors by
        thresholded score (identical selection to
        ops/nms.non_max_suppression_parts), then compute the cv2 chain + DFL
        decode on gathered 5x5 input patches at just those k positions. At
        the flagship 640x512/P2 geometry this removes the (B, 128, 160, 64/88)
        regression maps and the (B, A, 4, 16) DFL chain from HBM entirely
        (~10 GB per 512-chunk) and drops head FLOPs ~4x.

        EXACTNESS: per candidate, the patch pipeline reproduces the dense
        branch op-for-op — the 5x5 patch is zero-padded exactly like the
        dense conv's SAME padding, a VALID 3x3 conv gives the 3x3 cv2[0]
        neighborhood the second conv needs, and out-of-image neighbors are
        masked to zero (what dense cv2[1] sees as padding). Every anchor's
        box is therefore identical (float tolerance) to decode_from_inputs',
        and since the top-k selection is the same, the (boxes, cls, conf)
        triple fed to suppression matches non_max_suppression_parts' exactly.
        Parity is pinned by tests/test_sparse_head.py.

        Requires fused float params (inference) and the standard cv2
        structure (ConvBNAct k3 x2 + Conv2d 1x1 — true for every Detect).
        Returns (boxes_xyxy (B, K, 4) f32 px, cls_id (B, K) i32,
        conf (B, K) f32 with below-threshold slots at -1) with
        K = min(max_nms, A); feed ops/nms.non_max_suppression_sparse.
        """
        from yolo_tpu.ops.anchors import dist2bbox
        from yolo_tpu.ops.boxes import xywh2xyxy

        p20 = p["cv2"]["0"]["0"]
        assert "bn" not in p20, "sparse_candidates needs FUSED params (model.fuse)"
        assert "w_int8" not in p20["conv"], "sparse_candidates: int8 params unsupported"
        proj = p["dfl"]["conv"]["weight"].reshape(self.reg_max).astype(jnp.float32)

        # Per level: cls walk -> top-k_l -> ONE-HOT MATMUL patch selection ->
        # mini box branch -> decode. Patch selection is two batched
        # dot_generals (select 5 cols, then 5 rows): per-batch divergent row
        # GATHERS are poison under XLA's batch-minor activation layouts (each
        # lane wants a different row; measured +84 ms/512-chunk for
        # take_along_axis patch pulls), while one-hot selection rides the MXU
        # (~330 GFLOP at P2, ~2 ms). Out-of-image taps come out exactly zero
        # (their one-hot rows are zeroed) — the dense conv's SAME padding.
        d5 = jnp.arange(5) - 2
        all_boxes, all_conf, all_cls = [], [], []
        for l, x in enumerate(xs):
            c = x
            for j in range(3):
                c = self.cv3[l][j](p["cv3"][str(l)][str(j)], c, ctx, f"head/cv3/{l}/{j}")
            B, H, W, _ = c.shape
            s = jax.nn.sigmoid(c.astype(jnp.float32))
            if classes is not None:
                allowed = jnp.zeros((self.nc,), bool).at[jnp.asarray(classes)].set(True)
                s = jnp.where(allowed[None, None, None, :], s, 0.0)
            conf_l = jnp.max(s, axis=-1).reshape(B, H * W)
            conf_l = jnp.where(conf_l > conf_thres, conf_l, -1.0)
            K = min(max_nms, H * W)
            tc, ti = jax.lax.top_k(conf_l, K)  # (B, K)
            if self.nc == 1:
                cls_k = jnp.zeros((B, K), jnp.int32)
            else:
                cls_k = jnp.take_along_axis(jnp.argmax(s, axis=-1).reshape(B, H * W), ti, axis=1)
            hh, ww = ti // W, ti % W  # (B, K)
            rows = hh[..., None] + d5  # (B, K, 5) image coords h-2 .. h+2
            cols = ww[..., None] + d5
            ohw = jax.nn.one_hot(jnp.clip(cols, 0, W - 1), W, dtype=ctx.dtype)
            ohw = ohw * ((cols >= 0) & (cols < W))[..., None].astype(ctx.dtype)  # (B, K, 5, W)
            ohh = jax.nn.one_hot(jnp.clip(rows, 0, H - 1), H, dtype=ctx.dtype)
            ohh = ohh * ((rows >= 0) & (rows < H))[..., None].astype(ctx.dtype)  # (B, K, 5, H)
            # stage 1 — cols: (B, K*5v, W) . (B, H, W, C) over W -> (B, K*5v, H, C)
            r1 = jax.lax.dot_general(
                ohw.reshape(B, K * 5, W), x.astype(ctx.dtype),
                (((2,), (2,)), ((0,), (0,))),
            ).reshape(B, K, 5, H, -1)
            # stage 2 — rows, batched over (B, K): (5u, H) . (5v, H, C) over H
            patches = jax.lax.dot_general(
                ohh, r1, (((3,), (3,)), ((0, 1), (0, 1))),
            )  # (B, K, 5u, 5v, C)
            # out-of-image mask for the 3x3 cv2[0] neighborhood: dense cv2[1]
            # reads ZERO at padded positions, not silu(bias)
            mask = ((rows >= 0) & (rows < H))[..., 1:4, None] & ((cols >= 0) & (cols < W))[..., None, 1:4]
            bins = self._sparse_box_branch(p["cv2"][str(l)], patches, mask, ctx)  # (B, K, 64)
            dist = dfl_project(bins.reshape(B, K, 4, self.reg_max), proj)  # (B, K, 4) f32
            anchor_pts = jnp.stack([ww + 0.5, hh + 0.5], axis=-1).astype(jnp.float32)
            xywh = dist2bbox(dist, anchor_pts, xywh=True, axis=-1) * float(self.stride[l])
            all_boxes.append(xywh2xyxy(xywh))
            all_conf.append(tc)
            all_cls.append(cls_k)

        # Union-compact the per-level top-k's to the global top-max_nms: the
        # global top-k is always a subset of the per-level top-k union, so
        # this reproduces the dense path's candidate set exactly (stable-sort
        # tie order aside).
        conf_u = jnp.concatenate(all_conf, axis=1)  # (B, sum K_l)
        boxes_u = jnp.concatenate(all_boxes, axis=1)
        cls_u = jnp.concatenate(all_cls, axis=1)
        Kg = min(max_nms, conf_u.shape[1])
        top_conf, gi = jax.lax.top_k(conf_u, Kg)
        boxes = jnp.take_along_axis(boxes_u, gi[..., None], axis=1)
        cls_k = jnp.take_along_axis(cls_u, gi, axis=1)
        return boxes, cls_k, top_conf

    def _sparse_box_branch(self, pl, patches, mask, ctx):
        """cv2 chain on gathered patches: (B, K, 5, 5, C) -> raw reg bins
        (B, K, 4*reg_max), as three plain 2D matmuls (im2col via 9 static
        slices) — tiny-spatial convs on a huge patch batch lower badly on
        TPU, while (B*K*9, 9C) @ (9C, c2) is a clean MXU shape. `mask`
        (B, K, 3, 3) zeroes cv2[0] outputs at out-of-image positions (dense
        SAME-padding semantics). Fused float params only."""
        B, K, _, _, C = patches.shape
        d = ctx.dtype
        p0, p1, p2 = pl["0"]["conv"], pl["1"]["conv"], pl["2"]
        # im2col of the 9 overlapping 3x3 windows, (u, v, c)-major like HWIO
        wins = jnp.stack(
            [patches[:, :, du : du + 3, dv : dv + 3, :] for du in range(3) for dv in range(3)],
            axis=2,
        )  # (B, K, 9, 3, 3, C)
        w0 = p0["weight"].astype(d).reshape(9 * C, -1)  # (3,3,C,c2) -> (9C, c2)
        y = silu(wins.reshape(B * K * 9, 9 * C) @ w0 + p0["bias"].astype(d))
        c2 = y.shape[-1]
        y = y.reshape(B, K, 3, 3, c2) * mask[..., None].astype(d)
        w1 = p1["weight"].astype(d).reshape(9 * c2, c2)
        y = silu(y.reshape(B * K, 9 * c2) @ w1 + p1["bias"].astype(d))
        w2 = p2["weight"].reshape(c2, -1).astype(d)  # 1x1 conv == matmul
        y = y @ w2 + p2["bias"].astype(d)
        return y.reshape(B, K, -1)

    def decode_from_inputs_cm(self, p, xs, ctx, xywh: bool = True, interpret: bool = False, levels=None):
        """decode_from_inputs with the channel-major fused Pallas kernel
        (ops/pallas_head2.py) computing the per-level branch walk + DFL for
        every level with a valid W tile (others fall back to the XLA walk).
        Same output contract as decode_from_inputs, float-tolerance parity
        (tests/test_pallas_head2.py). Fused legacy params only. `levels`
        restricts the kernel to those level indices (A/B knob)."""
        from yolo_tpu.ops.anchors import dist2bbox, make_anchors
        from yolo_tpu.ops.pallas_head2 import head_level_cm, pick_wt

        p20 = p["cv2"]["0"]["0"]
        assert self.legacy and "bn" not in p20, "pallas_head2 needs FUSED legacy params (model.fuse)"
        proj_np = jnp.reshape(p["dfl"]["conv"]["weight"], (self.reg_max,))  # traced-safe
        nl = len(xs)
        dists, clss = [None] * nl, [None] * nl
        feat_shapes = [(x.shape[1], x.shape[2]) for x in xs]
        rest = []
        for l, x in enumerate(xs):
            if (levels is None or l in levels) and pick_wt(x.shape[2]):
                dists[l], clss[l] = head_level_cm(
                    x, p["cv2"][str(l)], p["cv3"][str(l)], proj_np, self.nc,
                    interpret=interpret, dtype=ctx.dtype,
                )
            else:
                rest.append(l)
        if rest:
            proj = jnp.asarray(proj_np)
            bins, cl, _ = self._branch_walk(p, [xs[l] for l in rest], ctx, levels=rest)
            for i, l in enumerate(rest):
                b = bins[i]
                dists[l] = dfl_project(b.reshape(b.shape[0], b.shape[1], 4, self.reg_max), proj)
                clss[l] = jax.nn.sigmoid(cl[i].astype(jnp.float32))
        anchors, strides = make_anchors(feat_shapes, self.stride, 0.5)
        dist = jnp.concatenate(dists, axis=1)  # (B, A, 4) f32
        cls = jnp.concatenate(clss, axis=1)
        dbox = dist2bbox(dist, jnp.asarray(anchors)[None], xywh=xywh, axis=-1) * jnp.asarray(strides)[None]
        return dbox, cls

    def decode_feats_pallas(self, p, xs, xywh: bool = True, interpret: bool = False, dtype=jnp.bfloat16):
        """decode_parts computed from the head INPUTS via the fused Pallas
        head kernel (ops/pallas_head.py): per level, both conv branches + the
        DFL projection run VMEM-resident in one kernel — the 64-channel head
        intermediates never touch HBM. Requires the legacy branch structure
        and fused (bn-folded) params. Numerics-parity tested in
        tests/test_pallas_head.py; gated off by default pending an on-chip
        win over the XLA path."""
        from yolo_tpu.ops.anchors import dist2bbox, make_anchors
        from yolo_tpu.ops.pallas_head import fused_head_level

        assert self.legacy, "pallas head kernel supports the legacy (v8) branch structure"
        assert "bn" not in p["cv2"]["0"]["0"], "pallas head kernel needs FUSED params (model.fuse)"
        proj = p["dfl"]["conv"]["weight"].reshape(self.reg_max)
        dists, clss = [], []
        for l, x in enumerate(xs):
            d, c = fused_head_level(
                x, p["cv2"][str(l)], p["cv3"][str(l)], proj,
                nc=self.nc, reg_max=self.reg_max, interpret=interpret, dtype=dtype,
            )
            dists.append(d)
            clss.append(c)
        feat_shapes = [(o.shape[1], o.shape[2]) for o in xs]
        anchors, strides = make_anchors(feat_shapes, self.stride, 0.5)
        dist = jnp.concatenate(dists, axis=1)  # (B, A, 4) f32
        cls = jnp.concatenate(clss, axis=1)
        dbox = dist2bbox(dist, jnp.asarray(anchors)[None], xywh=xywh, axis=-1) * jnp.asarray(strides)[None]
        return dbox, jax.nn.sigmoid(cls.astype(jnp.float32))

    def decode(self, p, outs, img_hw=None, xywh: bool = True):
        """Fused DFL decode → (B, 4+nc, A) xywh-in-pixels + sigmoid cls.

        Equivalent of Detect._inference (ref: head.py:152) but with anchors as
        trace-time constants (static shapes on TPU).
        """
        dbox, cls = self.decode_parts(p, outs, xywh=xywh)
        out = jnp.concatenate([dbox, cls], axis=-1)  # (B, A, 4+nc)
        return jnp.swapaxes(out, 1, 2)  # (B, 4+nc, A) — reference output layout


# ---------------------------------------------------------------------------
# YOLO11-family blocks (ref: block.py C3:329, C3k:~1150, C3k2:1107, SCDown:1573,
# Attention:1301, PSABlock:~1360, C2PSA:1475)
# ---------------------------------------------------------------------------


class C3:
    """CSP bottleneck with 3 convolutions (ref: block.py C3:329)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5, bottleneck_k=((1, 1), (3, 3))):
        c_ = int(c2 * e)
        self.cv1 = ConvBNAct(c1, c_, 1, 1)
        self.cv2 = ConvBNAct(c1, c_, 1, 1)
        self.cv3 = ConvBNAct(2 * c_, c2, 1)
        self.m = [Bottleneck(c_, c_, shortcut, g, k=bottleneck_k, e=1.0) for _ in range(n)]

    def init(self, rng):
        return {
            "cv1": self.cv1.init(rng),
            "cv2": self.cv2.init(rng),
            "cv3": self.cv3.init(rng),
            "m": {str(i): m.init(rng) for i, m in enumerate(self.m)},
        }

    def __call__(self, p, x, ctx, path=""):
        a = self.cv1(p["cv1"], x, ctx, f"{path}/cv1")
        for i, m in enumerate(self.m):
            a = m(p["m"][str(i)], a, ctx, f"{path}/m/{i}")
        b = self.cv2(p["cv2"], x, ctx, f"{path}/cv2")
        return self.cv3(p["cv3"], jnp.concatenate([a, b], axis=-1), ctx, f"{path}/cv3")


class C2:
    """CSP Bottleneck with 2 convolutions (ref: block.py C2:266)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        self.c = int(c2 * e)
        self.cv1 = ConvBNAct(c1, 2 * self.c, 1, 1)
        self.cv2 = ConvBNAct(2 * self.c, c2, 1)
        self.m = [Bottleneck(self.c, self.c, shortcut, g, k=((3, 3), (3, 3)), e=1.0) for _ in range(n)]

    def init(self, rng):
        return {
            "cv1": self.cv1.init(rng),
            "cv2": self.cv2.init(rng),
            "m": {str(i): m.init(rng) for i, m in enumerate(self.m)},
        }

    def __call__(self, p, x, ctx, path=""):
        y = self.cv1(p["cv1"], x, ctx, f"{path}/cv1")
        a, b = y[..., : self.c], y[..., self.c :]
        for i, m in enumerate(self.m):
            a = m(p["m"][str(i)], a, ctx, f"{path}/m/{i}")
        return self.cv2(p["cv2"], jnp.concatenate([a, b], -1), ctx, f"{path}/cv2")


class GhostConv:
    """Ghost convolution: primary conv + cheap 5x5 depthwise expansion
    (ref: conv.py GhostConv:331)."""

    def __init__(self, c1, c2, k=1, s=1, g=1, act=True):
        c_ = c2 // 2
        self.s = s
        self.cv1 = ConvBNAct(c1, c_, k, s, None, g, act=act)
        self.cv2 = ConvBNAct(c_, c_, 5, 1, None, c_, act=act)

    def init(self, rng):
        return {"cv1": self.cv1.init(rng), "cv2": self.cv2.init(rng)}

    def __call__(self, p, x, ctx, path=""):
        y = self.cv1(p["cv1"], x, ctx, f"{path}/cv1")
        return jnp.concatenate([y, self.cv2(p["cv2"], y, ctx, f"{path}/cv2")], -1)


class GhostBottleneck:
    """GhostNet bottleneck (ref: block.py GhostBottleneck:441)."""

    def __init__(self, c1, c2, k=3, s=1):
        c_ = c2 // 2
        self.s = s
        self.conv = [GhostConv(c1, c_, 1, 1), DWConv(c_, c_, k, s, act=False) if s == 2 else None,
                     GhostConv(c_, c2, 1, 1, act=False)]
        self.shortcut = [DWConv(c1, c1, k, s, act=False), ConvBNAct(c1, c2, 1, 1, act=False)] if s == 2 else None

    def init(self, rng):
        p = {"conv": {str(i): m.init(rng) for i, m in enumerate(self.conv) if m is not None}}
        if self.shortcut:
            p["shortcut"] = {str(i): m.init(rng) for i, m in enumerate(self.shortcut)}
        return p

    def __call__(self, p, x, ctx, path=""):
        y = x
        for i, m in enumerate(self.conv):
            if m is not None:
                y = m(p["conv"][str(i)], y, ctx, f"{path}/conv/{i}")
        if self.shortcut:
            sc = x
            for i, m in enumerate(self.shortcut):
                sc = m(p["shortcut"][str(i)], sc, ctx, f"{path}/shortcut/{i}")
        else:
            sc = x
        return y + sc


class C3Ghost(C3):
    """C3 with GhostBottleneck inner blocks (ref: block.py C3Ghost:421)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        super().__init__(c1, c2, n, shortcut, g, e)
        c_ = int(c2 * e)
        self.m = [GhostBottleneck(c_, c_) for _ in range(n)]


class ResNetBlock:
    """Bottleneck ResNet block (ref: block.py ResNetBlock:530)."""

    def __init__(self, c1, c2, s=1, e=4, act=True):
        c3 = e * c2
        # ref block.py ResNetBlock uses Conv(act=True) = default SiLU and only
        # the residual join is ReLU; TorchVision passes act="relu" for true
        # torchvision-Bottleneck numerics (real-weight import)
        self.cv1 = ConvBNAct(c1, c2, 1, 1, act=act)
        self.cv2 = ConvBNAct(c2, c2, 3, s, 1, act=act)
        self.cv3 = ConvBNAct(c2, c3, 1, act=False)
        self.shortcut = ConvBNAct(c1, c3, 1, s, act=False) if s != 1 or c1 != c3 else None

    def init(self, rng):
        p = {"cv1": self.cv1.init(rng), "cv2": self.cv2.init(rng), "cv3": self.cv3.init(rng)}
        if self.shortcut is not None:
            p["shortcut"] = {"0": self.shortcut.init(rng)}
        return p

    def __call__(self, p, x, ctx, path=""):
        y = self.cv3(p["cv3"], self.cv2(p["cv2"], self.cv1(p["cv1"], x, ctx, f"{path}/cv1"), ctx, f"{path}/cv2"), ctx, f"{path}/cv3")
        sc = self.shortcut(p["shortcut"]["0"], x, ctx, f"{path}/shortcut") if self.shortcut is not None else x
        return jnp.maximum(y + sc, 0.0)


class ResNetLayer:
    """Stage of ResNet blocks, or the stem conv+maxpool when is_first
    (ref: block.py ResNetLayer:555). yaml args are explicit [c1, c2, s,
    is_first, n]; output channels = c2 when is_first else 4*c2."""

    def __init__(self, c1, c2, s=1, is_first=False, n=1, e=4):
        self.is_first = is_first
        self.s_total = 4 if is_first else s  # stem = conv s2 + maxpool s2
        if is_first:
            self.stem = ConvBNAct(c1, c2, 7, 2, 3)
            self.pool = MaxPool2d(3, 2, 1)
            self.blocks = []
        else:
            self.blocks = [ResNetBlock(c1, c2, s, e=e)] + [ResNetBlock(e * c2, c2, 1, e=e) for _ in range(n - 1)]

    def init(self, rng):
        if self.is_first:
            return {"layer": {"0": self.stem.init(rng)}}
        return {"layer": {str(i): b.init(rng) for i, b in enumerate(self.blocks)}}

    def __call__(self, p, x, ctx, path=""):
        if self.is_first:
            x = self.stem(p["layer"]["0"], x, ctx, f"{path}/layer/0")
            return self.pool({}, x, ctx, f"{path}/pool")
        for i, b in enumerate(self.blocks):
            x = b(p["layer"][str(i)], x, ctx, f"{path}/layer/{i}")
        return x


class _TVBasicBlock:
    """torchvision ResNet BasicBlock: 3x3(s)-BN-ReLU, 3x3-BN, + shortcut, ReLU."""

    def __init__(self, c1, c2, s=1):
        self.cv1 = ConvBNAct(c1, c2, 3, s, 1, act="relu")
        self.cv2 = ConvBNAct(c2, c2, 3, 1, 1, act=False)
        self.down = ConvBNAct(c1, c2, 1, s, act=False) if s != 1 or c1 != c2 else None

    def init(self, rng):
        p = {"cv1": self.cv1.init(rng), "cv2": self.cv2.init(rng)}
        if self.down is not None:
            p["down"] = self.down.init(rng)
        return p

    def __call__(self, p, x, ctx, path=""):
        y = self.cv2(p["cv2"], self.cv1(p["cv1"], x, ctx, f"{path}/cv1"), ctx, f"{path}/cv2")
        sc = self.down(p["down"], x, ctx, f"{path}/down") if self.down is not None else x
        return jnp.maximum(y + sc, 0.0)


class TorchVision:
    """TPU-native stand-in for the reference's generic torchvision backbone
    wrapper (ref: nn/modules/block.py TorchVision:1624, used by
    cfg/models/11/yolo11-cls-resnet18.yaml). The reference loads an arbitrary
    torchvision model via torch hub; here the supported backbones are built
    natively in JAX with the torchvision graph layout (7x7/2 stem + maxpool,
    BasicBlock/Bottleneck stages, ReLU). `weights="DEFAULT"` has no effect in
    this zero-egress build — weights come from init or a checkpoint import.

    Yaml args mirror the reference: [c2, model, weights, unwrap, truncate,
    split]. unwrap=True with truncate=2 drops avgpool+fc and returns the
    stride-32 feature map; truncate=0 / unwrap=False additionally applies
    global average pooling (the classifier fc is task-head territory here).
    """

    _STAGES = {  # name -> (block depths, bottleneck?)
        "resnet18": ([2, 2, 2, 2], False),
        "resnet34": ([3, 4, 6, 3], False),
        "resnet50": ([3, 4, 6, 3], True),
        "resnet101": ([3, 4, 23, 3], True),
    }

    def __init__(self, c2, model="resnet18", weights="DEFAULT", unwrap=True, truncate=2, split=False):
        if model not in self._STAGES:
            raise NotImplementedError(
                f"TorchVision: only native ResNet backbones {sorted(self._STAGES)} are supported, got '{model}'"
            )
        if split:
            raise NotImplementedError("TorchVision: split=True (multi-output) is not supported")
        depths, bottleneck = self._STAGES[model]
        self.pool_out = not (unwrap and truncate >= 2)  # keep avgpool unless truncated away
        self.s_total = 32
        self.stem = ConvBNAct(3, 64, 7, 2, 3, act="relu")
        self.pool = MaxPool2d(3, 2, 1)
        self.stages = []
        c_in = 64
        for si, (n, width) in enumerate(zip(depths, (64, 128, 256, 512))):
            s = 1 if si == 0 else 2
            if bottleneck:
                blocks = [ResNetBlock(c_in, width, s, act="relu")] + [ResNetBlock(4 * width, width, 1, act="relu") for _ in range(n - 1)]
                c_in = 4 * width
            else:
                blocks = [_TVBasicBlock(c_in, width, s)] + [_TVBasicBlock(width, width, 1) for _ in range(n - 1)]
                c_in = width
            self.stages.append(blocks)
        self.c_out = c_in

    def init(self, rng):
        return {
            "stem": self.stem.init(rng),
            "stages": {
                str(si): {str(bi): b.init(rng) for bi, b in enumerate(blocks)}
                for si, blocks in enumerate(self.stages)
            },
        }

    def __call__(self, p, x, ctx, path=""):
        x = self.pool({}, self.stem(p["stem"], x, ctx, f"{path}/stem"), ctx, f"{path}/pool")
        for si, blocks in enumerate(self.stages):
            for bi, b in enumerate(blocks):
                x = b(p["stages"][str(si)][str(bi)], x, ctx, f"{path}/stages/{si}/{bi}")
        if self.pool_out:
            x = x.mean(axis=(1, 2), keepdims=True)
        return x


class NASBottleneck:
    """Two fused-QARepVGG 3x3 convs with a learnable-alpha residual — the
    deploy form of super_gradients' YoloNASBottleneck (ref analog:
    models/nas/model.py loads these prefused; QARepVGG's 3x3+1x1+identity
    branches fold into one 3x3 conv at deployment)."""

    def __init__(self, c1, c2, shortcut=True):
        self.cv1 = ConvBNAct(c1, c2, 3, 1, act="relu")
        self.cv2 = ConvBNAct(c2, c2, 3, 1, act="relu")
        self.add = shortcut and c1 == c2

    def init(self, rng):
        p = {"cv1": self.cv1.init(rng), "cv2": self.cv2.init(rng)}
        if self.add:
            p["alpha"] = np.ones((), np.float32)
        return p

    def __call__(self, p, x, ctx, path=""):
        y = self.cv2(p["cv2"], self.cv1(p["cv1"], x, ctx, f"{path}/cv1"), ctx, f"{path}/cv2")
        return p["alpha"] * x + y if self.add else y


class NASCSP:
    """CSP layer over NASBottlenecks — deploy form of YoloNASCSPLayer.
    Same 3-conv CSP topology as C3 but ReLU activations and 3x3-3x3
    alpha-residual inner blocks."""

    def __init__(self, c1, c2, n=1, shortcut=True, e=0.5):
        c_ = int(c2 * e)
        self.cv1 = ConvBNAct(c1, c_, 1, 1, act="relu")
        self.cv2 = ConvBNAct(c1, c_, 1, 1, act="relu")
        self.cv3 = ConvBNAct(2 * c_, c2, 1, act="relu")
        self.m = [NASBottleneck(c_, c_, shortcut) for _ in range(n)]

    def init(self, rng):
        return {
            "cv1": self.cv1.init(rng),
            "cv2": self.cv2.init(rng),
            "cv3": self.cv3.init(rng),
            "m": {str(i): m.init(rng) for i, m in enumerate(self.m)},
        }

    def __call__(self, p, x, ctx, path=""):
        a = self.cv1(p["cv1"], x, ctx, f"{path}/cv1")
        for i, m in enumerate(self.m):
            a = m(p["m"][str(i)], a, ctx, f"{path}/m/{i}")
        b = self.cv2(p["cv2"], x, ctx, f"{path}/cv2")
        return self.cv3(p["cv3"], jnp.concatenate([a, b], axis=-1), ctx, f"{path}/cv3")


class C3k(C3):
    """C3 with square k×k bottleneck kernels (ref: block.py C3k)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5, k=3):
        super().__init__(c1, c2, n, shortcut, g, e, bottleneck_k=((k, k), (k, k)))


class C3k2(C2f):
    """C2f whose inner blocks are C3k (or plain half-width Bottlenecks)
    (ref: block.py C3k2:1107)."""

    def __init__(self, c1, c2, n=1, c3k=False, e=0.5, g=1, shortcut=True):
        super().__init__(c1, c2, n, shortcut, g, e)
        self.m = [
            C3k(self.c, self.c, 2, shortcut, g) if c3k else Bottleneck(self.c, self.c, shortcut, g, k=((3, 3), (3, 3)), e=0.5)
            for _ in range(n)
        ]


class SCDown:
    """Separable-conv downsample: 1x1 pointwise + k/s depthwise (ref: block.py SCDown:1573)."""

    def __init__(self, c1, c2, k, s):
        self.cv1 = ConvBNAct(c1, c2, 1, 1)
        self.cv2 = ConvBNAct(c2, c2, k, s, g=c2, act=False)

    def init(self, rng):
        return {"cv1": self.cv1.init(rng), "cv2": self.cv2.init(rng)}

    def __call__(self, p, x, ctx, path=""):
        return self.cv2(p["cv2"], self.cv1(p["cv1"], x, ctx, f"{path}/cv1"), ctx, f"{path}/cv2")


class Attention:
    """Spatial self-attention over feature maps (ref: block.py Attention:1301).

    NHWC layout: tokens are pixels; qk dims follow the reference (attn_ratio
    scaled key dim, depthwise 3x3 positional conv on v).
    """

    def __init__(self, dim, num_heads=8, attn_ratio=0.5):
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = int(self.head_dim * attn_ratio)
        self.scale = self.key_dim**-0.5
        nh_kd = self.key_dim * num_heads
        h = dim + nh_kd * 2
        self.dim, self.h = dim, h
        self.qkv = ConvBNAct(dim, h, 1, act=False)
        self.proj = ConvBNAct(dim, dim, 1, act=False)
        self.pe = ConvBNAct(dim, dim, 3, 1, g=dim, act=False)

    def init(self, rng):
        return {"qkv": self.qkv.init(rng), "proj": self.proj.init(rng), "pe": self.pe.init(rng)}

    def __call__(self, p, x, ctx, path=""):
        B, H, W, C = x.shape
        N = H * W
        qkv = self.qkv(p["qkv"], x, ctx, f"{path}/qkv")  # (B, H, W, h)
        qkv = qkv.reshape(B, N, self.num_heads, self.key_dim * 2 + self.head_dim)
        q = qkv[..., : self.key_dim]
        k = qkv[..., self.key_dim : 2 * self.key_dim]
        v = qkv[..., 2 * self.key_dim :]  # (B, N, heads, head_dim)
        attn = jnp.einsum("bnhk,bmhk->bhnm", q, k) * self.scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, H, W, C)
        pe = self.pe(p["pe"], v.reshape(B, H, W, C), ctx, f"{path}/pe")
        return self.proj(p["proj"], out + pe, ctx, f"{path}/proj")


class PSABlock:
    """Attention + conv FFN with residuals (ref: block.py PSABlock)."""

    def __init__(self, c, attn_ratio=0.5, num_heads=4, shortcut=True):
        self.attn = Attention(c, num_heads=num_heads, attn_ratio=attn_ratio)
        self.ffn1 = ConvBNAct(c, c * 2, 1)
        self.ffn2 = ConvBNAct(c * 2, c, 1, act=False)
        self.add = shortcut

    def init(self, rng):
        return {"attn": self.attn.init(rng), "ffn": {"0": self.ffn1.init(rng), "1": self.ffn2.init(rng)}}

    def __call__(self, p, x, ctx, path=""):
        a = self.attn(p["attn"], x, ctx, f"{path}/attn")
        x = x + a if self.add else a
        f = self.ffn2(p["ffn"]["1"], self.ffn1(p["ffn"]["0"], x, ctx, f"{path}/ffn/0"), ctx, f"{path}/ffn/1")
        return x + f if self.add else f


class C2PSA:
    """CSP wrapper around stacked PSABlocks (ref: block.py C2PSA:1475)."""

    def __init__(self, c1, c2, n=1, e=0.5):
        assert c1 == c2
        self.c = int(c1 * e)
        self.cv1 = ConvBNAct(c1, 2 * self.c, 1, 1)
        self.cv2 = ConvBNAct(2 * self.c, c1, 1)
        self.m = [PSABlock(self.c, attn_ratio=0.5, num_heads=max(self.c // 64, 1)) for _ in range(n)]

    def init(self, rng):
        return {
            "cv1": self.cv1.init(rng),
            "cv2": self.cv2.init(rng),
            "m": {str(i): m.init(rng) for i, m in enumerate(self.m)},
        }

    def __call__(self, p, x, ctx, path=""):
        y = self.cv1(p["cv1"], x, ctx, f"{path}/cv1")
        a, b = y[..., : self.c], y[..., self.c :]
        for i, m in enumerate(self.m):
            b = m(p["m"][str(i)], b, ctx, f"{path}/m/{i}")
        return self.cv2(p["cv2"], jnp.concatenate([a, b], axis=-1), ctx, f"{path}/cv2")


class Classify:
    """Classification head: Conv → global-avg-pool → linear (ref: head.py Classify:427).

    Returns logits in train mode; the caller applies softmax at inference.
    """

    def __init__(self, c1: int, c2: int, k: int = 1, s: int = 1, p=None, g: int = 1):
        c_ = 1280  # efficientnet_b0 width, same as reference
        self.conv = ConvBNAct(c1, c_, k, s, p, g)
        self.c_ = c_
        self.c2 = c2

    def init(self, rng):
        bound = math.sqrt(1.0 / self.c_)
        return {
            "conv": self.conv.init(rng),
            "linear": {
                "weight": rng.uniform(-bound, bound, (self.c_, self.c2)).astype(np.float32),
                "bias": rng.uniform(-bound, bound, (self.c2,)).astype(np.float32),
            },
        }

    def __call__(self, p, x, ctx, path=""):
        y = self.conv(p["conv"], x, ctx, f"{path}/conv")  # (B, H, W, c_)
        pooled = y.mean(axis=(1, 2))  # global average pool
        if ctx.train and ctx.dropout > 0 and ctx.rng is not None:
            # inverted dropout on the pooled features (ref Classify nn.Dropout)
            keep = 1.0 - float(ctx.dropout)
            mask = jax.random.bernoulli(ctx.rng, keep, pooled.shape)
            pooled = jnp.where(mask, pooled / keep, jnp.zeros((), pooled.dtype))
        logits = pooled.astype(jnp.float32) @ p["linear"]["weight"].astype(jnp.float32) + p["linear"]["bias"]
        return logits


# ---------------------------------------------------------------------------
# Segmentation (ref: conv.py ConvTranspose:232, block.py Proto:85, head.py Segment:236)
# ---------------------------------------------------------------------------


class ConvTranspose:
    """ConvTranspose2d + optional BN + act (ref: conv.py ConvTranspose:232)."""

    def __init__(self, c1, c2, k=2, s=2, p=0, bn=True, act=True):
        self.c1, self.c2, self.k, self.s, self.p = c1, c2, k, s, p
        self.bn = bn
        self.act = act

    def init(self, rng):
        fan_in = self.c1 * self.k * self.k
        bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
        w = rng.uniform(-bound, bound, (self.k, self.k, self.c2, self.c1)).astype(np.float32)
        if self.bn:  # wrapper module: torch children conv_transpose/bn
            return {
                "conv_transpose": {"weight": w},
                "bn": {
                    "weight": np.ones((self.c2,), np.float32),
                    "bias": np.zeros((self.c2,), np.float32),
                    "running_mean": np.zeros((self.c2,), np.float32),
                    "running_var": np.ones((self.c2,), np.float32),
                },
            }
        # raw nn.ConvTranspose2d stand-in: params at top level (torch names)
        bb = math.sqrt(1.0 / fan_in)
        return {"weight": w, "bias": rng.uniform(-bb, bb, (self.c2,)).astype(np.float32)}

    def __call__(self, p, x, ctx: Ctx, path: str = ""):
        # torch ConvTranspose2d weight is (c1, c2, kh, kw) → ours (kh, kw, c2, c1)
        # lax.conv_transpose with NHWC/HWIO expects kernel (kh, kw, c_in, c_out);
        # use transpose_kernel=True to match torch's gradient-of-conv semantics.
        w = (p["conv_transpose"]["weight"] if "conv_transpose" in p else p["weight"]).astype(ctx.dtype)  # (kh, kw, c2, c1)
        pad = self.k - 1 - self.p  # torch ConvTranspose2d padding → lax padding
        y = jax.lax.conv_transpose(
            x.astype(ctx.dtype),
            w,
            strides=(self.s, self.s),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,
        ).astype(jnp.float32)
        if "bn" in p:
            bn = p["bn"]
            if ctx.train:
                mean = jnp.mean(y, (0, 1, 2))
                var = jnp.var(y, (0, 1, 2))
                n = y.shape[0] * y.shape[1] * y.shape[2]
                ctx.stats[f"{path}/bn"] = (jax.lax.stop_gradient(mean), jax.lax.stop_gradient(var), n)
            else:
                mean, var = bn["running_mean"], bn["running_var"]
            y = (y - mean) * (bn["weight"] * jax.lax.rsqrt(var + BN_EPS)) + bn["bias"]
        elif "bias" in p:
            y = y + p["bias"]
        if self.act:
            y = silu(y)
        return y.astype(ctx.dtype)


class Proto:
    """Mask prototype generator (ref: block.py Proto:85)."""

    def __init__(self, c1, c_=256, c2=32):
        self.cv1 = ConvBNAct(c1, c_, 3)
        self.upsample = ConvTranspose(c_, c_, 2, 2, 0, bn=False, act=False)
        self.cv2 = ConvBNAct(c_, c_, 3)
        self.cv3 = ConvBNAct(c_, c2)

    def init(self, rng):
        return {
            "cv1": self.cv1.init(rng),
            "upsample": self.upsample.init(rng),
            "cv2": self.cv2.init(rng),
            "cv3": self.cv3.init(rng),
        }

    def __call__(self, p, x, ctx, path=""):
        y = self.cv1(p["cv1"], x, ctx, f"{path}/cv1")
        y = self.upsample(p["upsample"], y, ctx, f"{path}/upsample")
        y = self.cv2(p["cv2"], y, ctx, f"{path}/cv2")
        return self.cv3(p["cv3"], y, ctx, f"{path}/cv3")


class Segment(Detect):
    """Detect + mask coefficients + prototype masks (ref: head.py Segment:236)."""

    def __init__(self, nc=80, nm=32, npr=256, ch=(), legacy=True):
        super().__init__(nc, ch, legacy)
        self.nm = nm
        self.npr = npr
        self.proto = Proto(ch[0], npr, nm)
        c4 = max(ch[0] // 4, nm)
        self.cv4 = [[ConvBNAct(x, c4, 3), ConvBNAct(c4, c4, 3), Conv2d(c4, nm, 1)] for x in ch]

    def init(self, rng):
        p = super().init(rng)
        p["proto"] = self.proto.init(rng)
        p["cv4"] = {}
        for l in range(self.nl):
            p["cv4"][str(l)] = {str(j): self.cv4[l][j].init(rng) for j in range(3)}
        return p

    def __call__(self, p, xs, ctx, path=""):
        """Returns (det_outs list, mask_coefs list, protos)."""
        protos = self.proto(p["proto"], xs[0], ctx, f"{path}/proto")
        mcs = []
        for l, x in enumerate(xs):
            m = x
            for j in range(3):
                m = self.cv4[l][j](p["cv4"][str(l)][str(j)], m, ctx, f"{path}/cv4/{l}/{j}")
            mcs.append(m)  # (B, H, W, nm)
        det_outs = super().__call__(p, xs, ctx, path)
        return det_outs, mcs, protos

    def decode_with_masks(self, p, outs):
        """(B, 4+nc+nm, A) predictions + (B, h, w, nm) protos."""
        det_outs, mcs, protos = outs
        dets = self.decode(p, det_outs)  # (B, 4+nc, A)
        B = dets.shape[0]
        mc = jnp.concatenate([m.reshape(B, -1, self.nm) for m in mcs], axis=1)  # (B, A, nm)
        return jnp.concatenate([dets, jnp.swapaxes(mc, 1, 2)], axis=1), protos


# ---------------------------------------------------------------------------
# Pose & OBB heads (ref: head.py Pose:344, OBB:288; utils/tal.py dist2rbox:400)
# ---------------------------------------------------------------------------


class Pose(Detect):
    """Detect + keypoint regression (ref: head.py Pose:344)."""

    def __init__(self, nc=80, kpt_shape=(17, 3), ch=(), legacy=True):
        super().__init__(nc, ch, legacy)
        self.kpt_shape = tuple(kpt_shape)
        self.nk = kpt_shape[0] * kpt_shape[1]
        c4 = max(ch[0] // 4, self.nk)
        self.cv4 = [[ConvBNAct(x, c4, 3), ConvBNAct(c4, c4, 3), Conv2d(c4, self.nk, 1)] for x in ch]

    def init(self, rng):
        p = super().init(rng)
        p["cv4"] = {str(l): {str(j): self.cv4[l][j].init(rng) for j in range(3)} for l in range(self.nl)}
        return p

    def __call__(self, p, xs, ctx, path=""):
        kpts = []
        for l, x in enumerate(xs):
            k = x
            for j in range(3):
                k = self.cv4[l][j](p["cv4"][str(l)][str(j)], k, ctx, f"{path}/cv4/{l}/{j}")
            kpts.append(k)  # (B, H, W, nk)
        det_outs = super().__call__(p, xs, ctx, path)
        return det_outs, kpts

    def decode_with_kpts(self, p, outs):
        """(B, 4+nc+nk, A): boxes+cls then decoded keypoints in pixels."""
        from yolo_tpu.ops.anchors import make_anchors

        det_outs, kpt_outs = outs
        dets = self.decode(p, det_outs)  # (B, 4+nc, A)
        B = dets.shape[0]
        kpt = jnp.concatenate([k.reshape(B, -1, self.nk) for k in kpt_outs], axis=1)  # (B, A, nk)
        feat_shapes = [(o.shape[1], o.shape[2]) for o in det_outs]
        anchors, strides = make_anchors(feat_shapes, self.stride, 0.5)
        anchors = jnp.asarray(anchors)  # (A, 2)
        strides = jnp.asarray(strides)  # (A, 1)
        ndim = self.kpt_shape[1]
        y = kpt.reshape(B, -1, self.kpt_shape[0], ndim).astype(jnp.float32)  # (B, A, nkpt, ndim)
        xk = (y[..., 0] * 2.0 + (anchors[None, :, None, 0] - 0.5)) * strides[None, :, None, 0]
        yk = (y[..., 1] * 2.0 + (anchors[None, :, None, 1] - 0.5)) * strides[None, :, None, 0]
        parts = [xk[..., None], yk[..., None]]
        if ndim == 3:
            parts.append(jax.nn.sigmoid(y[..., 2])[..., None])
        decoded = jnp.concatenate(parts, -1).reshape(B, -1, self.nk)  # (B, A, nk)
        return jnp.concatenate([dets, jnp.swapaxes(decoded, 1, 2)], axis=1)


class OBB(Detect):
    """Detect with oriented boxes: extra angle branch, rbox decode (ref: head.py OBB:288)."""

    def __init__(self, nc=80, ne=1, ch=(), legacy=True):
        super().__init__(nc, ch, legacy)
        self.ne = ne
        c4 = max(ch[0] // 4, ne)
        self.cv4 = [[ConvBNAct(x, c4, 3), ConvBNAct(c4, c4, 3), Conv2d(c4, ne, 1)] for x in ch]

    def init(self, rng):
        p = super().init(rng)
        p["cv4"] = {str(l): {str(j): self.cv4[l][j].init(rng) for j in range(3)} for l in range(self.nl)}
        return p

    def __call__(self, p, xs, ctx, path=""):
        angles = []
        for l, x in enumerate(xs):
            a = x
            for j in range(3):
                a = self.cv4[l][j](p["cv4"][str(l)][str(j)], a, ctx, f"{path}/cv4/{l}/{j}")
            angles.append(a)
        det_outs = super().__call__(p, xs, ctx, path)
        return det_outs, angles

    def decode_with_angle(self, p, outs):
        """(B, 4+nc+1, A): rotated (cx, cy, w, h) + cls + angle [-π/4, 3π/4]."""
        from yolo_tpu.ops.anchors import make_anchors

        det_outs, angle_outs = outs
        B = det_outs[0].shape[0]
        angle = jnp.concatenate([a.reshape(B, -1, self.ne) for a in angle_outs], axis=1).astype(jnp.float32)
        angle = (jax.nn.sigmoid(angle) - 0.25) * math.pi  # (B, A, 1)

        feat_shapes = [(o.shape[1], o.shape[2]) for o in det_outs]
        anchors, strides = make_anchors(feat_shapes, self.stride, 0.5)
        anchors = jnp.asarray(anchors)
        strides = jnp.asarray(strides)

        flat = jnp.concatenate([o.reshape(B, -1, self.no) for o in det_outs], axis=1)
        box, cls = flat[..., : self.reg_max * 4], flat[..., self.reg_max * 4 :]
        proj = p["dfl"]["conv"]["weight"].reshape(self.reg_max)
        dist = dfl_project(box.reshape(B, -1, 4, self.reg_max), proj)
        # dist2rbox: rotate the (rb−lt)/2 offset by the angle (ref: tal.py dist2rbox:400)
        lt, rb = dist[..., :2], dist[..., 2:]
        c, s = jnp.cos(angle), jnp.sin(angle)
        xf = ((rb - lt) / 2)[..., 0:1]
        yf = ((rb - lt) / 2)[..., 1:2]
        x = xf * c - yf * s
        y = xf * s + yf * c
        xy = jnp.concatenate([x, y], -1) + anchors[None]
        rbox = jnp.concatenate([xy, lt + rb], -1) * strides[None]
        out = jnp.concatenate([rbox, jax.nn.sigmoid(cls.astype(jnp.float32)), angle], axis=-1)
        return jnp.swapaxes(out, 1, 2)  # (B, 4+nc+1, A)


# ---------------------------------------------------------------------------
# YOLOv9 blocks (ref: conv.py RepConv:376; block.py RepBottleneck/RepCSP,
# RepNCSPELAN4:897, ELAN1, AConv, ADown:972, SPPELAN:998)
# ---------------------------------------------------------------------------


class RepConv:
    """Re-parameterizable conv: 3x3 + 1x1 (+ identity BN) branches summed, SiLU.

    Train-time structure matches torch (conv1/conv2 children); fuse() collapses
    to a single conv like the reference's fuse_convs.
    """

    def __init__(self, c1, c2, k=3, s=1, p=1, g=1, d=1, act=True, bn=False):
        assert k == 3 and p == 1
        self.c1, self.c2, self.k, self.s, self.g = c1, c2, k, s, g
        self.act = act
        self.has_id_bn = bn and c2 == c1 and s == 1
        self.conv1 = ConvBNAct(c1, c2, k, s, p=p, g=g, act=False)
        self.conv2 = ConvBNAct(c1, c2, 1, s, p=(p - k // 2), g=g, act=False)

    def init(self, rng):
        p = {"conv1": self.conv1.init(rng), "conv2": self.conv2.init(rng)}
        if self.has_id_bn:
            p["bn"] = {
                "weight": np.ones((self.c1,), np.float32),
                "bias": np.zeros((self.c1,), np.float32),
                "running_mean": np.zeros((self.c1,), np.float32),
                "running_var": np.ones((self.c1,), np.float32),
            }
        return p

    def __call__(self, p, x, ctx, path=""):
        if "conv" in p:  # fused
            if "w_int8" in p["conv"]:
                # PTQ'd fused kernel (quantize_params matches ANY fused conv
                # group, incl. this one) — delegate to the ConvBNAct int8
                # path with act=False; RepConv applies its own act below
                y = ConvBNAct(self.c1, self.c2, self.k, self.s, g=self.g, act=False)._call_int8(p, deq(x, ctx.dtype), ctx).astype(jnp.float32)
            else:
                y = jax.lax.conv_general_dilated(
                    deq(x, ctx.dtype).astype(ctx.dtype), p["conv"]["weight"].astype(ctx.dtype), (self.s, self.s),
                    [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=self.g,
                ).astype(jnp.float32) + p["conv"]["bias"]
        else:
            y = self.conv1(p["conv1"], x, ctx, f"{path}/conv1").astype(jnp.float32)
            y = y + self.conv2(p["conv2"], x, ctx, f"{path}/conv2").astype(jnp.float32)
            if self.has_id_bn and "bn" in p:
                bn = p["bn"]
                if ctx.train:
                    mean = jnp.mean(x.astype(jnp.float32), (0, 1, 2))
                    var = jnp.var(x.astype(jnp.float32), (0, 1, 2))
                    n = x.shape[0] * x.shape[1] * x.shape[2]
                    ctx.stats[f"{path}/bn"] = (jax.lax.stop_gradient(mean), jax.lax.stop_gradient(var), n)
                else:
                    mean, var = bn["running_mean"], bn["running_var"]
                y = y + (x.astype(jnp.float32) - mean) * (bn["weight"] * jax.lax.rsqrt(var + BN_EPS)) + bn["bias"]
        if self.act:
            y = silu(y)
        return y.astype(ctx.dtype)

    def fuse(self, p):
        """Collapse branches into one 3x3 conv (pad the 1x1 kernel to 3x3)."""
        if "conv" in p:
            return p
        f1 = self.conv1.fuse(p["conv1"])["conv"]
        f2 = self.conv2.fuse(p["conv2"])["conv"]
        xp = np if isinstance(f1["weight"], np.ndarray) else jnp
        w2 = xp.pad(f2["weight"], ((1, 1), (1, 1), (0, 0), (0, 0)))
        w = f1["weight"] + w2
        b = f1["bias"] + f2["bias"]
        return {"conv": {"weight": w, "bias": b}}


class RepBottleneck(Bottleneck):
    """Bottleneck whose first conv is a RepConv (ref: block.py RepBottleneck)."""

    def __init__(self, c1, c2, shortcut=True, g=1, k=(3, 3), e=0.5):
        super().__init__(c1, c2, shortcut, g, k, e)
        c_ = int(c2 * e)
        self.cv1 = RepConv(c1, c_, 3, 1)


class RepCSP(C3):
    """C3 with RepBottleneck inner blocks (ref: block.py RepCSP)."""

    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        super().__init__(c1, c2, n, shortcut, g, e)
        c_ = int(c2 * e)
        self.m = [RepBottleneck(c_, c_, shortcut, g, e=1.0) for _ in range(n)]


class _SeqN:
    """n-submodule sequential with torch child names 0..n-1."""

    def __init__(self, *mods):
        self.mods = list(mods)

    def init(self, rng):
        return {str(i): m.init(rng) for i, m in enumerate(self.mods)}

    def __call__(self, p, x, ctx, path=""):
        for i, m in enumerate(self.mods):
            x = m(p[str(i)], x, ctx, f"{path}/{i}")
        return x


class RepNCSPELAN4:
    """GELAN block (ref: block.py RepNCSPELAN4:897)."""

    def __init__(self, c1, c2, c3, c4, n=1):
        self.c = c3 // 2
        self.cv1 = ConvBNAct(c1, c3, 1, 1)
        self.cv2 = _SeqN(RepCSP(c3 // 2, c4, n), ConvBNAct(c4, c4, 3, 1))
        self.cv3 = _SeqN(RepCSP(c4, c4, n), ConvBNAct(c4, c4, 3, 1))
        self.cv4 = ConvBNAct(c3 + 2 * c4, c2, 1, 1)

    def init(self, rng):
        return {"cv1": self.cv1.init(rng), "cv2": self.cv2.init(rng), "cv3": self.cv3.init(rng), "cv4": self.cv4.init(rng)}

    def __call__(self, p, x, ctx, path=""):
        y = self.cv1(p["cv1"], x, ctx, f"{path}/cv1")
        parts = [y[..., : self.c], y[..., self.c :]]
        parts.append(self.cv2(p["cv2"], parts[-1], ctx, f"{path}/cv2"))
        parts.append(self.cv3(p["cv3"], parts[-1], ctx, f"{path}/cv3"))
        return self.cv4(p["cv4"], jnp.concatenate(parts, -1), ctx, f"{path}/cv4")


class ELAN1(RepNCSPELAN4):
    """Light ELAN (ref: block.py ELAN1)."""

    def __init__(self, c1, c2, c3, c4):
        self.c = c3 // 2
        self.cv1 = ConvBNAct(c1, c3, 1, 1)
        self.cv2 = ConvBNAct(c3 // 2, c4, 3, 1)
        self.cv3 = ConvBNAct(c4, c4, 3, 1)
        self.cv4 = ConvBNAct(c3 + 2 * c4, c2, 1, 1)


class AConv:
    """AvgPool2 + stride-2 conv downsample (ref: block.py AConv)."""

    def __init__(self, c1, c2):
        self.cv1 = ConvBNAct(c1, c2, 3, 2, 1)

    def init(self, rng):
        return {"cv1": self.cv1.init(rng)}

    @staticmethod
    def _avgpool2(x):
        # torch avg_pool2d(2, 1, 0, ceil_mode=False, count_include_pad=True)
        return jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 1, 1, 1), "VALID") / 4.0

    def __call__(self, p, x, ctx, path=""):
        return self.cv1(p["cv1"], self._avgpool2(x.astype(jnp.float32)).astype(ctx.dtype), ctx, f"{path}/cv1")


class ADown:
    """Split downsample: avg+conv branch ∥ max+1x1 branch (ref: block.py ADown:972)."""

    def __init__(self, c1, c2):
        self.c = c2 // 2
        self.cv1 = ConvBNAct(c1 // 2, self.c, 3, 2, 1)
        self.cv2 = ConvBNAct(c1 // 2, self.c, 1, 1, 0)

    def init(self, rng):
        return {"cv1": self.cv1.init(rng), "cv2": self.cv2.init(rng)}

    def __call__(self, p, x, ctx, path=""):
        x = AConv._avgpool2(x.astype(jnp.float32)).astype(ctx.dtype)
        half = x.shape[-1] // 2
        x1, x2 = x[..., :half], x[..., half:]
        x1 = self.cv1(p["cv1"], x1, ctx, f"{path}/cv1")
        pad = 1
        x2 = jax.lax.reduce_window(
            x2, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (pad, pad), (pad, pad), (0, 0)]
        )
        x2 = self.cv2(p["cv2"], x2, ctx, f"{path}/cv2")
        return jnp.concatenate([x1, x2], -1)


class SPPELAN:
    """SPP-ELAN (ref: block.py SPPELAN:998)."""

    def __init__(self, c1, c2, c3, k=5):
        self.c = c3
        self.k = k
        self.cv1 = ConvBNAct(c1, c3, 1, 1)
        self.cv5 = ConvBNAct(4 * c3, c2, 1, 1)

    def init(self, rng):
        return {"cv1": self.cv1.init(rng), "cv5": self.cv5.init(rng)}

    def _pool(self, x):
        pad = self.k // 2
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, self.k, self.k, 1), (1, 1, 1, 1), [(0, 0), (pad, pad), (pad, pad), (0, 0)])

    def __call__(self, p, x, ctx, path=""):
        y = [self.cv1(p["cv1"], x, ctx, f"{path}/cv1")]
        for _ in range(3):
            y.append(self._pool(y[-1]))
        return self.cv5(p["cv5"], jnp.concatenate(y, -1), ctx, f"{path}/cv5")


# ---------------------------------------------------------------------------
# YOLOv10 blocks (ref: block.py CIB:1220, C2fCIB:1268, PSA:1417; head.py v10Detect:1183)
# ---------------------------------------------------------------------------


class CIB:
    """Compact inverted block (ref: block.py CIB:1220). lk (RepVGGDW) variant of
    v10l/x is not implemented yet — n/s/m/b use the plain depthwise middle."""

    def __init__(self, c1, c2, shortcut=True, e=0.5, lk=False):
        c_ = int(c2 * e)
        self.seq = _SeqN(
            ConvBNAct(c1, c1, 3, g=c1),
            ConvBNAct(c1, 2 * c_, 1),
            RepVGGDW(2 * c_) if lk else ConvBNAct(2 * c_, 2 * c_, 3, g=2 * c_),
            ConvBNAct(2 * c_, c2, 1),
            ConvBNAct(c2, c2, 3, g=c2),
        )
        self.add = shortcut and c1 == c2

    def init(self, rng):
        return {"cv1": self.seq.init(rng)}

    def __call__(self, p, x, ctx, path=""):
        y = self.seq(p["cv1"], x, ctx, f"{path}/cv1")
        if not self.add:
            return y
        if isinstance(x, QTensor) or isinstance(y, QTensor):
            # C2fCIB's int8-resident split hands CIB a QTensor half — same
            # residual dequant rule as Bottleneck
            return deq(x, ctx.dtype) + deq(y, ctx.dtype)
        return x + y


class C2fCIB(C2f):
    """C2f with CIB inner blocks (ref: block.py C2fCIB:1268)."""

    def __init__(self, c1, c2, n=1, shortcut=False, lk=False, g=1, e=0.5):
        super().__init__(c1, c2, n, shortcut, g, e)
        self.m = [CIB(self.c, self.c, shortcut, e=1.0, lk=lk) for _ in range(n)]


class PSA:
    """Position-sensitive attention block (ref: block.py PSA:1417) — single
    attention+FFN over half the channels (C2PSA generalizes to n blocks)."""

    def __init__(self, c1, c2, e=0.5):
        assert c1 == c2
        self.c = int(c1 * e)
        self.cv1 = ConvBNAct(c1, 2 * self.c, 1, 1)
        self.cv2 = ConvBNAct(2 * self.c, c1, 1)
        self.attn = Attention(self.c, attn_ratio=0.5, num_heads=max(self.c // 64, 1))
        self.ffn1 = ConvBNAct(self.c, self.c * 2, 1)
        self.ffn2 = ConvBNAct(self.c * 2, self.c, 1, act=False)

    def init(self, rng):
        return {
            "cv1": self.cv1.init(rng),
            "cv2": self.cv2.init(rng),
            "attn": self.attn.init(rng),
            "ffn": {"0": self.ffn1.init(rng), "1": self.ffn2.init(rng)},
        }

    def __call__(self, p, x, ctx, path=""):
        y = self.cv1(p["cv1"], x, ctx, f"{path}/cv1")
        a, b = y[..., : self.c], y[..., self.c :]
        b = b + self.attn(p["attn"], b, ctx, f"{path}/attn")
        b = b + self.ffn2(p["ffn"]["1"], self.ffn1(p["ffn"]["0"], b, ctx, f"{path}/ffn/0"), ctx, f"{path}/ffn/1")
        return self.cv2(p["cv2"], jnp.concatenate([a, b], -1), ctx, f"{path}/cv2")


class v10Detect(Detect):
    """End-to-end (NMS-free) detect head (ref: head.py v10Detect:1183).

    Dual one2many/one2one branches at train time; inference decodes the one2one
    branch and selects top-max_det by score — no NMS program needed.
    """

    def __init__(self, nc=80, ch=(), legacy=False, max_det=300):
        super().__init__(nc, ch, legacy=True)  # build cv2 first
        self.max_det = max_det
        self.end2end = True  # NMS-free (ref head.py Detect.end2end)
        c3 = max(ch[0], min(nc, 100))
        self.cv3 = [
            [
                _Seq(ConvBNAct(x, x, 3, g=x), ConvBNAct(x, c3, 1)),
                _Seq(ConvBNAct(c3, c3, 3, g=c3), ConvBNAct(c3, c3, 1)),
                Conv2d(c3, self.nc, 1),
            ]
            for x in ch
        ]
        import copy as _copy

        self.one2one_cv2 = [_copy.deepcopy(b) for b in self.cv2]
        self.one2one_cv3 = [_copy.deepcopy(b) for b in self.cv3]

    def init(self, rng):
        p = super().init(rng)
        p["one2one_cv2"] = {}
        p["one2one_cv3"] = {}
        for l in range(self.nl):
            p["one2one_cv2"][str(l)] = {str(j): self.one2one_cv2[l][j].init(rng) for j in range(3)}
            p["one2one_cv3"][str(l)] = {str(j): self.one2one_cv3[l][j].init(rng) for j in range(3)}
        # bias priors on the one2one branch too
        for l, s in enumerate(self.stride):
            p["one2one_cv2"][str(l)]["2"]["bias"] = np.ones_like(np.asarray(p["one2one_cv2"][str(l)]["2"]["bias"]))
            cls_bias = math.log(5 / self.nc / (640 / s) ** 2)
            p["one2one_cv3"][str(l)]["2"]["bias"] = np.full_like(np.asarray(p["one2one_cv3"][str(l)]["2"]["bias"]), cls_bias)
        return p

    def __call__(self, p, xs, ctx, path=""):
        """Train: (one2many outs, one2one outs); eval: decoded (B, max_det, 6).

        The one2one branch consumes DETACHED features (ref: head.py
        forward_end2end:139 `x_detach`) — consistent-dual-assignment training
        lets only the one2many loss shape the backbone/neck."""
        if ctx.train:
            xs_detached = [jax.lax.stop_gradient(x) for x in xs]
            return super().__call__(p, xs, ctx, path), self.one2one_forward(p, xs_detached, ctx, path)
        return self.decode_end2end(p, xs, ctx)

    def one2one_forward(self, p, xs, ctx, path=""):
        outs = []
        for l, x in enumerate(xs):
            b = x
            for j in range(3):
                b = self.one2one_cv2[l][j](p["one2one_cv2"][str(l)][str(j)], b, ctx, f"{path}/o2o_cv2/{l}/{j}")
            c = x
            for j in range(3):
                c = self.one2one_cv3[l][j](p["one2one_cv3"][str(l)][str(j)], c, ctx, f"{path}/o2o_cv3/{l}/{j}")
            outs.append(jnp.concatenate([b, c], -1))
        return outs

    def decode_end2end(self, p, xs, ctx):
        """(B, max_det, 6) [x, y, w, h, score, cls] from the one2one branch
        (ref: Detect.postprocess:217)."""
        outs = self.one2one_forward(p, xs, ctx)
        # anchors-major parts directly — decode() would transpose to the
        # reference (B, 4+nc, A) layout only for this to transpose straight
        # back (the same ~26 ms/512 layout churn decode_parts eliminates in
        # the NMS path); end2end boxes are xyxy (ref decode_bboxes)
        boxes, scores = self.decode_parts(p, outs, xywh=False)  # (B, A, 4), (B, A, nc)
        k = min(self.max_det, boxes.shape[1])
        # two-stage (anchor, class) top-k exactly like the reference postprocess
        _, top_idx = jax.lax.top_k(scores.max(-1), k)
        b_sel = jnp.take_along_axis(boxes, top_idx[..., None], axis=1)  # (B, k, 4)
        s_sel = jnp.take_along_axis(scores, top_idx[..., None], axis=1)  # (B, k, nc)
        flat_scores, flat_idx = jax.lax.top_k(s_sel.reshape(s_sel.shape[0], -1), k)  # over k*nc pairs
        anchor_of = flat_idx // self.nc
        cls = (flat_idx % self.nc).astype(jnp.float32)
        b_final = jnp.take_along_axis(b_sel, anchor_of[..., None], axis=1)
        # (B, k, 6): xyxy boxes + conf + cls, like the reference v10 output
        return jnp.concatenate([b_final, flat_scores[..., None], cls[..., None]], -1)


class RepVGGDW:
    """Re-parameterizable depthwise block: dw7x7 + dw3x3 summed, SiLU
    (ref: block.py RepVGGDW)."""

    def __init__(self, ed: int):
        self.conv = ConvBNAct(ed, ed, 7, 1, 3, g=ed, act=False)
        self.conv1 = ConvBNAct(ed, ed, 3, 1, 1, g=ed, act=False)

    def init(self, rng):
        return {"conv": self.conv.init(rng), "conv1": self.conv1.init(rng)}

    def __call__(self, p, x, ctx, path=""):
        y = self.conv(p["conv"], x, ctx, f"{path}/conv").astype(jnp.float32)
        y = y + self.conv1(p["conv1"], x, ctx, f"{path}/conv1").astype(jnp.float32)
        return silu(y).astype(ctx.dtype)


# ---------------------------------------------------------------------------
# YOLOv9-e aux-branch blocks (ref: block.py CBLinear:1026, CBFuse:1050) and
# YOLO12 area-attention blocks (ref: block.py AAttn:1689, ABlock:1775,
# A2C2f:1843)
# ---------------------------------------------------------------------------


class Identity:
    """Pass-through (yaml nn.Identity; v9e uses it to alias the raw input)."""

    def init(self, rng):
        return {}

    def __call__(self, p, x, ctx, path=""):
        return x


class CBLinear:
    """Biased conv whose output splits into a list of channel groups
    (ref: block.py CBLinear:1026)."""

    def __init__(self, c1, c2s, k=1, s=1, p=None, g=1):
        self.c1, self.c2s, self.k, self.s, self.g = c1, list(c2s), k, s, g
        self.p = autopad(k, p)

    def init(self, rng):
        c2 = sum(self.c2s)
        fan_in = self.c1 // self.g * self.k * self.k
        bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
        return {
            "conv": {
                "weight": rng.uniform(-bound, bound, (self.k, self.k, self.c1 // self.g, c2)).astype(np.float32),
                "bias": rng.uniform(-math.sqrt(1.0 / fan_in), math.sqrt(1.0 / fan_in), (c2,)).astype(np.float32),
            }
        }

    def __call__(self, p, x, ctx: Ctx, path=""):
        if "w_int8" in p["conv"]:
            # PTQ'd (quantize_params matches any fused conv group): delegate
            # to the ConvBNAct int8 path with act=False, bias included
            tw = ConvBNAct(self.c1, sum(self.c2s), self.k, self.s, p=self.p, g=self.g, act=False)
            y = tw._call_int8(p, deq(x, ctx.dtype), ctx).astype(ctx.dtype)
        else:
            w = p["conv"]["weight"].astype(ctx.dtype)
            y = jax.lax.conv_general_dilated(
                x.astype(ctx.dtype),
                w,
                window_strides=(self.s, self.s),
                padding=[(self.p, self.p)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.g,
            )
            y = y.astype(jnp.float32) + p["conv"]["bias"].astype(jnp.float32)
            y = y.astype(ctx.dtype)
        outs = []
        o = 0
        for c in self.c2s:
            outs.append(y[..., o : o + c])
            o += c
        return outs


class CBFuse:
    """Sum selected CBLinear splits, nearest-upsampled to the last input's size
    (ref: block.py CBFuse:1050)."""

    def __init__(self, idx):
        self.idx = list(idx)

    def init(self, rng):
        return {}

    def __call__(self, p, xs, ctx: Ctx, path=""):
        target = xs[-1]
        th, tw = target.shape[1], target.shape[2]
        total = target.astype(jnp.float32)
        for i, x in enumerate(xs[:-1]):
            t = x[self.idx[i]]  # pick the matching CBLinear split
            b, h, w, c = t.shape
            if (h, w) != (th, tw):  # nearest upsample by integer repeat
                fy, fx = th // h, tw // w
                t = jnp.repeat(jnp.repeat(t, fy, axis=1), fx, axis=2)
            total = total + t.astype(jnp.float32)
        return total.astype(ctx.dtype)


class AAttn:
    """Area attention: windowed MHSA over `area` horizontal strips with a
    depthwise positional conv on V (ref: block.py AAttn:1689)."""

    def __init__(self, dim, num_heads, area=1):
        self.dim, self.num_heads, self.area = dim, num_heads, area
        self.head_dim = dim // num_heads
        self.qkv = ConvBNAct(dim, dim * 3, 1, act=False)
        self.proj = ConvBNAct(dim, dim, 1, act=False)
        self.pe = ConvBNAct(dim, dim, 7, 1, 3, g=dim, act=False)

    def init(self, rng):
        return {"qkv": self.qkv.init(rng), "proj": self.proj.init(rng), "pe": self.pe.init(rng)}

    def __call__(self, p, x, ctx: Ctx, path=""):
        B, H, W, C = x.shape
        N = H * W
        h, hd = self.num_heads, self.head_dim
        qkv = self.qkv(p["qkv"], x, ctx, f"{path}/qkv").reshape(B, N, 3 * C)
        Bn, Nn = B, N
        if self.area > 1:
            Bn, Nn = B * self.area, N // self.area
            qkv = qkv.reshape(Bn, Nn, 3 * C)
        # channels = (heads, 3·head_dim): each head's q,k,v are contiguous
        t = qkv.reshape(Bn, Nn, h, 3 * hd).transpose(0, 2, 3, 1).astype(jnp.float32)  # (Bn, h, 3hd, Nn)
        q, k, v = t[:, :, :hd], t[:, :, hd : 2 * hd], t[:, :, 2 * hd :]
        attn = jnp.einsum("bhdn,bhdm->bhnm", q, k) * (hd**-0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        y = jnp.einsum("bhdm,bhnm->bhdn", v, attn)  # v @ attnᵀ
        y = y.transpose(0, 3, 1, 2)  # (Bn, Nn, h, hd)
        vv = v.transpose(0, 3, 1, 2)
        if self.area > 1:
            y = y.reshape(B, N, C)
            vv = vv.reshape(B, N, C)
        y = y.reshape(B, H, W, C).astype(ctx.dtype)
        vv = vv.reshape(B, H, W, C).astype(ctx.dtype)
        y = y + self.pe(p["pe"], vv, ctx, f"{path}/pe")
        return self.proj(p["proj"], y, ctx, f"{path}/proj")


class ABlock:
    """Area-attention block: AAttn + 1×1-conv MLP, both residual
    (ref: block.py ABlock:1775)."""

    def __init__(self, dim, num_heads, mlp_ratio=1.2, area=1):
        self.attn = AAttn(dim, num_heads, area)
        hidden = int(dim * mlp_ratio)
        self.mlp = [ConvBNAct(dim, hidden, 1), ConvBNAct(hidden, dim, 1, act=False)]

    def init(self, rng):
        return {"attn": self.attn.init(rng), "mlp": {"0": self.mlp[0].init(rng), "1": self.mlp[1].init(rng)}}

    def __call__(self, p, x, ctx: Ctx, path=""):
        x = x + self.attn(p["attn"], x, ctx, f"{path}/attn")
        y = self.mlp[0](p["mlp"]["0"], x, ctx, f"{path}/mlp/0")
        y = self.mlp[1](p["mlp"]["1"], y, ctx, f"{path}/mlp/1")
        return x + y


class A2C2f:
    """Area-attention C2f: stacked ABlock pairs (or C3k), optional learnable
    residual gamma (ref: block.py A2C2f:1843)."""

    def __init__(self, c1, c2, n=1, a2=True, area=1, residual=False, mlp_ratio=2.0, e=0.5, g=1, shortcut=True):
        c_ = int(c2 * e)
        assert c_ % 32 == 0, "A2C2f hidden dim must be a multiple of 32"
        self.c2, self.n, self.a2, self.residual = c2, n, a2, a2 and residual
        self.cv1 = ConvBNAct(c1, c_, 1, 1)
        self.cv2 = ConvBNAct((1 + n) * c_, c2, 1)
        if a2:
            self.m = [[ABlock(c_, c_ // 32, mlp_ratio, area) for _ in range(2)] for _ in range(n)]
        else:
            self.m = [C3k(c_, c_, 2, shortcut, g) for _ in range(n)]

    def init(self, rng):
        p = {"cv1": self.cv1.init(rng), "cv2": self.cv2.init(rng)}
        if self.a2:
            p["m"] = {str(i): {str(j): blk.init(rng) for j, blk in enumerate(pair)} for i, pair in enumerate(self.m)}
        else:
            p["m"] = {str(i): mod.init(rng) for i, mod in enumerate(self.m)}
        if self.residual:
            p["gamma"] = np.full((self.c2,), 0.01, np.float32)
        return p

    def __call__(self, p, x, ctx: Ctx, path=""):
        ys = [self.cv1(p["cv1"], x, ctx, f"{path}/cv1")]
        for i, item in enumerate(self.m):
            z = ys[-1]
            if self.a2:
                for j, blk in enumerate(item):
                    z = blk(p["m"][str(i)][str(j)], z, ctx, f"{path}/m/{i}/{j}")
            else:
                z = item(p["m"][str(i)], z, ctx, f"{path}/m/{i}")
            ys.append(z)
        y = self.cv2(p["cv2"], jnp.concatenate(ys, -1), ctx, f"{path}/cv2")
        if self.residual:
            return x + p["gamma"].astype(jnp.float32) * y.astype(jnp.float32)
        return y


# ---------------------------------------------------------------------------
# RT-DETR / PPHGNetV2 backbone blocks (ref: block.py HGStem:108, HGBlock:146,
# RepC3:376; conv.py LightConv:158)
# ---------------------------------------------------------------------------


class LightConv:
    """1x1 conv (no act) + depthwise k×k conv (ref: conv.py LightConv:158)."""

    def __init__(self, c1, c2, k=1, act="relu"):
        self.conv1 = ConvBNAct(c1, c2, 1, act=False)
        self.conv2 = DWConv(c2, c2, k, act=act)

    def init(self, rng):
        return {"conv1": self.conv1.init(rng), "conv2": self.conv2.init(rng)}

    def __call__(self, p, x, ctx, path=""):
        return self.conv2(p["conv2"], self.conv1(p["conv1"], x, ctx, f"{path}/conv1"), ctx, f"{path}/conv2")


class HGStem:
    """PPHGNetV2 stem: 5 ReLU convs + stride-1 maxpool branch (ref: block.py HGStem:108)."""

    def __init__(self, c1, cm, c2):
        self.stem1 = ConvBNAct(c1, cm, 3, 2, act="relu")
        self.stem2a = ConvBNAct(cm, cm // 2, 2, 1, 0, act="relu")
        self.stem2b = ConvBNAct(cm // 2, cm, 2, 1, 0, act="relu")
        self.stem3 = ConvBNAct(cm * 2, cm, 3, 2, act="relu")
        self.stem4 = ConvBNAct(cm, c2, 1, 1, act="relu")

    def init(self, rng):
        return {k: getattr(self, k).init(rng) for k in ("stem1", "stem2a", "stem2b", "stem3", "stem4")}

    def __call__(self, p, x, ctx, path=""):
        x = self.stem1(p["stem1"], x, ctx, f"{path}/stem1")
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))  # F.pad [0,1,0,1]
        x2 = self.stem2a(p["stem2a"], x, ctx, f"{path}/stem2a")
        x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = self.stem2b(p["stem2b"], x2, ctx, f"{path}/stem2b")
        # maxpool k2 s1 ceil_mode=True on the padded map == VALID here (size keeps)
        x1 = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 1, 1, 1), "VALID")
        x = jnp.concatenate([x1, x2], -1)
        x = self.stem3(p["stem3"], x, ctx, f"{path}/stem3")
        return self.stem4(p["stem4"], x, ctx, f"{path}/stem4")


class HGBlock:
    """PPHGNetV2 block: n chained convs, squeeze/excite 1x1s, optional shortcut
    (ref: block.py HGBlock:146)."""

    def __init__(self, c1, cm, c2, k=3, n=6, lightconv=False, shortcut=False):
        block = LightConv if lightconv else ConvBNAct
        if lightconv:
            self.m = [LightConv(c1 if i == 0 else cm, cm, k=k) for i in range(n)]
        else:
            self.m = [ConvBNAct(c1 if i == 0 else cm, cm, k, act="relu") for i in range(n)]
        self.sc = ConvBNAct(c1 + n * cm, c2 // 2, 1, 1, act="relu")
        self.ec = ConvBNAct(c2 // 2, c2, 1, 1, act="relu")
        self.add = shortcut and c1 == c2

    def init(self, rng):
        return {
            "m": {str(i): m.init(rng) for i, m in enumerate(self.m)},
            "sc": self.sc.init(rng),
            "ec": self.ec.init(rng),
        }

    def __call__(self, p, x, ctx, path=""):
        ys = [x]
        for i, m in enumerate(self.m):
            ys.append(m(p["m"][str(i)], ys[-1], ctx, f"{path}/m/{i}"))
        y = self.ec(p["ec"], self.sc(p["sc"], jnp.concatenate(ys, -1), ctx, f"{path}/sc"), ctx, f"{path}/ec")
        return y + x if self.add else y


class RepC3:
    """CSP block of RepConvs with identity-or-conv cv3 (ref: block.py RepC3:376)."""

    def __init__(self, c1, c2, n=3, e=1.0):
        c_ = int(c2 * e)
        self.cv1 = ConvBNAct(c1, c_, 1, 1)
        self.cv2 = ConvBNAct(c1, c_, 1, 1)
        self.m = [RepConv(c_, c_) for _ in range(n)]
        self.cv3 = ConvBNAct(c_, c2, 1, 1) if c_ != c2 else None

    def init(self, rng):
        p = {
            "cv1": self.cv1.init(rng),
            "cv2": self.cv2.init(rng),
            "m": {str(i): m.init(rng) for i, m in enumerate(self.m)},
        }
        if self.cv3 is not None:
            p["cv3"] = self.cv3.init(rng)
        return p

    def __call__(self, p, x, ctx, path=""):
        y = self.cv1(p["cv1"], x, ctx, f"{path}/cv1")
        for i, m in enumerate(self.m):
            y = m(p["m"][str(i)], y, ctx, f"{path}/m/{i}")
        y = y + self.cv2(p["cv2"], x, ctx, f"{path}/cv2")
        return self.cv3(p["cv3"], y, ctx, f"{path}/cv3") if self.cv3 is not None else y


# ---------------------------------------------------------------------------
# YOLO-World open-vocabulary blocks (ref: block.py MaxSigmoidAttnBlock:587,
# C2fAttn:641, ImagePoolingAttn:710, ContrastiveHead:777, BNContrastiveHead:804;
# head.py WorldDetect:482). Text guides travel in Ctx.guide / Ctx.guide0.
# ---------------------------------------------------------------------------


class MaxSigmoidAttnBlock:
    """Text-guided max-sigmoid spatial attention (ref: block.py :587)."""

    def __init__(self, c1, c2, nh=1, ec=128, gc=512, scale=False):
        self.nh, self.hc = nh, c2 // nh
        self.ec_conv = ConvBNAct(c1, ec, 1, act=False) if c1 != ec else None
        self.gc, self.ec_dim = gc, ec
        self.proj_conv = ConvBNAct(c1, c2, 3, 1, act=False)
        self.has_scale = scale

    def init(self, rng):
        bound = math.sqrt(1.0 / self.gc)
        p = {
            "gl": {
                "weight": rng.uniform(-bound, bound, (self.ec_dim, self.gc)).astype(np.float32),
                "bias": rng.uniform(-bound, bound, (self.ec_dim,)).astype(np.float32),
            },
            "bias": np.zeros((self.nh,), np.float32),
            "proj_conv": self.proj_conv.init(rng),
        }
        if self.ec_conv is not None:
            p["ec"] = self.ec_conv.init(rng)
        if self.has_scale:
            p["scale"] = np.ones((1, self.nh, 1, 1), np.float32)
        return p

    def __call__(self, p, x, ctx: Ctx, path=""):
        guide = ctx.guide.astype(jnp.float32)  # (B, nt, gc)
        B, H, W, C = x.shape
        g = guide @ p["gl"]["weight"].astype(jnp.float32).T + p["gl"]["bias"]  # (B, nt, ec)
        g = g.reshape(B, -1, self.nh, self.hc)
        embed = self.ec_conv(p["ec"], x, ctx, f"{path}/ec") if self.ec_conv is not None else x
        embed = embed.reshape(B, H, W, self.nh, self.hc).astype(jnp.float32)
        aw = jnp.einsum("bhwmc,bnmc->bmhwn", embed, g)
        aw = aw.max(-1) / (self.hc**0.5)  # (B, nh, H, W)
        aw = aw + p["bias"][None, :, None, None]
        aw = jax.nn.sigmoid(aw) * (p["scale"] if "scale" in p else 1.0)
        y = self.proj_conv(p["proj_conv"], x, ctx, f"{path}/proj_conv")  # (B, H, W, c2)
        y = y.reshape(B, H, W, self.nh, self.hc).astype(jnp.float32)
        y = y * aw.transpose(0, 2, 3, 1)[..., None]
        return y.reshape(B, H, W, -1).astype(ctx.dtype)


class C2fAttn:
    """C2f + text-guided attention branch (ref: block.py C2fAttn:641)."""

    def __init__(self, c1, c2, n=1, ec=128, nh=1, gc=512, shortcut=False, g=1, e=0.5):
        self.c = int(c2 * e)
        self.n = n
        self.cv1 = ConvBNAct(c1, 2 * self.c, 1, 1)
        self.cv2 = ConvBNAct((3 + n) * self.c, c2, 1)
        self.m = [Bottleneck(self.c, self.c, shortcut, g, k=((3, 3), (3, 3)), e=1.0) for _ in range(n)]
        self.attn = MaxSigmoidAttnBlock(self.c, self.c, gc=gc, ec=ec, nh=nh)

    def init(self, rng):
        return {
            "cv1": self.cv1.init(rng),
            "cv2": self.cv2.init(rng),
            "m": {str(i): m.init(rng) for i, m in enumerate(self.m)},
            "attn": self.attn.init(rng),
        }

    def __call__(self, p, x, ctx: Ctx, path=""):
        y = self.cv1(p["cv1"], x, ctx, f"{path}/cv1")
        ys = [y[..., : self.c], y[..., self.c :]]
        for i, m in enumerate(self.m):
            ys.append(m(p["m"][str(i)], ys[-1], ctx, f"{path}/m/{i}"))
        ys.append(self.attn(p["attn"], ys[-1], ctx, f"{path}/attn"))
        return self.cv2(p["cv2"], jnp.concatenate(ys, -1), ctx, f"{path}/cv2")


def _adaptive_max_pool(x, k):
    """torch AdaptiveMaxPool2d((k, k)) on NHWC with static H, W."""
    B, H, W, C = x.shape
    rows = [x[:, (i * H) // k : -(-((i + 1) * H) // k)] for i in range(k)]
    out = []
    for r in rows:
        cols = [r[:, :, (j * W) // k : -(-((j + 1) * W) // k)].max((1, 2)) for j in range(k)]
        out.append(jnp.stack(cols, 1))
    return jnp.stack(out, 1)  # (B, k, k, C)


class ImagePoolingAttn:
    """Image-aware refresh of the text embeddings (ref: block.py :710).

    Reads Ctx.guide, writes the refreshed guide back into Ctx (the reference
    threads it imperatively through the layer loop, ref: tasks.py :940).
    """

    def __init__(self, ec=256, ch=(), ct=512, nh=8, k=3, scale=False):
        self.ec, self.ct, self.nh, self.k = ec, ct, nh, k
        self.nf = len(ch)
        self.hc = ec // nh
        self.ch = tuple(ch)
        self.has_scale = scale

    def _lin(self, rng, c_in, c_out):
        bound = math.sqrt(1.0 / c_in)
        return {
            "weight": rng.uniform(-bound, bound, (c_out, c_in)).astype(np.float32),
            "bias": rng.uniform(-bound, bound, (c_out,)).astype(np.float32),
        }

    def init(self, rng):
        def ln(c):
            return {"weight": np.ones((c,), np.float32), "bias": np.zeros((c,), np.float32)}

        p = {
            "query": {"0": ln(self.ct), "1": self._lin(rng, self.ct, self.ec)},
            "key": {"0": ln(self.ec), "1": self._lin(rng, self.ec, self.ec)},
            "value": {"0": ln(self.ec), "1": self._lin(rng, self.ec, self.ec)},
            "proj": self._lin(rng, self.ec, self.ct),
            "projections": {str(i): self._lin_conv(rng, c) for i, c in enumerate(self.ch)},
        }
        if self.has_scale:
            p["scale"] = np.zeros((1,), np.float32)
        return p

    def _lin_conv(self, rng, c_in):
        bound = math.sqrt(1.0 / c_in)
        return {
            "weight": rng.uniform(-bound, bound, (1, 1, c_in, self.ec)).astype(np.float32),
            "bias": rng.uniform(-bound, bound, (self.ec,)).astype(np.float32),
        }

    @staticmethod
    def _ln(p, x):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p["weight"] + p["bias"]

    def __call__(self, p, xs, ctx: Ctx, path=""):
        text = ctx.guide.astype(jnp.float32)  # (B, nt, ct)
        B = xs[0].shape[0]
        feats = []
        for i, x in enumerate(xs):
            pp = p["projections"][str(i)]
            f = jax.lax.conv_general_dilated(
                x.astype(jnp.float32), pp["weight"].astype(jnp.float32), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + pp["bias"]
            feats.append(_adaptive_max_pool(f, self.k).reshape(B, self.k * self.k, self.ec))
        xflat = jnp.concatenate(feats, 1)  # (B, nf·k², ec)
        q = self._ln(p["query"]["0"], text) @ p["query"]["1"]["weight"].T + p["query"]["1"]["bias"]
        kk = self._ln(p["key"]["0"], xflat) @ p["key"]["1"]["weight"].T + p["key"]["1"]["bias"]
        v = self._ln(p["value"]["0"], xflat) @ p["value"]["1"]["weight"].T + p["value"]["1"]["bias"]
        q = q.reshape(B, -1, self.nh, self.hc)
        kk = kk.reshape(B, -1, self.nh, self.hc)
        v = v.reshape(B, -1, self.nh, self.hc)
        aw = jnp.einsum("bnmc,bkmc->bmnk", q, kk) / (self.hc**0.5)
        aw = jax.nn.softmax(aw, -1)
        y = jnp.einsum("bmnk,bkmc->bnmc", aw, v).reshape(B, -1, self.ec)
        y = y @ p["proj"]["weight"].T + p["proj"]["bias"]
        scale = p["scale"] if "scale" in p else 1.0
        new_text = (y * scale + text).astype(ctx.dtype)
        ctx.guide = new_text  # refresh the running guide
        return new_text


class ContrastiveHead:
    """Region-text similarity with L2 norms (ref: block.py ContrastiveHead:777)."""

    def init(self, rng):
        return {"bias": np.array([-10.0], np.float32), "logit_scale": np.array(math.log(1 / 0.07), np.float32)}

    def __call__(self, p, x, w, ctx: Ctx, path=""):
        x = x.astype(jnp.float32)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)  # channel-last
        w = w.astype(jnp.float32)
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
        y = jnp.einsum("bhwc,bkc->bhwk", x, w)
        return y * jnp.exp(p["logit_scale"]) + p["bias"]


class BNContrastiveHead:
    """Contrastive head with BN on image feats (ref: block.py BNContrastiveHead:804)."""

    def __init__(self, embed: int):
        self.embed = embed

    def init(self, rng):
        return {
            "norm": {
                "weight": np.ones((self.embed,), np.float32),
                "bias": np.zeros((self.embed,), np.float32),
                "running_mean": np.zeros((self.embed,), np.float32),
                "running_var": np.ones((self.embed,), np.float32),
            },
            "bias": np.array([-10.0], np.float32),
            "logit_scale": np.array(-1.0, np.float32),
        }

    def __call__(self, p, x, w, ctx: Ctx, path=""):
        bn = p["norm"]
        x = x.astype(jnp.float32)
        if ctx.train:
            mean = x.mean((0, 1, 2))
            var = x.var((0, 1, 2))
            n = x.shape[0] * x.shape[1] * x.shape[2]
            ctx.stats[f"{path}/norm"] = (jax.lax.stop_gradient(mean), jax.lax.stop_gradient(var), n)
        else:
            mean, var = bn["running_mean"], bn["running_var"]
        x = (x - mean) * (bn["weight"] * jax.lax.rsqrt(var + BN_EPS)) + bn["bias"]
        w = w.astype(jnp.float32)
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
        y = jnp.einsum("bhwc,bkc->bhwk", x, w)
        return y * jnp.exp(p["logit_scale"]) + p["bias"]


class WorldDetect(Detect):
    """Detect head scoring classes by text-embedding similarity
    (ref: head.py WorldDetect:482)."""

    def __init__(self, nc=80, embed=512, with_bn=False, ch=(), legacy=True):
        super().__init__(nc, ch, legacy=True)
        c3 = max(ch[0], min(nc, 100))
        self.embed = embed
        self.cv3 = [[ConvBNAct(x, c3, 3), ConvBNAct(c3, c3, 3), Conv2d(c3, embed, 1)] for x in ch]
        self.cv4 = [BNContrastiveHead(embed) if with_bn else ContrastiveHead() for _ in ch]

    def init(self, rng):
        p = super().init(rng)
        p["cv3"] = {str(l): {str(j): self.cv3[l][j].init(rng) for j in range(3)} for l in range(self.nl)}
        p["cv4"] = {str(l): self.cv4[l].init(rng) for l in range(self.nl)}
        return p

    def __call__(self, p, xs, ctx: Ctx, path=""):
        text = ctx.guide0  # original text features (B, nc, embed)
        outs = []
        for l, x in enumerate(xs):
            box = x
            for j in range(3):
                box = self.cv2[l][j](p["cv2"][str(l)][str(j)], box, ctx, f"{path}/cv2/{l}/{j}")
            emb = x
            for j in range(3):
                emb = self.cv3[l][j](p["cv3"][str(l)][str(j)], emb, ctx, f"{path}/cv3/{l}/{j}")
            cls = self.cv4[l](p["cv4"][str(l)], emb, text, ctx, f"{path}/cv4/{l}")
            outs.append(jnp.concatenate([box, cls.astype(ctx.dtype)], -1))
        return outs


# ---------------------------------------------------------------------------
# YOLOE open-vocabulary blocks (ref: block.py SwiGLUFFN:1937, Residual:1952,
# SAVPE:1974; head.py YOLOEDetect:605, YOLOESegment:793)
# ---------------------------------------------------------------------------


class SwiGLUFFN:
    """SwiGLU feed-forward (ref: block.py SwiGLUFFN:1937)."""

    def __init__(self, gc: int, ec: int, e: int = 4):
        self.gc, self.ec, self.e = gc, ec, e

    def init(self, rng):
        b1 = math.sqrt(1.0 / self.gc)
        b2 = math.sqrt(1.0 / (self.e * self.ec // 2))
        return {
            "w12": {
                "weight": rng.uniform(-b1, b1, (self.e * self.ec, self.gc)).astype(np.float32),
                "bias": rng.uniform(-b1, b1, (self.e * self.ec,)).astype(np.float32),
            },
            "w3": {
                "weight": rng.uniform(-b2, b2, (self.ec, self.e * self.ec // 2)).astype(np.float32),
                "bias": np.zeros((self.ec,), np.float32),  # Residual zero-inits w3.bias
            },
        }

    def __call__(self, p, x):
        x12 = x.astype(jnp.float32) @ p["w12"]["weight"].astype(jnp.float32).T + p["w12"]["bias"]
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return (silu(x1) * x2) @ p["w3"]["weight"].astype(jnp.float32).T + p["w3"]["bias"]


class SAVPE:
    """Spatial-aware visual prompt embeddings (ref: block.py SAVPE:1974).

    Turns per-prompt binary masks on the P3 grid into normalized embedding
    vectors via score-weighted pooling of multi-level features."""

    def __init__(self, ch, c3, embed):
        self.ch, self.c3_dim, self.embed = list(ch), c3, embed
        self.c = 16
        self.cv1 = [[ConvBNAct(x, c3, 3), ConvBNAct(c3, c3, 3)] for x in ch]  # + upsample i∈{1,2}
        self.cv2 = [ConvBNAct(x, c3, 1) for x in ch]
        self.cv6_0 = ConvBNAct(2 * self.c, self.c, 3)

    def _conv_init(self, rng, k, ci, co):
        bound = math.sqrt(1.0 / (ci * k * k))
        return {
            "weight": rng.uniform(-bound, bound, (k, k, ci, co)).astype(np.float32),
            "bias": rng.uniform(-bound, bound, (co,)).astype(np.float32),
        }

    def init(self, rng):
        return {
            "cv1": {str(i): {"0": a.init(rng), "1": b.init(rng)} for i, (a, b) in enumerate(self.cv1)},
            "cv2": {str(i): {"0": m.init(rng)} for i, m in enumerate(self.cv2)},
            "cv3": self._conv_init(rng, 1, 3 * self.c3_dim, self.embed),
            "cv4": self._conv_init(rng, 3, 3 * self.c3_dim, self.c),
            "cv5": self._conv_init(rng, 3, 1, self.c),
            "cv6": {"0": self.cv6_0.init(rng), "1": self._conv_init(rng, 3, self.c, self.c)},
        }

    @staticmethod
    def _conv(p, x, pad=0):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), p["weight"].astype(jnp.float32), (1, 1), [(pad, pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + p["bias"]

    @staticmethod
    def _up(x, f):
        return jnp.repeat(jnp.repeat(x, f, 1), f, 2) if f > 1 else x

    def __call__(self, p, xs, vp, ctx: Ctx):
        """xs: 3-level NHWC features; vp: (B, Q, H, W) binary prompt masks on P3."""
        ys = []
        for i, x in enumerate(xs):
            y = self.cv2[i](p["cv2"][str(i)]["0"], x, ctx, "")
            ys.append(self._up(y, 2 * i if i in (1, 2) else 1))
        y = self._conv(p["cv4"], jnp.concatenate(ys, -1), pad=1)  # (B, H, W, c)

        feats = []
        for i, x in enumerate(xs):
            f = self.cv1[i][0](p["cv1"][str(i)]["0"], x, ctx, "")
            f = self.cv1[i][1](p["cv1"][str(i)]["1"], f, ctx, "")
            feats.append(self._up(f, 2 * i if i in (1, 2) else 1))
        feat = self._conv(p["cv3"], jnp.concatenate(feats, -1))  # (B, H, W, embed)

        B, H, W, C = feat.shape
        Q = vp.shape[1]
        xf = feat.reshape(B, H * W, C)
        yq = jnp.broadcast_to(y[:, None], (B, Q, H, W, self.c)).reshape(B * Q, H, W, self.c)
        vpf = vp.reshape(B * Q, H, W, 1).astype(jnp.float32)
        z = jnp.concatenate([yq, self._conv(p["cv5"], vpf, pad=1)], -1)
        z = self.cv6_0(p["cv6"]["0"], z, ctx, "")
        z = self._conv(p["cv6"]["1"], z, pad=1)  # (B·Q, H, W, c)
        z = z.reshape(B, Q, H * W, self.c)
        vflat = vpf.reshape(B, Q, H * W, 1)
        score = z * vflat + (1 - vflat) * jnp.finfo(jnp.float32).min
        score = jax.nn.softmax(score, axis=2)  # over spatial positions
        # aggregate: per sub-channel-group weighted pooling (ref :2029)
        xg = xf.reshape(B, H * W, self.c, C // self.c)
        agg = jnp.einsum("bqnc,bncd->bqcd", score, xg).reshape(B, Q, C)
        return agg / jnp.maximum(jnp.linalg.norm(agg, axis=-1, keepdims=True), 1e-12)


class YOLOEDetect(Detect):
    """Detect head with text/visual prompt embeddings (ref: head.py YOLOEDetect:605)."""

    def __init__(self, nc=80, embed=512, with_bn=True, ch=(), legacy=False):
        super().__init__(nc, ch, legacy=legacy)
        assert with_bn, "YOLOE uses the BN contrastive head"
        c3 = max(ch[0], min(nc, 100))
        self.embed = embed
        if legacy:
            self.cv3e = [[("conv", ConvBNAct(x, c3, 3)), ("conv", ConvBNAct(c3, c3, 3)), ("raw", Conv2d(c3, embed, 1))] for x in ch]
        else:
            self.cv3e = [
                [
                    ("seq", (DWConv(x, x, 3), ConvBNAct(x, c3, 1))),
                    ("seq", (DWConv(c3, c3, 3), ConvBNAct(c3, c3, 1))),
                    ("raw", Conv2d(c3, embed, 1)),
                ]
                for x in ch
            ]
        self.cv4 = [BNContrastiveHead(embed) for _ in ch]
        self.reprta = SwiGLUFFN(embed, embed)
        self.savpe = SAVPE(ch, c3, embed)

    def init(self, rng):
        p = super().init(rng)
        cv3 = {}
        for l, branch in enumerate(self.cv3e):
            lp = {}
            for j, (kind, mod) in enumerate(branch):
                if kind == "seq":
                    lp[str(j)] = {"0": mod[0].init(rng), "1": mod[1].init(rng)}
                else:
                    lp[str(j)] = mod.init(rng)
            cv3[str(l)] = lp
        p["cv3"] = cv3
        p["cv4"] = {str(l): h.init(rng) for l, h in enumerate(self.cv4)}
        p["reprta"] = {"m": self.reprta.init(rng)}
        p["savpe"] = self.savpe.init(rng)
        return p

    def get_tpe(self, p, tpe):
        """Text prompt embeddings: residual SwiGLU + L2 norm (ref :737)."""
        y = tpe.astype(jnp.float32) + self.reprta(p["reprta"]["m"], tpe)
        return y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12)

    def get_vpe(self, p, xs, vp, ctx):
        """Visual prompt embeddings from (B, Q, H, W) P3-grid masks (ref :744)."""
        return self.savpe(p["savpe"], xs, vp, ctx)

    def _cls_branch(self, p, l, x, ctx, path):
        for j, (kind, mod) in enumerate(self.cv3e[l]):
            pp = p["cv3"][str(l)][str(j)]
            if kind == "seq":
                x = mod[0](pp["0"], x, ctx, f"{path}/{j}/0")
                x = mod[1](pp["1"], x, ctx, f"{path}/{j}/1")
            elif kind == "conv":
                x = mod(pp, x, ctx, f"{path}/{j}")
            else:
                x = mod(pp, x, ctx, f"{path}/{j}")
        return x

    def __call__(self, p, xs, ctx: Ctx, path=""):
        text = ctx.guide0  # (B, nc, embed) processed class prompt embeddings
        outs = []
        for l, x in enumerate(xs):
            box = x
            for j in range(3):
                box = self.cv2[l][j](p["cv2"][str(l)][str(j)], box, ctx, f"{path}/cv2/{l}/{j}")
            emb = self._cls_branch(p, l, x, ctx, f"{path}/cv3/{l}")
            cls = self.cv4[l](p["cv4"][str(l)], emb, text, ctx, f"{path}/cv4/{l}")
            outs.append(jnp.concatenate([box, cls.astype(ctx.dtype)], -1))
        return outs

    # ---- prompt-free LRPC path (ref: head.py LRPCHead:540, fuse:667,
    # forward_lrpc:731) -------------------------------------------------------
    def fuse_text(self, p, cls_pe):
        """Fold [final embed conv + BN-contrastive head + class prompts] into
        per-level (nc, c3) linears — the reference's YOLOEDetect.fuse math.

        cls_pe: (nc, embed) prompt embeddings (normalized inside, idempotent).
        """
        pe = np.asarray(cls_pe, np.float32)
        pe = pe / np.maximum(np.linalg.norm(pe, axis=-1, keepdims=True), 1e-12)
        out = {}
        for l in range(self.nl):
            conv = p["cv3"][str(l)]["2"]
            head = p["cv4"][str(l)]
            W = np.asarray(conv["weight"], np.float32).reshape(-1, self.embed)  # (c3, embed) from HWIO
            b = np.asarray(conv["bias"], np.float32) if "bias" in conv else np.zeros((self.embed,), np.float32)
            bn = head["norm"]
            s = np.asarray(bn["weight"], np.float32) / np.sqrt(np.asarray(bn["running_var"], np.float32) + BN_EPS)
            Wf = W * s[None]  # BN folded into the embed conv (fuse_conv_and_bn)
            bf = np.asarray(bn["bias"], np.float32) + (b - np.asarray(bn["running_mean"], np.float32)) * s
            t = pe * np.exp(np.asarray(head["logit_scale"], np.float32))
            out[str(l)] = {
                "weight": (t @ Wf.T).astype(np.float32),  # (nc, c3)
                "bias": (t @ bf + np.asarray(head["bias"], np.float32)[0]).astype(np.float32),
            }
        return out

    def _cls_features(self, p, l, x, ctx, path):
        """cv3 chain WITHOUT the final embed conv → (B, h, w, c3)."""
        for j, (kind, mod) in enumerate(self.cv3e[l][:-1]):
            pp = p["cv3"][str(l)][str(j)]
            if kind == "seq":
                x = mod[0](pp["0"], x, ctx, f"{path}/{j}/0")
                x = mod[1](pp["1"], x, ctx, f"{path}/{j}/1")
            else:
                x = mod(pp, x, ctx, f"{path}/{j}")
        return x

    def forward_lrpc(self, p, xs, ctx: Ctx, conf: float = 0.001, path=""):
        """Prompt-free detection with the fused vocabulary (ref forward_lrpc:731).

        Region-proposal filtering is STATIC-shape: instead of gathering the
        anchors that pass the pf score (data-dependent shapes), failing
        anchors' class features are zeroed — the reference's own export-mode
        semantics — so their logits collapse to the fused bias (sigmoid ≈ 0)
        and NMS drops them. Returns (per-level outs, (B, A) keep mask).
        """
        assert "lrpc" in p, "prompt-free inference requires set_vocab() first (fused vocabulary)"
        vocab, pf = p["lrpc"]["vocab"], p["lrpc"]["pf"]
        outs, masks = [], []
        for l, x in enumerate(xs):
            box = x
            for j in range(3):
                box = self.cv2[l][j](p["cv2"][str(l)][str(j)], box, ctx, f"{path}/cv2/{l}/{j}")
            emb = self._cls_features(p, l, x, ctx, f"{path}/cv3/{l}").astype(jnp.float32)
            B, h, w, _ = emb.shape
            pf_logit = emb @ pf[str(l)]["weight"].T + pf[str(l)]["bias"]
            keep = jax.nn.sigmoid(pf_logit[..., :1]) > conf  # proposal filter, channel 0
            if l != self.nl - 1:  # last level runs unfiltered (ref enabled=i != 2)
                emb = emb * keep
                masks.append(keep.reshape(B, h * w))
            else:
                masks.append(jnp.ones((B, h * w), bool))
            cls = emb @ vocab[str(l)]["weight"].T + vocab[str(l)]["bias"]
            outs.append(jnp.concatenate([box.astype(jnp.float32), cls], -1))
        return outs, jnp.concatenate(masks, axis=1)


class YOLOESegment(YOLOEDetect):
    """YOLOE detect + prototype masks (ref: head.py YOLOESegment:793)."""

    def __init__(self, nc=80, nm=32, npr=256, embed=512, with_bn=True, ch=(), legacy=False):
        super().__init__(nc, embed, with_bn, ch, legacy=legacy)
        self.nm, self.npr = nm, npr
        self.proto = Proto(ch[0], npr, nm)
        c5 = max(ch[0] // 4, nm)
        self.cv5 = [[ConvBNAct(x, c5, 3), ConvBNAct(c5, c5, 3), Conv2d(c5, nm, 1)] for x in ch]

    def init(self, rng):
        p = super().init(rng)
        p["proto"] = self.proto.init(rng)
        p["cv5"] = {str(l): {str(j): self.cv5[l][j].init(rng) for j in range(3)} for l in range(self.nl)}
        return p

    def __call__(self, p, xs, ctx: Ctx, path=""):
        protos = self.proto(p["proto"], xs[0], ctx, f"{path}/proto")
        mcs = []
        for l, x in enumerate(xs):
            m = x
            for j in range(3):
                m = self.cv5[l][j](p["cv5"][str(l)][str(j)], m, ctx, f"{path}/cv5/{l}/{j}")
            mcs.append(m)
        det_outs = super().__call__(p, xs, ctx, path)
        return det_outs, mcs, protos

    def decode_with_masks(self, p, outs):
        det_outs, mask_outs, protos = outs
        dets = self.decode(p, det_outs)
        B = dets.shape[0]
        mc = jnp.concatenate([m.reshape(B, -1, self.nm) for m in mask_outs], axis=1)
        return jnp.concatenate([dets, jnp.swapaxes(mc, 1, 2)], axis=1), protos


# Graph-level layers that natively accept QTensor inputs (the int8-resident
# activation flow). tasks._apply_layer dequantizes the inputs of any OTHER
# layer class before calling it; see int8_flow_paths for the producer-side
# restriction. Subclasses count (DWConv, C3k2, Segment/Pose/OBB heads, ...);
# Detect qualifies because every per-level entry op is a ConvBNAct/Conv2d,
# both of which consume QTensor directly.
QTENSOR_MODULES = (ConvBNAct, Conv2d, Bottleneck, C2f, SPPF, Concat, Upsample, Detect)
