"""Space-to-depth stem folding: the layout-level rewrite for small-channel HBM traffic.

Why: the fused forward is HBM-bandwidth-bound (demos/roofline.py: 7.6 GF/frame
at 131 MB/frame of compiled traffic, 71% of v5e HBM peak). The worst offenders
are the stem tensors: a (512, 640, 1) bf16 input and a (256, 320, 16) P1
activation pad their channel dim onto the TPU's 128-lane vector layout at 128x
and 8x waste respectively. Nothing about the *math* needs those layouts — a
3x3 stride-2 conv is exactly a 2x2 stride-1 conv over a space-to-depth-packed
input with rearranged (zero-padded) weights.

MEASURED OUTCOME (v5e, chunk 512, 512x640 gray, bf16): neutral. XLA already
lays batched NHWC activations out batch-minor ({0,3,2,1:T(8,128)} — the
BATCH dim rides the 128-lane axis), so at chunk sizes >=128 the small-channel
stem is already dense and the padding this rewrite removes does not exist.
Forward: baseline 4493 fps / 131.2 MB-frame vs s2d r=4 4408 / 131.9 and r=8
4524 / 126.0 (r=8 trades 1.2x FLOPs for 4% fewer bytes — a wash). The real
HBM hog was the f32 DFL softmax in the decode (see modules.dfl_project).
The fold stays available (off by default, `FusedDetectTrack(s2d=4|8)`) for
small-batch / latency-bound serving where the batch dim cannot fill the
lanes; parity is pinned by tests/test_s2d.py either way.

This module folds the first two stride-2 convs (the P1/P2 stem, ref:
ultralytics/cfg/models/v8/yolov8-small.yaml backbone rows 0-1 via
nn/tasks.py parse_model) into packed-layout equivalents:

    r=4:  x (H, W, C) -> X4 (H/4, W/4, 16C)       [pack once, on uint8]
          stage A: 2x2 s1 conv, 16C -> 4*c0        == Conv0 with P1 packed 2x
          stage B: 2x2 s1 conv, 4*c0 -> c1         == Conv1, standard P2 layout
    r=8:  pack by 8, P1 packed 4x, P2 packed 2x, then one depth-to-space(2)

The rewrite is numerically exact up to float summation order (same products,
different association); parity is pinned by tests/test_s2d.py. SiLU/bias are
elementwise and commute with the packing (bias tiles across sub-positions).

Kernel-tap derivation (rows; cols identical): output block i, sub-row p of a
stride-2 conv reads input rows 2*(bi+p)+u-1 for u in 0..2 and block size b —
offsets from r*i span [-1, b-1], i.e. exactly two r-blocks {i-1, i}, so a
2x2 kernel with padding ((1,0),(1,0)) always suffices; tap (a, rr) maps to
original u = (a-1)*r + rr - 2p + 1, zero-weight where u falls outside 0..2.
"""

from __future__ import annotations

import numpy as np

__all__ = ["pack_input", "fold_stem", "stem_apply", "S2D_KEY"]

S2D_KEY = "s2d"


def pack_input(x, r: int):
    """(B, H, W, C) -> (B, H/r, W/r, r*r*C) with channel order (row-off, col-off, c).

    Pure reshape/transpose — run it on the uint8 frames inside the jit so the
    cast-to-bf16 lands on the packed (dense-lane) layout, never on the (H, W, C)
    one. Works on numpy or jax arrays.
    """
    B, H, W, C = x.shape
    assert H % r == 0 and W % r == 0, f"frame {H}x{W} not divisible by pack factor {r}"
    x = x.reshape(B, H // r, r, W // r, r, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // r, W // r, r * r * C)


def _unpack_hw(y, r: int):
    """Inverse of pack_input on the spatial grouping: (B, h, w, r*r*C) -> (B, h*r, w*r, C)."""
    B, h, w, Crr = y.shape
    C = Crr // (r * r)
    y = y.reshape(B, h, w, r, r, C)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, h * r, w * r, C)


def _pack_stage(w, b, r_in: int, r_out: int):
    """Rewrite one 3x3/s2/p1 conv (HWIO w, bias b) from an r_in-packed input to
    an r_out-packed output as a 2x2/s1 conv with padding ((1,0),(1,0))."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    assert r_in == 2 * r_out or (r_in, r_out) == (2, 1)
    wa = np.zeros((2, 2, r_in * r_in * cin, r_out * r_out * cout), w.dtype)
    for a in range(2):
        for bb_ in range(2):
            for rr in range(r_in):
                for ss in range(r_in):
                    for p in range(r_out):
                        for q in range(r_out):
                            u = (a - 1) * r_in + rr - 2 * p + 1
                            v = (bb_ - 1) * r_in + ss - 2 * q + 1
                            if 0 <= u < 3 and 0 <= v < 3:
                                ci = (rr * r_in + ss) * cin
                                co = (p * r_out + q) * cout
                                wa[a, bb_, ci : ci + cin, co : co + cout] = w[u, v]
    ba = np.tile(np.asarray(b), r_out * r_out)
    return wa, ba


def fold_stem(params, r: int = 4):
    """Build the packed-stem param group from FUSED model params.

    Expects layers "0"/"1" to be fused ConvBNAct(k=3, s=2, p=1, g=1, d=1) —
    exactly the yolov8 family stem. Returns {"wa","ba","wb","bb","r"} (numpy;
    uploads with the rest of the tree)."""
    assert r in (4, 8), f"pack factor must be 4 or 8, got {r}"
    l0, l1 = params["model"]["0"], params["model"]["1"]
    for li in (l0, l1):
        assert "bn" not in li, "fold_stem needs fused params (model.fuse(params) first)"
        assert np.asarray(li["conv"]["weight"]).shape[:2] == (3, 3), "stem must be 3x3 convs"
    w0, b0 = np.asarray(l0["conv"]["weight"]), np.asarray(l0["conv"]["bias"])
    w1, b1 = np.asarray(l1["conv"]["weight"]), np.asarray(l1["conv"]["bias"])
    wa, ba = _pack_stage(w0, b0, r, r // 2)
    wb, bb = _pack_stage(w1, b1, r // 2, r // 4 if r == 8 else 1)
    return {"wa": wa, "ba": ba, "wb": wb, "bb": bb}


def stem_apply(s2dp, x_packed, dtype, c1: int):
    """Run the packed stem: x_packed (B, H/r, W/r, r*r*C) float -> P2 activation
    (B, H/4, W/4, c1) in standard layout, equal to the fused layer-1 output
    up to float summation order. SiLU activations (the yolov8 stem's).

    `c1` (the model's static layer-1 out-channels) disambiguates the pack
    factor from the weight SHAPES — shapes stay static under jit, so no
    trace-time value inspection is needed."""
    import jax

    r4sq = s2dp["wb"].shape[-1] // c1  # 1 (r=4) or 4 (r=8: P2 still packed 2x)

    def conv2x2(x, w, b):
        y = jax.lax.conv_general_dilated(
            x,
            w.astype(dtype),
            window_strides=(1, 1),
            padding=[(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y + b.astype(dtype)
        return y * jax.nn.sigmoid(y)  # silu

    y = conv2x2(x_packed.astype(dtype), s2dp["wa"], s2dp["ba"])
    z = conv2x2(y, s2dp["wb"], s2dp["bb"])
    if r4sq == 4:
        z = _unpack_hw(z, 2)
    return z


_PACK_TABLES: dict = {}


def _pack_tables(r_in: int, r_out: int, cin: int, cout: int):
    """Static gather tables for _pack_stage_jnp: (idx, mask) numpy arrays of
    shape (2, 2, r_in^2*cin, r_out^2*cout); idx indexes the FLAT 3x3 weight
    (((u*3+v)*cin + ci)*cout + co), mask zeroes taps outside the kernel."""
    key = (r_in, r_out, cin, cout)
    if key in _PACK_TABLES:
        return _PACK_TABLES[key]
    idx = np.zeros((2, 2, r_in * r_in * cin, r_out * r_out * cout), np.int32)
    msk = np.zeros(idx.shape, bool)
    ci_g = np.arange(cin)[:, None] * cout + np.arange(cout)[None, :]
    for a in range(2):
        for bb_ in range(2):
            for rr in range(r_in):
                for ss in range(r_in):
                    for p in range(r_out):
                        for q in range(r_out):
                            u = (a - 1) * r_in + rr - 2 * p + 1
                            v = (bb_ - 1) * r_in + ss - 2 * q + 1
                            if 0 <= u < 3 and 0 <= v < 3:
                                ci = (rr * r_in + ss) * cin
                                co = (p * r_out + q) * cout
                                idx[a, bb_, ci : ci + cin, co : co + cout] = (u * 3 + v) * cin * cout + ci_g
                                msk[a, bb_, ci : ci + cin, co : co + cout] = True
    _PACK_TABLES[key] = (idx, msk)
    return idx, msk


def _pack_stage_jnp(w, r_in: int, r_out: int):
    """Differentiable _pack_stage: identical tap layout, built as ONE static
    gather of the flat 3x3 kernel (grads flow back through the gather's
    scatter-add transpose — same values as the elementwise construction).
    The earlier .at[].set scatter build (288 scatters) cost ~9 min of XLA
    compile on the full train step; the gather compiles in seconds.
    Bias-free (training convs carry BN, not bias)."""
    import jax.numpy as jnp

    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    idx, msk = _pack_tables(r_in, r_out, cin, cout)
    return jnp.where(jnp.asarray(msk), w.reshape(-1)[jnp.asarray(idx)], 0)


def stem_apply_train(p0, p1, x_packed, ctx):
    """TRAIN-mode packed stem (r=4): the first two stride-2 convs of the
    yolov8 stem on a space-to-depth-packed input, with full BatchNorm
    training semantics — numerically the standard walk's layers 0-1 up to
    float summation order, including batch statistics and their gradients.

    Why (VERDICT r5 / r4 weak#2): at the recipe batch 16, the standard P1
    activation (B, H/2, W/2, c0=16) is stored channel-minor and lane-pads
    16→128 (8x, 335.5 MB physical, FOUR appearances in the r4 train-roofline
    buffer table). Packed, the same data lives as (B, H/4, W/4, 4*c0=64) —
    2x padding instead of 8x — and the (B, H, W, 1) input cast never
    materializes at full resolution either.

    BN exactness: stage-A output channel (p*2+q)*c0 + c holds the P1
    sub-position (p, q) of ORIGINAL channel c, so per-original-channel batch
    moments are moments over (B, h, w, all 4 sub-channels) — the identical
    element set the unpacked BN reduces over. Stats are recorded in
    ctx.stats under the standard "model/0/bn"/"model/1/bn" keys so the
    running-stat update is byte-compatible with the normal walk.

    p0/p1: UNFUSED ConvBNAct params ({"conv": {"weight"}, "bn": {...}}).
    x_packed: pack_input(img, 4), already cast/normalized to ctx.dtype.
    Returns the layer-1 (P2) activation, standard (B, H/4, W/4, c1) layout —
    feed _walk(start=2).
    """
    import jax
    import jax.numpy as jnp

    from yolo_tpu.nn.modules import BN_EPS, silu

    w0 = p0["conv"]["weight"].astype(ctx.dtype)  # (3, 3, cin, c0)
    w1 = p1["conv"]["weight"].astype(ctx.dtype)  # (3, 3, c0, c1)
    c0 = w0.shape[-1]
    wa = _pack_stage_jnp(w0, 4, 2)  # (2, 2, 16*cin, 4*c0)
    wb = _pack_stage_jnp(w1, 2, 1)  # (2, 2, 4*c0, c1)

    def conv2x2(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=[(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def bn_train(y, bn, path, groups: int):
        """BN with batch stats; `groups` sub-position channels per original
        channel (stats combine across them — same element set as unpacked)."""
        B, h, w, cg = y.shape
        c = cg // groups
        y32 = y.astype(jnp.float32).reshape(B, h, w, groups, c)
        mean = jnp.mean(y32, (0, 1, 2, 3))  # (c,)
        var = jnp.mean((y32 - mean) ** 2, (0, 1, 2, 3))
        n = B * h * w * groups
        ctx.stats[f"{path}/bn"] = (jax.lax.stop_gradient(mean), jax.lax.stop_gradient(var), n)
        scale = (bn["weight"] * jax.lax.rsqrt(var + BN_EPS)).astype(y.dtype)
        bias = bn["bias"].astype(y.dtype)
        meanc = mean.astype(y.dtype)
        if groups > 1:
            scale, bias, meanc = (jnp.tile(v, groups) for v in (scale, bias, meanc))
        return (y - meanc) * scale + bias

    y = conv2x2(x_packed.astype(ctx.dtype), wa)  # (B, h, w, 4*c0) = P1 packed 2x
    y = silu(bn_train(y, p0["bn"], "model/0", groups=4)).astype(ctx.dtype)
    z = conv2x2(y, wb)  # (B, h, w, c1) = standard P2
    z = silu(bn_train(z, p1["bn"], "model/1", groups=1)).astype(ctx.dtype)
    return z


def validate_stem(model):
    """Assert the first two graph layers are the yolov8-family stem the fold
    assumes: plain ConvBNAct, 3x3, stride 2, pad 1, no groups/dilation, SiLU.

    fold_stem only sees params (where stride/act are invisible), so a
    stride-1 stem (yolov3-tiny) or a relu-family model (yolov6 activation
    override) would otherwise fold to silently wrong numbers — stem_apply's
    tap math assumes s=2 and hardcodes SiLU."""
    for i in (0, 1):
        m = model.layers[i].module
        name = type(m).__name__
        assert name == "ConvBNAct", f"s2d stem fold: layer {i} is {name}, not a plain stem conv"
        geo = (m.k, m.s, m.p, m.g, m.d)
        assert geo == (3, 2, 1, 1, 1), f"s2d stem fold: layer {i} geometry k,s,p,g,d={geo} != (3, 2, 1, 1, 1)"
        assert m.act == "silu", f"s2d stem fold: layer {i} activation {m.act!r} (stem_apply hardcodes SiLU)"
