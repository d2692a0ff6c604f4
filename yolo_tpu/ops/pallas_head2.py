"""Channel-major fused Detect-head kernel, take 2 (round 5).

Round 3's ops/pallas_head.py kernel lost 8x to the XLA conv walk for two
reasons the round-5 measurements finally separate:

  1. BOUNDARY LAYOUTS: it consumed (B, H, W, C) blocks C-minor while the
     surrounding XLA program keeps activations batch-minor
     ({0,3,2,1:T(8,128)} — lanes = batch), so every call paid a
     full-activation relayout.
  2. ORIENTATION: its dot put pixels in sublanes and OUT-channels in lanes
     (N = 64/24/nc of 128), underfilling the MXU exactly like XLA's own conv
     lowering — in-VMEM fusion saved HBM but bought no MXU headroom.

This kernel fixes both:

  - The XLA-side adapter hands the kernel x as (H+2, C, Wp*B) — channels
    leading, (w, b) MERGED in the minor dim — so the batch rides the lane
    axis inside the kernel too, and every dot is
    (C_out, 3C) @ (3C, cols*B): contraction = channels (K = 72..576, decent
    MXU fill), N = pixels*batch (always lane-dense). The transpose into this
    layout is a real (w <-> c) relayout paid once per level (~1-2 ms at P2),
    fused by XLA with the pad+reshape.
  - The whole level — merged first conv (reg|cls), both second convs, both
    1x1 heads, DFL projection, cls sigmoid — runs VMEM-resident per
    (W-tile, row) grid step. Row dependencies use 3-slot rings written in
    place; the 3-row contraction runs directly against the ring with
    ROTATED weight variants (lhs[rho] for rho = step%3), so no per-step
    K-stacking copies exist at all.
  - Streaming: 6 input views of the padded x (3 row shifts x 2 W-blocks)
    auto-pipelined by BlockSpecs; this environment's remote Mosaic compiler
    rejects manual ANY+DMA kernels (round-3 note), so everything stays on
    the automatic pipeline.

Per-level I/O: read x (6x overstream of a small tensor), write dist
(H, 4, W*B) f32 + cls scores (H, nc, W*B) f32 — the ~10 GB/512-chunk of P2
regression-map round-trips in the XLA walk never exist.

Reference counterpart: ultralytics/nn/modules/head.py Detect.forward:119 +
_inference:152 + block.py DFL:58 (here: nn/modules.py Detect._branch_walk +
dfl_project). Numerics mirror the fused ConvBNAct path: f32 MXU accumulation
rounded to bf16, bias + SiLU in bf16 (sigmoid computed f32 — Mosaic bf16
sigmoid verifier bug, see round-3 note), DFL exp in the compute dtype with
f32 reductions.

MEASURED OUTCOME (v5e, chunk 512, demos/head2_ab.py, 2026-08-21): LOSES.
Fused pipeline: dense XLA 5770 fps vs kernel-on-P2 5067 / P2+P3 4784; P5's
C=192 x-ring blows the 16 MB VMEM budget (compile error, expected from the
sizing table). Standalone isolation pins the cause: the (w <-> c) relayout
into the channel-major layout costs 13.25 ms ALONE at P2 (503 MB moved at
~76 GB/s — the TPU transpose path runs at ~9% of HBM peak through these
shapes), and the kernel proper (26.6 ms) only matches the dense level walk —
per-step grid overhead (2064 steps), the 6x x-overstream and the +25% W-halo
overcompute eat the MXU-fill gains. Together with round 5's other negative
results (column-packed strided convs: flat; sparse box head: -19%; round 3's
pixel-major VMEM kernel: -8x), this closes the question: XLA's dense conv
walk IS the fastest known evaluation of this head on v5e — its 46% MFU sits
exactly at the conv lowering's padded-operand bound, no alternative
formulation beats the relayout taxes required to change the operand shapes.
The kernel stays as a parity-tested opt-in and the write-up lives in
demos/artifacts/roofline_r5.txt.

Gated: YOLO_TPU_PALLAS_HEAD2=1 or FusedDetectTrack(pallas_head2=True);
parity pinned by tests/test_pallas_head2.py (interpret mode on CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _silu(x):
    return x * jax.nn.sigmoid(x.astype(jnp.float32)).astype(x.dtype)


_LHS_TABLES: dict = {}


def _build_lhs(w, slot_of_u, key):
    """(3, 3, C, co) HWIO -> (3 rho, 3 v, co, 3C) rotated dot matrices:
    lhs[rho, v, o, slot*C + c] = w[u, v, c, o] with slot = slot_of_u(rho, u).
    Contracting lhs[rho, v] against a 3-slot row ring (slot-major rows)
    computes the (u, v) tap sum without ever restacking the ring. Built as
    ONE static gather so `w` may be a traced array (the fused pipeline jits
    over params)."""
    kh, kw, C, co = w.shape
    assert (kh, kw) == (3, 3)
    tkey = (key, C, co)
    if tkey not in _LHS_TABLES:
        idx = np.zeros((3, 3, co, 3 * C), np.int32)
        msk = np.zeros(idx.shape, bool)
        # flat source index of w[u, v, c, o] = ((u*3 + v)*C + c)*co + o
        src = np.arange(C)[None, :] * co + np.arange(co)[:, None]  # (co, C)
        for rho in range(3):
            for u in range(3):
                g = slot_of_u(rho, u)
                for v in range(3):
                    idx[rho, v, :, g * C : (g + 1) * C] = (u * 3 + v) * C * co + src
                    msk[rho, v, :, g * C : (g + 1) * C] = True
        _LHS_TABLES[tkey] = (idx, msk)
    idx, msk = _LHS_TABLES[tkey]
    return jnp.where(jnp.asarray(msk), jnp.reshape(w, (-1,))[jnp.asarray(idx)], 0)


def pick_wt(W: int, pref: int = 10) -> int:
    """Largest tile width <= pref that divides W; >= 4 so the +4 W-halo fits
    inside the next block. Returns 0 if none works (caller falls back)."""
    for wt in range(min(pref, W), 3, -1):
        if W % wt == 0:
            return wt
    return 0


def head_level_cm(x, pl_cv2, pl_cv3, proj, nc: int, wt: int | None = None, interpret: bool = False, dtype=jnp.bfloat16):
    """One Detect level through the channel-major fused kernel.

    x: (B, H, W, C) level input; pl_cv2/pl_cv3: FUSED param groups for this
    level ({"0": {"conv": {weight, bias}}, "1": ..., "2": {weight, bias}});
    proj: (reg_max,). Returns (dist (B, H*W, 4) f32, cls (B, H*W, nc) f32
    sigmoid) — the per-level pieces of Detect.decode_from_inputs.
    """
    B, H, W, C = x.shape
    wt = wt or pick_wt(W)
    assert wt and W % wt == 0, f"W={W} has no valid tile (wt={wt})"
    T = W // wt
    reg_max = int(proj.shape[0]) if hasattr(proj, 'shape') else len(proj)
    c2 = pl_cv2["1"]["conv"]["weight"].shape[-1]
    c3 = pl_cv3["1"]["conv"]["weight"].shape[-1]
    cm = c2 + c3

    # ---- XLA-side relayout: (B,H,W,C) -> padded (H+2, C, Wp*B) ------------
    Wp = W + wt  # left pad 2, right pad wt-2 (covers the +-2 halo, tile-aligned)
    xt = jnp.transpose(x.astype(dtype), (1, 3, 2, 0))  # (H, C, W, B)
    xt = jnp.pad(xt, ((1, 1), (0, 0), (2, wt - 2), (0, 0)))
    xm = xt.reshape(H + 2, C, Wp * B)

    # ---- rotated weights (traced-safe: static-gather rearrangements) ------
    # stage 1: ring_x slot of padded row p is p%3; step s contracts padded
    # rows s+u -> slot (s+u)%3; rho = s%3.
    f32 = jnp.float32
    w0 = jnp.concatenate(
        [jnp.asarray(pl_cv2["0"]["conv"]["weight"], f32),
         jnp.asarray(pl_cv3["0"]["conv"]["weight"], f32)], axis=3)
    lhs1 = _build_lhs(w0, lambda rho, u: (rho + u) % 3, "s1")  # (3, 3, cm, 3C)
    b1 = jnp.concatenate(
        [jnp.asarray(pl_cv2["0"]["conv"]["bias"], f32),
         jnp.asarray(pl_cv3["0"]["conv"]["bias"], f32)]).reshape(cm, 1)
    # stage 2: ring_y slot of y-row q is q%3; step s (out row r = s-1)
    # contracts y-rows s-2+u -> slot (s-2+u)%3 = (rho+u+1)%3.
    lhs2r = _build_lhs(jnp.asarray(pl_cv2["1"]["conv"]["weight"], f32), lambda rho, u: (rho + u + 1) % 3, "s2")
    lhs2c = _build_lhs(jnp.asarray(pl_cv3["1"]["conv"]["weight"], f32), lambda rho, u: (rho + u + 1) % 3, "s2")
    b2r = jnp.asarray(pl_cv2["1"]["conv"]["bias"], f32).reshape(c2, 1)
    b2c = jnp.asarray(pl_cv3["1"]["conv"]["bias"], f32).reshape(c3, 1)
    w3r = jnp.asarray(pl_cv2["2"]["weight"], f32).reshape(c2, 4 * reg_max).T
    b3r = jnp.asarray(pl_cv2["2"]["bias"], f32).reshape(4 * reg_max, 1)
    w3c = jnp.asarray(pl_cv3["2"]["weight"], f32).reshape(c3, nc).T
    b3c = jnp.asarray(pl_cv3["2"]["bias"], f32).reshape(nc, 1)
    projc = jnp.asarray(proj, f32).reshape(reg_max, 1)

    NB = wt * B  # out cols per step (w, b merged)
    NY = (wt + 2) * B  # y-ring cols
    NX = (wt + 4) * B  # x-ring cols

    def body(rho, s, t, x20, x21, l1, l2r, l2c, w3r_, w3c_, b1_, b2r_, b2c_, b3r_, b3c_, proj_,
             dist_out, cls_out, ring_x, ring_r, ring_c, prime):
        """One grid step at static rho = s%3 (s passed from the kernel top —
        pl.program_id inside a pl.when branch loses the interpreter binding)."""
        cd = dtype

        def put_row(slot, blk0, blk1):
            ring_x[slot * C : (slot + 1) * C, 0 : wt * B] = blk0[0].astype(cd)
            ring_x[slot * C : (slot + 1) * C, wt * B : NX] = blk1[0, :, 0 : 4 * B].astype(cd)

        @pl.when(s == 0)
        def _():
            put_row(0, prime[0], prime[1])
            put_row(1, prime[2], prime[3])

        @pl.when(s < H)
        def _():
            put_row((rho + 2) % 3, x20, x21)
            acc = jnp.zeros((cm, NY), jnp.float32)
            for v in range(3):
                acc = acc + jax.lax.dot_general(
                    l1[rho, v].astype(cd), ring_x[:, v * B : v * B + NY],
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                )
            y = _silu(acc.astype(cd) + b1_[:, 0:1].astype(cd))
            # y-ring col j is y88 at real col t*wt + j - 1: zero the columns
            # that fall OUTSIDE the y map — the dense second conv reads zero
            # padding there, not silu(conv(zero-x) + bias)
            y = jnp.where(
                (jax.lax.broadcasted_iota(jnp.int32, (1, NY), 1) // B + t * wt - 1 >= 0)
                & (jax.lax.broadcasted_iota(jnp.int32, (1, NY), 1) // B + t * wt - 1 < W),
                y, jnp.zeros_like(y),
            )
            q = rho  # s % 3
            ring_r[q * c2 : (q + 1) * c2, :] = y[0:c2, :]
            ring_c[q * c3 : (q + 1) * c3, :] = y[c2:cm, :]

        # zero the ring slot standing in for the out-of-map y rows: y[-1]
        # (slot 2, read when s==1) and y[H] (slot H%3, read when s==H)
        @pl.when(s == 1)
        def _():
            ring_r[2 * c2 : 3 * c2, :] = jnp.zeros((c2, NY), cd)
            ring_c[2 * c3 : 3 * c3, :] = jnp.zeros((c3, NY), cd)

        qz = H % 3

        @pl.when(s == H)
        def _():
            ring_r[qz * c2 : (qz + 1) * c2, :] = jnp.zeros((c2, NY), cd)
            ring_c[qz * c3 : (qz + 1) * c3, :] = jnp.zeros((c3, NY), cd)

        @pl.when(s >= 1)
        def _():
            accr = jnp.zeros((c2, NB), jnp.float32)
            accc = jnp.zeros((c3, NB), jnp.float32)
            for v in range(3):
                accr = accr + jax.lax.dot_general(
                    l2r[rho, v].astype(cd), ring_r[:, v * B : v * B + NB],
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                )
                accc = accc + jax.lax.dot_general(
                    l2c[rho, v].astype(cd), ring_c[:, v * B : v * B + NB],
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                )
            zr = _silu(accr.astype(cd) + b2r_[:, 0:1].astype(cd))
            zc = _silu(accc.astype(cd) + b2c_[:, 0:1].astype(cd))
            bins = jax.lax.dot_general(
                w3r_[:, :].astype(cd), zr, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ).astype(cd) + b3r_[:, 0:1].astype(cd)
            logits = jax.lax.dot_general(
                w3c_[:, :].astype(cd), zc, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ).astype(cd) + b3c_[:, 0:1].astype(cd)
            for g in range(4):
                bg = bins[g * reg_max : (g + 1) * reg_max, :]
                e = jnp.exp(bg - jnp.max(bg, axis=0, keepdims=True))
                se = jnp.sum(e.astype(jnp.float32), axis=0, keepdims=True)
                sp = jnp.sum(e.astype(jnp.float32) * proj_[:, 0:1].astype(jnp.float32), axis=0, keepdims=True)
                dist_out[0, g : g + 1, :] = sp / se
            cls_out[0, :, :] = jax.nn.sigmoid(logits.astype(jnp.float32))

    def kernel_main(x00, x01, x10, x11, x20, x21, l1, l2r, l2c, w3r_, w3c_, b1_, b2r_, b2c_, b3r_, b3c_, proj_,
                    dist_out, cls_out, ring_x, ring_r, ring_c):
        s = pl.program_id(1)
        t = pl.program_id(0)
        for r_ in range(3):
            @pl.when(s % 3 == r_)
            def _(r_=r_):
                body(r_, s, t, x20, x21, l1, l2r, l2c, w3r_, w3c_, b1_, b2r_, b2c_, b3r_, b3c_, proj_,
                     dist_out, cls_out, ring_x, ring_r, ring_c, (x00, x01, x10, x11))

    Hrows = H + 2  # padded rows
    x_specs = [
        pl.BlockSpec(
            (1, C, wt * B),
            (lambda t, s, d=d, o=o: (jnp.minimum(s + d, Hrows - 1), 0, t + o)),
        )
        for d in range(3)
        for o in range(2)
    ]

    def whole(arr):
        nd = arr.ndim
        return pl.BlockSpec(arr.shape, lambda t, s, nd=nd: (0,) * nd)

    consts = [lhs1, lhs2r, lhs2c, w3r, w3c, b1, b2r, b2c, b3r, b3c, projc]
    const_specs = [whole(a) for a in consts]

    out_shape = [
        jax.ShapeDtypeStruct((H, 4, W * B), jnp.float32),
        jax.ShapeDtypeStruct((H, nc, W * B), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, 4, wt * B), lambda t, s: (jnp.maximum(s - 1, 0), 0, t)),
        pl.BlockSpec((1, nc, wt * B), lambda t, s: (jnp.maximum(s - 1, 0), 0, t)),
    ]
    scratch = [
        pltpu.VMEM((3 * C, NX), dtype),
        pltpu.VMEM((3 * c2, NY), dtype),
        pltpu.VMEM((3 * c3, NY), dtype),
    ]

    dist, cls = pl.pallas_call(
        kernel_main,
        grid=(T, H + 1),
        in_specs=x_specs + const_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*([xm] * 6 + [jnp.asarray(c) for c in consts]))

    dist = dist.reshape(H, 4, W, B).transpose(3, 0, 2, 1).reshape(B, H * W, 4)
    cls = cls.reshape(H, nc, W, B).transpose(3, 0, 2, 1).reshape(B, H * W, nc)
    return dist, cls
