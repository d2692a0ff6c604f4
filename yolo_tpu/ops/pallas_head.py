"""Fused Detect-head Pallas kernel: both branches of one head level — two 3x3
ConvBNAct + the final 1x1 conv each, plus the DFL bin projection — in a single
VMEM-resident kernel.

Why: the detect head is the hottest coherent region of the P2 model. At P2
(160x128) the reg branch materializes two 64-channel intermediates (2.6 MB
bf16 each) plus the 64-bin dist map; with the cls branch that is ~19 MB/frame
of HBM round-trips out of the ~98 MB/frame the whole compiled forward moves
(demos/roofline.py) — on a bandwidth-bound model (README "Roofline"). XLA
cannot fuse across convolutions, so the only way to keep those intermediates
on-chip is a hand-written multi-layer kernel. This kernel's I/O per level is
read x (+2 halo rows) and write (dist (B,H,W,4) f32, cls logits (B,H,W,nc)) —
~1.3 MB/frame at P2 vs ~19.

Reference counterpart being replaced: the per-level cv2/cv3 branch walk in
ultralytics/nn/modules/head.py Detect.forward:119 + the DFL decode in
Detect._inference:152 / block.py DFL:58 (here: nn/modules.py Detect.__call__ +
dfl_project).

Design (see /opt/skills/guides/pallas_guide.md):
- Orientation: pixels in sublanes, channels in lanes — the dot is
  (B_t*W, 9*C_in) @ (9*C_in, C_out), so the big streaming dimension is the
  pixel count and output-channel underfill (64 or nc of 128 lanes) costs VMEM,
  not cycles.
- Streaming: grid = (B/B_t, H+1); each step DMAs a 3-row halo window of the
  (pre-padded) input, computes conv1 for row h into 3-row VMEM ring buffers,
  and computes conv2 + 1x1 + DFL for row h-1 from the rings. Intermediates
  never leave VMEM.
- The reg and cls first convs share their input, so they run as ONE matmul
  with the weight matrices concatenated along the output dim.
- Numerics mirror the fused ConvBNAct path (nn/modules.py): matmuls accumulate
  f32 on the MXU, round to the compute dtype, then bias + SiLU in that dtype;
  dfl_project's exp stays in compute dtype with an f32-accumulated projection.

Gated off by default until it beats the XLA path on-chip; enable per call via
Detect.decode_feats_pallas / DetectionModel.predict_parts(pallas_head=True) or
globally with YOLO_TPU_PALLAS_HEAD=1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _head_level_kernel(
    # inputs (VMEM unless noted)
    x_hbm,  # (B, H+2, W+2, C) in ANY/HBM — DMA'd a 3-row window at a time
    w01,  # (9C, c2+c3) merged conv1 weights (reg | cls)
    b01,  # (1, c2+c3)
    w1r,  # (9c2, c2) reg conv2
    b1r,  # (1, c2)
    w1c,  # (9c3, c3) cls conv2
    b1c,  # (1, c3)
    w2r,  # (c2, 4*reg_max) reg 1x1
    b2r,  # (1, 4*reg_max)
    w2c,  # (c3, nc) cls 1x1
    b2c,  # (1, nc)
    proj_rhs,  # (reg_max, 2) f32: [ones, arange] — dfl_project's fused rhs
    # outputs
    dist_out,  # (B_t, 1, W, 4) f32 block at row h-1
    cls_out,  # (B_t, 1, W, nc) dtype block at row h-1
    # scratch
    xwin,  # (2, B_t, 3, W+2, C) double-buffered input halo windows
    t1,  # (B_t, 3, W+2, c2) reg conv1 ring
    c1,  # (B_t, 3, W+2, c3) cls conv1 ring
    sem,  # DMA semaphore
    *,
    H: int,
    W: int,
    C: int,
    c2: int,
    c3: int,
    nc: int,
    reg_max: int,
    block_b: int,
    dtype,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    Bt = block_b
    P = Bt * W

    @pl.when(h == 0)
    def _zero_rings():
        # ring slot (h-2) % 3 == slot 2 must read as a zero row for the first
        # conv2 (top image padding); zero everything incl. the W-pad columns,
        # which are never written after and stay the conv x-padding
        t1[...] = jnp.zeros_like(t1)
        c1[...] = jnp.zeros_like(c1)

    @pl.when(h == H)
    def _zero_bottom_row():
        # last grid step: conv2 for row H-1 needs t1/c1 row H == zeros; the
        # ring slot H % 3 still holds stale row H-3
        slot = h % 3
        t1[:, pl.ds(slot, 1)] = jnp.zeros((Bt, 1) + t1.shape[2:], t1.dtype)
        c1[:, pl.ds(slot, 1)] = jnp.zeros((Bt, 1) + c1.shape[2:], c1.dtype)

    def win_dma(row, slot):
        # 3-row halo window of x for output row `row` (input is pre-padded
        # H+2/W+2, so rows row..row+2 are always in range, edges already zero)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(b * Bt, Bt), pl.ds(row, 3)], xwin.at[slot], sem.at[slot]
        )

    @pl.when(h == 0)
    def _cold_start():
        win_dma(0, 0).start()

    @pl.when(h < H)
    def _stage1():
        # ---- double-buffered window fetch: wait this row's DMA (started at
        # the previous step), immediately prefetch the next row's window
        @pl.when(h + 1 < H)
        def _prefetch():
            win_dma(h + 1, (h + 1) % 2).start()

        win_dma(h, h % 2).wait()
        xw = xwin.at[h % 2]

        # ---- conv1 (reg & cls merged): im2col (P, 9C) @ (9C, c2+c3)
        a1 = jnp.concatenate(
            [xw[:, dy, dx : dx + W, :] for dy in range(3) for dx in range(3)],
            axis=-1,
        ).reshape(P, 9 * C)
        u = jnp.dot(a1, w01[...], preferred_element_type=jnp.float32)
        u = _silu(u.astype(dtype) + b01[...].astype(dtype))
        slot = h % 3
        t1[:, pl.ds(slot, 1), 1 : W + 1, :] = u[:, :c2].reshape(Bt, 1, W, c2)
        c1[:, pl.ds(slot, 1), 1 : W + 1, :] = u[:, c2:].reshape(Bt, 1, W, c3)

    @pl.when(h >= 1)
    def _stage2():
        r = h - 1  # output row
        s0, s1, s2 = (r - 1) % 3, r % 3, (r + 1) % 3

        def ring_im2col(ring, ch):
            rows = [
                ring[:, pl.ds(s, 1), dx : dx + W, :]
                for s in (s0, s1, s2)
                for dx in range(3)
            ]
            return jnp.concatenate(rows, axis=-1).reshape(P, 9 * ch)

        # ---- reg branch: conv2 -> 1x1 -> DFL projection
        t2 = jnp.dot(ring_im2col(t1, c2), w1r[...], preferred_element_type=jnp.float32)
        t2 = _silu(t2.astype(dtype) + b1r[...].astype(dtype))
        d = jnp.dot(t2, w2r[...], preferred_element_type=jnp.float32)
        d = d.astype(dtype) + b2r[...].astype(dtype)
        d = d.reshape(P * 4, reg_max)  # 2-D keeps the dot Mosaic-friendly
        # dfl_project numerics (nn/modules.py): max-sub + exp in dtype, the
        # [ones, proj] contraction accumulates f32, divide in f32
        e = jnp.exp(d - jax.lax.stop_gradient(d.max(axis=-1, keepdims=True)))
        nd = jnp.dot(
            e, proj_rhs[...].astype(e.dtype), preferred_element_type=jnp.float32
        )  # (P*4, 2): [sum(e), sum(e * proj)]
        dist_out[...] = (nd[:, 1] / nd[:, 0]).reshape(Bt, 1, W, 4)

        # ---- cls branch: conv2 -> 1x1 (logits; sigmoid happens outside)
        cc = jnp.dot(ring_im2col(c1, c3), w1c[...], preferred_element_type=jnp.float32)
        cc = _silu(cc.astype(dtype) + b1c[...].astype(dtype))
        cv = jnp.dot(cc, w2c[...], preferred_element_type=jnp.float32)
        cls_out[...] = (cv.astype(dtype) + b2c[...].astype(dtype)).reshape(Bt, 1, W, nc)


def _w3x3(p):
    """HWIO (3, 3, C, c_out) -> (9C, c_out), matching im2col order (dy, dx, ci)."""
    w = p["weight"] if "weight" in p else p["conv"]["weight"]
    return w.reshape(-1, w.shape[-1])


def _bias(p):
    b = p["bias"] if "bias" in p else p["conv"]["bias"]
    return b.reshape(1, -1)


@functools.partial(
    jax.jit, static_argnames=("nc", "reg_max", "block_b", "interpret", "dtype")
)
def fused_head_level(
    x,
    p_cv2,
    p_cv3,
    proj,
    *,
    nc: int,
    reg_max: int = 16,
    block_b: int = 8,
    interpret: bool = False,
    dtype=jnp.bfloat16,
):
    """One Detect level, fused: x (B, H, W, C) -> (dist (B, H*W, 4) f32,
    cls logits (B, H*W, nc) dtype).

    `p_cv2` / `p_cv3` are the level's FUSED param subtrees ({"0", "1", "2"}
    with ConvBNAct conv weight+bias for 0/1 and plain Conv2d for 2). `proj` is
    the DFL arange. Numerically equivalent to the module walk + dfl_project
    (tested in tests/test_pallas_head.py).
    """
    B, H, W, C = x.shape
    c2 = _w3x3(p_cv2["0"]).shape[-1]
    c3 = _w3x3(p_cv3["0"]).shape[-1]
    while B % block_b:
        block_b //= 2
    assert block_b >= 1

    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    proj_rhs = jnp.stack(
        [jnp.ones_like(proj), proj.astype(jnp.float32)], axis=-1
    )  # (reg_max, 2)

    kern = functools.partial(
        _head_level_kernel,
        H=H, W=W, C=C, c2=c2, c3=c3, nc=nc, reg_max=reg_max,
        block_b=block_b, dtype=dtype,
    )
    const = lambda shape: pl.BlockSpec(shape, lambda b, h: (0,) * len(shape), memory_space=pltpu.VMEM)
    dist, cls = pl.pallas_call(
        kern,
        grid=(B // block_b, H + 1),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x: manual DMA
            const((9 * C, c2 + c3)),
            const((1, c2 + c3)),
            const((9 * c2, c2)),
            const((1, c2)),
            const((9 * c3, c3)),
            const((1, c3)),
            const((c2, 4 * reg_max)),
            const((1, 4 * reg_max)),
            const((c3, nc)),
            const((1, nc)),
            const((reg_max, 2)),
        ],
        out_specs=[
            pl.BlockSpec(
                (block_b, 1, W, 4),
                lambda b, h: (b, jnp.maximum(h - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_b, 1, W, nc),
                lambda b, h: (b, jnp.maximum(h - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, 4), jnp.float32),
            jax.ShapeDtypeStruct((B, H, W, nc), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block_b, 3, W + 2, C), dtype),  # double-buffered x windows
            pltpu.VMEM((block_b, 3, W + 2, c2), dtype),
            pltpu.VMEM((block_b, 3, W + 2, c3), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(
        xp,
        jnp.concatenate([_w3x3(p_cv2["0"]), _w3x3(p_cv3["0"])], axis=-1).astype(dtype),
        jnp.concatenate([_bias(p_cv2["0"]), _bias(p_cv3["0"])], axis=-1).astype(dtype),
        _w3x3(p_cv2["1"]).astype(dtype),
        _bias(p_cv2["1"]).astype(dtype),
        _w3x3(p_cv3["1"]).astype(dtype),
        _bias(p_cv3["1"]).astype(dtype),
        p_cv2["2"]["weight"].reshape(c2, 4 * reg_max).astype(dtype),
        p_cv2["2"]["bias"].reshape(1, -1).astype(dtype),
        p_cv3["2"]["weight"].reshape(c3, nc).astype(dtype),
        p_cv3["2"]["bias"].reshape(1, -1).astype(dtype),
        proj_rhs,
    )
    return dist.reshape(B, H * W, 4), cls.reshape(B, H * W, nc)
