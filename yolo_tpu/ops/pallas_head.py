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
- Streaming: grid = (B/B_t, H+1); each step reads a 3-row halo window of the
  (pre-padded) input (three auto-pipelined 1-row BlockSpecs — this
  environment's remote Mosaic compiler rejects manual ANY+DMA kernels),
  computes conv1 for row h into 3-row VMEM ring buffers, and computes
  conv2 + 1x1 + DFL for row h-1 from the rings. Intermediates never leave
  VMEM.
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
    # jax.nn.sigmoid on a bf16 vector trips a Mosaic verifier bug on this
    # toolchain ('vector.broadcast' f32 scalar -> bf16 vector); computing the
    # logistic in f32 and rounding matches XLA's own bf16 lowering to <=1 ULP
    # (4/32768 bf16 inputs differ by one ULP; full-model routes are
    # tolerance-tested in tests/test_pallas_head.py).
    return x * jax.nn.sigmoid(x.astype(jnp.float32)).astype(x.dtype)


def _head_level_kernel(
    # inputs (VMEM, auto-pipelined)
    x0,  # (B_t, 1, W+2, C) pre-padded input halo row h   (this environment's
    x1,  # (B_t, 1, W+2, C)                     row h+1    remote Mosaic compiler
    x2,  # (B_t, 1, W+2, C)                     row h+2    rejects manual ANY+DMA,
    #                                                      so the 3-row window is
    #                                                      three pipelined specs)
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
    proj_row,  # (1, reg_max) f32: dfl_project's arange (an input ref because
    #            f32 iota is rejected by the Mosaic verifier)
    # outputs
    dist_out,  # (B_t, 1, W, 4) f32 block at row h-1
    cls_out,  # (B_t, 1, W, nc) dtype block at row h-1
    # scratch
    t1,  # (B_t, 3, W+2, c2) reg conv1 ring
    c1,  # (B_t, 3, W+2, c3) cls conv1 ring
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

    # The remote Mosaic compiler also crashes on lane-axis concatenation of
    # SHIFTED slices (classic im2col) and on lane-splitting reshapes, so every
    # 3x3 conv here is 9 shifted (P, ch) @ (ch, c_out) dots accumulated in f32
    # (same math, summation order differs within the f32 accumulator), and the
    # DFL softmax runs on lane-sliced reg_max groups instead of a
    # (P, 4*reg_max) -> (P*4, reg_max) reshape.

    @pl.when(h < H)
    def _stage1():
        # ---- conv1 (reg & cls merged): sum of 9 shifted dots against row
        # slices of the merged (9C, c2+c3) weight, from the 3 pipelined halo
        # rows (input is pre-padded H+2/W+2, edges zero)
        acc = None
        for k, xr in enumerate((x0, x1, x2)):
            for dx in range(3):
                a = xr[:, 0, dx : dx + W, :].reshape(P, C)
                wp = w01[(k * 3 + dx) * C : (k * 3 + dx + 1) * C, :]
                d = jnp.dot(a, wp, preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
        u = _silu(acc.astype(dtype) + b01[...].astype(dtype))
        slot = h % 3
        t1[:, pl.ds(slot, 1), 1 : W + 1, :] = u[:, :c2].reshape(Bt, 1, W, c2)
        c1[:, pl.ds(slot, 1), 1 : W + 1, :] = u[:, c2:].reshape(Bt, 1, W, c3)

    def conv3_ring(ring, ch, w, r):
        """3x3 conv for output row r from a 3-row ring: 9 shifted dots."""
        acc = None
        for k, s in enumerate(((r - 1) % 3, r % 3, (r + 1) % 3)):
            for dx in range(3):
                a = ring[:, pl.ds(s, 1), dx : dx + W, :].reshape(P, ch)
                wp = w[(k * 3 + dx) * ch : (k * 3 + dx + 1) * ch, :]
                d = jnp.dot(a, wp, preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
        return acc

    @pl.when(h == 0)
    def _out_prefill():
        # the output blocks at clamped index 0 are revisited at h == 0 and 1;
        # Pallas TPU double-buffers output windows, so every visit must write
        # (see ops/pallas_c2f.py _cv2_prefill — measured on chip). The real
        # row-0 write at h == 1 is the later visit and wins.
        dist_out[...] = jnp.zeros_like(dist_out)
        cls_out[...] = jnp.zeros_like(cls_out)

    @pl.when(h >= 1)
    def _stage2():
        r = h - 1  # output row

        # ---- reg branch: conv2 -> 1x1 -> DFL projection
        t2 = _silu(conv3_ring(t1, c2, w1r, r).astype(dtype) + b1r[...].astype(dtype))
        d = jnp.dot(t2, w2r[...], preferred_element_type=jnp.float32)
        d = d.astype(dtype) + b2r[...].astype(dtype)  # (P, 4*reg_max)
        # dfl_project numerics (nn/modules.py): max-sub + exp in dtype, the
        # projection accumulates f32, divide in f32 — per lane-sliced side
        pr = proj_row[...]  # (1, reg_max) f32
        sides = []
        for j in range(4):
            dj = d[:, j * reg_max : (j + 1) * reg_max]
            e = jnp.exp(dj - jax.lax.stop_gradient(dj.max(axis=-1, keepdims=True)))
            ef = e.astype(jnp.float32)
            sides.append(
                (ef * pr).sum(axis=-1, keepdims=True) / ef.sum(axis=-1, keepdims=True)
            )
        dist_out[...] = jnp.concatenate(sides, axis=-1).reshape(Bt, 1, W, 4)

        # ---- cls branch: conv2 -> 1x1 (logits; sigmoid happens outside)
        cc = _silu(conv3_ring(c1, c3, w1c, r).astype(dtype) + b1c[...].astype(dtype))
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
    proj_row = proj.astype(jnp.float32).reshape(1, reg_max)

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
            # 3-row halo window as three auto-pipelined 1-row specs (clamped at
            # the bottom: stage1 is off at h == H so the clamp row is unread)
            pl.BlockSpec(
                (block_b, 1, W + 2, C),
                lambda b, h, dy=dy: (b, jnp.minimum(h + dy, H + 1), 0, 0),
                memory_space=pltpu.VMEM,
            )
            for dy in range(3)
        ]
        + [
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
            const((1, reg_max)),
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
            pltpu.VMEM((block_b, 3, W + 2, c2), dtype),
            pltpu.VMEM((block_b, 3, W + 2, c3), dtype),
        ],
        interpret=interpret,
    )(
        xp,
        xp,
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
        proj_row,
    )
    return dist.reshape(B, H * W, 4), cls.reshape(B, H * W, nc)
