"""Fused C2f Pallas kernel: cv1 + the bottleneck chain + concat + cv2 of one
C2f block (ref: block.py C2f:294; here nn/modules.py C2f) in a single
VMEM-resident kernel.

Why: C2f is the dominant block of the v8 backbone/neck. Its hidden width is
tiny (c = c2/2, e.g. 12 at P2 on yolov8-small-n), so each of its 2+n
intermediate maps round-trips HBM through lane-padded layouts; at P2 a single
C2f moves ~11 MB/frame for ~0.9 MB of live data. XLA cannot fuse across
convolutions; this kernel keeps every intermediate in VMEM — I/O is one read
of x and one write of the output.

Structure: a software-pipelined row stream. Stage s (cv1, then each
bottleneck conv, then concat+cv2) for output row r runs at grid step
h = r + lag(s), where each 3x3 conv adds one row of lag (it needs its
producer's row r+1). Every intermediate lives in a ring buffer whose depth
covers the longest consumption distance (cv1's halves are read by the FINAL
concat 2n rows after production). Boundary rows (-1 and H) read as zeros:
rings zero-initialize at h == 0 and every producer stage emits one explicit
zero row past the image.

Numerics mirror the fused ConvBNAct path exactly like ops/pallas_head.py:
f32 MXU accumulation, round to compute dtype, bias + SiLU in that dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _c2f_kernel(
    x_hbm,  # (B, H, W, c1) in ANY/HBM
    w_cv1,  # (c1, 2c)
    b_cv1,  # (1, 2c)
    *ws,  # per bottleneck i: w_i1 (9c, c), b_i1, w_i2 (9c, c), b_i2; then w_cv2 ((2+n)c, c2o), b_cv2
    # then: out_ref, xrow scratch, y ring, per-bottleneck rings, sem
    n: int,
    shortcut: bool,
    H: int,
    W: int,
    c1: int,
    c: int,
    c2o: int,
    block_b: int,
    dtype,
):
    w_m = ws[: 4 * n]
    w_cv2, b_cv2 = ws[4 * n], ws[4 * n + 1]
    out_ref = ws[4 * n + 2]
    xrow = ws[4 * n + 3]  # (2, Bt, 1, W, c1) double-buffered input rows
    y = ws[4 * n + 4]  # (Bt, 2n+1, W+2, 2c) cv1 ring
    m_c1 = ws[4 * n + 5 : 4 * n + 5 + n]  # (Bt, 3, W+2, c) rings
    m_out = ws[4 * n + 5 + n : 4 * n + 5 + n + (n - 1)]  # (Bt, 2(n-i)+3, W+2, c) rings, i < n-1
    sem = ws[-1]

    b = pl.program_id(0)
    h = pl.program_id(1)
    Bt = block_b
    P = Bt * W
    DY = 2 * n + 1  # cv1 ring depth

    def row_dma(row, slot):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(b * Bt, Bt), pl.ds(row, 1)], xrow.at[slot], sem.at[slot]
        )

    @pl.when(h == 0)
    def _init():
        y[...] = jnp.zeros_like(y)
        for r in (*m_c1, *m_out):
            r[...] = jnp.zeros_like(r)
        row_dma(0, 0).start()

    # ---- stage cv1 (1x1, lag 0): rows 0..H-1 computed, row H written as zero
    @pl.when(h < H)
    def _cv1():
        @pl.when(h + 1 < H)
        def _prefetch():
            row_dma(h + 1, (h + 1) % 2).start()

        row_dma(h, h % 2).wait()
        xr = xrow[pl.ds(h % 2, 1)].reshape(P, c1)
        u = jnp.dot(xr, w_cv1[...], preferred_element_type=jnp.float32)
        u = _silu(u.astype(dtype) + b_cv1[...].astype(dtype))
        y[:, pl.ds(h % DY, 1), 1 : W + 1, :] = u.reshape(Bt, 1, W, 2 * c)

    @pl.when(h == H)
    def _cv1_zero():
        y[:, pl.ds(h % DY, 1)] = jnp.zeros((Bt, 1) + y.shape[2:], y.dtype)

    def im2col3(ring, row, depth, ch, off=0):
        """(P, 9*ch) from ring rows row-1..row+1, channels off:off+ch."""
        slots = [(row - 1) % depth, row % depth, (row + 1) % depth]
        return jnp.concatenate(
            [ring[:, pl.ds(s, 1), dx : dx + W, off : off + ch] for s in slots for dx in range(3)],
            axis=-1,
        ).reshape(P, 9 * ch)

    def conv3(ring, row, depth, ch, w, bias, off=0):
        t = jnp.dot(im2col3(ring, row, depth, ch, off), w[...], preferred_element_type=jnp.float32)
        return _silu(t.astype(dtype) + bias[...].astype(dtype))

    # ---- bottleneck stages. For bottleneck i (0-based): first conv at lag
    # 2i+1 reading its producer (y's second half for i=0, m_out[i-1] after),
    # second conv at lag 2i+2 (+ shortcut add), landing in m_out[i].
    mn_row_val = None  # bottleneck n-1's freshly computed row (consumed by cv2 in-step)
    for i in range(n):
        lag1, lag2 = 2 * i + 1, 2 * i + 2
        r1 = h - lag1
        r2 = h - lag2
        d_out = 2 * (n - i) + 3 if i < n - 1 else 3

        @pl.when((r1 >= 0) & (r1 < H))
        def _mc1(i=i, r1=r1):
            if i == 0:
                t = conv3(y, r1, DY, c, w_m[0], w_m[1], off=c)
            else:
                d_prev = 2 * (n - (i - 1)) + 3
                t = conv3(m_out[i - 1], r1, d_prev, c, w_m[4 * i], w_m[4 * i + 1])
            m_c1[i][:, pl.ds(r1 % 3, 1), 1 : W + 1, :] = t.reshape(Bt, 1, W, c)

        @pl.when(r1 == H)
        def _mc1_zero(i=i):
            m_c1[i][:, pl.ds(H % 3, 1)] = jnp.zeros((Bt, 1) + m_c1[i].shape[2:], m_c1[i].dtype)

        if i < n - 1:

            @pl.when((r2 >= 0) & (r2 < H))
            def _mc2(i=i, r2=r2, d_out=d_out):
                t = conv3(m_c1[i], r2, 3, c, w_m[4 * i + 2], w_m[4 * i + 3])
                if shortcut:
                    prev = (
                        y[:, pl.ds(r2 % DY, 1), 1 : W + 1, c:].reshape(P, c)
                        if i == 0
                        else m_out[i - 1][:, pl.ds(r2 % (2 * (n - i + 1) + 3), 1), 1 : W + 1, :].reshape(P, c)
                    )
                    t = t + prev
                m_out[i][:, pl.ds(r2 % d_out, 1), 1 : W + 1, :] = t.reshape(Bt, 1, W, c)

            @pl.when(r2 == H)
            def _mc2_zero(i=i, d_out=d_out):
                m_out[i][:, pl.ds(H % d_out, 1)] = jnp.zeros(
                    (Bt, 1) + m_out[i].shape[2:], m_out[i].dtype
                )

    # ---- final bottleneck's second conv + concat + cv2 (lag 2n), one block so
    # the last map never needs a ring
    r = h - 2 * n

    @pl.when((r >= 0) & (r < H))
    def _cv2():
        i = n - 1
        t = conv3(m_c1[i], r, 3, c, w_m[4 * i + 2], w_m[4 * i + 3])
        if shortcut:
            prev = (
                y[:, pl.ds(r % DY, 1), 1 : W + 1, c:].reshape(P, c)
                if i == 0
                else m_out[i - 1][:, pl.ds(r % (2 * (n - i + 1) + 3), 1), 1 : W + 1, :].reshape(P, c)
            )
            t = t + prev
        cat = [y[:, pl.ds(r % DY, 1), 1 : W + 1, :].reshape(P, 2 * c)]
        cat += [
            m_out[j][:, pl.ds(r % (2 * (n - j) + 3), 1), 1 : W + 1, :].reshape(P, c)
            for j in range(n - 1)
        ]
        cat.append(t)
        z = jnp.dot(jnp.concatenate(cat, axis=-1), w_cv2[...], preferred_element_type=jnp.float32)
        z = _silu(z.astype(dtype) + b_cv2[...].astype(dtype))
        out_ref[...] = z.reshape(Bt, 1, W, c2o)


def _w(p):
    """Fused ConvBNAct params -> (k*k*c_in, c_out) matmul weight + (1, c_out) bias."""
    w = p["conv"]["weight"]
    return w.reshape(-1, w.shape[-1]), p["conv"]["bias"].reshape(1, -1)


@functools.partial(jax.jit, static_argnames=("n", "shortcut", "block_b", "interpret", "dtype"))
def fused_c2f(x, p, *, n: int, shortcut: bool, block_b: int = 8, interpret: bool = False, dtype=jnp.bfloat16):
    """One fused C2f block: x (B, H, W, c1) -> (B, H, W, c2) in compute dtype.

    `p` is the C2f's FUSED param subtree. Numerically equivalent to
    nn/modules.py C2f.__call__ (tested in tests/test_pallas_c2f.py)."""
    B, H, W, c1 = x.shape
    w1, b1 = _w(p["cv1"])
    w2, b2 = _w(p["cv2"])
    c = w1.shape[-1] // 2
    c2o = w2.shape[-1]
    while B % block_b:
        block_b //= 2

    wm = []
    for i in range(n):
        for leaf in ("cv1", "cv2"):
            wi, bi = _w(p["m"][str(i)][leaf])
            wm += [wi.astype(dtype), bi.astype(dtype)]

    kern = functools.partial(
        _c2f_kernel,
        n=n, shortcut=shortcut, H=H, W=W, c1=c1, c=c, c2o=c2o, block_b=block_b, dtype=dtype,
    )
    const = lambda shape: pl.BlockSpec(shape, lambda b, h: (0,) * len(shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(B // block_b, H + 2 * n + 1),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [const((c1, 2 * c)), const((1, 2 * c))]
        + [const(w.shape) for w in wm]
        + [const((( 2 + n) * c, c2o)), const((1, c2o))],
        out_specs=pl.BlockSpec(
            (block_b, 1, W, c2o),
            lambda b, h, _n=n: (b, jnp.maximum(h - 2 * _n, 0), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, c2o), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, block_b, 1, W, c1), dtype),
            pltpu.VMEM((block_b, 2 * n + 1, W + 2, 2 * c), dtype),
        ]
        + [pltpu.VMEM((block_b, 3, W + 2, c), dtype) for _ in range(n)]
        + [
            pltpu.VMEM((block_b, 2 * (n - i) + 3, W + 2, c), dtype)
            for i in range(n - 1)
        ]
        + [pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(x.astype(dtype), w1.astype(dtype), b1.astype(dtype), *wm, w2.astype(dtype), b2.astype(dtype))
    return out
