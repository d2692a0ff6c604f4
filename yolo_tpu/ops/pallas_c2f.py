"""Fused C2f Pallas kernel: cv1 + the bottleneck chain + concat + cv2 of one
C2f block (ref: block.py C2f:294; here nn/modules.py C2f) in a single
VMEM-resident kernel — plus an "upconcat" variant that fuses the neck's
Upsample→Concat producer into the cv1 stage (the kernel form of
C2f.call_upconcat's exact algebra).

Why: C2f is the dominant block of the v8 backbone/neck. Its hidden width is
tiny (c = c2/2, e.g. 12 at P2 on yolov8-small-n), so each of its 2+n
intermediate maps round-trips HBM through lane-padded layouts; at P2 a single
C2f moves ~11 MB/frame for ~1 MB of live data. XLA cannot fuse across
convolutions; this kernel keeps every intermediate in VMEM — I/O is one read
of the input(s) and one write of the output.

Structure: a software-pipelined row stream. Stage s (cv1, then each
bottleneck conv, then concat+cv2) for output row r runs at grid step
h = r + lag(s), where each 3x3 conv adds one row of lag (it needs its
producer's row r+1). Every intermediate lives in a ring buffer whose depth
covers the longest consumption distance (cv1's halves are read by the FINAL
concat 2n rows after production). Boundary rows (-1 and H) read as zeros:
rings zero-initialize at h == 0 and every producer stage emits one explicit
zero row past the image.

In upconcat mode the block's two sources stream separately: the low-res
`small` half of cv1 runs at half resolution (scale² fewer FLOPs, matching
call_upconcat) and its result is repeated 2x along W in VMEM; the upsampled
map and the concat never exist anywhere.

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
    *refs,
    n: int,
    shortcut: bool,
    H: int,
    W: int,
    c1: int,
    cs: int,  # upconcat mode: channels of the low-res source (0 = plain mode)
    c: int,
    c2o: int,
    block_b: int,
    dtype,
):
    up = cs > 0
    if up:
        small_hbm, skip_hbm, w_a, w_b, b_cv1 = refs[:5]
        k = 5
    else:
        x_hbm, w_cv1, b_cv1 = refs[:3]
        k = 3
    w_m = refs[k : k + 4 * n]
    w_cv2, b_cv2, out_ref = refs[k + 4 * n : k + 4 * n + 3]
    scr = refs[k + 4 * n + 3 :]
    rows_in = scr[: 2 if up else 1]  # double-buffered input row scratches
    si = 2 if up else 1
    y = scr[si]  # (Bt, 2n+1, W+2, 2c) cv1 ring
    m_c1 = scr[si + 1 : si + 1 + n]  # (Bt, 3, W+2, c) rings
    m_out = scr[si + 1 + n : si + 1 + n + (n - 1)]  # (Bt, 2(n-i)+3, W+2, c), i < n-1
    sem = scr[-1]

    b = pl.program_id(0)
    h = pl.program_id(1)
    Bt = block_b
    P = Bt * W
    DY = 2 * n + 1  # cv1 ring depth

    def dmas(row):
        """Async copies bringing in everything cv1 needs for output row `row`."""
        slot = row % 2
        if up:
            return [
                pltpu.make_async_copy(
                    skip_hbm.at[pl.ds(b * Bt, Bt), pl.ds(row, 1)], rows_in[0].at[slot], sem.at[slot]
                ),
                pltpu.make_async_copy(
                    small_hbm.at[pl.ds(b * Bt, Bt), pl.ds(row // 2, 1)],
                    rows_in[1].at[slot],
                    sem.at[2 + slot],
                ),
            ]
        return [
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(b * Bt, Bt), pl.ds(row, 1)], rows_in[0].at[slot], sem.at[slot]
            )
        ]

    @pl.when(h == 0)
    def _init():
        y[...] = jnp.zeros_like(y)
        for r in (*m_c1, *m_out):
            r[...] = jnp.zeros_like(r)
        for d in dmas(0):
            d.start()

    # ---- stage cv1 (1x1, lag 0): rows 0..H-1 computed, row H written as zero
    @pl.when(h < H)
    def _cv1():
        @pl.when(h + 1 < H)
        def _prefetch():
            for d in dmas(h + 1):
                d.start()

        for d in dmas(h):
            d.wait()
        if up:
            ck = c1 - cs
            yb = jnp.dot(
                rows_in[0][pl.ds(h % 2, 1)].reshape(P, ck), w_b[...],
                preferred_element_type=jnp.float32,
            ).astype(dtype)
            ya = jnp.dot(
                rows_in[1][pl.ds(h % 2, 1)].reshape(Bt * (W // 2), cs), w_a[...],
                preferred_element_type=jnp.float32,
            ).astype(dtype)
            # nearest-2x along W: repeat each low-res pixel's 2c vector twice
            ya = jnp.broadcast_to(
                ya.reshape(Bt, W // 2, 1, 2 * c), (Bt, W // 2, 2, 2 * c)
            ).reshape(P, 2 * c)
            u = _silu(ya + yb + b_cv1[...].astype(dtype))
        else:
            xr = rows_in[0][pl.ds(h % 2, 1)].reshape(P, c1)
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

    def m_residual(i, r):
        """Bottleneck i's shortcut operand: its own input row r."""
        if i == 0:
            return y[:, pl.ds(r % DY, 1), 1 : W + 1, c:].reshape(P, c)
        d_prev = 2 * (n - (i - 1)) + 3
        return m_out[i - 1][:, pl.ds(r % d_prev, 1), 1 : W + 1, :].reshape(P, c)

    def m_conv2(i, r):
        t = conv3(m_c1[i], r, 3, c, w_m[4 * i + 2], w_m[4 * i + 3])
        return t + m_residual(i, r) if shortcut else t

    # ---- bottleneck stages. For bottleneck i (0-based): first conv at lag
    # 2i+1 reading its producer (y's second half for i=0, m_out[i-1] after),
    # second conv at lag 2i+2, landing in m_out[i] (the last one feeds cv2
    # directly in-step and needs no ring).
    for i in range(n):
        r1 = h - (2 * i + 1)
        r2 = h - (2 * i + 2)
        d_out = 2 * (n - i) + 3

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
                t = m_conv2(i, r2)
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
        t = m_conv2(n - 1, r)
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


def _call(inputs, head_ws, p, n, shortcut, H, W, c1, cs, c, c2o, block_b, interpret, dtype, in_row_scratch):
    wm = []
    for i in range(n):
        for leaf in ("cv1", "cv2"):
            wi, bi = _w(p["m"][str(i)][leaf])
            wm += [wi.astype(dtype), bi.astype(dtype)]
    w2, b2 = _w(p["cv2"])

    kern = functools.partial(
        _c2f_kernel,
        n=n, shortcut=shortcut, H=H, W=W, c1=c1, cs=cs, c=c, c2o=c2o,
        block_b=block_b, dtype=dtype,
    )
    const = lambda shape: pl.BlockSpec(shape, lambda b, h: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(inputs[0].shape[0] // block_b, H + 2 * n + 1),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(inputs)
        + [const(w.shape) for w in head_ws]
        + [const(w.shape) for w in wm]
        + [const(w2.shape), const(b2.shape)],
        out_specs=pl.BlockSpec(
            (block_b, 1, W, c2o),
            lambda b, h, _n=n: (b, jnp.maximum(h - 2 * _n, 0), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((inputs[0].shape[0], H, W, c2o), dtype),
        scratch_shapes=in_row_scratch
        + [pltpu.VMEM((block_b, 2 * n + 1, W + 2, 2 * c), dtype)]
        + [pltpu.VMEM((block_b, 3, W + 2, c), dtype) for _ in range(n)]
        + [pltpu.VMEM((block_b, 2 * (n - i) + 3, W + 2, c), dtype) for i in range(n - 1)]
        + [pltpu.SemaphoreType.DMA((4,))],
        interpret=interpret,
    )(*inputs, *(w.astype(dtype) for w in head_ws), *wm, w2.astype(dtype), b2.astype(dtype))


@functools.partial(jax.jit, static_argnames=("n", "shortcut", "block_b", "interpret", "dtype"))
def fused_c2f(x, p, *, n: int, shortcut: bool, block_b: int = 8, interpret: bool = False, dtype=jnp.bfloat16):
    """One fused C2f block: x (B, H, W, c1) -> (B, H, W, c2) in compute dtype.

    `p` is the C2f's FUSED param subtree. Numerically equivalent to
    nn/modules.py C2f.__call__ (tested in tests/test_pallas_c2f.py)."""
    B, H, W, c1 = x.shape
    w1, b1 = _w(p["cv1"])
    c = w1.shape[-1] // 2
    c2o = _w(p["cv2"])[0].shape[-1]
    while B % block_b:
        block_b //= 2
    return _call(
        [x.astype(dtype)], [w1, b1], p, n, shortcut, H, W, c1, 0, c, c2o,
        block_b, interpret, dtype,
        [pltpu.VMEM((2, block_b, 1, W, c1), dtype)],
    )


@functools.partial(jax.jit, static_argnames=("n", "shortcut", "block_b", "interpret", "dtype"))
def fused_c2f_upconcat(
    small, skip, p, *, n: int, shortcut: bool, block_b: int = 8, interpret: bool = False, dtype=jnp.bfloat16
):
    """C2f(concat(up2x_nearest(small), skip)) fully fused: neither the
    upsampled map, the concat, nor any C2f intermediate is materialized. The
    kernel form of C2f.call_upconcat (same exact algebra: a 1x1 conv commutes
    with nearest upsample; the `small` half of cv1 runs at low resolution)."""
    B, H, W, ck = skip.shape
    cs = small.shape[-1]
    assert small.shape[1] * 2 == H and small.shape[2] * 2 == W, (
        f"small {small.shape} is not a 2x-downsampled partner of skip {skip.shape}"
    )
    w1, b1 = _w(p["cv1"])  # (cs + ck, 2c)
    c = w1.shape[-1] // 2
    c2o = _w(p["cv2"])[0].shape[-1]
    while B % block_b:
        block_b //= 2
    return _call(
        [small.astype(dtype), skip.astype(dtype)],
        [w1[:cs], w1[cs:], b1],
        p, n, shortcut, H, W, cs + ck, cs, c, c2o,
        block_b, interpret, dtype,
        [
            pltpu.VMEM((2, block_b, 1, W, ck), dtype),
            pltpu.VMEM((2, block_b, 1, W // 2, cs), dtype),
        ],
    )
