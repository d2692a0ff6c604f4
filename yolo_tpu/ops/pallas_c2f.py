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
cv2 2n rows after production). Boundary rows (-1 and H) read as zeros:
rings zero-initialize at h == 0 and every producer stage emits one explicit
zero row past the image.

In upconcat mode the block's two sources stream separately. The low-res
`small` half of cv1 is repeated 2x along W on the host (one (B, H/2, W, cs)
materialization — in-kernel W-repeat crashes this environment's remote Mosaic
compiler) and row-repeated for free through the index map (row h reads source
row h//2); the full upsampled map and the concat never exist anywhere.

Mosaic portability (found by on-chip bisection, demos/pallas_ab.py history):
this environment's remote Mosaic compiler rejects manual ANY+DMA kernels,
lane-axis concatenation of shifted slices (classic im2col), lane-splitting
reshapes, f32 iota, and in-kernel W-repeat. So: inputs stream via
auto-pipelined 1-row BlockSpecs, every 3x3 conv is 9 shifted
(P, ch) @ (ch, c_out) dots accumulated in f32, cv1's two output halves come
from column-split weights (two dots, no lane slicing), and cv2's input concat
is a sum of row-sliced-weight dots.

Numerics mirror the fused ConvBNAct path exactly like ops/pallas_head.py:
f32 MXU accumulation (summation order differs within the accumulator across
the 9 shifted dots), round to compute dtype, bias + SiLU in that dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _silu(x):
    # See ops/pallas_head.py:_silu — bf16 logistic trips a Mosaic verifier
    # bug; f32 logistic rounded matches XLA's bf16 lowering to <=1 ULP.
    return x * jax.nn.sigmoid(x.astype(jnp.float32)).astype(x.dtype)


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
        small_ref, skip_ref, w_aa, w_ab, w_ba, w_bb, b1a, b1b = refs[:8]
        k = 8
    else:
        x_ref, w1a, w1b, b1a, b1b = refs[:5]
        k = 5
    w_m = refs[k : k + 4 * n]
    w_cv2, b_cv2, out_ref = refs[k + 4 * n : k + 4 * n + 3]
    scr = refs[k + 4 * n + 3 :]
    y_a, y_b = scr[0], scr[1]  # (Bt, 2n+1, W+2, c) cv1-half rings
    m_c1 = scr[2 : 2 + n]  # (Bt, 3, W+2, c) rings
    m_out = scr[2 + n : 2 + n + (n - 1)]  # (Bt, 2(n-i)+3, W+2, c), i < n-1

    h = pl.program_id(1)
    Bt = block_b
    P = Bt * W
    DY = 2 * n + 1  # cv1 ring depth

    @pl.when(h == 0)
    def _init():
        y_a[...] = jnp.zeros_like(y_a)
        y_b[...] = jnp.zeros_like(y_b)
        for r in (*m_c1, *m_out):
            r[...] = jnp.zeros_like(r)

    # ---- stage cv1 (1x1, lag 0): rows 0..H-1 computed, row H written as zero
    @pl.when(h < H)
    def _cv1():
        if up:
            ck = c1 - cs
            xa = small_ref[...].reshape(P, cs)  # host-W-repeated, row h//2
            xb = skip_ref[...].reshape(P, ck)
            ua = jnp.dot(xa, w_aa[...], preferred_element_type=jnp.float32) + jnp.dot(
                xb, w_ba[...], preferred_element_type=jnp.float32
            )
            ub = jnp.dot(xa, w_ab[...], preferred_element_type=jnp.float32) + jnp.dot(
                xb, w_bb[...], preferred_element_type=jnp.float32
            )
        else:
            xr = x_ref[...].reshape(P, c1)
            ua = jnp.dot(xr, w1a[...], preferred_element_type=jnp.float32)
            ub = jnp.dot(xr, w1b[...], preferred_element_type=jnp.float32)
        ua = _silu(ua.astype(dtype) + b1a[...].astype(dtype))
        ub = _silu(ub.astype(dtype) + b1b[...].astype(dtype))
        y_a[:, pl.ds(h % DY, 1), 1 : W + 1, :] = ua.reshape(Bt, 1, W, c)
        y_b[:, pl.ds(h % DY, 1), 1 : W + 1, :] = ub.reshape(Bt, 1, W, c)

    @pl.when(h == H)
    def _cv1_zero():
        y_a[:, pl.ds(h % DY, 1)] = jnp.zeros((Bt, 1) + y_a.shape[2:], y_a.dtype)
        y_b[:, pl.ds(h % DY, 1)] = jnp.zeros((Bt, 1) + y_b.shape[2:], y_b.dtype)

    def conv3(ring, row, depth, ch, w, bias):
        """3x3 conv for row `row` from ring rows row-1..row+1: 9 shifted dots
        against row slices of the (9*ch, c) weight, f32-accumulated."""
        acc = None
        for j, s in enumerate(((row - 1) % depth, row % depth, (row + 1) % depth)):
            for dx in range(3):
                a = ring[:, pl.ds(s, 1), dx : dx + W, :].reshape(P, ch)
                wp = w[(j * 3 + dx) * ch : (j * 3 + dx + 1) * ch, :]
                d = jnp.dot(a, wp, preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
        return _silu(acc.astype(dtype) + bias[...].astype(dtype))

    def m_residual(i, r):
        """Bottleneck i's shortcut operand: its own input row r."""
        if i == 0:
            return y_b[:, pl.ds(r % DY, 1), 1 : W + 1, :].reshape(P, c)
        d_prev = 2 * (n - (i - 1)) + 3
        return m_out[i - 1][:, pl.ds(r % d_prev, 1), 1 : W + 1, :].reshape(P, c)

    def m_conv2(i, r):
        t = conv3(m_c1[i], r, 3, c, w_m[4 * i + 2], w_m[4 * i + 3])
        return t + m_residual(i, r) if shortcut else t

    # ---- bottleneck stages. For bottleneck i (0-based): first conv at lag
    # 2i+1 reading its producer (y_b for i=0, m_out[i-1] after), second conv
    # at lag 2i+2, landing in m_out[i] (the last one feeds cv2 directly
    # in-step and needs no ring).
    for i in range(n):
        r1 = h - (2 * i + 1)
        r2 = h - (2 * i + 2)
        d_out = 2 * (n - i) + 3

        @pl.when((r1 >= 0) & (r1 < H))
        def _mc1(i=i, r1=r1):
            if i == 0:
                t = conv3(y_b, r1, DY, c, w_m[0], w_m[1])
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

    # ---- final bottleneck's second conv + "concat" + cv2 (lag 2n), one block
    # so the last map never needs a ring. The concat@cv2 is a sum of dots
    # against row slices of w_cv2, ordered [y_a | y_b | m_out[0..n-2] | t].
    r = h - 2 * n

    @pl.when(r < 0)
    def _cv2_prefill():
        # the output block at clamped index 0 is REVISITED for every h < 2n;
        # Pallas TPU buffers are double-buffered, so a revisited block must be
        # written on EVERY visit or the flush takes a stale/garbage buffer
        # (measured on chip: output row 0 garbage for batch tiles > 0;
        # interpret mode single-buffers and masks it). The real row-0 write at
        # h == 2n is the block's last visit and wins.
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(r >= 0)
    def _cv2():
        t = m_conv2(n - 1, r)
        segs = [
            y_a[:, pl.ds(r % DY, 1), 1 : W + 1, :].reshape(P, c),
            y_b[:, pl.ds(r % DY, 1), 1 : W + 1, :].reshape(P, c),
        ]
        segs += [
            m_out[j][:, pl.ds(r % (2 * (n - j) + 3), 1), 1 : W + 1, :].reshape(P, c)
            for j in range(n - 1)
        ]
        segs.append(t)
        acc = None
        for j, seg in enumerate(segs):
            d = jnp.dot(
                seg, w_cv2[j * c : (j + 1) * c, :], preferred_element_type=jnp.float32
            )
            acc = d if acc is None else acc + d
        z = _silu(acc.astype(dtype) + b_cv2[...].astype(dtype))
        out_ref[...] = z.reshape(Bt, 1, W, c2o)


def _w(p):
    """Fused ConvBNAct params -> (k*k*c_in, c_out) matmul weight + (1, c_out) bias."""
    w = p["conv"]["weight"]
    return w.reshape(-1, w.shape[-1]), p["conv"]["bias"].reshape(1, -1)


def _call(inputs, in_specs, cv1_ws, p, n, shortcut, H, W, c1, cs, c, c2o, block_b, interpret, dtype):
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
        # grid rows: the deepest stage is cv2 for row H-1 at h = H-1+2n (the
        # deepest zero-row stages land earlier), so H+2n steps suffice — and
        # keep the clamped output index map in range (max h-2n = H-1)
        grid=(inputs[0].shape[0] // block_b, H + 2 * n),
        in_specs=in_specs
        + [const(w.shape) for w in cv1_ws]
        + [const(w.shape) for w in wm]
        + [const(w2.shape), const(b2.shape)],
        out_specs=pl.BlockSpec(
            (block_b, 1, W, c2o),
            lambda b, h, _n=n: (b, jnp.maximum(h - 2 * _n, 0), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((inputs[0].shape[0], H, W, c2o), dtype),
        scratch_shapes=[pltpu.VMEM((block_b, 2 * n + 1, W + 2, c), dtype) for _ in range(2)]
        + [pltpu.VMEM((block_b, 3, W + 2, c), dtype) for _ in range(n)]
        + [pltpu.VMEM((block_b, 2 * (n - i) + 3, W + 2, c), dtype) for i in range(n - 1)],
        interpret=interpret,
    )(*inputs, *(w.astype(dtype) for w in cv1_ws), *wm, w2.astype(dtype), b2.astype(dtype))


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
    in_specs = [
        pl.BlockSpec(
            (block_b, 1, W, c1),
            lambda b, h: (b, jnp.minimum(h, H - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    return _call(
        [x.astype(dtype)], in_specs,
        [w1[:, :c], w1[:, c:], b1[:, :c], b1[:, c:]],
        p, n, shortcut, H, W, c1, 0, c, c2o, block_b, interpret, dtype,
    )


@functools.partial(jax.jit, static_argnames=("n", "shortcut", "block_b", "interpret", "dtype"))
def fused_c2f_upconcat(
    small, skip, p, *, n: int, shortcut: bool, block_b: int = 8, interpret: bool = False, dtype=jnp.bfloat16
):
    """C2f(concat(up2x_nearest(small), skip)) fused: the upsampled map, the
    concat, and every C2f intermediate stay in VMEM. The kernel form of
    C2f.call_upconcat (same exact algebra: a 1x1 conv commutes with nearest
    upsample). The only materialization is `small` W-repeated on the host
    ((B, H/2, W, cs) — half the upsample; see the module docstring); the row
    repeat is free via the index map (row h reads source row h//2)."""
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
    small_rep = jnp.repeat(small.astype(dtype), 2, axis=2)  # (B, H/2, W, cs)
    Hs = H // 2
    in_specs = [
        pl.BlockSpec(
            (block_b, 1, W, cs),
            lambda b, h: (b, jnp.minimum(h // 2, Hs - 1), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (block_b, 1, W, ck),
            lambda b, h: (b, jnp.minimum(h, H - 1), 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    w_a, w_b = w1[:cs], w1[cs:]
    return _call(
        [small_rep, skip.astype(dtype)], in_specs,
        [w_a[:, :c], w_a[:, c:], w_b[:, :c], w_b[:, c:], b1[:, :c], b1[:, c:]],
        p, n, shortcut, H, W, cs + ck, cs, c, c2o, block_b, interpret, dtype,
    )
