"""Pallas kernels: interpret-mode correctness vs the XLA/numpy paths."""

import numpy as np
import pytest

from yolo_tpu.ops.nms import nms_numpy


def test_pallas_nms_matches_numpy_oracle():
    import jax.numpy as jnp

    from yolo_tpu.ops.pallas_nms import pallas_nms_keep

    rng = np.random.default_rng(0)
    B, K = 2, 128
    boxes = np.zeros((B, K, 4), np.float32)
    scores = np.zeros((B, K), np.float32)
    for b in range(B):
        n = 90
        centers = rng.uniform(50, 450, (n, 2))
        sizes = rng.uniform(10, 60, (n, 2))
        bx = np.concatenate([centers - sizes / 2, centers + sizes / 2], -1).astype(np.float32)
        sc = np.sort(rng.uniform(0.05, 1.0, n).astype(np.float32))[::-1]
        boxes[b, :n] = bx
        scores[b, :n] = sc
        scores[b, n:] = -1.0

    keep = np.asarray(pallas_nms_keep(jnp.asarray(boxes), jnp.asarray(scores), 0.45, interpret=True))
    for b in range(B):
        n = 90
        ref_keep_idx = set(nms_numpy(boxes[b, :n], scores[b, :n], 0.45).tolist())
        got = {i for i in range(K) if keep[b, i]}
        assert got == ref_keep_idx, (b, sorted(got ^ ref_keep_idx))
