#!/usr/bin/env python3
"""Minimal consumer of a `yolo export format=stablehlo` artifact.

The exported file is a `jax.export` serialization of the FUSED inference
program (normalize → backbone → decode); this consumer deserializes and runs
it with zero knowledge of the model code — the deployment contract is the
bytes alone. The same bytes feed any PJRT runtime (see README.md for the
C/C++ route).

Usage:
    python examples/stablehlo_consumer/consumer.py model.stablehlo [image]
"""

import sys
from pathlib import Path

import numpy as np


def main():
    blob = Path(sys.argv[1]).read_bytes()
    from jax import export as jax_export

    exported = jax_export.deserialize(blob)
    print("in_avals :", exported.in_avals[-1])
    print("out_avals:", exported.out_avals)
    # the exported signature is (params_pytree, uint8 NHWC frames)
    img_aval = exported.in_avals[-1]
    b, h, w, c = img_aval.shape
    if len(sys.argv) > 2:
        import cv2

        raw = cv2.imread(sys.argv[2], cv2.IMREAD_GRAYSCALE if c == 1 else cv2.IMREAD_COLOR)
        if raw is None:
            print(f"cannot read image {sys.argv[2]}", file=sys.stderr)
            sys.exit(2)
        raw = cv2.resize(raw, (w, h))
        if raw.ndim == 2:
            raw = raw[..., None]
        im = np.broadcast_to(raw[None], (b, h, w, c)).astype(np.uint8)
    else:
        im = np.random.default_rng(0).integers(0, 255, (b, h, w, c), np.uint8)
    # params were serialized as example args metadata? No — StableHLO export
    # closes over NOTHING; the caller supplies params. For a self-contained
    # artifact ship the .npz next to the .stablehlo:
    npz = Path(sys.argv[1]).with_suffix(".npz")
    if not npz.exists():
        print(f"params file {npz} not found — export with save_npz alongside", file=sys.stderr)
        sys.exit(2)
    from yolo_tpu.engine.exporter import load_npz

    _, params, _ = load_npz(npz)
    out = exported.call(params, im)
    out = np.asarray(out)
    print("output:", out.shape, "max score:", float(out[:, 4:].max()))


if __name__ == "__main__":
    main()
