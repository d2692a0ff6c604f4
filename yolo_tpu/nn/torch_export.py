"""Export param pytrees back to torch-layout checkpoints.

The exact inverse of nn/torch_import.py: tree paths ARE torch submodule names,
so the state_dict falls out mechanically — 4-D conv kernels transpose
HWIO→OIHW, everything else passes through. The saved .pt holds a plain
{"state_dict", "yaml", "names", ...} dict of tensors (torch.save, no module
code), loadable by any torch runtime:

    from ultralytics.nn.tasks import DetectionModel
    ckpt = torch.load("model.pt", weights_only=False)
    m = DetectionModel(ckpt["yaml"], nc=len(ckpt["names"]))
    m.load_state_dict(ckpt["state_dict"], strict=False)  # bn counters absent

This is the interchange surface the reference provides through its per-engine
exports (ref: engine/exporter.py:118-155) — one artifact consumable outside
the PJRT ecosystem, and the bridge for running reference-side validation on
TPU-trained weights (tests/test_val_parity.py).
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def params_to_state_dict(params) -> dict:
    """Param pytree → {torch_name: np.ndarray} with torch layouts.

    Inverse of torch_import.state_dict_to_params: joins each leaf's tree path
    with '.', transposing 4-D conv kernels HWIO→OIHW. Channels-last 4-D
    buffers imported as-is (SAM pos_embed/rel_pos, torch_import.py:65) also
    pass through unchanged on the way out.
    """
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    sd = {}
    for path, leaf in flat:
        key = ".".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        arr = np.asarray(leaf, dtype=np.float32)
        if arr.ndim == 4 and not any(s in key for s in ("pos_embed", "rel_pos")):
            arr = arr.transpose(3, 2, 0, 1)  # HWIO → OIHW
        sd[key] = arr
    return sd


def save_pt(model, params, filename, names=None, train_args=None) -> Path:
    """Write a torch-loadable .pt: tensor state_dict + model yaml + names.

    No nn.Module is pickled (we have no torch model code), so the artifact is
    dependency-light: torch.load(weights_only=False) returns plain dicts and
    tensors only.
    """
    import torch

    filename = Path(filename)
    yaml_cfg = getattr(model, "yaml", None)
    ckpt = {
        "state_dict": {k: torch.from_numpy(v.copy()) for k, v in params_to_state_dict(params).items()},
        "yaml": dict(yaml_cfg) if isinstance(yaml_cfg, dict) else yaml_cfg,
        "names": names or getattr(model, "names", None),
        "train_args": dict(train_args or {}),
        "format": "yolo_tpu.state_dict.v1",
    }
    torch.save(ckpt, filename)
    return filename
