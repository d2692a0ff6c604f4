"""Import torch checkpoints (ultralytics .pt / raw state_dicts) into param pytrees.

Because our param-tree keys mirror torch submodule names (see nn/modules.py), the
mapping is purely mechanical: join the tree path with '.' to get the torch key,
then convert layouts (OIHW→HWIO for 4-D conv weights, DFL (1,c,1,1)→(1,1,c,1)).

Equivalent role to the reference's checkpoint loading (ref: ultralytics/nn/tasks.py
torch_safe_load:1404, attempt_load_one_weight) — ours targets a JAX pytree.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.utils import LOGGER


def load_torch_checkpoint(path):
    """Load a torch checkpoint → (state_dict {name: np.ndarray}, metadata dict).

    Handles: ultralytics full-model checkpoints ({'model': nn.Module, ...}),
    plain state_dicts, and {'state_dict': ...} wrappers.
    """
    import torch

    # Safe-first loading (ref: nn/tasks.py torch_safe_load:1404): try the
    # no-arbitrary-code weights_only path, and only fall back to full
    # unpickling with an explicit warning — .pt files execute pickle code.
    try:
        ckpt = torch.load(str(path), map_location="cpu", weights_only=True)
    except Exception:
        LOGGER.warning(
            f"{path} is not loadable with weights_only=True; falling back to full unpickling. "
            "Only load checkpoints from sources you trust."
        )
        ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    meta = {}
    if isinstance(ckpt, dict):
        meta = {k: v for k, v in ckpt.items() if k in ("epoch", "train_args", "date", "version", "yaml", "names")}
        obj = ckpt.get("ema") or ckpt.get("model") or ckpt.get("state_dict") or ckpt
    else:
        obj = ckpt
    if hasattr(obj, "state_dict"):  # nn.Module
        if hasattr(obj, "yaml"):
            meta["yaml"] = obj.yaml
        if hasattr(obj, "names"):
            meta["names"] = obj.names
        sd = obj.float().state_dict()
    else:
        sd = obj
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v) for k, v in sd.items()}, meta


def _convert(torch_key: str, arr: np.ndarray, target_shape) -> np.ndarray:
    """Layout-convert one torch tensor to the target pytree leaf shape."""
    if arr.ndim == 4:
        t = arr.transpose(2, 3, 1, 0)  # conv weight OIHW → HWIO
        if tuple(arr.shape) == tuple(target_shape) and tuple(t.shape) == tuple(target_shape):
            # ambiguous (O==kH and I==kW, e.g. a 3-in/3-out 3x3 conv): decide
            # by key — conv kernels transpose; channels-last 4-D buffers
            # (SAM pos_embed/rel_pos) pass through
            if not any(s in torch_key for s in ("pos_embed", "rel_pos")):
                arr = t
        elif tuple(arr.shape) != tuple(target_shape):
            arr = t
    if tuple(arr.shape) != tuple(target_shape):
        raise ValueError(f"shape mismatch for {torch_key}: torch {arr.shape} vs model {tuple(target_shape)}")
    return arr


def state_dict_to_params(state_dict: dict, params_template) -> dict:
    """Fill a param-tree template from a torch state_dict by name."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    leaves = []
    missing = []
    for path, leaf in flat:
        key = ".".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if key in state_dict:
            leaves.append(jnp.asarray(_convert(key, state_dict[key], leaf.shape), dtype=leaf.dtype))
        else:
            missing.append(key)
            leaves.append(leaf)
    if missing:
        LOGGER.warning(f"torch import: {len(missing)} params not found in checkpoint, kept init values: {missing[:8]}...")
    unused = set(state_dict) - {
        ".".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path) for path, _ in flat
    }
    unused = {k for k in unused if not k.endswith("num_batches_tracked")}
    if unused:
        LOGGER.info(f"torch import: {len(unused)} checkpoint tensors unused (e.g. {sorted(unused)[:5]})")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_pt(path, model=None):
    """Load an ultralytics-style .pt → (task-specific model, params, meta)."""
    from yolo_tpu.nn.tasks import model_class_for

    sd, meta = load_torch_checkpoint(path)
    if model is None:
        yaml_cfg = meta.get("yaml")
        if yaml_cfg is None:
            raise ValueError(f"{path} has no embedded yaml; pass model= explicitly")
        yaml_cfg = dict(yaml_cfg)
        task = (meta.get("train_args") or {}).get("task") if isinstance(meta.get("train_args"), dict) else None
        model = model_class_for(yaml_cfg, task)(yaml_cfg)
    template = model.init(0)
    params = state_dict_to_params(sd, template)
    return model, params, meta
