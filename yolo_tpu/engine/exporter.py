"""Export / native checkpoint formats.

Reference counterpart: engine/exporter.py (16 torch-ecosystem formats). On TPU
the deployment story is different by design: params are a pytree and the graph
is jit-compiled from source, so the export surface is:

  - ``npz``         — flat params + model yaml in one portable file (default)
  - ``orbax``       — sharded orbax checkpoint directory (large models, resume)
  - ``stablehlo``   — serialized lowered StableHLO of the fused predict program
                      (consumable from C++ via PJRT, see examples/cpp_client)
  - ``savedmodel``  — alias of npz+yaml bundle for serving shims
  - ``pt``          — torch-ecosystem interchange (ultralytics state_dict)
  - ``tflite``      — edge interchange via jax2tf (LiteRT/Android/XNNPACK)

Each loader returns (model, params, meta) so `YOLO(<artifact>)` round-trips.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from yolo_tpu.utils import LOGGER, yaml_load


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: dict):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_npz(model, params, filename="model.npz", meta: dict | None = None) -> Path:
    """Save params + embedded model yaml to a single .npz."""
    filename = Path(filename)
    filename.parent.mkdir(parents=True, exist_ok=True)
    flat = _flatten(params)
    payload = {f"param::{k}": v for k, v in flat.items()}
    payload["__yaml__"] = np.frombuffer(json.dumps(model.yaml, default=str).encode(), dtype=np.uint8)
    payload["__meta__"] = np.frombuffer(
        json.dumps(
            {"names": getattr(model, "names", {}), "task": getattr(model, "task", "detect"), **(meta or {})},
            default=str,
        ).encode(),
        dtype=np.uint8,
    )
    np.savez(filename, **payload)
    LOGGER.info(f"saved {filename} ({filename.stat().st_size / 1e6:.1f} MB)")
    return filename


def load_npz(filename):
    """Load a .npz produced by save_npz → (model, params, meta)."""
    import jax.numpy as jnp

    from yolo_tpu.nn.tasks import model_class_for

    data = np.load(filename, allow_pickle=False)
    yaml_cfg = json.loads(bytes(data["__yaml__"]).decode())
    meta = json.loads(bytes(data["__meta__"]).decode()) if "__meta__" in data else {}
    # dispatch to the task's model subclass (Segmentation/Pose/OBB/RTDETR/...)
    # so a saved non-detect model round-trips with the right head decode + loss
    model = model_class_for(yaml_cfg, meta.get("task"))(yaml_cfg)
    if meta.get("names"):
        model.names = {int(k): v for k, v in meta["names"].items()}
    flat = {k[len("param::") :]: data[k] for k in data.files if k.startswith("param::")}
    params = _unflatten({k: jnp.asarray(v) for k, v in flat.items()})
    # parameterless layers (Upsample/Concat) flatten to nothing — restore their
    # empty dicts so the tree matches the module structure
    for spec in model.layers:
        params.setdefault("model", {}).setdefault(str(spec.i), {})
    return model, params, meta


def save_orbax(model, params, dirname, meta: dict | None = None) -> Path:
    """Save an orbax checkpoint dir (params + yaml/meta json sidecars)."""
    import orbax.checkpoint as ocp

    dirname = Path(dirname).resolve()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(dirname / "params", params, force=True)
    ckptr.wait_until_finished()
    (dirname / "model.json").write_text(
        json.dumps(
            {"yaml": model.yaml, "names": getattr(model, "names", {}), "task": getattr(model, "task", "detect"), **(meta or {})},
            default=str,
        )
    )
    LOGGER.info(f"saved orbax checkpoint {dirname}")
    return dirname


def load_orbax(dirname):
    import jax
    import orbax.checkpoint as ocp

    from yolo_tpu.nn.tasks import model_class_for

    dirname = Path(dirname).resolve()
    info = json.loads((dirname / "model.json").read_text())
    model = model_class_for(info["yaml"], info.get("task"))(info["yaml"])
    if info.get("names"):
        model.names = {int(k): v for k, v in info["names"].items()}
    template = jax.tree_util.tree_map(lambda x: np.asarray(x), model.init(0))
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(dirname / "params", template)
    return model, params, info


def export_stablehlo(model, params, imgsz=(640, 640), batch: int = 1, filename="model.stablehlo",
                     platforms=("tpu", "cpu"), baked: bool = True, nms: bool = False,
                     conf: float = 0.25, iou: float = 0.45, max_det: int = 300,
                     dynamic: bool = False) -> Path:
    """Serialize the fused inference program to portable StableHLO bytes.

    Lowered for multiple platforms by default so one artifact serves both the
    TPU fleet and CPU consumers (examples/stablehlo_consumer). `baked=False`
    skips the second, params-as-constants .mlir module (the C++ PJRT
    consumer's input) — it roughly doubles export time and disk.

    nms=True bakes decode+NMS into the exported program (ref: exporter.py
    NMSModel:1496) — outputs the fixed-shape dict (boxes (B, max_det, 4) xyxy,
    scores, cls, valid) instead of raw (B, 4+nc, A) predictions, so a native
    consumer needs no postprocessing."""
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    h, w = (imgsz, imgsz) if isinstance(imgsz, int) else imgsz

    if nms:
        from yolo_tpu.ops.nms import non_max_suppression

        def infer(p, imgs):
            x = imgs.astype(jnp.float32) / 255.0
            out = non_max_suppression(
                model.predict(p, x), conf_thres=conf, iou_thres=iou, max_det=max_det
            )
            # dicts don't serialize through jax.export consumers cleanly —
            # fixed tuple order (boxes, scores, cls, valid)
            return out["boxes"], out["scores"], out["cls"], out["valid"]

    else:

        def infer(p, imgs):
            x = imgs.astype(jnp.float32) / 255.0
            return model.predict(p, x)

    if dynamic:
        # symbolic batch dim (ref: exporter 'dynamic' ONNX axes) — the
        # envelope accepts any batch at call time; the baked single-platform
        # .mlir below stays static (the PJRT C consumer compiles fixed shapes)
        (bdim,) = jax_export.symbolic_shape("b")
        in_shape = (bdim, h, w, 3)
    else:
        in_shape = (batch, h, w, 3)
    exported = jax_export.export(jax.jit(infer), platforms=list(platforms))(
        jax.tree_util.tree_map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params),
        jax.ShapeDtypeStruct(in_shape, jnp.uint8),
    )
    blob = exported.serialize()
    Path(filename).write_bytes(blob)
    LOGGER.info(f"exported StableHLO: {filename} ({len(blob) / 1e6:.1f} MB)")

    if not baked:
        return Path(filename)

    # RAW single-platform module with the weights baked in as constants — ONE
    # uint8 NHWC argument, directly compilable through the PJRT C API by the
    # C++ consumer (examples/stablehlo_consumer/pjrt_consumer.cpp). The
    # jax.export envelope above stays the Python-side artifact; this is the
    # native-side one. A .json sidecar carries the input geometry.
    params_const = jax.tree_util.tree_map(jnp.asarray, params)

    def infer_baked(imgs):
        return infer(params_const, imgs)

    mlir_path = Path(filename).with_suffix(".mlir")
    baked = jax_export.export(jax.jit(infer_baked), platforms=[platforms[0]])(
        jax.ShapeDtypeStruct((batch, h, w, 3), jnp.uint8)
    )
    mlir_path.write_bytes(baked.mlir_module_serialized)
    Path(str(mlir_path) + ".json").write_text(
        json.dumps({"shape": [batch, h, w, 3], "dtype": "uint8",
                    "platform": platforms[0],
                    "out_avals": [str(a) for a in baked.out_avals]})
    )
    LOGGER.info(f"exported raw StableHLO module: {mlir_path} "
                f"({mlir_path.stat().st_size / 1e6:.1f} MB, platform {platforms[0]})")
    return Path(filename)


def export_tflite(model, params, imgsz=(640, 640), batch: int = 1, filename="model.tflite",
                  nms: bool = False, conf: float = 0.25, iou: float = 0.45, max_det: int = 300,
                  half: bool = False) -> Path:
    """Export the inference program to a .tflite flatbuffer via jax2tf.

    The edge-interchange format (ref: engine/exporter.py export_tflite:582):
    runs on LiteRT/TFLite runtimes (Android, microcontrollers, XNNPACK CPU) —
    the one consumer class the PJRT/StableHLO artifacts don't reach. The JAX
    program is lowered for CPU and legalized to TFLite builtin ops (verified:
    the yolov8 forward converts with NO flex/select ops and reproduces the
    JAX outputs to ~1e-4; tests/test_export.py).

    Input: float32 NHWC RGB in [0, 255] (the /255 normalize is baked in, like
    the reference's TFLite models). Output: raw (B, 4+nc, A) predictions, or
    the fixed-shape NMS tuple (boxes, scores, cls, valid) when nms=True.
    half=True stores weights fp16 (runtime dequantizes; ~2x smaller file)."""
    import jax
    import jax.numpy as jnp
    import tensorflow as tf
    from jax.experimental import jax2tf

    h, w = (imgsz, imgsz) if isinstance(imgsz, int) else imgsz
    params_const = jax.tree_util.tree_map(jnp.asarray, params)

    if nms:
        from yolo_tpu.ops.nms import non_max_suppression

        def infer(imgs):
            out = non_max_suppression(
                model.predict(params_const, imgs / 255.0, dtype=jnp.float32),
                conf_thres=conf, iou_thres=iou, max_det=max_det,
            )
            return out["boxes"], out["scores"], out["cls"].astype(jnp.int32), out["valid"]

    else:

        def infer(imgs):
            return model.predict(params_const, imgs / 255.0, dtype=jnp.float32)

    f = jax2tf.convert(infer, with_gradient=False, native_serialization_platforms=("cpu",))
    cf = tf.function(
        f, input_signature=[tf.TensorSpec((batch, h, w, 3), tf.float32)], autograph=False
    ).get_concrete_function()
    converter = tf.lite.TFLiteConverter.from_concrete_functions([cf])
    if half:
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        converter.target_spec.supported_types = [tf.float16]
    try:
        blob = converter.convert()
    except Exception as e:  # nms-baked programs may need flex ops on some tf versions
        LOGGER.warning(f"TFLite builtin-ops conversion failed ({str(e)[:120]}); retrying with SELECT_TF_OPS")
        converter = tf.lite.TFLiteConverter.from_concrete_functions([cf])
        converter.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS, tf.lite.OpsSet.SELECT_TF_OPS]
        if half:  # keep the fp16-weight request through the fallback path
            converter.optimizations = [tf.lite.Optimize.DEFAULT]
            converter.target_spec.supported_types = [tf.float16]
        blob = converter.convert()
    filename = Path(filename)
    filename.write_bytes(blob)
    # metadata sidecar (names/task/geometry) — the reference embeds these in
    # the tflite metadata block; a json rides along here
    Path(str(filename) + ".json").write_text(
        json.dumps({"names": getattr(model, "names", {}), "task": getattr(model, "task", "detect"),
                    "imgsz": [h, w], "batch": batch, "nms": nms, "half": bool(half),
                    "normalized_input": "0-255 float32 RGB"},
                   default=str)
    )
    LOGGER.info(f"exported TFLite: {filename} ({len(blob) / 1e6:.1f} MB)")
    return filename


class Exporter:
    """Dispatch exports by args.format (ref: engine/exporter.py Exporter:207)."""

    def __init__(self, args=None):
        from yolo_tpu.cfg import get_cfg, DEFAULT_CFG_DICT

        self.args = get_cfg(overrides={k: v for k, v in (args or {}).items() if k in DEFAULT_CFG_DICT})

    def __call__(self, model, params):
        fmt = (self.args.format or "npz").lower()
        name = Path(str(self.args.model or "model")).stem
        if fmt in ("npz", "savedmodel", "-"):
            return save_npz(model, params, f"{name}.npz")
        if fmt == "orbax":
            return save_orbax(model, params, f"{name}_orbax")
        if fmt == "stablehlo":
            imgsz = self.args.imgsz or 640
            return export_stablehlo(
                model, params, imgsz=imgsz, filename=f"{name}.stablehlo",
                nms=bool(getattr(self.args, "nms", False)),
                conf=float(self.args.conf or 0.25), iou=float(self.args.iou or 0.45),
                max_det=int(self.args.max_det or 300),
                dynamic=bool(getattr(self.args, "dynamic", False)),
            )
        if fmt == "pt":  # torch-ecosystem interchange: tensor state_dict .pt
            from yolo_tpu.nn.torch_export import save_pt

            return save_pt(model, params, f"{name}.pt", names=getattr(model, "names", None))
        if fmt == "tflite":  # edge interchange (LiteRT/Android/XNNPACK)
            imgsz = self.args.imgsz or 640
            return export_tflite(
                model, params, imgsz=imgsz, filename=f"{name}.tflite",
                nms=bool(getattr(self.args, "nms", False)),
                conf=float(self.args.conf or 0.25), iou=float(self.args.iou or 0.45),
                max_det=int(self.args.max_det or 300), half=bool(getattr(self.args, "half", False)),
            )
        raise ValueError(f"unsupported export format '{fmt}' (npz | orbax | stablehlo | pt | tflite)")


def save_train_state(dirname, state: dict) -> Path:
    """Persist full training state (params, optimizer moments, EMA, counters)
    as an orbax checkpoint — the TPU equivalent of the reference's resume
    checkpoint (ref: engine/trainer.py save_model:536, which pickles
    model+optimizer into the .pt)."""
    import jax
    import orbax.checkpoint as ocp

    dirname = Path(dirname).resolve()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(dirname / "state", jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    return dirname


def load_train_state(dirname, template: dict) -> dict:
    """Restore training state saved by save_train_state (template gives shapes)."""
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    dirname = Path(dirname).resolve()
    template = jax.tree_util.tree_map(lambda x: np.asarray(x), template)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(dirname / "state", template)
