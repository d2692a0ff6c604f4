"""Event-callback hub (ref: ultralytics/utils/callbacks/base.py:144-174).

Same 24 hook points; integrations register plain functions. TensorBoard/CSV
come built-in; heavier integrations (wandb/mlflow) attach if their SDK imports.
"""

from __future__ import annotations

from yolo_tpu.utils import LOGGER

HOOKS = [
    "on_pretrain_routine_start", "on_pretrain_routine_end",
    "on_train_start", "on_train_epoch_start", "on_train_batch_start",
    "optimizer_step", "on_before_zero_grad", "on_train_batch_end",
    "on_train_epoch_end", "on_fit_epoch_end", "on_model_save",
    "on_train_end", "on_params_update", "teardown",
    "on_val_start", "on_val_batch_start", "on_val_batch_end", "on_val_end",
    "on_predict_start", "on_predict_batch_start", "on_predict_postprocess_end",
    "on_predict_batch_end", "on_predict_end",
    "on_export_start", "on_export_end",
]


def default_callbacks() -> dict:
    return {h: [] for h in HOOKS}


def add_integration_callbacks(callbacks: dict):
    """Attach optional logger integrations if importable (tensorboard via jax)."""
    try:
        from yolo_tpu.utils.tb_logger import callbacks as tb

        for k, v in tb.items():
            callbacks.setdefault(k, []).append(v)
    except ImportError:
        pass
    from yolo_tpu.utils.integrations import attach

    return attach(callbacks)


def run_callbacks(callbacks: dict, hook: str, obj):
    for fn in callbacks.get(hook, []):
        try:
            fn(obj)
        except Exception as e:  # callbacks must never kill training
            LOGGER.warning(f"callback {hook}/{getattr(fn, '__name__', fn)} failed: {e}")
