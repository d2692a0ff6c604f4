"""yolo_tpu — a TPU-native (JAX/XLA/Pallas) small-target detection + Kalman trajectory
prediction framework.

Re-implements the capabilities of the reference ultralytics-fork
(Tomorrow-star-618/YOLO---Small-Target-Recognition---Kalman-Trajectory-Prediction)
with a TPU-first design: functional models (pytree params + pure apply), fused
preprocess→forward→decode→NMS inference under one jit, batched scan-based Kalman
tracking, and pjit/shard_map data parallelism over a device mesh.

Public surface mirrors the reference (see SURVEY.md §1-2):
  - ``YOLO(model).predict/track/train/val/export/benchmark``  (ref: engine/model.py)
  - ``yolo_tpu.kalman.EnhancedMultiTargetTracker.update``     (ref: kalman/)
"""

__version__ = "0.1.0"

from yolo_tpu.engine.model import NAS, RTDETR, YOLO, YOLOE, YOLOWorld  # noqa: E402
from yolo_tpu.models import SAM, FastSAM  # noqa: E402

__all__ = ["YOLO", "NAS", "RTDETR", "YOLOWorld", "YOLOE", "FastSAM", "SAM", "__version__"]
