"""Predictor that runs on a remote serving daemon instead of a local device.

TPU-native analog of the reference's Triton routing inside AutoBackend
(ref: nn/autobackend.py:79-98 ``triton`` row + utils/triton.py): the facade
constructs this when the model source is a ``tcp://host:port/<id>`` URL, so
``YOLO("tcp://...").predict/track`` behave like a local model — same source
routing (files/dirs/videos/arrays/streams via data.loaders), same Results —
while the heavy lifting happens in one shared yolo_tpu.serve.DetectionServer
process that owns the jitted TPU program.
"""

from __future__ import annotations

import numpy as np

from yolo_tpu.cfg import get_cfg
from yolo_tpu.engine.predictor import _iter_source
from yolo_tpu.engine.results import Results
from yolo_tpu.utils import LOGGER, Profile


class RemotePredictor:
    """Streams frames to a RemoteModel client and wraps detections as Results.

    The server applies its own conf/iou/letterbox (configured server-side, ref
    serve.py _ModelLane); client-side ``conf`` re-filters downward only.
    """

    def __init__(self, client, overrides: dict | None = None, names: dict | None = None):
        self.client = client
        self.args = get_cfg(overrides=overrides or {})
        self.names = names or {}

    def __call__(self, source, stream: bool = False, **kwargs):
        gen = self.stream_inference(source, **kwargs)
        return gen if stream else list(gen)

    def stream_inference(self, source, **kwargs):
        for k, v in kwargs.items():
            setattr(self.args, k, v)
        conf = self.args.conf if self.args.conf is not None else 0.0
        frames = _iter_source(
            source,
            vid_stride=self.args.vid_stride,
            stream_buffer=bool(getattr(self.args, "stream_buffer", False)),
        )
        for img, path, _frame_info in frames:
            prof = Profile()
            with prof:
                dets = self.client(img)
            if conf:
                dets = dets[dets[:, 4] >= conf]
            r = Results(img, path, self.names, boxes=dets if len(dets) else None)
            r.speed = {"preprocess": 0.0, "inference": prof.dt * 1e3, "postprocess": 0.0}
            if self.args.verbose:
                LOGGER.info(f"{path}: {r.verbose()}{r.speed['inference']:.1f}ms (remote)")
            yield r

    def close(self):
        self.client.close()
