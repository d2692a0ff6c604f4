"""SAM facade (ref: ultralytics/models/sam/model.py SAM:38)."""

from __future__ import annotations

from yolo_tpu.models.sam.build import SAM_BUILDERS
from yolo_tpu.models.sam.predict import SAMPredictor


class SAM:
    """Promptable Segment Anything facade.

    >>> sam = SAM("sam_b")          # ViT-B graph (random init without a checkpoint)
    >>> sam.load_torch("sam_b.pt")  # optional: import released weights
    >>> res = sam.predict(img, points=[[x, y]])
    """

    def __init__(self, model: str = "sam_b", img_size: int = 1024):
        key = str(model).lower().replace(".pt", "").replace("-", "_")
        if key not in SAM_BUILDERS:
            raise ValueError(f"unknown SAM variant '{model}' — choose from {sorted(SAM_BUILDERS)}")
        self.model = SAM_BUILDERS[key](img_size=img_size)
        self.params = self.model.init(0)
        self.predictor = None
        self.task = "segment"

    def load_torch(self, path):
        """Import a released SAM checkpoint (.pt/.pth state_dict)."""
        from yolo_tpu.nn.torch_import import load_torch_checkpoint, state_dict_to_params

        sd, _ = load_torch_checkpoint(path)
        self.params = state_dict_to_params(sd, self.params)
        self.predictor = None
        return self

    def predict(self, source, points=None, labels=None, bboxes=None, multimask_output=True, **kwargs):
        if self.predictor is None:
            self.predictor = SAMPredictor(self.model, self.params)
        self.predictor.set_image(source)
        return self.predictor(points=points, labels=labels, bboxes=bboxes, multimask_output=multimask_output)

    def __call__(self, source, **kwargs):
        return self.predict(source, **kwargs)

    def video_predictor(self, num_frames: int):
        """SAM2 video mask propagation (ref: predict.py SAM2VideoPredictor:885).

        >>> vp = SAM("sam2_t").video_predictor(num_frames=len(frames))
        >>> vp.add_prompt(frames[0], points=[[x, y]], labels=[1])
        >>> masks, scores = vp.propagate(frames[1:])
        """
        from yolo_tpu.models.sam.sam2 import SAM2Model
        from yolo_tpu.models.sam.video import SAM2VideoPredictor

        if not isinstance(self.model, SAM2Model):
            raise ValueError("video propagation requires a SAM2 variant (sam2_t/s/b)")
        return SAM2VideoPredictor(self.model, self.params, num_frames=num_frames)

    def info(self):
        import jax

        n = sum(int(x.size) for x in jax.tree_util.tree_leaves(self.params))
        return {"params": n, "img_size": self.model.image_encoder.img_size}
