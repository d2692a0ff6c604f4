"""YOLO-World: build/forward + parity vs reference torch with shared random
text embeddings (no CLIP needed — both sides take precomputed txt_feats)."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

from yolo_tpu.nn.tasks import WorldModel


def test_world_builds_and_forwards():
    import jax
    import jax.numpy as jnp

    m = WorldModel("yolov8s-world.yaml")
    p = m.init(0)
    y = jax.jit(m.predict)(p, jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert y.shape == (1, 84, 84)
    # set_text_features resizes the class axis
    m.set_text_features(np.random.default_rng(0).normal(0, 1, (1, 3, 512)).astype(np.float32))
    y = jax.jit(m.predict)(p, jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert y.shape == (1, 4 + 3, 84)
    # set_classes now runs the native CLIP text tower end-to-end
    m.set_classes(["a", "b"])
    assert m.nc == 2 and m.names == {0: "a", 1: "b"}


@pytest.mark.parametrize("yaml_name", ["yolov8s-world.yaml", "yolov8s-worldv2.yaml"])
@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_world_parity_with_reference(yaml_name):
    add_reference_to_path()
    import torch
    from ultralytics.nn.tasks import WorldModel as TWM

    from yolo_tpu.nn.torch_import import state_dict_to_params
    import jax
    import jax.numpy as jnp

    ref_yaml = f"/root/reference/ultralytics/cfg/models/v8/{yaml_name}"
    torch.manual_seed(0)
    t = TWM(ref_yaml, verbose=False)
    t.eval()
    ours = WorldModel(yaml_name)
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    params = state_dict_to_params(sd, ours.init(0))

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    txt = rng.normal(0, 1, (1, 80, 512)).astype(np.float32)
    t.txt_feats = torch.tensor(txt)
    with torch.no_grad():
        y_t = t.predict(torch.from_numpy(img))[0].numpy()
    ours.set_text_features(txt)
    y_j = np.asarray(jax.jit(ours.predict)(params, jnp.asarray(img.transpose(0, 2, 3, 1))))
    assert y_t.shape == y_j.shape
    assert np.allclose(y_t[:, :4], y_j[:, :4], atol=5e-2), np.abs(y_t[:, :4] - y_j[:, :4]).max()
    assert np.allclose(y_t[:, 4:], y_j[:, 4:], atol=2e-3), np.abs(y_t[:, 4:] - y_j[:, 4:]).max()


def test_world_finetune_close_set(tmp_path):
    """Close-set YOLO-World fine-tuning (ref: world/train.py WorldTrainer):
    dataset class names embed via the native text tower and the detection
    loss trains through the region-text head."""
    import cv2

    from yolo_tpu.engine.model import YOLOWorld

    root = tmp_path / "ds"
    for sub in ("images/train", "labels/train"):
        (root / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.integers(0, 255, (64, 64, 3), np.uint8)
        cv2.rectangle(img, (20, 20), (44, 44), (250, 250, 250), -1)
        cv2.imwrite(str(root / "images/train" / f"{i}.jpg"), img)
        (root / "labels/train" / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    data = root / "d.yaml"
    data.write_text(f"path: {root}\ntrain: images/train\nval: images/train\nnames:\n  0: bright box\n")

    m = YOLOWorld("yolov8s-world.yaml")
    m.train(data=str(data), epochs=2, imgsz=64, batch=2, workers=1, mosaic=0.0,
            project=str(tmp_path), name="w", val=False, plots=False, amp=False)
    import csv

    rows = list(csv.DictReader(open(tmp_path / "w" / "results.csv")))
    assert len(rows) == 2
    assert all(np.isfinite(float(r["train/box_loss"])) for r in rows)
    assert m.model.nc == 1 and m.model.names == {0: "bright box"}
