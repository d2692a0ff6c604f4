"""YOLOE: build/forward + parity vs reference torch with shared prompt embeddings."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

from yolo_tpu.nn.tasks import YOLOEModel


def test_yoloe_builds_and_forwards():
    import jax
    import jax.numpy as jnp

    m = YOLOEModel("yoloe-11s.yaml")
    p = m.init(0)
    y = jax.jit(m.predict)(p, jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert y.shape == (1, 84, 84)
    # set_classes runs the native CLIP text tower through the head's SwiGLU
    m.set_classes(["a"], params=p)
    assert m.nc == 1 and m.names == {0: "a"}


def test_yoloe_visual_prompts():
    import jax.numpy as jnp

    m = YOLOEModel("yoloe-11s.yaml")
    p = m.init(0)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    vp = jnp.zeros((1, 2, 8, 8), jnp.float32).at[:, 0, 2:5, 2:5].set(1.0).at[:, 1, 5:8, 5:8].set(1.0)
    vpe = m.get_visual_pe(p, x, vp)
    assert vpe.shape == (1, 2, 512)
    n = np.linalg.norm(np.asarray(vpe), axis=-1)
    assert np.allclose(n, 1.0, atol=1e-4)  # SAVPE embeds are L2-normalized
    m.set_visual_pe(np.asarray(vpe))
    y = m.predict(p, x)
    assert y.shape == (1, 4 + 2, 84)  # two visual-prompt classes


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_yoloe_parity_with_reference():
    add_reference_to_path()
    import torch
    from ultralytics.nn.tasks import YOLOEModel as TEM

    from yolo_tpu.nn.torch_import import state_dict_to_params
    import jax
    import jax.numpy as jnp

    torch.manual_seed(0)
    t = TEM("/root/reference/ultralytics/cfg/models/11/yoloe-11.yaml", verbose=False)  # assumes scale n
    t.eval()
    ours = YOLOEModel("yoloe-11n.yaml")
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    params = state_dict_to_params(sd, ours.init(0))

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    raw_txt = rng.normal(0, 1, (1, 80, 512)).astype(np.float32)

    head = t.model[-1]
    with torch.no_grad():
        tpe_t = head.get_tpe(torch.tensor(raw_txt))
        y_t = t.predict(torch.from_numpy(img), tpe=tpe_t)[0].numpy()

    ours.set_text_features(params, raw_txt)
    y_j = np.asarray(jax.jit(ours.predict)(params, jnp.asarray(img.transpose(0, 2, 3, 1))))
    assert y_t.shape == y_j.shape, (y_t.shape, y_j.shape)
    assert np.allclose(y_t[:, :4], y_j[:, :4], atol=5e-2), np.abs(y_t[:, :4] - y_j[:, :4]).max()
    assert np.allclose(y_t[:, 4:], y_j[:, 4:], atol=2e-3), np.abs(y_t[:, 4:] - y_j[:, 4:]).max()


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_yoloe_savpe_parity():
    add_reference_to_path()
    import torch
    from ultralytics.nn.modules.block import SAVPE as RefSAVPE

    from yolo_tpu.nn.modules import SAVPE, Ctx
    from yolo_tpu.nn.torch_import import state_dict_to_params
    import jax.numpy as jnp

    torch.manual_seed(2)
    ref = RefSAVPE([32, 64, 128], 32, 64)
    ref.eval()
    ours = SAVPE([32, 64, 128], 32, 64)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = state_dict_to_params(sd, ours.init(np.random.default_rng(0)))

    rng = np.random.default_rng(3)
    xs = [rng.normal(0, 1, (1, c, 16 // (2**i), 16 // (2**i))).astype(np.float32) for i, c in enumerate([32, 64, 128])]
    vp = (rng.uniform(0, 1, (1, 2, 16, 16)) > 0.6).astype(np.float32)
    with torch.no_grad():
        y_r = ref([torch.tensor(x) for x in xs], torch.tensor(vp)).numpy()
    ctx = Ctx(train=False, dtype=jnp.float32)
    y_j = np.asarray(ours(params, [jnp.asarray(x.transpose(0, 2, 3, 1)) for x in xs], jnp.asarray(vp), ctx))
    assert y_r.shape == y_j.shape
    assert np.allclose(y_r, y_j, atol=2e-3), np.abs(y_r - y_j).max()


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_yoloe_lrpc_prompt_free_parity():
    """Prompt-free LRPC path vs torch (ref: head.py LRPCHead:540, fuse:667,
    forward_lrpc:731): fused vocabulary + proposal filter, identical kept
    anchors and logits."""
    add_reference_to_path()
    import copy

    import torch
    from ultralytics.nn.modules.head import LRPCHead
    from ultralytics.nn.tasks import YOLOEModel as TEM

    from yolo_tpu.nn.torch_import import state_dict_to_params
    import jax.numpy as jnp

    torch.manual_seed(3)
    t = TEM("/root/reference/ultralytics/cfg/models/11/yoloe-11.yaml", verbose=False)
    t.eval()
    ours = YOLOEModel("yoloe-11n.yaml")
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    params = state_dict_to_params(sd, ours.init(0))

    rng = np.random.default_rng(5)
    nc_v = 4
    big_txt = rng.normal(0, 1, (1, nc_v, 512)).astype(np.float32)
    obj_txt = rng.normal(0, 1, (1, 1, 512)).astype(np.float32)
    img = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)

    head = t.model[-1]
    with torch.no_grad():
        tpe_big = head.get_tpe(torch.tensor(big_txt))
        tpe_obj = head.get_tpe(torch.tensor(obj_txt))
        # reference prompt-free assembly (ref tasks.py get_vocab:1086 + set_vocab:1057)
        hv = copy.deepcopy(head)
        hv.fuse(tpe_big)  # vocabulary convs
        hp = copy.deepcopy(head)
        hp.fuse(tpe_obj)  # proposal-filter convs (1-class 'object' model)
        captured = {}
        hook = head.register_forward_pre_hook(lambda m, args: captured.update(x=[xi.clone() for xi in args[0]]))
        _ = t.predict(torch.tensor(img), tpe=head.get_tpe(torch.tensor(rng.normal(0, 1, (1, 80, 512)).astype(np.float32))))
        hook.remove()
        head.lrpc = torch.nn.ModuleList(
            LRPCHead(hv.cv3[i][-1], hp.cv3[i][-1], head.cv2[i][-1], enabled=i != 2) for i in range(3)
        )
        for i in range(3):
            del head.cv2[i][-1]
            del head.cv3[i][-1]
        head.nc = nc_v
        head.conf = 0.25  # high enough that the filter actually drops anchors
        head.is_fused = True
        (y_t, _), mask_t = head.forward(captured["x"], None, return_mask=True)
        y_t, mask_t = y_t.numpy(), mask_t.numpy()

    # ours: same obj prompts for the pf head, stubbed text model for the vocab
    class StubTM:
        def encode_text(self, texts):
            return big_txt[0]

    ours.set_text_features(params, obj_txt)
    p2 = ours.set_vocab(params, ["a", "b", "c", "d"], text_model=StubTM())
    y_j, keep = ours.predict_lrpc(p2, jnp.asarray(img.transpose(0, 2, 3, 1)), conf=0.25)
    keep = np.asarray(keep)[0]
    assert (keep == mask_t).all(), f"proposal masks differ: ours {keep.sum()} vs ref {mask_t.sum()}"
    y_sel = np.asarray(y_j)[:, :, keep]
    assert y_sel.shape == y_t.shape, (y_sel.shape, y_t.shape)
    assert np.allclose(y_t[:, :4], y_sel[:, :4], atol=5e-2), np.abs(y_t[:, :4] - y_sel[:, :4]).max()
    assert np.allclose(y_t[:, 4:], y_sel[:, 4:], atol=2e-3), np.abs(y_t[:, 4:] - y_sel[:, 4:]).max()


def test_yoloe_finetune_close_set(tmp_path):
    """YOLOE close-set fine-tuning (ref: yoloe/train.py): class names embed
    through the text tower + SwiGLU residual; detection loss trains."""
    import cv2

    from yolo_tpu.engine.model import YOLOE

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
    data.write_text(f"path: {root}\ntrain: images/train\nval: images/train\nnames:\n  0: box\n")

    m = YOLOE("yoloe-11n.yaml")
    m.train(data=str(data), epochs=2, imgsz=64, batch=2, workers=1, mosaic=0.0,
            project=str(tmp_path), name="e", val=False, plots=False, amp=False)
    import csv

    rows = list(csv.DictReader(open(tmp_path / "e" / "results.csv")))
    assert len(rows) == 2
    assert all(np.isfinite(float(r["train/box_loss"])) for r in rows)
    assert m.model.nc == 1
