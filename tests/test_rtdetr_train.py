"""RT-DETR training pieces: Hungarian matcher + DETR loss parity, then an
end-to-end training smoke test."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available


def _case(seed=0, B=2, Nq=20, nc=5, n_gt=(3, 2)):
    rng = np.random.default_rng(seed)
    pb = rng.uniform(0.2, 0.8, (B, Nq, 4)).astype(np.float32)
    pb[..., 2:] = rng.uniform(0.05, 0.3, (B, Nq, 2))
    ps = rng.normal(0, 1, (B, Nq, nc)).astype(np.float32)
    N = max(n_gt)
    gb = np.zeros((B, N, 4), np.float32)
    gc = np.zeros((B, N), np.float32)
    m = np.zeros((B, N), np.float32)
    for b in range(B):
        for j in range(n_gt[b]):
            gb[b, j] = [*rng.uniform(0.3, 0.7, 2), *rng.uniform(0.1, 0.3, 2)]
            gc[b, j] = rng.integers(0, nc)
            m[b, j] = 1
    return pb, ps, gb, gc, m


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_hungarian_matcher_parity():
    add_reference_to_path()
    import torch
    from ultralytics.models.utils.ops import HungarianMatcher as RefMatcher

    from yolo_tpu.utils.detr_loss import hungarian_match

    pb, ps, gb, gc, m = _case(seed=3)
    B = pb.shape[0]
    gt_groups = [int(m[b].sum()) for b in range(B)]
    flat_gb = np.concatenate([gb[b][m[b] > 0] for b in range(B)])
    flat_gc = np.concatenate([gc[b][m[b] > 0] for b in range(B)]).astype(np.int64)

    ref = RefMatcher(cost_gain={"class": 2, "bbox": 5, "giou": 2})
    idx = ref(torch.tensor(pb), torch.tensor(ps), torch.tensor(flat_gb), torch.tensor(flat_gc), gt_groups)

    src_idx, valid = hungarian_match(pb, ps, gb, gc, m)
    for b in range(B):
        qi, gj = idx[b]
        # reference gt index is offset into the flat batch tensor
        off = sum(gt_groups[:b])
        ours = {(int(src_idx[b, j]), j + off) for j in range(gb.shape[1]) if valid[b, j]}
        theirs = {(int(q), int(g)) for q, g in zip(qi, gj)}
        assert ours == theirs, (b, ours, theirs)


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_detr_loss_parity():
    add_reference_to_path()
    import torch
    from ultralytics.models.utils.loss import DETRLoss as RefLoss

    from yolo_tpu.utils.detr_loss import DETRLoss, hungarian_match

    pb, ps, gb, gc, m = _case(seed=5)
    B, Nq, nc = ps.shape
    gt_groups = [int(m[b].sum()) for b in range(B)]
    flat_gb = np.concatenate([gb[b][m[b] > 0] for b in range(B)])
    flat_gc = np.concatenate([gc[b][m[b] > 0] for b in range(B)]).astype(np.int64)

    ref = RefLoss(nc=nc, aux_loss=False, use_fl=True)
    out_r = ref(
        torch.tensor(pb)[None],  # (L=1, B, Nq, 4)
        torch.tensor(ps)[None],
        {"cls": torch.tensor(flat_gc), "bboxes": torch.tensor(flat_gb), "gt_groups": gt_groups},
    )

    import jax.numpy as jnp

    src_idx, valid = hungarian_match(pb, ps, gb, gc, m)
    ours = DETRLoss(nc=nc)
    out_j = ours(
        jnp.asarray(pb), jnp.asarray(ps), jnp.asarray(gb), jnp.asarray(gc), jnp.asarray(m),
        jnp.asarray(src_idx), jnp.asarray(valid),
    )
    for k in ("loss_class", "loss_bbox", "loss_giou"):
        r = float(out_r[k])
        j = float(out_j[k])
        assert abs(r - j) < 2e-3 * max(1.0, abs(r)), (k, r, j)


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_detr_loss_vfl_parity():
    """RT-DETR trains with use_vfl=True (ref: tasks.py init_criterion:749)."""
    add_reference_to_path()
    import torch
    from ultralytics.models.utils.loss import DETRLoss as RefLoss

    from yolo_tpu.utils.detr_loss import DETRLoss, hungarian_match

    pb, ps, gb, gc, m = _case(seed=9)
    B, Nq, nc = ps.shape
    gt_groups = [int(m[b].sum()) for b in range(B)]
    flat_gb = np.concatenate([gb[b][m[b] > 0] for b in range(B)])
    flat_gc = np.concatenate([gc[b][m[b] > 0] for b in range(B)]).astype(np.int64)

    ref = RefLoss(nc=nc, aux_loss=False, use_fl=True, use_vfl=True)
    out_r = ref(
        torch.tensor(pb)[None], torch.tensor(ps)[None],
        {"cls": torch.tensor(flat_gc), "bboxes": torch.tensor(flat_gb), "gt_groups": gt_groups},
    )

    import jax.numpy as jnp

    src_idx, valid = hungarian_match(pb, ps, gb, gc, m)
    ours = DETRLoss(nc=nc, use_vfl=True)
    out_j = ours(
        jnp.asarray(pb), jnp.asarray(ps), jnp.asarray(gb), jnp.asarray(gc), jnp.asarray(m),
        jnp.asarray(src_idx), jnp.asarray(valid),
    )
    for k in ("loss_class", "loss_bbox", "loss_giou"):
        r, j = float(out_r[k]), float(out_j[k])
        assert abs(r - j) < 2e-3 * max(1.0, abs(r)), (k, r, j)


def _mini_rtdetr_cfg(nc=2):
    """Tiny RT-DETR: 3-level conv backbone + small deformable decoder."""
    return {
        "nc": nc,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],   # 0 P1/2
            [-1, 1, "Conv", [32, 3, 2]],   # 1 P2/4
            [-1, 1, "Conv", [64, 3, 2]],   # 2 P3/8
            [-1, 1, "Conv", [64, 3, 2]],   # 3 P4/16
            [-1, 1, "Conv", [64, 3, 2]],   # 4 P5/32
        ],
        "head": [
            [[2, 3, 4], 1, "RTDETRDecoder", ["nc", 64, 32, 2, 4, 2, 128]],  # hd 64, nq 32, ndp 2, nh 4, ndl 2
        ],
    }


def test_rtdetr_train_step_runs_and_loss_finite(tmp_path):
    """Full jitted RT-DETR train step: forward (train) → pure_callback Hungarian
    matching → VFL/L1/GIoU over enc + decoder layers → grads applied."""
    import jax
    import jax.numpy as jnp

    from yolo_tpu.nn.tasks import RTDETRDetectionModel
    from yolo_tpu.utils.detr_loss import RTDETRDetectionLoss
    from yolo_tpu.nn.modules import Ctx

    m = RTDETRDetectionModel(_mini_rtdetr_cfg())
    params = m.init(0)
    loss_fn = RTDETRDetectionLoss(m)

    rng = np.random.default_rng(0)
    B, H, W, N = 2, 64, 64, 8
    batch = {
        "img": jnp.asarray(rng.integers(0, 255, (B, H, W, 3)).astype(np.float32)),
        "bboxes": jnp.asarray(
            np.stack([np.concatenate([rng.uniform(0.3, 0.7, (N, 2)), rng.uniform(0.1, 0.3, (N, 2))], -1) for _ in range(B)]).astype(np.float32)
        ),
        "cls": jnp.zeros((B, N), jnp.float32),
        "mask_gt": jnp.asarray((np.arange(N)[None] < np.array([[3], [2]])).astype(np.float32)),
    }

    def forward_loss(p, batch):
        ctx = Ctx(train=True, dtype=jnp.float32)
        x = batch["img"] / 255.0
        preds = m.forward_features(p, x, ctx)
        total, comps = loss_fn(preds, batch)
        return total, comps

    (total, comps), grads = jax.jit(jax.value_and_grad(forward_loss, has_aux=True))(params, batch)
    assert np.isfinite(float(total))
    assert np.isfinite(np.asarray(comps)).all()
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0, "no gradient signal"
    # a parameter that must receive grads: decoder bbox head last layer
    g = grads["model"]["5"]["dec_bbox_head"]["0"]["layers"]["2"]["weight"]
    assert float(jnp.abs(g).sum()) > 0


def test_rtdetr_facade_train_smoke(tmp_path):
    """2-epoch facade training run on a tiny synthetic dataset through the
    RTDETR trainer path (pure_callback matching inside the jitted step)."""
    import cv2

    root = tmp_path / "rtds"
    (root / "images/train").mkdir(parents=True)
    (root / "labels/train").mkdir(parents=True)
    rng = np.random.default_rng(1)
    for i in range(4):
        img = rng.normal(40, 6, (96, 96, 3)).clip(0, 255).astype(np.uint8)
        cx, cy, w, h = rng.uniform(0.35, 0.65), rng.uniform(0.35, 0.65), 0.3, 0.3
        cv2.rectangle(img, (int((cx - w / 2) * 96), int((cy - h / 2) * 96)), (int((cx + w / 2) * 96), int((cy + h / 2) * 96)), (250,) * 3, -1)
        cv2.imwrite(str(root / f"images/train/{i}.png"), img)
        (root / f"labels/train/{i}.txt").write_text(f"0 {cx:.4f} {cy:.4f} {w} {h}\n")
    (root / "dataset.yaml").write_text(f"path: {root}\ntrain: images/train\nval: images/train\nnames: {{0: t}}\n")

    from yolo_tpu.engine.trainer import DetectionTrainer
    from yolo_tpu.nn.tasks import RTDETRDetectionModel

    model = RTDETRDetectionModel(_mini_rtdetr_cfg(nc=1))
    tr = DetectionTrainer(
        overrides={
            "data": str(root / "dataset.yaml"), "epochs": 2, "imgsz": 96, "batch": 4, "workers": 1,
            "mosaic": 0.0, "optimizer": "AdamW", "lr0": 0.001, "amp": False, "val": True,
            "project": str(tmp_path / "runs"), "name": "rt", "exist_ok": True,
        },
        model=model,
    )
    tr.train()
    import csv

    rows = list(csv.DictReader(open(tmp_path / "runs" / "rt" / "results.csv")))
    assert len(rows) == 2
    for r in rows:
        for k in ("train/giou_loss", "train/cls_loss", "train/l1_loss"):
            assert np.isfinite(float(r[k])), (k, r[k])


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_cdn_attn_mask_exact_parity():
    """The dn attention mask is deterministic — compare bit-exact vs the
    reference get_cdn_group (ref: models/utils/ops.py :295-307)."""
    add_reference_to_path()
    import torch
    from ultralytics.models.utils.ops import get_cdn_group

    from yolo_tpu.utils.cdn import cdn_attn_mask

    N, nq, nc = 8, 30, 5
    # a batch where every image has exactly N gts → reference max_nums == N
    B = 2
    batch = {
        "cls": torch.arange(B * N) % nc,
        "bboxes": torch.rand(B * N, 4) * 0.4 + 0.3,
        "batch_idx": torch.arange(B * N) // N,
        "gt_groups": [N] * B,
    }
    emb = torch.rand(nc, 16)
    _, _, ref_mask, meta = get_cdn_group(batch, nc, nq, emb, num_dn=24, training=True)
    G = meta["dn_num_group"]
    ours = cdn_attn_mask(G, N, nq)
    assert ours.shape == tuple(ref_mask.shape)
    assert (ours == ref_mask.numpy()).all()


def test_make_cdn_batch_noise_semantics():
    from yolo_tpu.utils.cdn import make_cdn_batch

    rng = np.random.default_rng(0)
    B, N = 2, 8
    batch = {
        "cls": rng.integers(0, 5, (B, N)).astype(np.float32),
        "bboxes": (rng.random((B, N, 4)) * 0.3 + 0.35).astype(np.float32),
        "mask_gt": np.ones((B, N), np.float32),
    }
    dn = make_cdn_batch(batch, num_classes=5, num_dn=24, rng=np.random.default_rng(1))
    G = dn["dn_num_group"]
    D = 2 * G * N
    assert dn["dn_cls"].shape == (B, D) and dn["dn_bbox"].shape == (B, D, 4)
    # positives stay within half-extent of the gt; negatives are pushed outside
    def sig(x):
        return 1 / (1 + np.exp(-x))

    gt = np.tile(batch["bboxes"], (1, 2 * G, 1))
    dev = np.abs(sig(dn["dn_bbox"]) - gt)  # xywh deviation
    pos_dev = dev[:, : G * N, :2]
    neg_dev = dev[:, G * N :, :2]
    assert neg_dev.mean() > pos_dev.mean()
    # padded gts give zero logits
    batch["mask_gt"][0, 4:] = 0.0
    dn = make_cdn_batch(batch, 5, 24, rng=np.random.default_rng(2))
    assert (dn["dn_bbox"][0, 4:8] == 0).all() and (dn["dn_valid"][0, 4:8] == 0).all()


def test_rtdetr_train_step_with_cdn():
    """One jitted RT-DETR train step consuming denoising groups end to end
    (VERDICT r1 next#8 acceptance)."""
    import jax
    import jax.numpy as jnp

    from yolo_tpu.nn.modules import Ctx
    from yolo_tpu.nn.tasks import RTDETRDetectionModel
    from yolo_tpu.utils.cdn import cdn_attn_mask, make_cdn_batch
    from yolo_tpu.utils.detr_loss import RTDETRDetectionLoss

    m = RTDETRDetectionModel(_mini_rtdetr_cfg(nc=3))
    p = m.init(0)
    loss_fn = RTDETRDetectionLoss(m)
    rng = np.random.default_rng(0)
    B, N = 2, 4
    batch = {
        "img": rng.integers(0, 255, (B, 64, 64, 3)).astype(np.uint8),
        "cls": rng.integers(0, 3, (B, N)).astype(np.float32),
        "bboxes": (rng.random((B, N, 4)) * 0.3 + 0.3).astype(np.float32),
        "mask_gt": np.ones((B, N), np.float32),
    }
    dn = make_cdn_batch(batch, m.nc, num_dn=8, rng=rng)
    batch.update({k: dn[k] for k in ("dn_cls", "dn_bbox", "dn_valid")})
    G = dn["dn_num_group"]

    def fl(params):
        ctx = Ctx(train=True, dtype=jnp.float32)
        ctx.dn = {"dn_cls": jnp.asarray(batch["dn_cls"]), "dn_bbox": jnp.asarray(batch["dn_bbox"]),
                  "dn_valid": jnp.asarray(batch["dn_valid"]), "attn_mask": cdn_attn_mask(G, N, m.head.nq)}
        feats = m.forward_features(params, jnp.asarray(batch["img"], jnp.float32) / 255.0, ctx)
        total, comps = loss_fn(feats, {k: jnp.asarray(v) for k, v in batch.items() if k != "img"})
        return total, comps

    (total, comps), grads = jax.jit(jax.value_and_grad(fl, has_aux=True))(p)
    assert np.isfinite(float(total))
    # gradients reach the denoising class embedding (dn path is live)
    gnorm = float(jnp.abs(grads["model"][str(m.layers[-1].i)]["denoising_class_embed"]["weight"]).sum())
    assert gnorm > 0


def test_rtdetr_facade_train_with_cdn(tmp_path):
    """RT-DETR micro-train through the facade trainer — the cdn batch hook
    (trainer loop) and the dn loss split run end to end."""
    import cv2

    from yolo_tpu import RTDETR

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
    data.write_text(f"path: {root}\ntrain: images/train\nval: images/train\nnames:\n  0: t\n")

    import yaml

    cfg_path = tmp_path / "rtdetr-mini.yaml"
    cfg_path.write_text(yaml.safe_dump(_mini_rtdetr_cfg(nc=1)))
    m = RTDETR(str(cfg_path))
    m.train(data=str(data), epochs=2, imgsz=64, batch=2, workers=1, mosaic=0.0,
            project=str(tmp_path), name="r", val=False, plots=False, amp=False)
    import csv

    rows = list(csv.DictReader(open(tmp_path / "r" / "results.csv")))
    assert len(rows) == 2
    assert all(np.isfinite(float(rows[-1][f"train/{c}_loss"])) for c in ("giou", "cls", "l1"))
