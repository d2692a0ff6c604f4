"""SAM: module parity vs the reference torch implementation + end-to-end
promptable prediction on a small ViT."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_sam_prompt_encoder_parity():
    add_reference_to_path()
    import torch
    from ultralytics.models.sam.modules.encoders import PromptEncoder as RefPE

    from yolo_tpu.models.sam.modules import PromptEncoder
    from yolo_tpu.nn.torch_import import state_dict_to_params
    import jax.numpy as jnp

    torch.manual_seed(0)
    ref = RefPE(embed_dim=64, image_embedding_size=(8, 8), input_image_size=(128, 128), mask_in_chans=16)
    ours = PromptEncoder(embed_dim=64, image_embedding_size=(8, 8), input_image_size=(128, 128), mask_in_chans=16)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = state_dict_to_params(sd, ours.init(np.random.default_rng(0)))

    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 128, (2, 3, 2)).astype(np.float32)
    lbl = rng.integers(0, 2, (2, 3)).astype(np.int64)
    boxes = rng.uniform(0, 128, (2, 4)).astype(np.float32)
    masks = rng.normal(0, 1, (2, 1, 32, 32)).astype(np.float32)

    with torch.no_grad():
        sp_r, de_r = ref((torch.tensor(pts), torch.tensor(lbl)), torch.tensor(boxes)[:, None], torch.tensor(masks))
    sp_j, de_j = ours(params, points=(jnp.asarray(pts), jnp.asarray(lbl)), boxes=jnp.asarray(boxes),
                      masks=jnp.asarray(masks.transpose(0, 2, 3, 1)))
    assert np.allclose(sp_r.numpy(), np.asarray(sp_j), atol=1e-4), np.abs(sp_r.numpy() - np.asarray(sp_j)).max()
    assert np.allclose(de_r.numpy().transpose(0, 2, 3, 1), np.asarray(de_j), atol=1e-4)
    # dense PE grid
    pe_r = ref.get_dense_pe().detach().numpy()
    pe_j = np.asarray(ours.get_dense_pe(params)).transpose(0, 3, 1, 2)
    assert np.allclose(pe_r, pe_j, atol=1e-4)


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_sam_mask_decoder_parity():
    add_reference_to_path()
    import torch
    from ultralytics.models.sam.modules.decoders import MaskDecoder as RefMD
    from ultralytics.models.sam.modules.transformer import TwoWayTransformer as RefTWT

    from yolo_tpu.models.sam.modules import MaskDecoder, TwoWayTransformer
    from yolo_tpu.nn.torch_import import state_dict_to_params
    import jax.numpy as jnp

    torch.manual_seed(1)
    ref = RefMD(transformer_dim=64, transformer=RefTWT(depth=2, embedding_dim=64, num_heads=4, mlp_dim=128),
                num_multimask_outputs=3, iou_head_depth=3, iou_head_hidden_dim=64)
    ref.eval()
    ours = MaskDecoder(transformer_dim=64, transformer=TwoWayTransformer(2, 64, 4, 128),
                       num_multimask_outputs=3, iou_head_depth=3, iou_head_hidden_dim=64)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = state_dict_to_params(sd, ours.init(np.random.default_rng(0)))

    rng = np.random.default_rng(2)
    emb = rng.normal(0, 1, (1, 64, 8, 8)).astype(np.float32)
    pe = rng.normal(0, 1, (1, 64, 8, 8)).astype(np.float32)
    sparse = rng.normal(0, 1, (2, 3, 64)).astype(np.float32)
    dense = rng.normal(0, 1, (2, 64, 8, 8)).astype(np.float32)

    with torch.no_grad():
        m_r, i_r = ref(torch.tensor(emb), torch.tensor(pe), torch.tensor(sparse), torch.tensor(dense), True)
    m_j, i_j = ours(params, jnp.asarray(emb.transpose(0, 2, 3, 1)), jnp.asarray(pe.transpose(0, 2, 3, 1)),
                    jnp.asarray(sparse), jnp.asarray(dense.transpose(0, 2, 3, 1)), True)
    assert np.allclose(m_r.numpy(), np.asarray(m_j), atol=2e-3), np.abs(m_r.numpy() - np.asarray(m_j)).max()
    assert np.allclose(i_r.numpy(), np.asarray(i_j), atol=1e-3)


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_sam_image_encoder_parity_small():
    """Small ViT (2 blocks: one windowed, one global w/ rel-pos) vs torch."""
    add_reference_to_path()
    import torch
    from ultralytics.models.sam.modules.encoders import ImageEncoderViT as RefEnc

    from yolo_tpu.models.sam.modules import ImageEncoderViT
    from yolo_tpu.nn.torch_import import state_dict_to_params
    import jax
    import jax.numpy as jnp
    from functools import partial

    torch.manual_seed(3)
    ref = RefEnc(img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0,
                 out_chans=16, qkv_bias=True, use_rel_pos=True, window_size=2, global_attn_indexes=(1,),
                 norm_layer=partial(torch.nn.LayerNorm, eps=1e-6))
    ref.eval()
    # randomize the zero-init rel-pos tables so the test actually exercises them
    with torch.no_grad():
        for blk in ref.blocks:
            blk.attn.rel_pos_h.normal_(0, 0.5)
            blk.attn.rel_pos_w.normal_(0, 0.5)
        ref.pos_embed.normal_(0, 0.5)
    # the reference's pos-embed rescale assumes a 1024-pretrain grid and breaks
    # for small built-from-scratch sizes; our pos_embed is already at this grid
    ref.img_size = 1024  # skip its interpolate branch
    ours = ImageEncoderViT(img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0,
                           out_chans=16, use_rel_pos=True, window_size=2, global_attn_indexes=(1,))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = state_dict_to_params(sd, ours.init(np.random.default_rng(0)))

    rng = np.random.default_rng(4)
    x = rng.normal(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        y_r = ref(torch.tensor(x)).numpy()
    y_j = np.asarray(jax.jit(ours.__call__)(params, jnp.asarray(x.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    assert y_r.shape == y_j.shape
    assert np.allclose(y_r, y_j, atol=2e-3), np.abs(y_r - y_j).max()


def test_sam_end_to_end_prompts():
    """Facade flow on a small ViT-B-shaped model: set_image → point/box prompts."""
    from yolo_tpu.models.sam.build import _build_sam
    from yolo_tpu.models.sam.predict import SAMPredictor

    model = _build_sam(32, 2, 2, (1,), img_size=128)
    pred = SAMPredictor(model)
    img = np.random.default_rng(0).integers(0, 255, (96, 120, 3), np.uint8)
    pred.set_image(img)
    r = pred(points=[[40, 40]], labels=[1])
    assert r.masks.data.shape == (3, 96, 120)  # multimask
    assert r.iou_scores.shape == (3,)
    r2 = pred(bboxes=[[10, 10, 80, 80]], multimask_output=False)
    assert r2.masks.data.shape == (1, 96, 120)


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_mobile_sam_tinyvit_parity():
    """TinyViT encoder vs the reference torch implementation (small input)."""
    add_reference_to_path()
    import torch
    from ultralytics.models.sam.modules.tiny_encoder import TinyViT as RefTiny

    from yolo_tpu.models.sam.tiny_encoder import TinyViT
    from yolo_tpu.nn.torch_import import state_dict_to_params
    import jax
    import jax.numpy as jnp

    torch.manual_seed(7)
    # the last stage must be 320/448/576 wide — the reference PatchMerging
    # switches to stride 1 only for those, keeping the 3rd/4th stage resolutions
    # equal like the shipped MobileSAM config
    ref = RefTiny(img_size=128, in_chans=3, num_classes=1000, embed_dims=[16, 32, 48, 320],
                  depths=[1, 1, 2, 1], num_heads=[1, 2, 3, 4], window_sizes=[4, 4, 8, 4],
                  mlp_ratio=2.0, drop_rate=0.0, drop_path_rate=0.0, use_checkpoint=False,
                  mbconv_expand_ratio=2.0, local_conv_size=3, layer_lr_decay=0.8)
    ref.eval()
    with torch.no_grad():  # randomize the zero-init attention biases
        for m in ref.modules():
            if hasattr(m, "attention_biases"):
                m.attention_biases.normal_(0, 0.5)
    ref.eval()  # refresh the eval-mode bias cache
    ours = TinyViT(img_size=128, embed_dims=(16, 32, 48, 320), depths=(1, 1, 2, 1),
                   num_heads=(1, 2, 3, 4), window_sizes=(4, 4, 8, 4), mlp_ratio=2.0,
                   mbconv_expand_ratio=2.0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = state_dict_to_params(sd, ours.init(np.random.default_rng(0)))

    rng = np.random.default_rng(8)
    x = rng.normal(0, 1, (1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        y_r = ref(torch.tensor(x)).numpy()
    y_j = np.asarray(jax.jit(ours.__call__)(params, jnp.asarray(x.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    assert y_r.shape == y_j.shape, (y_r.shape, y_j.shape)
    assert np.allclose(y_r, y_j, atol=2e-3), np.abs(y_r - y_j).max()


def test_mobile_sam_end_to_end():
    from yolo_tpu.models.sam.build import build_mobile_sam
    from yolo_tpu.models.sam.predict import SAMPredictor

    model = build_mobile_sam(img_size=128)
    pred = SAMPredictor(model)
    img = np.random.default_rng(0).integers(0, 255, (90, 110, 3), np.uint8)
    pred.set_image(img)
    r = pred(points=[[50, 40]], labels=[1])
    assert r.masks.data.shape == (3, 90, 110)


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_sam2_hiera_parity():
    add_reference_to_path()
    import torch
    from ultralytics.models.sam.modules.encoders import Hiera as RefHiera

    from yolo_tpu.models.sam.sam2 import Hiera
    from yolo_tpu.nn.torch_import import state_dict_to_params
    import jax
    import jax.numpy as jnp

    torch.manual_seed(4)
    kw = dict(embed_dim=32, num_heads=1, stages=(1, 1, 2, 1), window_spec=(4, 2, 4, 2),
              global_att_blocks=(3,), window_pos_embed_bkg_spatial_size=(7, 7))
    ref = RefHiera(**kw)
    ref.eval()
    with torch.no_grad():
        ref.pos_embed.normal_(0, 0.3)
        ref.pos_embed_window.normal_(0, 0.3)
    ours = Hiera(**kw)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = state_dict_to_params(sd, ours.init(np.random.default_rng(0)))

    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        outs_r = [o.numpy() for o in ref(torch.tensor(x))]
    outs_j = jax.jit(ours.__call__)(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(outs_r) == len(outs_j) == 4
    for o_r, o_j in zip(outs_r, outs_j):
        o_j = np.asarray(o_j).transpose(0, 3, 1, 2)
        assert o_r.shape == o_j.shape, (o_r.shape, o_j.shape)
        assert np.allclose(o_r, o_j, atol=3e-3), np.abs(o_r - o_j).max()


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_sam2_fpn_neck_parity():
    add_reference_to_path()
    import torch
    from ultralytics.models.sam.modules.encoders import FpnNeck as RefNeck

    from yolo_tpu.models.sam.sam2 import FpnNeck
    from yolo_tpu.nn.torch_import import state_dict_to_params
    import jax.numpy as jnp

    torch.manual_seed(5)
    ref = RefNeck(d_model=32, backbone_channel_list=[128, 64, 32, 16], fpn_top_down_levels=[2, 3],
                  fpn_interp_model="nearest")
    ref.eval()
    ours = FpnNeck(32, [128, 64, 32, 16])
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = state_dict_to_params(sd, ours.init(np.random.default_rng(0)))

    rng = np.random.default_rng(6)
    xs = [rng.normal(0, 1, (1, c, 32 // (2**i), 32 // (2**i))).astype(np.float32) for i, c in enumerate([16, 32, 64, 128])]
    with torch.no_grad():
        out_r, _ = ref([torch.tensor(x) for x in xs])
    out_j = ours(params, [jnp.asarray(x.transpose(0, 2, 3, 1)) for x in xs])
    for o_r, o_j in zip(out_r, out_j):
        o_j = np.asarray(o_j).transpose(0, 3, 1, 2)
        assert np.allclose(o_r.numpy(), o_j, atol=1e-4), np.abs(o_r.numpy() - o_j).max()


@pytest.mark.skipif(not reference_available(), reason="reference oracle not present")
def test_sam2_mask_decoder_parity():
    add_reference_to_path()
    import torch
    from ultralytics.models.sam.modules.decoders import SAM2MaskDecoder as RefMD
    from ultralytics.models.sam.modules.transformer import TwoWayTransformer as RefTWT

    from yolo_tpu.models.sam.modules import TwoWayTransformer
    from yolo_tpu.models.sam.sam2 import SAM2MaskDecoder
    from yolo_tpu.nn.torch_import import state_dict_to_params
    import jax.numpy as jnp

    torch.manual_seed(6)
    ref = RefMD(transformer_dim=64, transformer=RefTWT(depth=2, embedding_dim=64, num_heads=4, mlp_dim=128),
                num_multimask_outputs=3, iou_head_depth=3, iou_head_hidden_dim=64,
                use_high_res_features=True, pred_obj_scores=True, pred_obj_scores_mlp=True,
                use_multimask_token_for_obj_ptr=True)
    ref.eval()
    ours = SAM2MaskDecoder(64, 3, 3, 64, transformer=TwoWayTransformer(2, 64, 4, 128),
                           use_high_res_features=True, pred_obj_scores=True, pred_obj_scores_mlp=True)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = state_dict_to_params(sd, ours.init(np.random.default_rng(0)))

    rng = np.random.default_rng(7)
    emb = rng.normal(0, 1, (1, 64, 8, 8)).astype(np.float32)
    pe = rng.normal(0, 1, (1, 64, 8, 8)).astype(np.float32)
    sparse = rng.normal(0, 1, (2, 3, 64)).astype(np.float32)
    dense = rng.normal(0, 1, (2, 64, 8, 8)).astype(np.float32)
    # high-res feats arrive pre-projected: td/8 at stride 4, td/4 at stride 8
    s0 = rng.normal(0, 1, (2, 8, 32, 32)).astype(np.float32)
    s1 = rng.normal(0, 1, (2, 16, 16, 16)).astype(np.float32)

    with torch.no_grad():
        m_r, i_r, _, o_r = ref(torch.tensor(emb), torch.tensor(pe), torch.tensor(sparse), torch.tensor(dense),
                               multimask_output=True, repeat_image=True,
                               high_res_features=[torch.tensor(s0), torch.tensor(s1)])
    m_j, i_j, o_j = ours(params, jnp.asarray(emb.transpose(0, 2, 3, 1)), jnp.asarray(pe.transpose(0, 2, 3, 1)),
                         jnp.asarray(sparse), jnp.asarray(dense.transpose(0, 2, 3, 1)), True,
                         high_res_features=(jnp.asarray(s0.transpose(0, 2, 3, 1)), jnp.asarray(s1.transpose(0, 2, 3, 1))))
    assert np.allclose(m_r.numpy(), np.asarray(m_j), atol=3e-3), np.abs(m_r.numpy() - np.asarray(m_j)).max()
    assert np.allclose(i_r.numpy(), np.asarray(i_j), atol=1e-3)
    assert np.allclose(o_r.numpy(), np.asarray(o_j), atol=1e-3)


def test_sam_generate_everything():
    """Point-grid segment-everything (ref: predict.py generate:329): grid
    prompts -> conf/stability filters -> NMS -> Results at original size."""
    from yolo_tpu.models.sam.build import _build_sam

    model = _build_sam(32, 2, 2, (1,), img_size=128)
    from yolo_tpu.models.sam.predict import SAMPredictor

    pred = SAMPredictor(model)
    img = np.random.default_rng(0).integers(0, 255, (96, 128, 3), np.uint8)
    r = pred.generate(img, points_stride=4, points_batch_size=8,
                      conf_thres=0.0, stability_score_thresh=0.0, nms_thresh=0.7)
    assert r.masks is not None
    if len(r.masks.data):
        assert r.masks.data.shape[1:] == (96, 128)
        assert r.boxes.xyxy.shape[0] == len(r.masks.data)


def test_sam2_facade_builds_and_video_predictor():
    """SAM('sam2_t') resolves through SAM_BUILDERS (it raised ValueError
    before round 3, making the documented video path unreachable)."""
    from yolo_tpu.models.sam.model import SAM
    from yolo_tpu.models.sam.sam2 import SAM2Model

    sam = SAM("sam2_t", img_size=128)
    assert isinstance(sam.model, SAM2Model)
    vp = sam.video_predictor(num_frames=4)
    assert vp is not None
