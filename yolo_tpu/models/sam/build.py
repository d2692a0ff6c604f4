"""SAM model builders (ref: ultralytics/models/sam/build.py _build_sam:121).

Checkpoints: released SAM .pth state_dicts import via
yolo_tpu.nn.torch_import.state_dict_to_params (the param trees mirror torch
names); in this zero-egress environment models build randomly initialized.
"""

from __future__ import annotations

from yolo_tpu.models.sam.modules import ImageEncoderViT, MaskDecoder, PromptEncoder, SAMModel, TwoWayTransformer


def _build_sam(encoder_embed_dim, encoder_depth, encoder_num_heads, encoder_global_attn_indexes, img_size=1024):
    prompt_embed_dim = 256
    vit_patch_size = 16
    grid = img_size // vit_patch_size
    image_encoder = ImageEncoderViT(
        img_size=img_size,
        patch_size=vit_patch_size,
        embed_dim=encoder_embed_dim,
        depth=encoder_depth,
        num_heads=encoder_num_heads,
        mlp_ratio=4,
        qkv_bias=True,
        use_rel_pos=True,
        global_attn_indexes=tuple(encoder_global_attn_indexes),
        window_size=14,
        out_chans=prompt_embed_dim,
    )
    return SAMModel(
        image_encoder=image_encoder,
        prompt_encoder=PromptEncoder(
            embed_dim=prompt_embed_dim,
            image_embedding_size=(grid, grid),
            input_image_size=(img_size, img_size),
            mask_in_chans=16,
        ),
        mask_decoder=MaskDecoder(
            transformer_dim=prompt_embed_dim,
            num_multimask_outputs=3,
            transformer=TwoWayTransformer(depth=2, embedding_dim=prompt_embed_dim, num_heads=8, mlp_dim=2048),
            iou_head_depth=3,
            iou_head_hidden_dim=256,
        ),
    )


def build_mobile_sam(img_size=1024):
    """MobileSAM: TinyViT-5M encoder + the standard SAM prompt/mask heads
    (ref: build.py build_mobile_sam:102)."""
    from yolo_tpu.models.sam.tiny_encoder import TinyViT

    prompt_embed_dim = 256
    grid = img_size // 16
    return SAMModel(
        image_encoder=TinyViT(img_size=img_size, embed_dims=(64, 128, 160, 320), depths=(2, 2, 6, 2),
                              num_heads=(2, 4, 5, 10), window_sizes=(7, 7, 14, 7)),
        prompt_encoder=PromptEncoder(
            embed_dim=prompt_embed_dim, image_embedding_size=(grid, grid),
            input_image_size=(img_size, img_size), mask_in_chans=16,
        ),
        mask_decoder=MaskDecoder(
            transformer_dim=prompt_embed_dim, num_multimask_outputs=3,
            transformer=TwoWayTransformer(depth=2, embedding_dim=prompt_embed_dim, num_heads=8, mlp_dim=2048),
            iou_head_depth=3, iou_head_hidden_dim=256,
        ),
    )


def build_sam_vit_b(img_size=1024):
    """SAM ViT-B (ref: build.py build_sam_vit_b:45)."""
    return _build_sam(768, 12, 12, (2, 5, 8, 11), img_size)


def build_sam_vit_l(img_size=1024):
    """SAM ViT-L."""
    return _build_sam(1024, 24, 16, (5, 11, 17, 23), img_size)


def build_sam_vit_h(img_size=1024):
    """SAM ViT-H."""
    return _build_sam(1280, 32, 16, (7, 15, 23, 31), img_size)


def _sam2(name):  # lazy: keep sam2's Hiera import cost out of SAM1 builds
    def build(img_size=1024):
        from yolo_tpu.models.sam import sam2

        return getattr(sam2, f"build_sam2_{name}")(img_size)

    return build


SAM_BUILDERS = {
    "sam_b": build_sam_vit_b,
    "sam_l": build_sam_vit_l,
    "sam_h": build_sam_vit_h,
    "mobile_sam": build_mobile_sam,
    "sam2_t": _sam2("t"),
    "sam2_s": _sam2("s"),
    "sam2_b": _sam2("b"),
}
