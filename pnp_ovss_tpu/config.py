"""Configuration tree for the PnP-OVSS TPU framework.

One dataclass tree replaces the reference's three coexisting config systems
(argparse flags in the drivers, LAVIS OmegaConf YAML, yacs in the vendored
subrepo) and surfaces every hidden in-code constant as a named knob with the
reference default:

- drop count 10/round        (reference driver ``save_len = 10`` at :643)
- CRF constants              (reference driver :1036-1041)
- GPT probability cutoff 70  (reference driver :764-767)
- blur scale 0.05            (reference driver :1149)
- ``max_txt_len`` 500        (reference blip_image_text_matching.py:48)
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """ViT image-encoder hyperparameters (reference vit.py:467-533)."""

    image_size: int = 336
    patch_size: int = 16
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-6
    dtype: str = "bfloat16"  # compute dtype; params stay float32

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def seq_len(self) -> int:
        """Patch tokens + the image CLS token."""
        return self.num_patches + 1

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclasses.dataclass(frozen=True)
class BertConfig:
    """BERT fusion-encoder hyperparameters (reference med.py; BLIP med config).

    Every layer carries a cross-attention block over the ViT patch embeddings
    (reference med.py:413-524).
    """

    vocab_size: int = 30524  # BERT-base 30522 + BLIP's [DEC]/[ENC] tokens
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    encoder_width: int = 1024  # ViT-L hidden size (cross-attn K/V input dim)
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0
    enc_token_id: int = 30523  # BLIP [ENC] (text/wordpiece.BLIP_ENC_ID)
    dtype: str = "bfloat16"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """BLIP-ITM assembly (reference blip_image_text_matching.py:19-314)."""

    vit: ViTConfig = dataclasses.field(default_factory=ViTConfig)
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    embed_dim: int = 256  # ITC projection dim (blip_itm_large.yaml:23)
    # Reference hard-codes 500 (blip_image_text_matching.py:48). TPU-native
    # default pads captions to a small static bucket instead; ITM logits are
    # identical because padded positions are masked out of self-attention.
    max_text_len: int = 128

    @classmethod
    def tiny(cls) -> "ModelConfig":
        """Small config for unit tests (CPU-runnable, same topology)."""
        return cls(
            vit=ViTConfig(
                image_size=48,
                patch_size=16,
                hidden_size=32,
                num_layers=2,
                num_heads=2,
                dtype="float32",
            ),
            bert=BertConfig(
                vocab_size=256,  # headroom over the toy test vocab (~100)
                hidden_size=32,
                num_layers=2,
                num_heads=2,
                intermediate_size=64,
                max_position_embeddings=64,
                encoder_width=32,
                enc_token_id=2,
                dtype="float32",
            ),
            embed_dim=16,
            max_text_len=16,
        )


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """OpenAI CLIP vision tower (ViT-L/14-336: the search subsystem's
    independent reward model, reference driver :1370-1372)."""

    image_size: int = 336
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    embed_dim: int = 768  # projection dim shared with the text tower
    layer_norm_eps: float = 1e-5
    dtype: str = "bfloat16"

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    """OpenAI CLIP text tower (causal transformer, BPE vocab 49408)."""

    vocab_size: int = 49408
    context_length: int = 77
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    embed_dim: int = 768
    layer_norm_eps: float = 1e-5
    dtype: str = "bfloat16"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    """CLIP dual encoder (ViT-L-14-336 by default)."""

    vision: CLIPVisionConfig = dataclasses.field(
        default_factory=CLIPVisionConfig
    )
    text: CLIPTextConfig = dataclasses.field(default_factory=CLIPTextConfig)

    @classmethod
    def tiny(cls) -> "CLIPConfig":
        return cls(
            vision=CLIPVisionConfig(
                image_size=28, patch_size=14, hidden_size=32, num_layers=2,
                num_heads=2, embed_dim=16, dtype="float32",
            ),
            text=CLIPTextConfig(
                # Headroom over the toy BPE vocab (512 byte tokens + merges;
                # OOB embedding ids silently produce NaN).
                vocab_size=1024, context_length=16, hidden_size=32,
                num_layers=2, num_heads=2, embed_dim=16, dtype="float32",
            ),
        )


@dataclasses.dataclass(frozen=True)
class DropConfig:
    """Iterative salience drop (the paper's key trick).

    Reference: drop loop in PnP_OVSS_0514_updated_segmentation.py:564-722.
    """

    num_rounds: int = 4  # --drop_iter
    patches_per_round: int = 10  # save_len=10 (driver :643)
    # Reference aggregation double-counts round 0 (driver :716-721):
    # agg is initialised to round 0's map and then += every round incl. 0.
    double_count_round0: bool = True


@dataclasses.dataclass(frozen=True)
class AttributionConfig:
    """GradCAM source selection (reference :572-574, :619-620)."""

    layer: int = 8  # --max_att_block_num, 1-indexed BERT layer
    head: int = 9  # --prune_att_head, 0-indexed attention head
    # When True, capture all layers x heads (search subsystem,
    # compute_gradcam_ensemble reference :386-457). Costs ~12x memory.
    ensemble: bool = False


@dataclasses.dataclass(frozen=True)
class CRFConfig:
    """DenseCRF mean-field constants (reference driver :1036-1041)."""

    num_iters: int = 10
    pos_w: float = 7.0
    pos_xy_std: float = 3.0
    bi_w: float = 10.0
    bi_xy_std: float = 50.0
    bi_rgb_std: float = 5.0


@dataclasses.dataclass(frozen=True)
class PostprocessConfig:
    """Blur + CRF selection (reference --postprocess, driver :1002-1028)."""

    mode: str = "blur+crf"  # "", "blur", "crf", "blur+crf"
    blur_scale: float = 0.05  # sigma = scale * max(H, W) (driver :1149)
    crf: CRFConfig = dataclasses.field(default_factory=CRFConfig)
    # "host": per-image numpy/C++ path at exact GT resolution (parity mode).
    # "device": batched on-device path at a bucketed resolution (fast mode).
    backend: str = "device"
    # Bilateral message support stride for the device CRF (1 = exact;
    # s > 1 = grid anchors every s pixels; see ops/crf.py).
    # "strided": rectangular quadrature over the anchor grid (N*M exps per
    # iter). "nystrom": low-rank K_NA (K_AA+ridge)^-1 K_AN reconstruction
    # through the same anchors (2*N*M exps).
    #
    # Default strided s=4. Nystrom was briefly the default on small-scene
    # (64-80px) evidence, but at the production bucket (224px) with
    # photo-like RGB noise the bilateral kernel is near-diagonal (pixel
    # colours differ from neighbours by ~2.4 srgb) and a ~1k-anchor
    # low-rank reconstruction collapses: 0.35-0.45 label agreement vs the
    # exact CRF, where strided quadrature holds 0.97-0.99 (measured on
    # TPU, NOTES.md round-2 ledger). Strided s=4 = 98.0% agreement at
    # NM/16 exps; s=2/s=3 buy +0.6-0.8 points at 4x/1.8x the exps
    # (--crf_subsample). Real-data mIoU gate: scripts/run_accuracy_gate.sh
    # (assets not in this environment); synthetic end-to-end gate:
    # scripts/synthetic_postprocess_gate.py.
    bilateral_subsample: int = 4
    bilateral_mode: str = "strided"
    nystrom_ridge: float = 1e-2
    # Scale the CRF's spatial stds per image by bucket / max(gt_h, gt_w)
    # so the bucket-resolution CRF has the same RELATIVE spatial reach as
    # the reference's exact-GT-resolution CRF (pixel-unit constants,
    # driver :1036-1041). False = raw pixel units at the bucket (round-1
    # behaviour; reaches ~2x further on a 500px image at bucket 224).
    crf_xy_gt_scale: bool = True


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """End-to-end segmentation pipeline configuration.

    Mirrors the public flag surface of the reference drivers (:57-106)
    plus the hidden constants, with reference defaults from Run_seg.sh.
    """

    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    attribution: AttributionConfig = dataclasses.field(
        default_factory=AttributionConfig
    )
    drop: DropConfig = dataclasses.field(default_factory=DropConfig)
    postprocess: PostprocessConfig = dataclasses.field(
        default_factory=PostprocessConfig
    )

    data_type: str = "voc"  # voc | psc | ade20k | coco_object | coco_stuff
    batch_size: int = 35
    threshold: float = 0.15  # mask binarization (--threshold)
    gpt_prob_cutoff: int = 70  # keep GPT classes with prob > this (:764-767)
    max_classes: int = 28  # static padding for ragged per-image class counts
    # Context datasets (psc/ade20k/coco_stuff) skip the synthesized background
    # channel when >= this many classes were proposed (driver :372-379).
    context_background_max_classes: int = 3

    @property
    def img_size(self) -> int:
        return self.model.vit.image_size

    @classmethod
    def reference_default(cls) -> "PipelineConfig":
        """The Run_seg.sh configuration (336px, layer 8 head 9, 4 drops)."""
        return cls()

    @classmethod
    def tiny(cls) -> "PipelineConfig":
        return cls(
            model=ModelConfig.tiny(),
            drop=DropConfig(num_rounds=2, patches_per_round=2),
            batch_size=2,
            max_classes=4,
        )


# Dataset category-count table (background channel included where the
# reference includes it; see Calculate_mIoU.py:23-201).
NUM_CLASSES = {
    "voc": 21,
    "psc": 60,
    "ade20k": 151,
    "coco_object": 91,
    "coco_stuff": 183,
}
