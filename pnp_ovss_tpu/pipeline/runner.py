"""End-to-end segmentation runner: one jitted attribution graph + one jitted
postprocess graph, batched and mesh-sharded.

Replaces the reference's per-batch orchestration (save_img_union_attention,
driver :290-521) with two device programs:

ATTRIBUTION (per batch, SPMD over the mesh):
  salience-drop scan (pipeline/drop.py) -> token->class pooling
  (ops/segment_pool.py) -> threshold (pipeline/masks.py) -> bilinear
  upsample to a fixed bucket resolution. Produces the 1-drop map (round 0,
  rescaled 0-1 — reference :362) and the aggregated N-drop map (no rescale —
  reference :441) for every image.

POSTPROCESS (per batch):
  background channel -> Gaussian blur + per-channel min-max -> mean-field
  DenseCRF (ops/crf.py) -> argmax labels at bucket resolution.
  Per-image background enablement and class-validity are data, not shape:
  disabled channels are driven to -1e30 after the blur so softmax/argmax
  ignore them, keeping one static graph for object and context datasets.

Host finishes per image: nearest-resize labels to ground-truth resolution,
channel->category remap, confusion histogram. In parity mode the resize +
postprocess run at exact GT resolution instead (slower, shape-bucketed).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pnp_ovss_tpu.attribution import gradcam as gradcam_mod
from pnp_ovss_tpu.attribution.gradcam import gradcam_from_tap
from pnp_ovss_tpu.config import PipelineConfig
from pnp_ovss_tpu.models.blip_itm import BlipITM
from pnp_ovss_tpu.ops import crf as crf_mod
from pnp_ovss_tpu.ops.blur import blur_and_minmax
from pnp_ovss_tpu.ops.segment_pool import pool_token_maps
from pnp_ovss_tpu.parallel import mesh as mesh_mod
from pnp_ovss_tpu.pipeline import drop as drop_mod
from pnp_ovss_tpu.pipeline import masks as masks_mod

_DISABLED = -1e30


@dataclasses.dataclass
class BatchResult:
    """Per-batch outputs mirroring the reference's two evaluation variants."""

    labels_r0: np.ndarray  # [B, Hb, Wb] int32 channel indices (1-drop)
    labels_agg: np.ndarray  # [B, Hb, Wb] int32 channel indices (N-drop agg)
    num_classes: np.ndarray  # [B]
    bg_enable: Optional[np.ndarray] = None  # [B] bool
    maps_r0: Optional[np.ndarray] = None  # [B, K, Hb, Wb] (viz mode)
    maps_agg: Optional[np.ndarray] = None
    grid_r0: Optional[np.ndarray] = None  # [B, K, g, g] (parity mode)
    grid_agg: Optional[np.ndarray] = None


@dataclasses.dataclass
class PendingBatch:
    """A dispatched-but-unmaterialised batch (device arrays only).

    All device programs for the batch are already enqueued; calling
    ``result()`` blocks on the device->host transfer. Holding at most one
    PendingBatch while dispatching the next batch double-buffers the
    pipeline: batch N+1's attribution queues behind batch N's postprocess
    with no host-side gap (the reference's loop is fully synchronous,
    driver :213-257).
    """

    labels_r0_dev: jax.Array
    labels_agg_dev: jax.Array
    num_classes: np.ndarray
    bg_enable: np.ndarray
    maps_r0_dev: Optional[jax.Array] = None
    maps_agg_dev: Optional[jax.Array] = None
    grid_r0_dev: Optional[jax.Array] = None
    grid_agg_dev: Optional[jax.Array] = None

    def result(self, *, materialize_labels: bool = True) -> BatchResult:
        """materialize_labels=False keeps the label arrays on device (for
        the --eval_at_bucket path, where hists are computed in-graph and
        the predicted masks never cross to the host)."""
        to_host = np.asarray if materialize_labels else (lambda x: x)

        def opt(x):
            return None if x is None else np.asarray(x)

        return BatchResult(
            labels_r0=to_host(self.labels_r0_dev),
            labels_agg=to_host(self.labels_agg_dev),
            num_classes=self.num_classes,
            bg_enable=self.bg_enable,
            maps_r0=opt(self.maps_r0_dev),
            maps_agg=opt(self.maps_agg_dev),
            grid_r0=opt(self.grid_r0_dev),
            grid_agg=opt(self.grid_agg_dev),
        )


class SegmentationRunner:
    def __init__(
        self,
        cfg: PipelineConfig,
        params,
        *,
        mesh=None,
        attn_impl: str = "pallas",
        bucket_size: int = 192,  # round-3 default (SYNTH_GATE + bench)
        bilateral_impl: str = "pallas",
        encode_parallel: Optional[str] = None,
        pp_microbatches: Optional[int] = None,
    ):
        """encode_parallel: None (default) runs the ViT encode data-
        parallel (GSPMD over ``mesh``, Megatron TP when the mesh has a
        ``model`` axis). "sp" shards the encode's TOKEN axis over the
        mesh's ``model`` axis (parallel/sequence.py: per-layer K/V
        all-gathers; the long-context strategy the reference lacks,
        SURVEY §5); "pp" shards the block stack's LAYER axis
        (parallel/pipeline.py GPipe schedule; ``pp_microbatches``
        overrides the per-device microbatch count, default = pipeline
        depth). Both need a 2D (data, model) mesh (make_mesh_2d) and
        produce bit-identical outputs to the unsharded kernel-path
        encode (tests/test_sequence_parallel.py,
        tests/test_pipeline_parallel.py)."""
        self.cfg = cfg
        if encode_parallel not in (None, "sp", "pp"):
            raise ValueError(
                f"encode_parallel must be None, 'sp' or 'pp'; "
                f"got {encode_parallel!r}")
        if encode_parallel is not None:
            sizes = dict(zip(mesh.axis_names, mesh.devices.shape)) \
                if mesh is not None else {}
            if mesh_mod.MODEL_AXIS not in sizes:
                raise ValueError(
                    f"encode_parallel={encode_parallel!r} needs a 2D "
                    f"(data, model) mesh (parallel.mesh.make_mesh_2d)")
        # Under a mesh, commit the weights with their partition specs up
        # front: replicated on a 1D data mesh (the reference's DDP layout,
        # driver :1218), Megatron column/row-sharded along the `model` axis
        # of a 2D (data, model) mesh (parallel/mesh.py) — GSPMD propagates
        # the head sharding through the attention from these specs alone.
        # sp uses the model axis for tokens (weights replicate); pp
        # layer-shards the ViT block stack over it.
        strategy = {None: "megatron", "sp": "replicated",
                    "pp": "pipeline"}[encode_parallel]
        self.params = (
            params if mesh is None
            else mesh_mod.shard_params(mesh, params, strategy=strategy)
        )
        self.mesh = mesh
        self.attn_impl = attn_impl
        self.encode_parallel = encode_parallel
        self.pp_microbatches = pp_microbatches
        self.bucket = bucket_size
        self.bilateral_impl = bilateral_impl

        layer0 = cfg.attribution.layer - 1  # 1-indexed flag -> 0-indexed
        self.model = BlipITM(
            cfg.model, capture_layers=(layer0,), attn_impl=attn_impl
        )
        # The drop loop runs as a host loop over a single jitted round step
        # (pipeline/drop.py): compiling the whole scan-of-vjp in one program
        # took tens of minutes on the TPU backend.
        self._round_step = drop_mod.make_split_round_step(
            self._embed_fn,
            self._bert_gradcam_fn,
            cfg=cfg.drop,
            grid=cfg.model.vit.grid,
            patch_size=cfg.model.vit.patch_size,
        )
        self._finish_maps = jax.jit(self._finish_maps_fn)
        self._post = jax.jit(self._post_fn)
        self._normalize = jax.jit(self._normalize_fn)

    def _normalize_fn(self, images_u8):
        """[B, S, S, 3] uint8 -> CLIP-normalised bf16 (data/transforms.py
        constants; reference Dataset.py:434-443)."""
        from pnp_ovss_tpu.data.transforms import CLIP_MEAN, CLIP_STD

        x = images_u8.astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
        return x.astype(jnp.bfloat16)

    # ------------------------------------------------------------------
    # Device graphs
    # ------------------------------------------------------------------
    def _gradcam_fn(self, images, ids, mask):
        cfg = self.cfg

        def apply_fn(p, im, i, m, cross_tap):
            return self.model.apply(p, im, i, m, cross_tap=cross_tap)

        gc, logits = gradcam_from_tap(
            apply_fn,
            self.params,
            images,
            ids,
            mask,
            num_capture_layers=1,
            num_heads=cfg.model.bert.num_heads,
            num_image_tokens=cfg.model.vit.seq_len,
            grid=cfg.model.vit.grid,
        )
        return gc[0, :, cfg.attribution.head], logits

    def _embed_fn(self, params, images):
        from pnp_ovss_tpu.models.blip_itm import BlipITM

        if self.encode_parallel is None:
            return self.model.apply(
                params, images, method=BlipITM.encode_image)
        # Sequence-/pipeline-parallel encode (the drop loop's hot 4x-
        # repeated program): shard_map over the 2D mesh; output comes
        # back batch-sharded exactly like the data-parallel encode, so
        # the BERT/gradcam/post stages downstream are oblivious.
        vparams = {"params": params["params"]["visual_encoder"]}
        vit_cfg = self.cfg.model.vit
        if self.encode_parallel == "sp":
            from pnp_ovss_tpu.parallel.sequence import encode_images_sp

            return encode_images_sp(
                vit_cfg, vparams, images, self.mesh, impl=self.attn_impl)
        from pnp_ovss_tpu.parallel.pipeline import encode_images_pp

        return encode_images_pp(
            vit_cfg, vparams, images, self.mesh, impl=self.attn_impl,
            num_microbatches=self.pp_microbatches)

    def _bert_gradcam_fn(self, params, image_embeds, ids, mask):
        cfg = self.cfg

        def apply_embeds_fn(p, embeds, i, m, cross_tap):
            from pnp_ovss_tpu.models.blip_itm import BlipITM

            return self.model.apply(
                p, embeds, i, m, cross_tap=cross_tap,
                method=BlipITM.itm_from_embeds,
            )

        gc, logits = gradcam_mod.gradcam_from_embeds(
            apply_embeds_fn,
            params,
            image_embeds,
            ids,
            mask,
            num_capture_layers=1,
            num_heads=cfg.model.bert.num_heads,
            grid=cfg.model.vit.grid,
        )
        return gc[0, :, cfg.attribution.head], logits

    def _finish_maps_fn(self, gc0, agg, pool_matrix):
        """Pool + threshold + bucket-upsample both gradcam variants.

        Also returns the grid-resolution thresholded maps (pre-upsample,
        raw): the host parity path resizes THOSE to GT resolution in one
        bilinear step, matching the reference (driver :358-360) — chaining
        grid->bucket->GT resamples would not. They are intermediates of
        the bucket path, so returning them adds no compute; the transfer
        only happens when the caller materialises them."""
        cfg = self.cfg
        out = []
        grids = []
        for gc, rescale in ((gc0, True), (agg, False)):
            pooled = pool_token_maps(pool_matrix, gc)
            masked = masks_mod.threshold_maps(pooled, cfg.threshold)
            grids.append(masked)
            up = masks_mod.upsample_maps(
                masked, self.bucket, self.bucket, rescale=rescale
            )
            out.append(up)
        return tuple(out), tuple(grids)

    def _attribution(self, images, ids, mask, pool_matrix):
        """[B,S,S,3],[B,T],[B,T],[B,K,T-1] ->
        ((maps_r0, maps_agg) [B,K,Hb,Wb], (grid_r0, grid_agg) [B,K,g,g])."""
        cfg = self.cfg
        step = functools.partial(self._round_step, self.params)
        gc0, agg = drop_mod.run_drop_rounds(
            step, images, ids, mask,
            cfg=cfg.drop, num_patches=cfg.model.vit.grid**2,
        )
        return self._finish_maps(gc0, agg, pool_matrix)

    def _post_fn(self, maps_r0, maps_agg, bg_enable, class_valid,
                 images_rgb, xy_scale):
        """maps_* [B,K,Hb,Wb]; bg_enable [B] bool; class_valid [B,K] bool;
        images_rgb [B, Hb, Wb, 3] 0-255; xy_scale [B, 2] f32 (per-image
        per-axis (bucket/gt_w, bucket/gt_h) ratios scaling the CRF's
        spatial stds so the bucket CRF matches the reference's
        GT-resolution reach on both axes, ops/crf.py) ->
        labels [B, 2, Hb, Wb] (variant axis: 0 = round-0, 1 = aggregated).

        Both variants of each image run through ONE CRF kernel pass
        (mean_field_crf_variants): the bilateral matmul pads its value
        lanes to 128 and C ~ 29, so the second variant's channels ride
        along for free, and the image-dependent kernels/degrees/anchor
        inverse are computed once per image instead of twice. The [B, 2,
        ...] layout keeps each image's pair on one device under a mesh."""
        cfg = self.cfg
        maps = jnp.stack([maps_r0, maps_agg], axis=1)  # [B, 2, K, Hb, Wb]
        b, _, k, hb, wb = maps.shape
        maps = jnp.where(class_valid[:, None, :, None, None], maps, 0.0)
        wbg = masks_mod.add_background(maps)  # [B, 2, K+1, Hb, Wb]

        mode = cfg.postprocess.mode
        if "blur" in mode:
            sigma = cfg.postprocess.blur_scale * max(hb, wb)
            # bf16 blur matmuls (MXU rate); min-max renormalises after.
            wbg = blur_and_minmax(wbg.astype(jnp.bfloat16), sigma)

        # Disable the background channel where the context rule says so and
        # padded class slots everywhere (reference builds exactly-K channel
        # stacks instead; :372-379).
        chan_valid = jnp.concatenate(
            [bg_enable[:, None], class_valid], axis=1
        )  # [B, K+1]
        wbg = jnp.where(chan_valid[:, None, :, None, None], wbg, _DISABLED)

        if "crf" in mode:
            crf_cfg = cfg.postprocess.crf
            crf_kw = dict(
                bilateral_impl=self.bilateral_impl,
                bilateral_subsample=cfg.postprocess.bilateral_subsample,
                bilateral_mode=cfg.postprocess.bilateral_mode,
                nystrom_ridge=cfg.postprocess.nystrom_ridge,
            )

            def one(args):
                logits2, img, scale = args
                return crf_mod.mean_field_crf_variants(
                    logits2, img.astype(jnp.float32), crf_cfg,
                    xy_scale=scale, **crf_kw
                )

            import os

            # Chunked map: vmap within chunks of 4 batches the CRF's many
            # small per-image ops (degrees, normalisers, softmaxes) while
            # keeping peak memory at chunk_size kernels (315 MB each at
            # 224/s=4). Measured: 31.8 -> 32.7 img/s end to end vs the
            # sequential map; PNP_CRF_MAP_BATCH=1 restores it.
            chunk = int(os.environ.get("PNP_CRF_MAP_BATCH", "4"))
            labels = jax.lax.map(
                one, (wbg, images_rgb, xy_scale),
                batch_size=(chunk if chunk > 1 else None),
            )  # [B, 2, Hb, Wb]
        else:
            labels = masks_mod.argmax_labels(wbg)
        # Channel indices fit in uint8 (K+1 <= 29): quarters the
        # device->host transfer over the tunnel.
        return labels.astype(jnp.uint8)

    # ------------------------------------------------------------------
    # Host orchestration
    # ------------------------------------------------------------------
    def run_batch(
        self,
        images: np.ndarray,
        caption_batch,
        images_rgb_bucket: np.ndarray,
        *,
        return_maps: bool = False,
        gt_sizes=None,
    ) -> BatchResult:
        """Dispatch one batch and block for its results (see submit_batch)."""
        return self.submit_batch(
            images, caption_batch, images_rgb_bucket,
            return_maps=return_maps, gt_sizes=gt_sizes,
        ).result()

    def submit_batch(
        self,
        images: np.ndarray,  # [B, S, S, 3] normalised
        caption_batch,  # text.captions.CaptionBatch
        images_rgb_bucket: np.ndarray,  # [B, Hb, Wb, 3] 0-255
        *,
        return_maps: bool = False,
        return_grid_maps: bool = False,
        gt_sizes: Optional[Sequence[Tuple[int, int]]] = None,
    ) -> PendingBatch:
        """return_maps: bucket-resolution maps (viz overlays);
        return_grid_maps: grid-resolution thresholded maps (parity path).

        gt_sizes: per-image (H, W) of the ground truth / original image;
        drives the CRF's GT-relative spatial rescaling (ops/crf.py
        xy_scale). None = no rescale (bucket-pixel constants, the round-1
        behaviour, also selectable via config crf_xy_gt_scale=False)."""
        cfg = self.cfg
        n = caption_batch.num_classes
        bg_enable = np.asarray(
            [
                masks_mod.context_includes_background(
                    cfg.data_type, int(c),
                    max_for_background=cfg.context_background_max_classes,
                )
                for c in n
            ]
        )
        if self.mesh is not None:
            sharding = mesh_mod.batch_sharding(self.mesh)

            def to_dev(x):
                return jax.device_put(np.asarray(x), sharding)
        else:
            def to_dev(x):
                return jnp.asarray(np.asarray(x))

        images_np = np.asarray(images)
        if images_np.dtype == np.uint8:
            # uint8 transfer + on-device CLIP normalisation: bit-identical
            # to host normalisation (PIL's bicubic resize of uint8 input is
            # uint8 anyway) at HALF the bf16 transfer bytes — the image
            # upload dominates host->device traffic on a tunneled chip.
            img_j = self._normalize(to_dev(images_np))
        else:
            # Pre-normalised float images (tests / library users):
            # bf16 transfer, the model computes in bf16 anyway.
            import ml_dtypes

            img_j = to_dev(images_np.astype(ml_dtypes.bfloat16))
        args = (
            img_j,
            to_dev(caption_batch.input_ids),
            to_dev(caption_batch.attention_mask),
            to_dev(caption_batch.pool_matrix),
        )
        (maps_r0, maps_agg), (grid_r0, grid_agg) = self._attribution(*args)

        # One postprocess call handles both variants per image (fused CRF
        # kernel pass; shared per-image kernels and degrees).
        bg_j = jnp.asarray(bg_enable)
        valid_j = jnp.asarray(caption_batch.class_valid)
        # uint8 RGB transfer (cast to f32 on device inside the CRF).
        rgb_j = jnp.asarray(np.asarray(images_rgb_bucket, np.uint8))
        b = images.shape[0]
        if gt_sizes is not None and cfg.postprocess.crf_xy_gt_scale:
            # Per-axis (sx, sy): the square bucket resize is anisotropic
            # for non-square images, so each axis gets its own ratio.
            scale = np.asarray(
                [(self.bucket / w, self.bucket / h) for h, w in gt_sizes],
                np.float32,
            )
        else:
            scale = np.ones((b, 2), np.float32)
        labels_both = self._post(
            maps_r0, maps_agg, bg_j, valid_j, rgb_j, jnp.asarray(scale)
        )
        labels_r0, labels_agg = labels_both[:, 0], labels_both[:, 1]
        return PendingBatch(
            labels_r0_dev=labels_r0,
            labels_agg_dev=labels_agg,
            num_classes=np.asarray(n),
            bg_enable=bg_enable,
            maps_r0_dev=maps_r0 if return_maps else None,
            maps_agg_dev=maps_agg if return_maps else None,
            grid_r0_dev=grid_r0 if return_grid_maps else None,
            grid_agg_dev=grid_agg if return_grid_maps else None,
        )

    def make_hist_fn(self, n_class: int):
        """Jitted per-image confusion matrices at bucket resolution.

        (labels [B,Hb,Wb] channel idx, tables [B,C+1] channel->category,
        gt [B,Hb,Wb] int32) -> [B, n_class, n_class] int32. Fully on
        device; under a mesh the batch axis shards and XLA reduces.
        """
        from pnp_ovss_tpu.evalx.metrics import fast_hist_jnp

        @jax.jit
        def hist_fn(labels, tables, gt):
            pred_cat = jnp.take_along_axis(
                tables, labels.reshape(labels.shape[0], -1), axis=1
            ).reshape(labels.shape)
            return jax.vmap(
                lambda t, p: fast_hist_jnp(t, p, n_class)
            )(gt, pred_cat)

        return hist_fn

    def finalize_image_parity(
        self,
        maps_grid: np.ndarray,  # [K, g, g] thresholded grid-res class maps
        bg_enable: bool,
        class_valid: np.ndarray,  # [K]
        category_ids: Sequence[int],
        image_rgb_full: np.ndarray,  # [H, W, 3] original image
        gt_shape: Tuple[int, int],
        *,
        rescale: bool = False,  # True for the 1-drop (r0) variant
    ) -> np.ndarray:
        """Parity path, bit-faithful to the reference's per-image CPU
        postprocess: ONE bilinear resize of the grid-resolution thresholded
        maps to GT resolution (driver :358-360), Scale_0_1 on the 1-drop
        variant only (:362 vs :441), background channel (:370), then blur +
        native permutohedral CRF (:1002-1074) and channel remap.

        Pure numpy/scipy + the native lattice — NO device dispatch, so it
        is safe on the CLI's finalize worker thread (device dispatch is
        main-thread-only; see cli/segment.py bucket_hists)."""
        from pnp_ovss_tpu.ops import crf_host, host_post

        h, w = gt_shape
        k = int(np.sum(class_valid))
        maps = host_post.resize_bilinear_np(
            np.asarray(maps_grid[:k], np.float32), h, w
        )
        if rescale:
            maps = host_post.rescale_0_1_np(maps)
        if bg_enable:
            background = (maps.max(axis=0) == 0).astype(np.float32)
            wbg = np.concatenate([background[None], maps], axis=0)
        else:
            wbg = maps
        mode = self.cfg.postprocess.mode
        if "blur" in mode:
            sigma = self.cfg.postprocess.blur_scale * max(h, w)
            wbg = host_post.blur_and_minmax_np(wbg, sigma)
        if "crf" in mode:
            img = np.asarray(image_rgb_full, np.float32)
            if img.shape[:2] != (h, w):
                from pnp_ovss_tpu.data.transforms import resize_rgb

                img = resize_rgb(img, (h, w)).astype(np.float32)
            labels = crf_host.densecrf_labels(
                wbg, img, self.cfg.postprocess.crf
            )
        else:
            labels = np.argmax(wbg, axis=0).astype(np.int32)
        return masks_mod.remap_channels_to_categories(
            labels,
            np.asarray(category_ids, np.int32),
            include_background=bool(bg_enable),
            max_channels=self.cfg.max_classes,
        )

    def finalize_image(
        self,
        labels_bucket: np.ndarray,  # [Hb, Wb] channel indices
        category_ids: Sequence[int],  # dataset ids of the proposed classes
        gt_shape: Tuple[int, int],
    ) -> np.ndarray:
        """Nearest-resize to GT resolution and remap to category ids."""
        from PIL import Image

        h, w = gt_shape
        up = np.asarray(
            Image.fromarray(labels_bucket.astype(np.int32), mode="I").resize(
                (w, h), Image.NEAREST
            )
        )
        return masks_mod.remap_channels_to_categories(
            up,
            np.asarray(category_ids, np.int32),
            include_background=True,  # channel layout always has slot 0
            max_channels=self.cfg.max_classes,
        )
