"""Main segmentation driver — the reference's public CLI, one binary.

Replaces BOTH reference drivers (PnP_OVSS_0514_updated_segmentation.py and
the ~85%-duplicated _coco variant) with one driver parameterised by dataset
adapter. Flag names match the reference's argparse surface (drivers
:57-106) where the concept survives; TPU-native additions are documented
inline.

Per-image outputs keep the reference's layout so Calculate_mIoU-style
offline aggregation and image-granular resume both work:
  {save_path}/hist_withfiltered_caption/img_{id}_max_blocknum_{L}_atthead_{H}.npy
  {save_path}/all_drop_hist_with_filtered_caption/img_{id}_....npy
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def get_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        "pnp-ovss-tpu segmentation", description=__doc__
    )
    # Reference flag surface (drivers :57-106).
    p.add_argument("--img_size", type=int, default=336)
    p.add_argument("--batch_size", type=int, default=35)
    p.add_argument("--max_att_block_num", type=int, default=8)
    p.add_argument("--prune_att_head", type=int, default=9)
    p.add_argument("--drop_iter", type=int, default=4)
    p.add_argument("--del_patch_num", default="sort_thresh005",
                   help="kept for flag parity; 10 patches/round")
    p.add_argument("--sort_threshold", type=float, default=0.05)
    p.add_argument("--threshold", type=float, default=0.15)
    p.add_argument("--postprocess", default="blur+crf",
                   choices=["", "blur", "crf", "blur+crf"])
    p.add_argument("--data_type", required=True,
                   choices=["voc", "psc", "ade20k", "coco_object",
                            "coco_stuff"])
    p.add_argument("--save_path", required=True)
    p.add_argument("--home_dir", required=True)
    p.add_argument("--world_size", type=int, default=1,
                   help="data-parallel hosts (jax.distributed)")
    p.add_argument("--rank", type=int, default=0)
    p.add_argument("--distributed", action="store_true",
                   help="initialise jax.distributed (multi-host SPMD over "
                        "ICI/DCN; rank/world auto-detected) — replaces the "
                        "reference's NCCL process groups (ddp_setup :45-54)")
    p.add_argument("--mesh", action="store_true",
                   help="shard the batch over all local devices")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="Megatron-shard the model over an inner `model` "
                        "mesh axis of this size (must divide the head "
                        "counts: ViT 16 / BERT 12 -> 1, 2 or 4; implies "
                        "--mesh). Absent from the reference (SURVEY §2.4); "
                        "useful for the 768px long-sequence path")
    p.add_argument("--sequence_parallel", type=int, default=1,
                   help="shard the ViT encode's TOKEN axis over an inner "
                        "`model` mesh axis of this size (implies --mesh; "
                        "K/V all-gathered per layer, parallel/sequence.py)."
                        " Bit-identical to the unsharded kernel-path "
                        "encode; for the latency-bound long-sequence "
                        "regime (768px, per-chip batch ~1) the reference "
                        "cannot run at all (SURVEY §5). Exclusive with "
                        "--tensor_parallel/--pipeline_parallel")
    p.add_argument("--pipeline_parallel", type=int, default=1,
                   help="GPipe-shard the ViT block stack's LAYER axis "
                        "over an inner `model` mesh axis of this size "
                        "(implies --mesh; must divide num_layers=24; "
                        "microbatches flow via ppermute, "
                        "parallel/pipeline.py). Bit-identical to the "
                        "unsharded kernel-path encode. Exclusive with "
                        "--tensor_parallel/--sequence_parallel")
    p.add_argument("--pp_microbatches", type=int, default=None,
                   help="with --pipeline_parallel: microbatches per "
                        "device batch (default = pipeline depth; raise "
                        "to amortise the (pp-1)/(M+pp-1) bubble when the "
                        "per-device batch allows)")
    p.add_argument("--max_txt_len", type=int, default=128,
                   help="static caption bucket (reference pads to 500)")
    # TPU-native knobs.
    p.add_argument("--checkpoint", default=None,
                   help="LAVIS/BLIP torch checkpoint (.pth) to convert")
    p.add_argument("--vocab", default=None,
                   help="bert-base-uncased vocab.txt path")
    # 192 promoted to default in round 3: +12% throughput over 224
    # (43.6 vs 38.9 img/s) while the 5-seed synthetic gate keeps it
    # +1.37 pts ABOVE the reference-semantics host anchor (worst seed
    # +0.32; SYNTH_GATE.json strided_s4_b192).
    p.add_argument("--bucket_size", type=int, default=192,
                   help="device postprocess resolution")
    p.add_argument("--crf_mode", default=None,
                   choices=["strided", "nystrom"],
                   help="device-CRF bilateral approximation (default: "
                        "config strided s=4; WARNING: nystrom s8 fails "
                        "the 5-seed synthetic gate at -4.7 mIoU pts — "
                        "see SYNTH_GATE.json and ops/crf.py)")
    p.add_argument("--crf_subsample", type=int, default=None,
                   help="bilateral anchor-grid stride (1 = exact)")
    p.add_argument("--crf_xy_bucket_pixels", action="store_true",
                   help="interpret the CRF spatial stds in raw bucket "
                        "pixels instead of rescaling them per image to "
                        "match the reference's GT-resolution reach")
    p.add_argument("--max_classes", type=int, default=28)
    p.add_argument("--attn_impl", default="pallas",
                   choices=["pallas", "xla"])
    p.add_argument("--limit", type=int, default=None,
                   help="process only the first N images (debug)")
    p.add_argument("--no_resume", action="store_true",
                   help="recompute even if per-image hist files exist")
    # Demo mode (reference coco driver --in_the_wild :351-384): segment
    # arbitrary images in a directory with a user-given class list; no GT,
    # no metrics — rendered maps are written under {save_path}/viz/.
    p.add_argument("--postprocess_backend", default="device",
                   choices=["device", "host"],
                   help="device: batched on-device blur+CRF at bucket "
                        "resolution (fast). host: per-image native "
                        "permutohedral CRF at exact GT resolution "
                        "(reference parity).")
    p.add_argument("--eval_at_bucket", action="store_true",
                   help="compute confusion hists on device at the bucket "
                        "resolution (nearest-resized GT) instead of at "
                        "exact GT resolution on host — fastest eval mode")
    p.add_argument("--record_classification", action="store_true",
                   help="save per-image classification pred/true vectors "
                        "(reference Record_classification_prediction, "
                        "driver :958-986)")
    p.add_argument("--viz_ids", default=None,
                   help="comma-separated image ids: dump attention overlays"
                        " and pred-vs-GT renders under {save_path}/viz/ "
                        "(reference debug-image list, driver :330-341, "
                        "Draw_Segmentation_map :790-807)")
    p.add_argument("--in_the_wild", action="store_true")
    p.add_argument("--wild_dir", default=None,
                   help="directory of images for --in_the_wild")
    p.add_argument("--wild_classes", default=None,
                   help="comma-separated class names for --in_the_wild "
                        "(reference hard-codes its demo lists :379-384)")
    return p


def run_in_the_wild(args, cfg, runner, tok, meta):
    """Segment a directory of arbitrary images with a fixed class list."""
    import glob as globmod

    from pnp_ovss_tpu.data import transforms
    from pnp_ovss_tpu.text.captions import build_caption_batch
    from pnp_ovss_tpu.utils import viz
    from pnp_ovss_tpu.utils.logging import log

    classes = (args.wild_classes.split(",") if args.wild_classes
               else meta.nms[:2])
    paths = sorted(
        p for p in globmod.glob(os.path.join(args.wild_dir, "*"))
        if p.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    if args.limit:
        paths = paths[: args.limit]
    log(f"in-the-wild: {len(paths)} images, classes={classes}")

    bs = cfg.batch_size
    for start in range(0, len(paths), bs):
        chunk = paths[start : start + bs]
        raws = [transforms.load_rgb(p) for p in chunk]
        imgs = [transforms.resize_for_model(r, cfg.img_size) for r in raws]
        rgbs = [
            transforms.resize_rgb(r, (runner.bucket, runner.bucket))
            for r in raws
        ]
        pad = bs - len(chunk)
        from pnp_ovss_tpu.text.captions import fitted_text_len

        cap = build_caption_batch(
            [classes] * (len(chunk) + pad), tok,
            max_text_len=fitted_text_len(
                [classes], tok, max_text_len=cfg.model.max_text_len
            ),
            max_classes=cfg.max_classes,
        )
        sizes = [r.shape[:2] for r in raws]
        res = runner.run_batch(
            np.stack(imgs + [imgs[-1]] * pad),
            cap,
            np.stack(rgbs + [rgbs[-1]] * pad).astype(np.float32),
            gt_sizes=sizes + [sizes[-1]] * pad,
        )
        for i, p in enumerate(chunk):
            name = os.path.splitext(os.path.basename(p))[0]
            pred = runner.finalize_image(
                res.labels_agg[i],
                np.arange(1, len(classes) + 1),
                raws[i].shape[:2],
            )
            viz.save_image01(
                os.path.join(args.save_path, "viz", f"wild_{name}.jpeg"),
                viz.render_segmentation(
                    pred, raws[i].astype(np.float32) / 255.0
                ),
            )
    log(f"in-the-wild outputs under {args.save_path}/viz/")


def build_config(args) -> "PipelineConfig":
    from pnp_ovss_tpu.config import (
        AttributionConfig, DropConfig, ModelConfig, PipelineConfig,
        PostprocessConfig, ViTConfig,
    )

    model = ModelConfig(
        vit=ViTConfig(image_size=args.img_size),
        max_text_len=args.max_txt_len,
    )
    post_kw = {}
    if args.crf_mode is not None:
        post_kw["bilateral_mode"] = args.crf_mode
    if args.crf_subsample is not None:
        post_kw["bilateral_subsample"] = args.crf_subsample
    if args.crf_xy_bucket_pixels:
        post_kw["crf_xy_gt_scale"] = False
    return PipelineConfig(
        model=model,
        attribution=AttributionConfig(
            layer=args.max_att_block_num, head=args.prune_att_head
        ),
        drop=DropConfig(num_rounds=args.drop_iter),
        postprocess=PostprocessConfig(mode=args.postprocess, **post_kw),
        data_type=args.data_type,
        batch_size=args.batch_size,
        threshold=args.threshold,
        max_classes=args.max_classes,
    )


def main(argv=None):
    args = get_args_parser().parse_args(argv)

    import jax

    from pnp_ovss_tpu.config import NUM_CLASSES
    from pnp_ovss_tpu.data import transforms
    from pnp_ovss_tpu.data.categories import get_dataset_meta
    from pnp_ovss_tpu.data.datasets import make_dataset, shard_records
    from pnp_ovss_tpu.evalx.metrics import fast_hist, scores_from_hist
    from pnp_ovss_tpu.models.blip_itm import init_params
    from pnp_ovss_tpu.pipeline.runner import SegmentationRunner
    from pnp_ovss_tpu.text.captions import build_caption_batch
    from pnp_ovss_tpu.text.labels import GPTLabelProvider
    from pnp_ovss_tpu.text.wordpiece import WordPieceTokenizer
    from pnp_ovss_tpu.utils.logging import MetricLogger, log

    if args.distributed:
        jax.distributed.initialize()
        args.rank = jax.process_index()
        args.world_size = jax.process_count()

    cfg = build_config(args)
    meta = get_dataset_meta(args.data_type)

    # --- tokenizer & labels -------------------------------------------
    if args.vocab:
        tok = WordPieceTokenizer.from_vocab_file(args.vocab)
    else:
        log("WARNING: no --vocab given; using a toy vocab (random-weight "
            "smoke runs only)")
        tok = WordPieceTokenizer.toy(["a", "picture", "of"] + meta.nms)

    gpt_file = {
        "voc": "voc_classification_noboundary.json",
        "psc": "psc_classification_noboundary.json",
        "ade20k": "ade20k_classification_noboundary.json",
        "coco_object": "coco_object_classification_noboundary.json",
        "coco_stuff": "coco_stuff_classification_noboundary.json",
    }[args.data_type]
    labels = GPTLabelProvider(
        os.path.join(args.home_dir, "GPT4o_classification", gpt_file),
        meta.nms, prob_cutoff=cfg.gpt_prob_cutoff,
    )

    # --- model --------------------------------------------------------
    layer0 = cfg.attribution.layer - 1
    if args.checkpoint:
        from pnp_ovss_tpu.models.cache import load_params_cached

        params = load_params_cached(args.checkpoint, cfg.model,
                                    (layer0,))
    else:
        log("WARNING: no --checkpoint given; RANDOM weights "
            "(throughput/smoke runs only)")
        params = init_params(
            jax.random.PRNGKey(0), cfg.model, capture_layers=(layer0,),
            attn_impl=args.attn_impl,
        )

    # Model-axis strategies are mutually exclusive: all three use the same
    # inner `model` mesh axis (for weights, tokens and layers
    # respectively); each one implies --mesh.
    strategies = {
        "--tensor_parallel": args.tensor_parallel,
        "--sequence_parallel": args.sequence_parallel,
        "--pipeline_parallel": args.pipeline_parallel,
    }
    active = {k: v for k, v in strategies.items() if v > 1}
    if len(active) > 1:
        raise SystemExit(
            f"choose at most one of {', '.join(active)} (all shard the "
            f"same `model` mesh axis)")
    model_axis = max(strategies.values())
    mesh = None
    if args.mesh or model_axis > 1:
        from pnp_ovss_tpu.parallel import mesh as mesh_mod

        if model_axis > 1:
            mesh = mesh_mod.make_mesh_2d(model_axis)
            dp = mesh.devices.size // model_axis
            kind = next(iter(active)).lstrip("-")
            log(f"mesh over {mesh.devices.size} devices: "
                f"data={dp} x model={model_axis} ({kind})")
        else:
            mesh = mesh_mod.make_mesh()
            log(f"data-parallel mesh over {mesh.devices.size} devices")
    encode_parallel = ("sp" if args.sequence_parallel > 1
                       else "pp" if args.pipeline_parallel > 1 else None)

    runner = SegmentationRunner(
        cfg, params, mesh=mesh, attn_impl=args.attn_impl,
        bucket_size=args.bucket_size,
        bilateral_impl="pallas" if jax.default_backend() != "cpu"
        else "reference",
        encode_parallel=encode_parallel,
        pp_microbatches=args.pp_microbatches,
    )

    if args.in_the_wild:
        if not args.wild_dir:
            raise SystemExit("--in_the_wild requires --wild_dir")
        return run_in_the_wild(args, cfg, runner, tok, meta)

    # --- data ---------------------------------------------------------
    ds = make_dataset(args.data_type, args.home_dir)
    records = list(ds.records())
    if args.limit:
        records = records[: args.limit]
    records = shard_records(records, args.rank, args.world_size)
    log(f"{len(records)} images on rank {args.rank}/{args.world_size}")

    # Bucket-resolution hists have different metric semantics than exact-
    # GT-res hists; tag the directories so an offline aggregator can never
    # silently mix the two.
    bucket_tag = f"_bucket{args.bucket_size}" if args.eval_at_bucket else ""
    hist_dir_r0 = os.path.join(
        args.save_path, "hist_withfiltered_caption" + bucket_tag
    )
    hist_dir_agg = os.path.join(
        args.save_path, "all_drop_hist_with_filtered_caption" + bucket_tag
    )
    os.makedirs(hist_dir_r0, exist_ok=True)
    os.makedirs(hist_dir_agg, exist_ok=True)

    def hist_path(d, img_id):
        return os.path.join(
            d,
            f"img_{img_id}_max_blocknum_{cfg.attribution.layer}"
            f"_atthead_{cfg.attribution.head}.npy",
        )

    if not args.no_resume:
        before = len(records)
        records = [
            r for r in records
            if not (os.path.exists(hist_path(hist_dir_r0, r.img_id))
                    and os.path.exists(hist_path(hist_dir_agg, r.img_id)))
        ]
        if len(records) != before:
            log(f"resume: skipping {before - len(records)} done images")

    n_class = NUM_CLASSES[args.data_type]
    total_r0 = np.zeros((n_class, n_class))
    total_agg = np.zeros((n_class, n_class))
    # --eval_at_bucket: the run-total confusion matrix lives ON DEVICE and
    # is accumulated in-graph (SURVEY §2.4: psum reduction replacing the
    # reference's .npy scatter-gather, :513-520). Predicted masks never
    # leave the TPU; only the tiny per-image [C,C] hists come down for the
    # resume files, and one total per rank is written at the end.
    dev_totals = {"r0": None, "agg": None}

    from pnp_ovss_tpu.data.loader import PrefetchLoader
    import concurrent.futures as cf

    logger = MetricLogger()
    bs = cfg.batch_size
    parity = args.postprocess_backend == "host"
    viz_set = set(args.viz_ids.split(",")) if args.viz_ids else set()
    loader = PrefetchLoader(
        records, batch_size=bs, img_size=cfg.img_size, bucket=runner.bucket,
        keep_raw=parity or bool(viz_set), gt_at_bucket=args.eval_at_bucket,
    )
    hist_fn = runner.make_hist_fn(n_class) if args.eval_at_bucket else None
    if args.eval_at_bucket:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def accum_hist(total, hists, w):
            # Padded trailing-batch rows carry w=0; under a mesh the batch
            # axis of `hists` is sharded and XLA reduces across devices.
            return total + (hists * w[:, None, None]).sum(axis=0)

    def maybe_dump_viz(batch, res, class_idx_lists):
        """Debug artifacts for --viz_ids images (reference :330-341,
        :790-807): per-class attention overlays + pred/GT renders."""
        from pnp_ovss_tpu.data.transforms import resize_rgb
        from pnp_ovss_tpu.utils import viz

        for i, rec in enumerate(batch.records):
            if rec.img_id not in viz_set:
                continue
            idxs = class_idx_lists[i]
            cat_ids = meta.category_ids[idxs]
            names = [meta.nms[j] for j in idxs]
            gt = batch.gts[i]
            h, w = gt.shape[:2]
            image01 = (
                resize_rgb(
                    batch.raw_images[i].astype(np.float32), (h, w)
                ) / 255.0
            )
            pred = runner.finalize_image(
                np.asarray(res.labels_agg[i]), cat_ids, (h, w)
            )
            maps = np.asarray(res.maps_agg[i][: len(names)])
            viz.dump_debug_artifacts(
                args.save_path, rec.img_id, image01, maps, names, pred,
                gt_labels=gt.astype(np.int32),
            )

    def bucket_hists(batch, res, class_idx_lists):
        """Device-side per-image hists + in-graph run-total accumulation.

        MUST run on the main thread: it dispatches jitted programs, and
        concurrent dispatch from two threads can enqueue a sharded
        program's per-device collectives in different orders under a mesh
        — observed as a hard deadlock on the 8-device CPU mesh. Returns
        {variant: [B, C, C] numpy} for the worker thread to write.
        """
        nb = len(batch.records)
        tables = np.zeros((bs, cfg.max_classes + 2), np.int32)
        for i in range(nb):
            cat_ids = meta.category_ids[class_idx_lists[i]]
            k = len(cat_ids)
            tables[i, 1 : k + 1] = cat_ids
        gtb = np.concatenate(
            [batch.gt_bucket] + [batch.gt_bucket[-1:]] * (bs - nb)
        ).astype(np.int32)
        w = np.zeros(bs, np.int32)
        w[:nb] = 1
        out = {}
        for variant in ("r0", "agg"):
            labels_b = (res.labels_r0 if variant == "r0"
                        else res.labels_agg)  # device array (uint8)
            hists_dev = hist_fn(
                labels_b, jnp.asarray(tables), jnp.asarray(gtb)
            )
            if dev_totals[variant] is None:
                dev_totals[variant] = jnp.zeros(
                    (n_class, n_class), jnp.int32
                )
            dev_totals[variant] = accum_hist(
                dev_totals[variant], hists_dev, jnp.asarray(w)
            )
            out[variant] = np.asarray(hists_dev)
        return out

    def finalize_batch(batch, res, cap, class_idx_lists, hists_np=None):
        """Host resize/remap/hist/file-IO for one batch (worker thread).
        No device dispatch happens here — see bucket_hists. The parity
        path is pure numpy + the native CRF (runner.finalize_image_parity),
        so it too stays off the device."""
        if viz_set:
            maybe_dump_viz(batch, res, class_idx_lists)
        if args.eval_at_bucket:
            for variant, hist_dir in (
                ("r0", hist_dir_r0), ("agg", hist_dir_agg),
            ):
                for i, rec in enumerate(batch.records):
                    np.save(hist_path(hist_dir, rec.img_id),
                            hists_np[variant][i])
            return
        for i, rec in enumerate(batch.records):
            cat_ids = meta.category_ids[class_idx_lists[i]]
            gt = batch.gts[i]
            if args.record_classification:
                # Binary pred/true vectors over the label set
                # (reference :958-986).
                pred_vec = np.zeros(len(meta.nms), np.int64)
                pred_vec[class_idx_lists[i]] = 1
                gt_ids = [
                    int(v) for v in np.unique(gt)
                    if 0 < v <= len(meta.nms)
                ]
                true_vec = np.zeros(len(meta.nms), np.int64)
                true_vec[[g - 1 for g in gt_ids]] = 1
                for sub, vec in (("classification_pred", pred_vec),
                                 ("classification_true", true_vec)):
                    d = os.path.join(args.save_path, sub)
                    os.makedirs(d, exist_ok=True)
                    np.save(os.path.join(
                        d, f"img_{rec.img_id}.npy"), vec)
            for variant, hist_dir, total in (
                ("r0", hist_dir_r0, total_r0),
                ("agg", hist_dir_agg, total_agg),
            ):
                if parity:
                    # Grid-resolution maps: ONE bilinear resize to GT
                    # inside finalize_image_parity (reference :358-360);
                    # Scale_0_1 applies to the r0 variant only (:362).
                    maps = res.grid_r0 if variant == "r0" else res.grid_agg
                    pred = runner.finalize_image_parity(
                        maps[i], bool(res.bg_enable[i]),
                        cap.class_valid[i], cat_ids,
                        batch.raw_images[i], gt.shape[:2],
                        rescale=(variant == "r0"),
                    )
                else:
                    labels_b = (res.labels_r0 if variant == "r0"
                                else res.labels_agg)
                    pred = runner.finalize_image(
                        labels_b[i], cat_ids, gt.shape[:2]
                    )
                h = fast_hist(gt.flatten(), pred.flatten(), n_class)
                np.save(hist_path(hist_dir, rec.img_id), h)
                total += h

    # Double-buffered pipeline: batch N+1's attribution + postprocess are
    # DISPATCHED (async) before batch N's labels are materialised, so the
    # device queue never drains; host finalize additionally overlaps in a
    # worker thread. (The reference's loop is fully synchronous per batch,
    # driver :213-257.)
    in_flight = None  # (batch, PendingBatch, cap, class_idx_lists, t_sub)
    fin_future = None
    with cf.ThreadPoolExecutor(1) as finalize_pool:

        def collect(entry):
            nonlocal fin_future
            b0, pb0, cap0, cls0, t_sub = entry
            t0 = time.perf_counter()
            # Bucket-eval keeps predicted masks on device (hists are
            # computed and accumulated in-graph); --viz_ids still needs
            # host labels for the debug renders.
            res0 = pb0.result(
                materialize_labels=not args.eval_at_bucket or bool(viz_set)
            )
            hists_np = (bucket_hists(b0, res0, cls0)
                        if args.eval_at_bucket else None)
            t_dev = time.perf_counter() - t0
            if fin_future is not None:
                fin_future.result()  # surface worker exceptions, keep order
            fin_future = finalize_pool.submit(
                finalize_batch, b0, res0, cap0, cls0, hists_np
            )
            logger.update(
                device_s=t_dev,
                imgs_per_s=len(b0.records) / max(
                    time.perf_counter() - t_sub, 1e-9
                ),
            )

        # ONE fitted text length for the whole run (largest caption over
        # all records, rounded to a 64 bucket): the reference pads every
        # caption to 500 tokens (blip_image_text_matching.py:48) but real
        # captions are ~10-60, and the BERT fwd+bwd is linear in the
        # padded length — identical results (masked positions are inert),
        # one compile, a fraction of the fusion-encoder cost.
        from pnp_ovss_tpu.text.captions import fitted_text_len

        text_len = fitted_text_len(
            [labels.lookup(r.gpt_key)[1] for r in records], tok,
            max_text_len=cfg.model.max_text_len,
        )
        log(f"fitted text length: {text_len} "
            f"(cap {cfg.model.max_text_len})")

        for batch in logger.log_every(loader, 10, header="segment",
                                      total=len(loader)):
            t0 = time.perf_counter()
            class_idx_lists, class_name_lists = [], []
            for rec in batch.records:
                idxs, names = labels.lookup(rec.gpt_key)
                class_idx_lists.append(idxs)
                class_name_lists.append(names)
            # Pad the trailing batch to the static batch size.
            pad = bs - len(batch.records)
            cap = build_caption_batch(
                class_name_lists + [class_name_lists[-1]] * pad, tok,
                max_text_len=text_len,
                max_classes=cfg.max_classes,
            )
            images_np = np.concatenate(
                [batch.images] + [batch.images[-1:]] * pad
            )
            rgbs_np = np.concatenate(
                [batch.rgb_bucket] + [batch.rgb_bucket[-1:]] * pad
            )
            # Per-image GT sizes drive the CRF's GT-relative spatial
            # rescaling (ops/crf.py xy_scale); padded rows reuse the last
            # real image's size.
            gt_sizes = [g.shape[:2] for g in batch.gts]
            gt_sizes += [gt_sizes[-1]] * pad
            t_sub = time.perf_counter()
            pending_batch = runner.submit_batch(
                images_np, cap, rgbs_np,
                return_maps=bool(viz_set),
                return_grid_maps=parity,
                gt_sizes=gt_sizes,
            )
            logger.update(host_s=t_sub - t0)

            if in_flight is not None:
                collect(in_flight)
            in_flight = (batch, pending_batch, cap, class_idx_lists, t_sub)
        if in_flight is not None:
            collect(in_flight)
        if fin_future is not None:
            fin_future.result()

    if args.distributed:
        # Cross-rank metric sync (reference SmoothedValue all_reduce,
        # utils.py:48-59): after this every rank's global_avg describes
        # the WHOLE run, not its own shard.
        logger.synchronize_between_processes()
        log(f"global (all {args.world_size} ranks): {logger}")

    if args.eval_at_bucket:
        # One run-total per rank, straight off the device (the in-graph
        # reduction result) — written next to the per-image resume files.
        for variant, key in (("r0", "r0"), ("agg", "agg")):
            if dev_totals[key] is None:
                continue
            tot = np.asarray(dev_totals[key])
            np.save(
                os.path.join(
                    args.save_path,
                    f"total_hist_{variant}{bucket_tag}_rank{args.rank}.npy",
                ),
                tot,
            )
            if variant == "r0":
                total_r0 = tot
            else:
                total_agg = tot

    for name, total in (("1-drop", total_r0), ("N-drop agg", total_agg)):
        if total.sum() == 0:
            continue
        table = scores_from_hist(total, meta.metric_class_names())
        log(f"== {name} ({args.data_type}, rank {args.rank}) ==")
        for k, v in table.items():
            if k != "Class IoU":
                log(f"  {k}: {v:.4f}")


if __name__ == "__main__":
    main()
