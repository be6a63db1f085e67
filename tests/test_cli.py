"""End-to-end CLI driver test on a synthetic VOC fixture."""

import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def fake_voc(tmp_path_factory):
    root = tmp_path_factory.mktemp("fake_voc")
    base = root / "VOCdevkit/VOC2012"
    (base / "ImageSets/Segmentation").mkdir(parents=True)
    (base / "JPEGImages").mkdir()
    (base / "SegmentationClass").mkdir()
    (root / "GPT4o_classification").mkdir()

    rng = np.random.RandomState(0)
    ids = [f"2007_{i:06d}" for i in range(5)]
    gpt = {}
    for img_id in ids:
        img = (rng.rand(60, 80, 3) * 255).astype(np.uint8)
        img[:30, :40] = [200, 40, 40]
        Image.fromarray(img).save(base / "JPEGImages" / f"{img_id}.jpg")
        gt = np.zeros((60, 80), np.uint8)
        gt[:30, :40] = 12
        gt[40:, 50:] = 255  # ignore -> remapped to 0
        Image.fromarray(gt).save(
            base / "SegmentationClass" / f"{img_id}.png"
        )
        gpt[img_id] = "[12: 'dog', 8: 'cat'], [12: 95%, 8: 80%]"
    with open(base / "ImageSets/Segmentation/val.txt", "w") as f:
        f.write("\n".join(ids) + "\n")
    with open(
        root / "GPT4o_classification/voc_classification_noboundary.json", "w"
    ) as f:
        json.dump(gpt, f)
    return str(root)


def _run(fake_voc, out, extra):
    from pnp_ovss_tpu.cli.segment import main

    main([
        "--data_type", "voc", "--home_dir", fake_voc, "--save_path", out,
        "--img_size", "48", "--batch_size", "4", "--drop_iter", "2",
        "--bucket_size", "32", "--attn_impl", "xla", "--max_txt_len", "32",
    ] + extra)


def test_cli_end_to_end_and_resume(fake_voc, tmp_path):
    out = str(tmp_path / "out")
    _run(fake_voc, out, [])
    hist_dir = os.path.join(out, "all_drop_hist_with_filtered_caption")
    files = sorted(os.listdir(hist_dir))
    assert len(files) == 5
    h = np.load(os.path.join(hist_dir, files[0]))
    assert h.shape == (21, 21)
    assert h.sum() == 60 * 80  # every pixel counted

    # Resume: second run writes nothing new (mtimes unchanged).
    mtimes = {f: os.path.getmtime(os.path.join(hist_dir, f)) for f in files}
    _run(fake_voc, out, [])
    for f in files:
        assert os.path.getmtime(os.path.join(hist_dir, f)) == mtimes[f]

    # Offline aggregation consumes the same files.
    from pnp_ovss_tpu.evalx.aggregate import aggregate

    tables = aggregate(out, "voc")
    assert "all_drop_hist_with_filtered_caption" in tables
    assert 0.0 <= tables["all_drop_hist_with_filtered_caption"][
        "Pixel Accuracy"
    ] <= 1.0


def test_cli_device_eval_mode(fake_voc, tmp_path):
    out = str(tmp_path / "out_bucket")
    _run(fake_voc, out, ["--eval_at_bucket"])
    # Bucket-res hists are tagged so they can't be mixed with exact-GT-res
    # hists by an offline aggregator.
    hist_dir = os.path.join(out, "hist_withfiltered_caption_bucket32")
    files = sorted(os.listdir(hist_dir))
    assert len(files) == 5
    h = np.load(os.path.join(hist_dir, files[0]))
    assert h.shape == (21, 21)
    assert h.sum() == 32 * 32  # bucket-resolution hist
    # The on-device in-graph run total equals the sum of the per-image
    # files (SURVEY §2.4 psum reduction plan).
    total = np.load(os.path.join(out, "total_hist_r0_bucket32_rank0.npy"))
    summed = sum(np.load(os.path.join(hist_dir, f)) for f in files)
    np.testing.assert_array_equal(total, summed)


def test_cli_viz_ids(fake_voc, tmp_path):
    out = str(tmp_path / "out_viz")
    _run(fake_voc, out, ["--viz_ids", "2007_000001,2007_000003"])
    viz_dir = os.path.join(out, "viz")
    files = set(os.listdir(viz_dir))
    for img_id in ("2007_000001", "2007_000003"):
        assert f"seg_{img_id}.jpeg" in files
        assert f"gt_{img_id}.jpeg" in files
        assert f"attn_{img_id}_dog.jpeg" in files
    assert not any("2007_000000" in f for f in files)


def test_cli_coco_end_to_end(tmp_path):
    """COCO driver path: annotation-JSON ground truth through the native
    RLE/polygon rasteriser, sparse category ids, 91-class hists
    (reference coco driver :1095-1125 + Calculate_mIoU n_class=91)."""
    from pnp_ovss_tpu.data.categories import get_dataset_meta

    root = tmp_path / "fake_coco"
    (root / "annotations").mkdir(parents=True)
    (root / "val2017").mkdir()
    (root / "GPT4o_classification").mkdir()
    meta = get_dataset_meta("coco_object")
    dog_pos = meta.nms.index("dog") + 1  # 1-based position in the table
    cat_pos = meta.nms.index("cat") + 1
    dog_id = int(meta.category_ids[dog_pos - 1])

    rng = np.random.RandomState(2)
    images, anns, gpt = [], [], {}
    for i, img_id in enumerate((101, 102, 103)):
        img = (rng.rand(40, 50, 3) * 255).astype(np.uint8)
        img[:20, :25] = [40, 180, 60]
        Image.fromarray(img).save(root / "val2017" / f"{img_id:012d}.jpg")
        images.append({"id": img_id, "file_name": f"{img_id:012d}.jpg",
                       "height": 40, "width": 50})
        anns.append({"image_id": img_id, "category_id": dog_id,
                     "segmentation": [[2.0, 2.0, 24.0, 2.0, 24.0, 18.0,
                                       2.0, 18.0]]})
        gpt[str(img_id)] = (
            f"[{dog_pos}: 'dog', {cat_pos}: 'cat'], "
            f"[{dog_pos}: 95%, {cat_pos}: 80%]"
        )
    with open(root / "annotations/instances_val2017.json", "w") as f:
        json.dump({"images": images, "annotations": anns}, f)
    with open(root / "GPT4o_classification/"
              "coco_object_classification_noboundary.json", "w") as f:
        json.dump(gpt, f)

    from pnp_ovss_tpu.cli.segment import main

    out = str(tmp_path / "out_coco")
    main([
        "--data_type", "coco_object", "--home_dir", str(root),
        "--save_path", out, "--img_size", "48", "--batch_size", "3",
        "--drop_iter", "2", "--bucket_size", "32", "--attn_impl", "xla",
        "--max_txt_len", "32",
    ])
    hist_dir = os.path.join(out, "all_drop_hist_with_filtered_caption")
    files = sorted(os.listdir(hist_dir))
    assert len(files) == 3
    h = np.load(os.path.join(hist_dir, files[0]))
    assert h.shape == (91, 91)
    assert h.sum() == 40 * 50
    # GT rows: only background (0) and dog (sparse id) are populated.
    assert h[dog_id].sum() == 22 * 16  # polygon pixel count
    from pnp_ovss_tpu.evalx.aggregate import aggregate

    tables = aggregate(out, "coco_object")
    assert 0.0 <= tables["all_drop_hist_with_filtered_caption"][
        "Pixel Accuracy"] <= 1.0


def test_cli_ade20k_end_to_end(tmp_path):
    """ADE20K driver path: odgt manifest, zero-stripped ids, GPT keys in
    the ADE_val_* format, 151-class hists (reference Dataset.py:1132-1298,
    Calculate_mIoU ade table)."""
    from pnp_ovss_tpu.data.categories import get_dataset_meta

    root = tmp_path / "fake_ade"
    (root / "ADEChallengeData2016/images/validation").mkdir(parents=True)
    (root / "ADEChallengeData2016/annotations/validation").mkdir(
        parents=True)
    (root / "GPT4o_classification").mkdir()
    meta = get_dataset_meta("ade20k")
    wall_pos = meta.nms.index("wall") + 1
    sky_pos = meta.nms.index("sky") + 1

    rng = np.random.RandomState(5)
    lines, gpt = [], {}
    for i in (42, 77):
        name = f"ADE_val_{i:08d}"
        img = (rng.rand(40, 50, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            root / "ADEChallengeData2016/images/validation" / f"{name}.jpg")
        gt = np.full((40, 50), wall_pos, np.uint8)
        gt[:15] = sky_pos
        Image.fromarray(gt).save(
            root / "ADEChallengeData2016/annotations/validation"
            / f"{name}.png")
        lines.append(json.dumps({
            "fpath_img": (
                f"ADEChallengeData2016/images/validation/{name}.jpg"),
            "fpath_segm": (
                f"ADEChallengeData2016/annotations/validation/{name}.png"),
        }))
        gpt[name] = (f"[{wall_pos}: 'wall', {sky_pos}: 'sky'], "
                     f"[{wall_pos}: 95%, {sky_pos}: 90%]")
    with open(root / "validation.odgt", "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(root / "GPT4o_classification/"
              "ade20k_classification_noboundary.json", "w") as f:
        json.dump(gpt, f)

    from pnp_ovss_tpu.cli.segment import main

    out = str(tmp_path / "out_ade")
    main([
        "--data_type", "ade20k", "--home_dir", str(root),
        "--save_path", out, "--img_size", "48", "--batch_size", "2",
        "--drop_iter", "2", "--bucket_size", "32", "--attn_impl", "xla",
        "--max_txt_len", "32",
    ])
    hist_dir = os.path.join(out, "all_drop_hist_with_filtered_caption")
    files = sorted(os.listdir(hist_dir))
    assert len(files) == 2
    h = np.load(os.path.join(hist_dir, files[0]))
    assert h.shape == (151, 151)
    assert h.sum() == 40 * 50
    assert h[wall_pos].sum() == 25 * 50
    assert h[sky_pos].sum() == 15 * 50


def test_cli_psc_end_to_end(tmp_path):
    """Pascal-Context driver path: trainval_merged.json phase filter,
    image-id reformatting, 60-class hists."""
    from pnp_ovss_tpu.data.categories import get_dataset_meta

    root = tmp_path / "fake_psc"
    (root / "VOCdevkit/VOC2012/JPEGImages").mkdir(parents=True)
    (root / "mmsegmentation/data/VOCdevkit/VOC2010/"
     "SegmentationClassContext").mkdir(parents=True)
    (root / "GPT4o_classification").mkdir()
    meta = get_dataset_meta("psc")
    grass_pos = meta.nms.index("grass") + 1

    rng = np.random.RandomState(6)
    img = (rng.rand(40, 50, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(
        root / "VOCdevkit/VOC2012/JPEGImages/2008_001997.jpg")
    gt = np.full((40, 50), grass_pos, np.uint8)
    Image.fromarray(gt).save(
        root / "mmsegmentation/data/VOCdevkit/VOC2010/"
        "SegmentationClassContext/2008_001997.png")
    with open(root / "trainval_merged.json", "w") as f:
        json.dump({"images": [
            {"image_id": 2008001997, "phase": "val"},
            {"image_id": 2008000001, "phase": "train"},  # filtered out
        ]}, f)
    with open(root / "GPT4o_classification/"
              "psc_classification_noboundary.json", "w") as f:
        json.dump({"2008_001997": (
            f"[{grass_pos}: 'grass'], [{grass_pos}: 95%]")}, f)

    from pnp_ovss_tpu.cli.segment import main

    out = str(tmp_path / "out_psc")
    main([
        "--data_type", "psc", "--home_dir", str(root),
        "--save_path", out, "--img_size", "48", "--batch_size", "1",
        "--drop_iter", "2", "--bucket_size", "32", "--attn_impl", "xla",
        "--max_txt_len", "32",
    ])
    hist_dir = os.path.join(out, "all_drop_hist_with_filtered_caption")
    files = sorted(os.listdir(hist_dir))
    assert len(files) == 1  # train-phase image filtered out
    h = np.load(os.path.join(hist_dir, files[0]))
    assert h.shape == (60, 60)
    assert h.sum() == 40 * 50
    assert h[grass_pos].sum() == 40 * 50
    # < 3 proposed classes on a context dataset: background stays ENABLED,
    # so background predictions are possible (column 0 unconstrained) but
    # the single-class caption should dominate; just check finiteness.
    from pnp_ovss_tpu.evalx.aggregate import aggregate

    t = aggregate(out, "psc")
    assert 0.0 <= t["all_drop_hist_with_filtered_caption"][
        "Pixel Accuracy"] <= 1.0


def test_cli_coco_stuff_end_to_end(tmp_path):
    """coco_stuff: stuff annotations layered over things, 183-class hists,
    and the context-dataset background rule (>= 3 proposed classes skip
    the synthesized background channel — reference :446-489)."""
    from pnp_ovss_tpu.data.categories import get_dataset_meta

    root = tmp_path / "fake_stuff"
    (root / "annotations").mkdir(parents=True)
    (root / "val2017").mkdir()
    (root / "GPT4o_classification").mkdir()
    meta = get_dataset_meta("coco_stuff")
    dog_pos = meta.nms.index("dog") + 1
    grass_pos = meta.nms.index("grass") + 1
    sky_pos = meta.nms.index("skyother") + 1  # multi-word names concatenated
    dog_id = int(meta.category_ids[dog_pos - 1])
    grass_id = int(meta.category_ids[grass_pos - 1])

    rng = np.random.RandomState(4)
    img_id = 201
    img = (rng.rand(40, 50, 3) * 255).astype(np.uint8)
    Image.fromarray(img).save(root / "val2017" / f"{img_id:012d}.jpg")
    things = {
        "images": [{"id": img_id, "file_name": f"{img_id:012d}.jpg",
                    "height": 40, "width": 50}],
        "annotations": [{"image_id": img_id, "category_id": dog_id,
                         "segmentation": [[2.0, 2.0, 24.0, 2.0, 24.0, 18.0,
                                           2.0, 18.0]]}],
    }
    stuff = {
        "annotations": [{"image_id": img_id, "category_id": grass_id,
                         "segmentation": [[26.0, 22.0, 48.0, 22.0,
                                           48.0, 38.0, 26.0, 38.0]]}],
    }
    with open(root / "annotations/instances_val2017.json", "w") as f:
        json.dump(things, f)
    with open(root / "annotations/stuff_val2017.json", "w") as f:
        json.dump(stuff, f)
    with open(root / "GPT4o_classification/"
              "coco_stuff_classification_noboundary.json", "w") as f:
        json.dump({str(img_id): (
            f"[{dog_pos}: 'dog', {grass_pos}: 'grass', {sky_pos}: 'sky'], "
            f"[{dog_pos}: 95%, {grass_pos}: 90%, {sky_pos}: 85%]"
        )}, f)

    from pnp_ovss_tpu.cli.segment import main

    out = str(tmp_path / "out_stuff")
    main([
        "--data_type", "coco_stuff", "--home_dir", str(root),
        "--save_path", out, "--img_size", "48", "--batch_size", "1",
        "--drop_iter", "2", "--bucket_size", "32", "--attn_impl", "xla",
        "--max_txt_len", "32",
    ])
    hist_dir = os.path.join(out, "all_drop_hist_with_filtered_caption")
    files = sorted(os.listdir(hist_dir))
    assert len(files) == 1
    h = np.load(os.path.join(hist_dir, files[0]))
    assert h.shape == (183, 183)
    assert h.sum() == 40 * 50
    # GT layering: thing (dog) and stuff (grass) rows both populated.
    assert h[dog_id].sum() == 22 * 16
    assert h[grass_id].sum() == 22 * 16
    # Context rule with 3 proposed classes: background channel disabled,
    # so every predicted pixel is a real class (no column-0 predictions).
    assert h[:, 0].sum() == 0


def test_cli_search_end_to_end(fake_voc, tmp_path):
    """Search CLI on the synthetic fixture (tiny random model, itc
    scorer): runs the annealer end to end, memoizes per-config rewards
    (reference Search :1229-1311 + reward JSON at :1303-1306)."""
    from pnp_ovss_tpu.cli.search import main

    out = str(tmp_path / "out_search")
    best, score = main([
        "--data_type", "voc", "--home_dir", fake_voc, "--save_path", out,
        "--tiny", "--layer", "1-2", "--n_iter", "3", "--limit", "3",
        "--scorer", "itc",
    ])
    assert set(best) == {"layer", "head", "min_att"}
    assert 1 <= best["layer"] <= 2
    cache_dir = os.path.join(out, "Search_Wsupervised_voc")
    assert len(os.listdir(cache_dir)) >= 1  # memoized reward JSONs
    # Per-image token-contrast JSONs in the reference's exact layout
    # (Dataset.py:166-210): Token_Contrast/max_att_block_num{L}_atthead{H}
    # _withatt{T}/Token_contrast_sum/img_{id}.json with TCSum_/TCStd_ keys.
    tc_root = os.path.join(out, "Token_Contrast")
    cfg_dirs = os.listdir(tc_root)
    assert cfg_dirs and all(d.startswith("max_att_block_num")
                            for d in cfg_dirs)
    sum_dir = os.path.join(tc_root, cfg_dirs[0], "Token_contrast_sum")
    f0 = sorted(os.listdir(sum_dir))[0]
    assert f0.startswith("img_") and f0.endswith(".json")
    with open(os.path.join(sum_dir, f0)) as f:
        tc = json.load(f)
    assert any(k.startswith("TCSum_layer") for k in tc)
    assert any(k.startswith("TCStd_layer") for k in tc)


def test_cli_token_contrast_end_to_end(fake_voc, tmp_path):
    """Token-contrast ablation CLI writes the reference-format JSON
    (sum_token_contrast.json, driver :1414-1436)."""
    from pnp_ovss_tpu.cli.token_contrast import main

    out = str(tmp_path / "out_tc")
    result = main([
        "--data_type", "voc", "--home_dir", fake_voc, "--save_path", out,
        "--tiny", "--limit", "3",
    ])
    path = os.path.join(out, "Token_Contrast", "sum_token_contrast.json")
    with open(path) as f:
        saved = json.load(f)
    assert saved == {k: v for k, v in result.items()}
    # tiny model: 2 layers x 2 heads, reference key format.
    assert "TCSum_layer1_head0" in saved and "TCSum_layer2_head1" in saved
    assert all(np.isfinite(v) for v in saved.values())


def test_cli_in_the_wild(fake_voc, tmp_path):
    """Demo mode (reference coco driver --in_the_wild, :351-384): segment a
    directory of images with a user-supplied class list, render overlays."""
    wild = tmp_path / "wild"
    wild.mkdir()
    rng = np.random.RandomState(3)
    for name in ("street", "park"):
        img = (rng.rand(50, 70, 3) * 255).astype(np.uint8)
        img[:25] = [30, 160, 220]
        Image.fromarray(img).save(wild / f"{name}.jpg")
    out = str(tmp_path / "out_wild")
    _run(fake_voc, out, [
        "--in_the_wild", "--wild_dir", str(wild),
        "--wild_classes", "dog,cat",
    ])
    viz_dir = os.path.join(out, "viz")
    files = set(os.listdir(viz_dir))
    assert {"wild_street.jpeg", "wild_park.jpeg"} <= files


def test_cli_host_parity_backend(fake_voc, tmp_path):
    """--postprocess_backend host: grid-res maps, ONE bilinear resize to GT
    inside finalize_image_parity, blur + native CRF at exact GT resolution
    (the reference's per-image CPU postprocess, driver :1002-1074). Runs on
    the finalize worker thread with zero device dispatch."""
    out = str(tmp_path / "out_parity")
    _run(fake_voc, out, ["--postprocess_backend", "host"])
    hist_dir = os.path.join(out, "all_drop_hist_with_filtered_caption")
    files = sorted(os.listdir(hist_dir))
    assert len(files) == 5
    for f in files:
        h = np.load(os.path.join(hist_dir, f))
        assert h.shape == (21, 21)
        assert h.sum() == 60 * 80  # exact-GT-res hist, every pixel counted


def test_cli_device_eval_mode_mesh(fake_voc, tmp_path):
    """Same run sharded over the 8-device CPU mesh: the in-graph (XLA-
    reduced) total must equal both the per-image sum and the single-device
    total."""
    out = str(tmp_path / "out_bucket_mesh")
    _run(fake_voc, out, ["--eval_at_bucket", "--mesh", "--batch_size", "8"])
    hist_dir = os.path.join(out, "all_drop_hist_with_filtered_caption_bucket32")
    files = sorted(os.listdir(hist_dir))
    assert len(files) == 5
    total = np.load(os.path.join(out, "total_hist_agg_bucket32_rank0.npy"))
    summed = sum(np.load(os.path.join(hist_dir, f)) for f in files)
    np.testing.assert_array_equal(total, summed)


def test_cli_sequence_parallel(fake_voc, tmp_path):
    """--sequence_parallel 2 from the public driver surface (VERDICT r4
    #2): dp=4 x sp=2 over the virtual mesh, token-sharded ViT encode
    (parallel/sequence.py), full pipeline to per-image hist files."""
    out = str(tmp_path / "out_sp")
    _run(fake_voc, out, ["--sequence_parallel", "2", "--batch_size", "8"])
    hist_dir = os.path.join(out, "all_drop_hist_with_filtered_caption")
    files = sorted(os.listdir(hist_dir))
    assert len(files) == 5
    h = np.load(os.path.join(hist_dir, files[0]))
    assert h.shape == (21, 21)
    assert h.sum() == 60 * 80


def test_cli_pipeline_parallel(fake_voc, tmp_path):
    """--pipeline_parallel 2: dp=4 x pp=2, layer-sharded GPipe ViT encode
    (parallel/pipeline.py; the CLI ViT has 24 layers -> 12 per stage),
    full pipeline to per-image hist files."""
    out = str(tmp_path / "out_pp")
    _run(fake_voc, out, ["--pipeline_parallel", "2", "--batch_size", "8"])
    hist_dir = os.path.join(out, "all_drop_hist_with_filtered_caption")
    files = sorted(os.listdir(hist_dir))
    assert len(files) == 5
    h = np.load(os.path.join(hist_dir, files[0]))
    assert h.sum() == 60 * 80


def test_cli_rejects_combined_model_axis_strategies(fake_voc, tmp_path):
    """tp/sp/pp all shard the same `model` mesh axis: combining them must
    fail loudly, not silently pick one."""
    out = str(tmp_path / "out_conflict")
    with pytest.raises(SystemExit, match="model"):
        _run(fake_voc, out, [
            "--sequence_parallel", "2", "--pipeline_parallel", "2",
            "--batch_size", "8",
        ])
