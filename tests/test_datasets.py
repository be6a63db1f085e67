"""Dataset adapter tests on synthetic fixtures (no real datasets)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from pnp_ovss_tpu.data.categories import get_dataset_meta
from pnp_ovss_tpu.data.datasets import (
    ADE20KDataset, CocoDataset, PascalContextDataset, VOCDataset,
    shard_records,
)
from pnp_ovss_tpu.data.rle import ann_to_mask, decode_compressed_rle


def _save_img(path, h=20, w=30):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(path)


def _save_mask(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr.astype(np.uint8)).save(path)


def test_voc_adapter(tmp_path):
    root = str(tmp_path)
    base = os.path.join(root, "VOCdevkit/VOC2012")
    os.makedirs(os.path.join(base, "ImageSets/Segmentation"), exist_ok=True)
    with open(os.path.join(base, "ImageSets/Segmentation/val.txt"), "w") as f:
        f.write("2007_000001\n2007_000002\n")
    for i in (1, 2):
        _save_img(os.path.join(base, f"JPEGImages/2007_00000{i}.jpg"))
        m = np.zeros((20, 30), np.uint8)
        m[0, 0] = 255  # ignore pixel
        m[5, 5] = 12
        _save_mask(os.path.join(base, f"SegmentationClass/2007_00000{i}.png"), m)

    ds = VOCDataset(root)
    recs = list(ds.records())
    assert len(recs) == 2
    gt = recs[0].load_gt()
    assert gt[0, 0] == 0  # 255 -> 0 (driver :903-908)
    assert gt[5, 5] == 12
    assert recs[0].gpt_key == "2007_000001"


def test_psc_adapter(tmp_path):
    root = str(tmp_path)
    merged = {
        "images": [
            {"image_id": 2008001997, "phase": "val"},
            {"image_id": 2008001998, "phase": "train"},
        ]
    }
    with open(os.path.join(root, "trainval_merged.json"), "w") as f:
        json.dump(merged, f)
    _save_img(os.path.join(root, "VOCdevkit/VOC2012/JPEGImages/2008_001997.jpg"))
    m = np.full((20, 30), 7, np.uint8)
    _save_mask(
        os.path.join(
            root,
            "mmsegmentation/data/VOCdevkit/VOC2010/SegmentationClassContext/"
            "2008_001997.png",
        ),
        m,
    )
    ds = PascalContextDataset(root)
    recs = list(ds.records())
    assert len(recs) == 1  # only phase == val
    assert recs[0].img_id == "2008_001997"
    assert (recs[0].load_gt() == 7).all()


def test_ade20k_adapter(tmp_path):
    root = str(tmp_path)
    odgt = os.path.join(root, "validation.odgt")
    with open(odgt, "w") as f:
        f.write(json.dumps({
            "fpath_img": "ADEChallengeData2016/images/validation/ADE_val_00000042.jpg",
            "fpath_segm": "ADEChallengeData2016/annotations/validation/ADE_val_00000042.png",
        }) + "\n")
    _save_img(os.path.join(
        root, "ADEChallengeData2016/images/validation/ADE_val_00000042.jpg"
    ))
    _save_mask(os.path.join(
        root, "ADEChallengeData2016/annotations/validation/ADE_val_00000042.png"
    ), np.full((20, 30), 3, np.uint8))
    ds = ADE20KDataset(root, odgt)
    recs = list(ds.records())
    assert recs[0].img_id == "42"  # zeros stripped (Dataset.py:1270)
    assert recs[0].gpt_key == "ADE_val_00000042"
    assert (recs[0].load_gt() == 3).all()


def test_coco_adapter_with_polygon_and_rle(tmp_path):
    root = str(tmp_path)
    ann = {
        "images": [{"id": 7, "file_name": "000007.jpg",
                    "height": 20, "width": 30}],
        "annotations": [
            {"image_id": 7, "category_id": 18,  # dog, polygon
             "segmentation": [[2.0, 2.0, 10.0, 2.0, 10.0, 8.0, 2.0, 8.0]]},
            {"image_id": 7, "category_id": 1,  # person, uncompressed RLE
             "segmentation": {"counts": [600 - 0, 0][0:1] + [], "size": [20, 30]}},
        ],
    }
    # simple uncompressed RLE: first 590 zeros then 10 ones
    ann["annotations"][1]["segmentation"]["counts"] = [590, 10]
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    with open(os.path.join(root, "annotations/instances_val2017.json"), "w") as f:
        json.dump(ann, f)
    _save_img(os.path.join(root, "val2017/000007.jpg"))

    ds = CocoDataset(root, "annotations/instances_val2017.json")
    recs = list(ds.records())
    assert recs[0].img_id == "7"
    gt = recs[0].load_gt()
    assert gt.shape == (20, 30)
    assert gt[5, 5] == 18  # inside the polygon
    assert gt[0, 0] == 0
    assert (gt == 1).sum() == 10  # RLE ones


def test_rle_decode_roundtrip():
    # Uncompressed counts: column-major runs.
    from pnp_ovss_tpu.data.rle import _counts_to_mask

    m = _counts_to_mask([3, 2, 5], 2, 5)  # N=10 pixels
    flat = np.zeros(10, np.uint8)
    flat[3:5] = 1
    want = flat.reshape(5, 2).T
    np.testing.assert_array_equal(m, want)


def test_polygon_rasterization_matches_area():
    # Axis-aligned rectangle [x0,x1]x[y0,y1] -> exact pixel count.
    mask = ann_to_mask(
        {"segmentation": [[2, 3, 12, 3, 12, 9, 2, 9]]}, 20, 30
    )
    # Pixels with centers inside [2,12]x[3,9]: x in {2..11}, y in {3..8}.
    assert mask.sum() == 10 * 6
    assert mask[5, 5] == 1 and mask[5, 13] == 0


def test_shard_records_strided():
    recs = list(range(10))
    assert shard_records(recs, 0, 4) == [0, 4, 8]
    assert shard_records(recs, 3, 4) == [3, 7]


def test_dataset_meta_tables():
    for dt, n in (("voc", 21), ("psc", 60), ("ade20k", 151),
                  ("coco_object", 91), ("coco_stuff", 183)):
        meta = get_dataset_meta(dt)
        assert meta.n_class == n
        assert len(meta.nms) == len(meta.category_ids)
        # caption names are single tokens
        assert all(" " not in n_ and "-" not in n_ for n_ in meta.nms)
    voc = get_dataset_meta("voc")
    assert voc.nms[15] == "pottedplant"
    coco = get_dataset_meta("coco_object")
    assert coco.category_ids[-1] == 90  # sparse ids preserved
    assert coco.nms[9] == "trafficlight"
