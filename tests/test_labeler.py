"""GPT-4o labeler semantics: resume, retry, failure logs, merge-write.

Reference behavior being matched: gpt_rewrite_label.py — resume from the
existing output JSON (:199-214), 3-retry timeout loop (:249-291),
BadRequest -> '' + no_output_idx.json (:272-287), unusable return ->
no_return.json (:276-316), incremental merge-write (:319-334).
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from pnp_ovss_tpu.cli.labeler import BadRequest, label_dataset


@pytest.fixture(scope="module")
def fake_voc(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc_lab")
    base = root / "VOCdevkit/VOC2012"
    (base / "ImageSets/Segmentation").mkdir(parents=True)
    (base / "JPEGImages").mkdir()
    (base / "SegmentationClass").mkdir()
    rng = np.random.RandomState(0)
    ids = [f"2007_{i:06d}" for i in range(4)]
    for img_id in ids:
        Image.fromarray(
            (rng.rand(20, 20, 3) * 255).astype(np.uint8)
        ).save(base / "JPEGImages" / f"{img_id}.jpg")
        Image.fromarray(np.zeros((20, 20), np.uint8)).save(
            base / "SegmentationClass" / f"{img_id}.png"
        )
    with open(base / "ImageSets/Segmentation/val.txt", "w") as f:
        f.write("\n".join(ids) + "\n")
    return str(root), ids


def test_labeler_resume_retry_and_failure_logs(fake_voc, tmp_path):
    root, ids = fake_voc
    out = str(tmp_path / "gpt")
    os.makedirs(out)
    # Pre-existing output: first image already labelled -> skipped (resume).
    with open(os.path.join(out, "voc_classification_noboundary.json"), "w") as f:
        json.dump({ids[0]: "[1: 'dog'], [95%]"}, f)

    calls = {"n": 0}
    sleeps = []

    def request_fn(image_b64, prompt):
        calls["n"] += 1
        key = calls["n"]
        if key == 1:  # image 2: fails twice then succeeds (retry loop)
            raise TimeoutError()
        if key == 2:
            raise TimeoutError()
        if key == 3:
            return "[2: 'cat'], [90%]"
        if key == 4:  # image 3: non-retryable
            raise BadRequest()
        return None  # image 4: "succeeds" but no usable content

    produced = label_dataset(
        "voc", root, out, request_fn,
        max_retries=3, sleep_fn=sleeps.append,
    )
    assert ids[0] not in produced  # resumed, not re-requested
    assert produced[ids[1]] == "[2: 'cat'], [90%]"
    assert produced[ids[2]] == ""
    assert produced[ids[3]] == ""
    assert len(sleeps) == 2  # two timeout retries slept

    with open(os.path.join(out, "voc_classification_noboundary.json")) as f:
        merged = json.load(f)
    assert set(merged) == set(ids)  # merge-write kept the resumed entry
    with open(os.path.join(out, "no_output_idx.json")) as f:
        assert json.load(f) == [ids[2]]
    with open(os.path.join(out, "no_return.json")) as f:
        assert json.load(f) == [ids[3]]


def test_labeler_exhausted_retries_logged(fake_voc, tmp_path):
    root, ids = fake_voc
    out = str(tmp_path / "gpt2")

    def request_fn(image_b64, prompt):
        raise TimeoutError()

    produced = label_dataset(
        "voc", root, out, request_fn,
        max_retries=2, limit=1, sleep_fn=lambda s: None,
    )
    assert produced[ids[0]] == ""
    with open(os.path.join(out, "no_output_idx.json")) as f:
        assert json.load(f) == [ids[0]]
