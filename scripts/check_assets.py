"""Probe for the assets the real-data accuracy axis needs (VERDICT r2 #5).

The north-star accuracy gate (scripts/run_accuracy_gate.sh) requires model
weights, tokenizer vocabularies and the five validation datasets — none of
which ship with either repo. This probe answers, in one command, "can the
accuracy gate run here?", prints what is missing with its provenance, and
writes a JSON verdict the round-entry workflow can archive.

Usage:
  python scripts/check_assets.py [--assets DIR] [--home_dir DIR] [--out F]

  --assets   directory searched for weights/vocabs (default: $PNP_ASSETS,
             then ~/assets, then the repo root)
  --home_dir dataset root in the reference's layout (README.md:34-80);
             default $PNP_HOME_DIR

Asset manifest (see also BASELINE.md "Asset manifest"):

  blip ckpt   model_large_retrieval_flickr.pth  (~1.9 GB torch state dict)
              https://storage.googleapis.com/sfr-vision-language-research/BLIP/models/model_large_retrieval_flickr.pth
              (blip_itm_large.yaml:10 — the Flickr-retrieval finetune, NOT
              model_base_capfilt_large)
  bert vocab  bert-base-uncased vocab.txt (30 522 lines)
              https://huggingface.co/google-bert/bert-base-uncased/raw/main/vocab.txt
  clip ckpt   OpenAI CLIP ViT-L/14-336px (driver :1370-1372; search reward
              scorer): a torch .pt jit archive or state dict
              https://openaipublic.azureedge.net/clip/models/3035c92b350959924f9f00213499208652fc7ea050643e8b385c2dac08641f02/ViT-L-14-336px.pt
  clip bpe    bpe_simple_vocab_16e6.txt.gz (CLIP repo, text/bpe.py)
              https://github.com/openai/CLIP/raw/main/clip/bpe_simple_vocab_16e6.txt.gz
  datasets    five val sets under --home_dir in the reference layout
              (README.md:34-80) + the GPT4o_classification/*.json caches
              (shipped in the reference repo).

Record each file's sha256 next to it (<name>.sha256) on first download;
the probe verifies when present. No hashes are pre-filled here because
this environment has zero egress — do not trust from-memory hashes.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WEIGHT_FILES = {
    "blip_ckpt": ["model_large_retrieval_flickr.pth"],
    "bert_vocab": ["vocab.txt", "bert-base-uncased-vocab.txt"],
    "clip_ckpt": ["ViT-L-14-336px.pt", "ViT-L-14-336.pt"],
    "clip_bpe": ["bpe_simple_vocab_16e6.txt.gz", "bpe_simple_vocab_16e6.txt"],
}

# data_type -> (relative paths that must exist under --home_dir)
DATASET_PATHS = {
    "voc": ["VOCdevkit/VOC2012/ImageSets/Segmentation/val.txt",
            "VOCdevkit/VOC2012/JPEGImages",
            "VOCdevkit/VOC2012/SegmentationClass"],
    "psc": ["trainval_merged.json",
            "VOCdevkit/VOC2012/JPEGImages",
            "mmsegmentation/data/VOCdevkit/VOC2010/SegmentationClassContext"],
    "ade20k": ["validation.odgt",
               "ADEChallengeData2016/images/validation",
               "ADEChallengeData2016/annotations/validation"],
    "coco_object": ["annotations/instances_val2017.json", "val2017"],
    "coco_stuff": ["annotations/instances_val2017.json",
                   "annotations/stuff_val2017.json", "val2017"],
}

GPT_CACHE = "GPT4o_classification/{d}_classification_noboundary.json"


def find_file(roots, names):
    for root in roots:
        for name in names:
            p = os.path.join(root, name)
            if os.path.isfile(p):
                return p
        # one level of subdirectories (e.g. assets/blip/..., assets/clip/...)
        if os.path.isdir(root):
            for sub in sorted(os.listdir(root)):
                d = os.path.join(root, sub)
                if os.path.isdir(d):
                    for name in names:
                        p = os.path.join(d, name)
                        if os.path.isfile(p):
                            return p
    return None


def sha256_if_recorded(path):
    """Verify <path>.sha256 if the user recorded one; None = unrecorded."""
    rec = path + ".sha256"
    if not os.path.isfile(rec):
        return None
    with open(rec) as f:
        want = f.read().split()[0].strip()
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 22), b""):
            h.update(chunk)
    return h.hexdigest() == want


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--assets", default=os.environ.get("PNP_ASSETS"))
    p.add_argument("--home_dir", default=os.environ.get("PNP_HOME_DIR"))
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    roots = [r for r in (
        args.assets, os.path.expanduser("~/assets"), REPO,
    ) if r]
    report = {"weights": {}, "datasets": {}, "ready": {}}

    for key, names in WEIGHT_FILES.items():
        path = find_file(roots, names)
        entry = {"found": path is not None, "path": path}
        if path:
            entry["size"] = os.path.getsize(path)
            ok = sha256_if_recorded(path)
            entry["sha256_verified"] = ok  # None = no .sha256 recorded
        report["weights"][key] = entry

    for d, rels in DATASET_PATHS.items():
        if args.home_dir:
            missing = [r for r in rels
                       if not os.path.exists(os.path.join(args.home_dir, r))]
            gpt = os.path.join(args.home_dir, GPT_CACHE.format(d=d))
            if not os.path.exists(gpt):
                missing.append(GPT_CACHE.format(d=d))
            report["datasets"][d] = {"found": not missing, "missing": missing}
        else:
            report["datasets"][d] = {"found": False,
                                     "missing": ["(no --home_dir given)"]}

    w = report["weights"]
    seg_ready = w["blip_ckpt"]["found"] and w["bert_vocab"]["found"]
    report["ready"] = {
        "segmentation": seg_ready,
        "search_clip_reward": seg_ready and w["clip_ckpt"]["found"]
        and w["clip_bpe"]["found"],
        "accuracy_gate_per_dataset": {
            d: seg_ready and v["found"] for d, v in report["datasets"].items()
        },
    }

    for key, entry in report["weights"].items():
        state = entry["path"] if entry["found"] else "MISSING"
        print(f"[assets] {key:<12} {state}")
    for d, v in report["datasets"].items():
        state = "ok" if v["found"] else f"MISSING: {', '.join(v['missing'])}"
        print(f"[assets] dataset {d:<12} {state}")
    gate_ready = [d for d, ok in
                  report["ready"]["accuracy_gate_per_dataset"].items() if ok]
    print(f"[assets] segmentation-with-real-weights ready: "
          f"{report['ready']['segmentation']}")
    print(f"[assets] accuracy gate runnable for: {gate_ready or 'none'}")
    if gate_ready:
        print("[assets] -> run: bash scripts/run_accuracy_gate.sh "
              f"{gate_ready[0]} <ckpt> <vocab> <home_dir> <out_dir>")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    return 0 if report["ready"]["segmentation"] else 1


if __name__ == "__main__":
    sys.exit(main())
