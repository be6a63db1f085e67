"""Tokenizer / caption / GPT-label parsing tests."""

import numpy as np
import pytest

from pnp_ovss_tpu.text.captions import CaptionBatch, build_caption_batch
from pnp_ovss_tpu.text.labels import parse_gpt_classes
from pnp_ovss_tpu.text.wordpiece import WordPieceTokenizer, basic_tokenize


def test_basic_tokenize():
    assert basic_tokenize("A picture of Dogs!") == [
        "a", "picture", "of", "dogs", "!",
    ]
    assert basic_tokenize("café") == ["cafe"]
    assert basic_tokenize("pott-ed") == ["pott", "-", "ed"]


def test_wordpiece_greedy():
    tok = WordPieceTokenizer.toy(["picture", "of", "dog", "cat"])
    # "dogcat" splits greedily using ## single-char continuations.
    pieces = tok.tokenize("dog")
    assert pieces == ["dog"]
    pieces = tok.tokenize("dogx")
    assert pieces[0] in ("dog", "d")  # greedy longest-first from vocab
    assert all(p.startswith("##") for p in pieces[1:])


def test_wordpiece_matches_hf_algorithm():
    """Cross-check against HuggingFace's WordPiece on a custom vocab."""
    transformers = pytest.importorskip("transformers")
    from transformers import BertTokenizer
    import tempfile, os

    words = ["a", "picture", "of", "dog", "cat", "pott", "##ed",
             "##plant", "tv", "##monitor", "aero", "##plane"]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words + list(
        "abcdefghijklmnopqrstuvwxyz"
    ) + ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"]
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "vocab.txt")
        with open(path, "w") as f:
            f.write("\n".join(vocab) + "\n")
        hf = BertTokenizer(path, do_lower_case=True)
        ours = WordPieceTokenizer.from_vocab_file(path)
        for text in [
            "A picture of dog cat",
            "pottedplant tvmonitor aeroplane",
            "dog!cat, tv",
            "unknownlongword dog",
        ]:
            assert ours.tokenize(text) == hf.tokenize(text), text


def test_caption_batch_layout():
    tok = WordPieceTokenizer.toy(
        ["a", "picture", "of", "dog", "cat", "potted", "plant"]
    )
    batch = build_caption_batch(
        [["dog", "cat"], ["pottedplant"]], tok, max_text_len=32,
        max_classes=4,
    )
    assert batch.input_ids.shape == (2, 32)
    # Position 0 is [ENC].
    assert (batch.input_ids[:, 0] == tok.enc_id).all()
    # First image: prefix rows 0-2 unpooled, class rows start at row 3.
    assert batch.pool_matrix[0, 0, 3] == 1.0
    assert batch.num_classes.tolist() == [2, 1]
    # Pool rows sum to 1 for valid classes, 0 for padded slots.
    sums = batch.pool_matrix.sum(-1)
    np.testing.assert_allclose(sums[0, :2], 1.0, rtol=1e-6)
    assert sums[0, 2:].sum() == 0
    # Multi-piece class ("pottedplant" is not in vocab as one piece):
    # weights spread uniformly over its pieces.
    row = batch.pool_matrix[1, 0]
    nz = row[row > 0]
    assert len(nz) >= 1
    np.testing.assert_allclose(nz, 1.0 / len(nz), rtol=1e-6)


def test_caption_tokens_match_mask(tiny_tok=None):
    tok = WordPieceTokenizer.toy(["a", "picture", "of", "dog"])
    batch = build_caption_batch([["dog"]], tok, max_text_len=16, max_classes=2)
    n_real = batch.attention_mask[0].sum()
    # [ENC] a picture of dog [SEP]
    assert n_real == 6
    assert batch.input_ids[0, n_real - 1] == tok.sep_id


def test_parse_gpt_classes():
    raw = "[1: 'wall', 5: 'sky', 12: 'person'], [1: 90%, 5: 60%, 12: 80%]"
    assert parse_gpt_classes(raw, 20) == [0, 11]
    # newline-separated variant
    raw2 = "[2: 'cat']\n[2: 95%]"
    assert parse_gpt_classes(raw2, 20) == [1]
    # nothing above cutoff -> fallback to [0]
    raw3 = "[3: 'dog'], [3: 50%]"
    assert parse_gpt_classes(raw3, 20) == [0]
    # empty / garbage -> fallback
    assert parse_gpt_classes("", 20) == [0]
    assert parse_gpt_classes("no objects detected", 20) == [0]
