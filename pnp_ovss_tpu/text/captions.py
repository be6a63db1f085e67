"""Caption building and pooling-matrix construction (host side).

Reference semantics:
- caption = "A picture of " + " ".join(class_names)   (driver :783)
- the ITM tokenisation replaces token 0 with [ENC]    (:238-239)
- gradcam row r corresponds to text token r+1 (the [ENC] row is removed in
  the gradcam engine), so the 3 prefix tokens "a picture of" occupy rows
  0-2 and class pieces start at row 3 (driver :820-821 slices [3:-1])
- each class's WordPiece pieces are mean-pooled into one map (:810-853).

This module turns that into static-shaped device inputs: token ids, masks,
and a pooling matrix W [K, T-1] with W[k, r] = 1/n_k over class k's piece
rows (consumed by ops/segment_pool.py).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import numpy as np

from pnp_ovss_tpu.text.wordpiece import WordPieceTokenizer

CAPTION_PREFIX = "A picture of"
NUM_PREFIX_TOKENS = 3  # "a", "picture", "of"


@dataclasses.dataclass
class CaptionBatch:
    input_ids: np.ndarray  # [B, T] int32
    attention_mask: np.ndarray  # [B, T] int32
    pool_matrix: np.ndarray  # [B, K, T-1] float32
    class_valid: np.ndarray  # [B, K] bool
    num_classes: np.ndarray  # [B] int32
    class_names: List[List[str]]  # ragged, pre-padding


def fitted_text_len(
    class_lists: Sequence[Sequence[str]],
    tokenizer: WordPieceTokenizer,
    *,
    max_text_len: int,
    granularity: int = 64,
) -> int:
    """Smallest padded text length (multiple of ``granularity``, capped at
    ``max_text_len``) that fits every caption in the batch.

    The reference pads every caption to max_txt_len=500
    (blip_image_text_matching.py:48) although real captions are ~10-60
    tokens; the BERT fwd+bwd cost is linear in the padded length on the
    text axis and the attention mask makes the padded positions exactly
    inert (the (1-mask)*-10000 bias underflows to probability 0 in f32),
    so a fitted bucket gives identical results at a fraction of the
    fusion-encoder cost. Each distinct bucket compiles once (granularity
    64 keeps that to <= 8 programs per model config).
    """
    need = 0
    for classes in class_lists:
        n = NUM_PREFIX_TOKENS + 2  # [ENC] + prefix + [SEP]
        for name in classes:
            n += len(tokenizer.tokenize(name))
        need = max(need, n)
    fitted = -(-need // granularity) * granularity
    return min(max_text_len, max(fitted, granularity))


def build_caption_batch(
    class_lists: Sequence[Sequence[str]],
    tokenizer: WordPieceTokenizer,
    *,
    max_text_len: int,
    max_classes: int,
) -> CaptionBatch:
    """Tokenise per-image captions and build pooling matrices.

    Classes whose pieces do not fully fit in ``max_text_len`` (after the
    [ENC] + prefix + [SEP] overhead) are dropped from both the caption and
    the pooling matrix, keeping shapes static. The reference instead pads
    everything to 500 tokens; raise ``max_text_len`` for strict parity.
    """
    b = len(class_lists)
    t = max_text_len
    ids = np.full((b, t), tokenizer.pad_id, np.int32)
    mask = np.zeros((b, t), np.int32)
    pool = np.zeros((b, max_classes, t - 1), np.float32)
    valid = np.zeros((b, max_classes), bool)
    counts = np.zeros((b,), np.int32)
    kept_names: List[List[str]] = []

    prefix_pieces = tokenizer.tokenize(CAPTION_PREFIX)
    if len(prefix_pieces) != NUM_PREFIX_TOKENS:
        raise ValueError(
            f"caption prefix must tokenise to {NUM_PREFIX_TOKENS} pieces, "
            f"got {prefix_pieces} — check the vocab file"
        )

    for i, classes in enumerate(class_lists):
        classes = list(classes)[:max_classes]
        pieces: List[str] = list(prefix_pieces)
        # Per class: (row_start, n_pieces). Rows are token positions - 1.
        spans = []
        kept: List[str] = []
        budget = t - 2  # [ENC] + ... + [SEP]
        for name in classes:
            cp = tokenizer.tokenize(name)
            if not cp or len(pieces) + len(cp) > budget:
                continue
            # Token position of the first piece = 1 + len(pieces); row index
            # in the (enc-row-removed) gradcam = position - 1 = len(pieces).
            spans.append((len(pieces), len(cp)))
            pieces.extend(cp)
            kept.append(name)

        token_ids = [tokenizer.enc_id]
        token_ids += [
            tokenizer.vocab.get(p, tokenizer.unk_id) for p in pieces
        ]
        token_ids.append(tokenizer.sep_id)
        n = len(token_ids)
        ids[i, :n] = token_ids
        mask[i, :n] = 1

        for k, (row, length) in enumerate(spans):
            pool[i, k, row : row + length] = 1.0 / length
            valid[i, k] = True
        counts[i] = len(spans)
        kept_names.append(kept)

    return CaptionBatch(
        input_ids=ids,
        attention_mask=mask,
        pool_matrix=pool,
        class_valid=valid,
        num_classes=counts,
        class_names=kept_names,
    )
