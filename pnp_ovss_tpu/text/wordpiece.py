"""Native WordPiece tokenizer (BERT-uncased algorithm), host-side.

The reference relies on the HuggingFace BertTokenizer with BLIP's two extra
special tokens ([DEC]=30522, [ENC]=30523 on top of the 30522-entry
bert-base-uncased vocab; blip models append them at init). This module
implements the same algorithm natively so the framework has no network /
external-asset dependency at import time:

- basic tokenisation: lowercase, strip accents, split on whitespace and
  punctuation, isolate CJK characters,
- greedy longest-match-first WordPiece with '##' continuations, [UNK] on
  failure, max 100 chars per word,
- encoding: [CLS] tokens... [SEP], padded to a static length. The ITM path
  then swaps position 0 to [ENC] (reference
  blip_image_text_matching.py:238-239).

Production use loads the real 30522-entry vocab file
(``WordPieceTokenizer.from_vocab_file``); tests use a tiny synthetic vocab.
"""

from __future__ import annotations

import unicodedata
from typing import Dict, Iterable, List, Tuple

import numpy as np

PAD = "[PAD]"
UNK = "[UNK]"
CLS = "[CLS]"
SEP = "[SEP]"
MASK = "[MASK]"
DEC = "[DEC]"
ENC = "[ENC]"

# bert-base-uncased ids for the standard specials.
BERT_PAD_ID = 0
BERT_UNK_ID = 100
BERT_CLS_ID = 101
BERT_SEP_ID = 102
BERT_MASK_ID = 103
BLIP_DEC_ID = 30522
BLIP_ENC_ID = 30523


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (
        123 <= cp <= 126
    ):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F
        or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF
        or 0x2F800 <= cp <= 0x2FA1F
    )


def basic_tokenize(text: str) -> List[str]:
    """Lowercase, strip accents, split whitespace/punctuation/CJK."""
    out: List[str] = []
    buf: List[str] = []

    def flush():
        if buf:
            out.append("".join(buf))
            buf.clear()

    text = unicodedata.normalize("NFD", text.lower())
    for ch in text:
        cat = unicodedata.category(ch)
        if cat == "Mn":  # accent mark
            continue
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or cat.startswith("C"):
            continue
        if ch.isspace():
            flush()
        elif _is_punctuation(ch) or _is_cjk(cp):
            flush()
            out.append(ch)
        else:
            buf.append(ch)
    flush()
    return out


class WordPieceTokenizer:
    def __init__(self, vocab: Dict[str, int]):
        self.vocab = dict(vocab)
        for tok in (PAD, UNK, CLS, SEP):
            if tok not in self.vocab:
                raise ValueError(f"vocab missing required token {tok}")
        # BLIP special tokens appended after the base vocab if absent.
        for tok in (DEC, ENC):
            if tok not in self.vocab:
                self.vocab[tok] = len(self.vocab)
        self.pad_id = self.vocab[PAD]
        self.unk_id = self.vocab[UNK]
        self.cls_id = self.vocab[CLS]
        self.sep_id = self.vocab[SEP]
        self.enc_id = self.vocab[ENC]
        self.dec_id = self.vocab[DEC]
        self.inv = {v: k for k, v in self.vocab.items()}

    @classmethod
    def from_vocab_file(cls, path: str) -> "WordPieceTokenizer":
        vocab: Dict[str, int] = {}
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                vocab[line.rstrip("\n")] = i
        return cls(vocab)

    @classmethod
    def toy(cls, words: Iterable[str]) -> "WordPieceTokenizer":
        """Tiny vocab for tests: specials + single chars + given words."""
        vocab = {PAD: 0, UNK: 1, CLS: 2, SEP: 3, MASK: 4}
        for w in sorted(set("abcdefghijklmnopqrstuvwxyz")):
            vocab.setdefault(w, len(vocab))
            vocab.setdefault("##" + w, len(vocab))
        for w in words:
            for piece in basic_tokenize(w):
                vocab.setdefault(piece, len(vocab))
        return cls(vocab)

    def wordpiece(self, word: str) -> List[str]:
        """Greedy longest-match-first split of one basic token."""
        if len(word) > 100:
            return [UNK]
        pieces: List[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [UNK]
            pieces.append(cur)
            start = end
        return pieces

    def tokenize(self, text: str) -> List[str]:
        pieces: List[str] = []
        for word in basic_tokenize(text):
            pieces.extend(self.wordpiece(word))
        return pieces

    def encode(
        self,
        text: str,
        *,
        max_length: int,
        enc_token: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray, List[str]]:
        """-> (ids [max_length], mask [max_length], piece strings).

        Layout: [CLS] pieces... [SEP] pad...; with ``enc_token`` position 0
        is [ENC] instead (the ITM convention, reference :238-239). Pieces
        are truncated to fit (reference truncation=True).
        """
        pieces = self.tokenize(text)
        pieces = pieces[: max_length - 2]
        ids = [self.enc_id if enc_token else self.cls_id]
        ids += [self.vocab.get(p, self.unk_id) for p in pieces]
        ids.append(self.sep_id)
        mask = [1] * len(ids)
        pad = max_length - len(ids)
        ids += [self.pad_id] * pad
        mask += [0] * pad
        return (
            np.asarray(ids, np.int32),
            np.asarray(mask, np.int32),
            pieces,
        )
