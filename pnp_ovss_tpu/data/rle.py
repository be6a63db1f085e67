"""COCO mask decoding without pycocotools (C extension).

The reference depends on pycocotools for ``annToMask`` (coco driver
:1095-1125). This module reimplements the needed subset in numpy:

- compressed RLE strings (the LEB128-style ASCII format of the COCO API),
- uncompressed RLE counts lists,
- polygon rasterisation (even-odd scanline fill, matching COCO's
  upper-left pixel-center convention closely enough for evaluation masks).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Union

import numpy as np


def decode_compressed_rle(rle_str: Union[str, bytes], h: int, w: int) -> np.ndarray:
    """COCO compressed RLE string -> [H, W] uint8 mask (Fortran order)."""
    if isinstance(rle_str, bytes):
        rle_str = rle_str.decode("ascii")
    counts: List[int] = []
    i = 0
    n = len(rle_str)
    while i < n:
        x = 0
        k = 0
        more = True
        while more:
            c = ord(rle_str[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return _counts_to_mask(counts, h, w)


def _counts_to_mask(counts: Sequence[int], h: int, w: int) -> np.ndarray:
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for c in counts:
        if val:
            flat[pos : pos + c] = 1
        pos += c
        val ^= 1
    return flat.reshape(w, h).T  # column-major


def rasterize_polygon(polys: Sequence[Sequence[float]], h: int, w: int) -> np.ndarray:
    """COCO polygon list [[x0,y0,x1,y1,...], ...] -> [H, W] uint8 mask.

    Even-odd scanline fill at pixel centers (x+0.5, y+0.5 convention of the
    COCO API's frPoly path).
    """
    mask = np.zeros((h, w), np.uint8)
    for poly in polys:
        xs = np.asarray(poly[0::2], np.float64)
        ys = np.asarray(poly[1::2], np.float64)
        if len(xs) < 3:
            continue
        # For each row (pixel center y+0.5) find crossing x's.
        for y in range(h):
            cy = y + 0.5
            x0s, y0s = xs, ys
            x1s = np.roll(xs, -1)
            y1s = np.roll(ys, -1)
            cond = (y0s <= cy) != (y1s <= cy)
            if not cond.any():
                continue
            t = (cy - y0s[cond]) / (y1s[cond] - y0s[cond])
            cross = x0s[cond] + t * (x1s[cond] - x0s[cond])
            cross.sort()
            for a, b in zip(cross[0::2], cross[1::2]):
                lo = int(np.ceil(a - 0.5))
                hi = int(np.floor(b - 0.5))
                if hi >= lo:
                    mask[y, max(lo, 0) : min(hi + 1, w)] ^= 1
    return mask


def ann_to_mask(ann: Dict, h: int, w: int) -> np.ndarray:
    """COCO annotation dict -> [H, W] uint8 mask (pycocotools.annToMask)."""
    seg = ann["segmentation"]
    if isinstance(seg, list):
        return rasterize_polygon(seg, h, w)
    counts = seg["counts"]
    if isinstance(counts, list):
        return _counts_to_mask(counts, h, w)
    return decode_compressed_rle(counts, h, w)
