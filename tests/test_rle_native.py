"""Native (C++) vs pure-numpy RLE/polygon codec cross-tests.

The native core (native/rle/rle.cc) mirrors pycocotools' C extension role
(reference coco driver :1095-1125); the numpy fallback in data/rle.py is
the oracle. Inputs are randomized masks/polygons plus the format's edge
cases (long runs -> multi-char LEB128 varints with the sign-extension bit,
all-zero / all-one masks, sub-pixel and out-of-bounds polygons).
"""

import numpy as np
import pytest

from pnp_ovss_tpu.data import rle

pytestmark = pytest.mark.skipif(
    not rle.native_available(), reason="native librle build unavailable"
)


def encode_counts(counts):
    """COCO-API compressed RLE string encoder (test-side inverse)."""
    out = []
    for i, c in enumerate(counts):
        x = int(c)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            digit = x & 0x1F
            x >>= 5
            more = not (
                (x == 0 and not (digit & 0x10))
                or (x == -1 and (digit & 0x10))
            )
            if more:
                digit |= 0x20
            out.append(chr(digit + 48))
    return "".join(out)


def mask_to_counts(mask):
    """[H, W] mask -> column-major run lengths starting with a 0-run."""
    flat = np.asarray(mask, np.uint8).T.reshape(-1)
    change = np.flatnonzero(np.diff(flat)) + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(bounds).tolist()
    if flat.size and flat[0] == 1:
        counts = [0] + counts
    return counts


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_compressed_string_matches_python(seed):
    rng = np.random.RandomState(seed)
    h, w = rng.randint(5, 60), rng.randint(5, 60)
    # Blocky masks produce long runs (multi-char varints).
    mask = (rng.rand(h // 2 + 1, w // 2 + 1) > 0.5).astype(np.uint8)
    mask = np.kron(mask, np.ones((2, 2), np.uint8))[:h, :w]
    s = encode_counts(mask_to_counts(mask))
    got_native = rle.decode_compressed_rle(s, h, w)
    got_py = rle._decode_compressed_rle_py(s, h, w)
    np.testing.assert_array_equal(got_py, mask)
    np.testing.assert_array_equal(got_native, got_py)


def test_counts_roundtrip_edges():
    for mask in (
        np.zeros((7, 3), np.uint8),
        np.ones((7, 3), np.uint8),
        np.eye(5, dtype=np.uint8),
    ):
        counts = mask_to_counts(mask)
        got = rle._counts_to_mask(counts, *mask.shape)
        np.testing.assert_array_equal(got, mask)
        np.testing.assert_array_equal(
            rle._counts_to_mask_py(counts, *mask.shape), mask
        )


def test_counts_overflow_rejected():
    with pytest.raises(ValueError):
        rle._counts_to_mask([5, 100], 3, 3)


@pytest.mark.parametrize("seed", list(range(6)))
def test_polygons_match_python(seed):
    rng = np.random.RandomState(seed)
    h, w = rng.randint(8, 48), rng.randint(8, 48)
    polys = []
    for _ in range(rng.randint(1, 4)):
        n = rng.randint(3, 9)
        cx, cy = rng.rand(2) * [w, h]
        ang = np.sort(rng.rand(n)) * 2 * np.pi
        r = rng.rand(n) * max(h, w) * 0.5 + 1
        xs = cx + r * np.cos(ang)
        ys = cy + r * np.sin(ang)  # may leave the canvas: clamp path tested
        polys.append(np.stack([xs, ys], axis=1).reshape(-1).tolist())
    got_native = rle.rasterize_polygon(polys, h, w)
    got_py = rle._rasterize_polygon_py(polys, h, w)
    np.testing.assert_array_equal(got_native, got_py)


def test_odd_length_polygon_truncated_identically():
    """A dangling odd coordinate is truncated to len//2 vertex pairs by
    BOTH rasterisers (the Python path used to build mismatched xs/ys and
    raise, breaking fallback equivalence on malformed annotations)."""
    square = [2.0, 2.0, 10.0, 2.0, 10.0, 10.0, 2.0, 10.0]
    odd = square + [99.0]  # malformed: 4.5 "vertices"
    got_native = rle.rasterize_polygon([odd], 14, 14)
    got_py = rle._rasterize_polygon_py([odd], 14, 14)
    np.testing.assert_array_equal(got_native, got_py)
    np.testing.assert_array_equal(
        got_py, rle._rasterize_polygon_py([square], 14, 14)
    )


def test_degenerate_polygon_ignored():
    # <3 vertices: both paths return empty masks.
    np.testing.assert_array_equal(
        rle.rasterize_polygon([[1.0, 1.0, 2.0, 2.0]], 4, 4),
        np.zeros((4, 4), np.uint8),
    )


def test_ann_to_mask_dispatch():
    mask = np.eye(6, dtype=np.uint8)
    counts = mask_to_counts(mask)
    np.testing.assert_array_equal(
        rle.ann_to_mask({"segmentation": {"counts": counts, "size": [6, 6]}},
                        6, 6),
        mask,
    )
    s = encode_counts(counts)
    np.testing.assert_array_equal(
        rle.ann_to_mask({"segmentation": {"counts": s, "size": [6, 6]}},
                        6, 6),
        mask,
    )
