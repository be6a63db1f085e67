"""ctypes binding for the native permutohedral DenseCRF (host parity path).

Exposes the C++ lattice (native/densecrf/permutohedral.cc) to Python:
- ``permutohedral_filter``: exact-ish high-dimensional Gaussian filtering,
- ``densecrf_labels``: full mean-field inference at ground-truth
  resolution — the drop-in replacement for the reference's pydensecrf call
  (driver :1030-1074).

The shared library is built on first use (``make -C native/densecrf``).
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

from pnp_ovss_tpu.config import CRFConfig

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "densecrf",
)


@functools.lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    so = os.path.join(_NATIVE_DIR, "libdensecrf.so")
    # Always invoke make: no-op when fresh, rebuilds when the source is
    # newer than a previously built .so (stale-binary hazard).
    subprocess.run(["make", "-C", _NATIVE_DIR],
                   check=not os.path.exists(so), capture_output=True)
    lib = ctypes.CDLL(so)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.permutohedral_filter.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, f32p,
    ]
    lib.densecrf_inference.argtypes = [
        f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, i32p,
    ]
    return lib


def available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


def _f32(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x, np.float32)


def permutohedral_filter(features: np.ndarray, values: np.ndarray) -> np.ndarray:
    """K @ values with K = exp(-||fi - fj||^2 / 2) (lattice approximation)."""
    n, d = features.shape
    c = values.shape[1]
    feats = _f32(features)
    vals = _f32(values)
    out = np.empty((n, c), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    _lib().permutohedral_filter(
        feats.ctypes.data_as(f32p), n, d,
        vals.ctypes.data_as(f32p), c,
        out.ctypes.data_as(f32p),
    )
    return out


def densecrf_labels(
    logits: np.ndarray,  # [C, H, W] mask maps
    image_rgb: np.ndarray,  # [H, W, 3] 0-255
    cfg: CRFConfig,
) -> np.ndarray:
    """Mean-field inference at full resolution -> [H, W] int32 labels."""
    c, h, w = logits.shape
    unary = _f32(logits.reshape(c, h * w).T)  # [N, C]
    img = _f32(image_rgb.reshape(h * w, 3))
    out = np.empty(h * w, np.int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    _lib().densecrf_inference(
        unary.ctypes.data_as(f32p), img.ctypes.data_as(f32p),
        h, w, c, cfg.num_iters,
        cfg.pos_w, cfg.pos_xy_std, cfg.bi_w, cfg.bi_xy_std, cfg.bi_rgb_std,
        out.ctypes.data_as(i32p),
    )
    return out.reshape(h, w)
