"""Bilinear resize with torch align_corners=True semantics, as matmuls.

The reference resizes patch-grid maps to ground-truth resolution with
``F.interpolate(..., mode='bilinear', align_corners=True)`` (driver
:358-360). jax.image.resize uses half-pixel centers, which differs, so we
build explicit 1D interpolation matrices (out x in) and apply them as two
matmuls — which is also the TPU-friendly formulation (rides the MXU instead
of gather pipelines).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _interp_matrix_np(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] align_corners=True bilinear interpolation weights."""
    a = np.zeros((n_out, n_in), np.float32)
    if n_in == 1:
        a[:, 0] = 1.0
        return a
    if n_out == 1:
        # align_corners=True maps the single output to source index 0.
        a[0, 0] = 1.0
        return a
    scale = (n_in - 1) / (n_out - 1)
    src = np.arange(n_out) * scale
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, n_in - 2)
    w = (src - lo).astype(np.float32)
    a[np.arange(n_out), lo] = 1.0 - w
    a[np.arange(n_out), lo + 1] += w
    return a


def interp_matrix(n_in: int, n_out: int) -> jax.Array:
    return jnp.asarray(_interp_matrix_np(n_in, n_out))


def resize_bilinear_align_corners(
    x: jax.Array, out_h: int, out_w: int
) -> jax.Array:
    """x: [..., H, W] -> [..., out_h, out_w] (float32 accumulation)."""
    h, w = x.shape[-2:]
    ah = interp_matrix(h, out_h)  # [out_h, h]
    aw = interp_matrix(w, out_w)  # [out_w, w]
    y = jnp.einsum("oh,...hw->...ow", ah, x.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("pw,...ow->...op", aw, y,
                   preferred_element_type=jnp.float32)
    return y


def resize_nearest(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Nearest-neighbour resize for label maps [..., H, W]."""
    return jax.image.resize(
        x, (*x.shape[:-2], out_h, out_w), method="nearest"
    )
