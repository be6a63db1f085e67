"""Pure-numpy host postprocess helpers for the bit-faithful parity path.

The parity path (``--postprocess_backend host``) reproduces the reference's
per-image CPU postprocess exactly (driver :348-379, :1002-1074):

  grid-res thresholded maps -> ONE bilinear resize to GT resolution
  (align_corners=True, :358-360) -> Scale_0_1 on the 1-drop variant only
  (:362 vs :441) -> background channel (:370) -> scipy-style Gaussian blur
  + min-max (:1149-1153) -> native permutohedral DenseCRF.

Everything here is numpy/scipy on the host thread: the parity path runs on
the CLI's finalize worker thread, and device dispatch is restricted to the
main thread by the repo's single-threaded-dispatch rule (two threads
enqueueing sharded programs can order per-device collectives differently —
see cli/segment.py bucket_hists). Earlier rounds dispatched jitted resize
and blur programs from this path; that both violated the rule and chained
TWO bilinear resamples (grid->bucket in _finish_maps, then bucket->GT),
which the reference never does.

The interpolation / blur matrices are shared with the device formulations
(ops/resize.py, ops/blur.py), which are scipy/torch-parity-tested; applying
them with numpy matmuls gives the same math without touching the device.
"""

from __future__ import annotations

import numpy as np

from pnp_ovss_tpu.ops.blur import _blur_matrix_np
from pnp_ovss_tpu.ops.resize import _interp_matrix_np


def resize_bilinear_np(x: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """[..., H, W] -> [..., out_h, out_w], torch align_corners=True
    semantics (reference F.interpolate, driver :358-360)."""
    h, w = x.shape[-2:]
    ah = _interp_matrix_np(h, out_h)  # [out_h, h]
    aw = _interp_matrix_np(w, out_w)  # [out_w, w]
    y = np.einsum("oh,...hw->...ow", ah, x.astype(np.float32))
    return np.einsum("pw,...ow->...op", aw, y)


def rescale_0_1_np(maps: np.ndarray) -> np.ndarray:
    """Per-map min-max to [0, 1] (reference Scale_0_1, :1080-1103)."""
    flat = maps.reshape(*maps.shape[:-2], -1)
    mn = flat.min(axis=-1)[..., None, None]
    mx = flat.max(axis=-1)[..., None, None]
    denom = mx - mn
    denom = np.where(denom > 0, denom, 1.0)
    return (maps - mn) / denom


def blur_and_minmax_np(x: np.ndarray, sigma: float) -> np.ndarray:
    """Reference ``blurring`` (driver :1149-1153): scipy gaussian_filter
    (reflect boundary, truncate=4) then per-map min-max, on [..., H, W]."""
    h, w = x.shape[-2:]
    bh = _blur_matrix_np(h, float(sigma), 4.0)
    bw = _blur_matrix_np(w, float(sigma), 4.0)
    y = np.einsum("oh,...hw->...ow", bh, x.astype(np.float32))
    y = np.einsum("pw,...ow->...op", bw, y)
    return rescale_0_1_np(y)
