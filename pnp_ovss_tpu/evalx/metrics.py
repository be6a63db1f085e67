"""Confusion-histogram metrics (Pixel Acc / Mean Acc / FW-IoU / mIoU).

Reference: _fast_hist/scores (driver :1106-1146) and the offline aggregator
(Calculate_mIoU.py:204-256). Numpy and jnp variants share the same math; the
jnp variant runs in-graph and reduces across a device mesh with ``psum``,
replacing the reference's per-image ``.npy`` scatter + offline sum.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def fast_hist(
    label_true: np.ndarray, label_pred: np.ndarray, n_class: int
) -> np.ndarray:
    """Reference _fast_hist (:1106-1112): bincount confusion matrix."""
    mask = (label_true >= 0) & (label_true < n_class)
    hist = np.bincount(
        n_class * label_true[mask].astype(int) + label_pred[mask].astype(int),
        minlength=n_class**2,
    ).reshape(n_class, n_class)
    return hist


def fast_hist_jnp(
    label_true: jax.Array, label_pred: jax.Array, n_class: int
) -> jax.Array:
    """In-graph confusion matrix. Inputs int32 [...], any shape.

    Out-of-range true labels are excluded by routing them to an overflow
    bin that is sliced off (static shapes, no boolean indexing).
    """
    t = label_true.reshape(-1)
    p = jnp.clip(label_pred.reshape(-1), 0, n_class - 1)
    valid = (t >= 0) & (t < n_class)
    idx = jnp.where(valid, n_class * t + p, n_class * n_class)
    hist = jnp.zeros((n_class * n_class + 1,), jnp.int32).at[idx].add(1)
    return hist[:-1].reshape(n_class, n_class)


def batch_hist_jnp(
    label_true: jax.Array,  # [B, H, W] int32
    label_pred: jax.Array,  # [B, H, W] int32
    n_class: int,
) -> jax.Array:
    """Summed confusion matrix for a batch, in-graph.

    Under jit with a batch-sharded mesh this reduces across devices via the
    XLA collective the sum lowers to — replacing the reference's per-rank
    .npy file scatter + offline aggregation (SURVEY §2.4).
    """
    return fast_hist_jnp(label_true, label_pred, n_class)


def scores_from_hist(
    hist: np.ndarray, class_names: Sequence[str]
) -> Dict[str, object]:
    """Reference scores (:1115-1146) from a summed confusion matrix."""
    hist = np.asarray(hist, np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        acc = np.diag(hist).sum() / hist.sum()
        acc_cls = np.nanmean(np.diag(hist) / hist.sum(axis=1))
        iu = np.diag(hist) / (
            hist.sum(axis=1) + hist.sum(axis=0) - np.diag(hist)
        )
        valid = hist.sum(axis=1) > 0
        mean_iu = np.nanmean(iu[valid])
        freq = hist.sum(axis=1) / hist.sum()
        fwavacc = (freq[freq > 0] * iu[freq > 0]).sum()
    cls_iu = dict(zip(class_names, iu))
    return {
        "Pixel Accuracy": acc,
        "Mean Accuracy": acc_cls,
        "Frequency Weighted IoU": fwavacc,
        "Mean IoU": mean_iu,
        "Class IoU": cls_iu,
    }


def class_name_list(cats: Dict[int, str], n_class: int) -> list:
    """Channel-id -> name table with 'Background' at 0 (reference :1129-1136)."""
    return ["Background"] + [cats[i] for i in range(1, n_class)]
