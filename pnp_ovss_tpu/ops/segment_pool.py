"""Token -> class pooling as one matmul.

The reference averages the gradcam rows of each class's WordPiece pieces
with a per-image Python loop over '##' continuations
(Mean_over_filtered_label_tokens, driver :810-853). Class names are single
whitespace words in the caption (multi-word names are concatenated upstream,
Load_datasets.py:85 ``"".join(name.split(" "))``), so each class owns a
contiguous run of piece tokens and the loop computes the mean over that run.

TPU-native: the host precomputes a pooling matrix W [K, T-1] per image with
W[k, r] = 1/n_k for the rows r of class k's pieces (see text/captions.py),
and pooling becomes ``einsum('bkt,bthw->bkhw')`` — batched, static-shaped,
MXU-bound. Padded class slots have all-zero rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pool_token_maps(pool_matrix: jax.Array, gradcam: jax.Array) -> jax.Array:
    """pool_matrix: [B, K, T-1]; gradcam: [B, T-1, g, g] -> [B, K, g, g]."""
    return jnp.einsum(
        "bkt,bthw->bkhw",
        pool_matrix.astype(jnp.float32),
        gradcam.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
