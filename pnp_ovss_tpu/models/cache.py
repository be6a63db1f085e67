"""Converted-parameter caching with orbax (SURVEY §5 checkpoint/resume).

The reference re-downloads and re-loads the torch checkpoint per run
(base_model.py:86-127). Here the torch->flax conversion result is cached as
an orbax checkpoint keyed by (checkpoint file, model config, capture
layers), so subsequent runs restore directly to device.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, Optional, Tuple

from pnp_ovss_tpu.config import ModelConfig


def _cache_key(ckpt_path: str, cfg: ModelConfig, capture_layers: Tuple[int, ...]) -> str:
    stat = os.stat(ckpt_path)
    payload = json.dumps({
        "path": os.path.abspath(ckpt_path),
        "size": stat.st_size,
        "mtime": int(stat.st_mtime),
        "cfg": repr(cfg),
        "capture": list(capture_layers),
    }, sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def load_params_cached(
    ckpt_path: str,
    cfg: ModelConfig,
    capture_layers: Tuple[int, ...] = (7,),
    *,
    cache_dir: Optional[str] = None,
) -> Dict:
    """Convert (or restore) LAVIS torch params, caching via orbax."""
    import orbax.checkpoint as ocp

    from pnp_ovss_tpu.models.convert import load_torch_checkpoint

    cache_dir = cache_dir or os.path.expanduser("~/.cache/pnp_ovss_tpu")
    key = _cache_key(ckpt_path, cfg, capture_layers)
    store = os.path.join(cache_dir, "params", key)

    ckptr = ocp.StandardCheckpointer()
    if os.path.isdir(store):
        return ckptr.restore(store)

    params = load_torch_checkpoint(ckpt_path, cfg, capture_layers)
    os.makedirs(os.path.dirname(store), exist_ok=True)
    ckptr.save(store, params)
    ckptr.wait_until_finished()
    return params
