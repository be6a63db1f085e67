"""Driver entry points: single-chip compile check + multichip dry run."""

import sys

import jax
import numpy as np
import pytest


def _load_graft():
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "__graft_entry__.py",
    )
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def test_dryrun_multichip_8_devices():
    graft = _load_graft()
    graft.dryrun_multichip(8)


def test_entry_abstract_eval():
    """entry() must at least trace/lower on CPU (compile check is the
    driver's job on real hardware; tiny proxy: eval_shape)."""
    graft = _load_graft()
    fn, args = graft.entry()
    out = jax.eval_shape(fn, *args)
    gc_shape = out[0].shape
    assert gc_shape[0] == args[1].shape[0]  # batch
    assert gc_shape[-1] == gc_shape[-2] == 21  # 336/16 grid
