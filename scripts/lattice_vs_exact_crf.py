"""Measure the lattice-vs-exact CRF accuracy difference directly.

Same inputs, same 128x128 GT resolution, same mean-field semantics:
  - host native permutohedral lattice (the reference's pydensecrf family)
  - exact brute-force device CRF (bilateral_subsample=1, pallas kernel)

Round-3 result (TPU, 24 scenes, seed 0):
  lattice 0.7938 / exact 0.8049 -> exact - lattice = +1.112 pts,
  label agreement 0.9914.
This MEASURES the synthetic gate's positive device-vs-anchor offset as
kernel quality (the lattice approximates the Gaussian; the device kernel
is exact), supporting the one-sided budget in
synthetic_postprocess_gate.py. Run on TPU (~9 min, mostly the exact
N^2 kernel): python scripts/lattice_vs_exact_crf.py
"""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
sys.stdout.reconfigure(line_buffering=True)
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp

from scripts.synthetic_postprocess_gate import make_scene
from pnp_ovss_tpu.config import PipelineConfig
from pnp_ovss_tpu.evalx.metrics import fast_hist, scores_from_hist
from pnp_ovss_tpu.ops import crf_host, host_post
from pnp_ovss_tpu.ops.crf import mean_field_crf
from pnp_ovss_tpu.pipeline import masks as masks_mod

cfg = PipelineConfig()
grid, kmax = cfg.model.vit.grid, cfg.max_classes
H = W = 128
MAXK, SCENES = 6, 24
n_class = MAXK + 1
names = [str(i) for i in range(n_class)]
rng = np.random.RandomState(0)

hist_lat = np.zeros((n_class, n_class), np.int64)
hist_ex = np.zeros((n_class, n_class), np.int64)
agree = []
t0 = time.perf_counter()
for i in range(SCENES):
    k = int(rng.randint(2, MAXK + 1))
    gt, rgb, maps = make_scene(rng, H, W, k, grid)
    padded = np.zeros((1, kmax, grid, grid), np.float32)
    padded[0, :k] = maps
    tg = np.asarray(masks_mod.threshold_maps(jnp.asarray(padded), cfg.threshold)[0])
    up = host_post.resize_bilinear_np(tg[:k], H, W)
    bg = (up.max(axis=0) == 0).astype(np.float32)
    wbg = np.concatenate([bg[None], up], axis=0)
    sigma = cfg.postprocess.blur_scale * max(H, W)
    wbg = host_post.blur_and_minmax_np(wbg, sigma)

    lab_lat = crf_host.densecrf_labels(wbg, rgb.astype(np.float32), cfg.postprocess.crf)
    lab_ex = np.asarray(mean_field_crf(
        jnp.asarray(wbg), jnp.asarray(rgb.astype(np.float32)),
        cfg.postprocess.crf, bilateral_impl="pallas", bilateral_subsample=1,
    ))
    hist_lat += fast_hist(gt.flatten(), lab_lat.flatten(), n_class)
    hist_ex += fast_hist(gt.flatten(), lab_ex.flatten(), n_class)
    agree.append((lab_lat == lab_ex).mean())
    if (i + 1) % 6 == 0:
        print(f"  {i + 1}/{SCENES} [{time.perf_counter() - t0:.0f}s]")

m_lat = scores_from_hist(hist_lat, names)["Mean IoU"]
m_ex = scores_from_hist(hist_ex, names)["Mean IoU"]
print(f"lattice (reference-style) mIoU: {m_lat:.4f}")
print(f"exact (device kernel)    mIoU: {m_ex:.4f}")
print(f"exact - lattice: {(m_ex - m_lat) * 100:+.3f} pts; "
      f"label agreement {np.mean(agree):.4f}")
