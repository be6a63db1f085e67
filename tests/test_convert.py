"""Torch->Flax converter tests: structural equality + numeric spot checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_ovss_tpu.config import ModelConfig
from pnp_ovss_tpu.models.blip_itm import BlipITM, init_params
from pnp_ovss_tpu.models.convert import convert_state_dict


def _tiny_torch_state_dict(cfg: ModelConfig, rng):
    """Random state dict in the LAVIS BLIP layout for the tiny config."""
    sd = {}
    v = cfg.vit
    d = v.hidden_size

    def lin(name, i, o):
        sd[name + ".weight"] = rng.randn(o, i).astype(np.float32) * 0.02
        sd[name + ".bias"] = rng.randn(o).astype(np.float32) * 0.02

    def ln(name, n):
        sd[name + ".weight"] = np.ones(n, np.float32)
        sd[name + ".bias"] = np.zeros(n, np.float32)

    sd["visual_encoder.patch_embed.proj.weight"] = (
        rng.randn(d, 3, v.patch_size, v.patch_size).astype(np.float32) * 0.02
    )
    sd["visual_encoder.patch_embed.proj.bias"] = np.zeros(d, np.float32)
    sd["visual_encoder.cls_token"] = rng.randn(1, 1, d).astype(np.float32)
    sd["visual_encoder.pos_embed"] = rng.randn(
        1, v.num_patches + 1, d
    ).astype(np.float32)
    for i in range(v.num_layers):
        b = f"visual_encoder.blocks.{i}"
        ln(b + ".norm1", d)
        lin(b + ".attn.qkv", d, 3 * d)
        lin(b + ".attn.proj", d, d)
        ln(b + ".norm2", d)
        lin(b + ".mlp.fc1", d, int(d * v.mlp_ratio))
        lin(b + ".mlp.fc2", int(d * v.mlp_ratio), d)
    ln("visual_encoder.norm", d)

    c = cfg.bert
    h = c.hidden_size
    sd["text_encoder.embeddings.word_embeddings.weight"] = (
        rng.randn(c.vocab_size, h).astype(np.float32) * 0.02
    )
    sd["text_encoder.embeddings.position_embeddings.weight"] = (
        rng.randn(c.max_position_embeddings, h).astype(np.float32) * 0.02
    )
    ln("text_encoder.embeddings.LayerNorm", h)
    for i in range(c.num_layers):
        b = f"text_encoder.encoder.layer.{i}"
        for part in ("attention", "crossattention"):
            kv_in = h if part == "attention" else c.encoder_width
            lin(f"{b}.{part}.self.query", h, h)
            lin(f"{b}.{part}.self.key", kv_in, h)
            lin(f"{b}.{part}.self.value", kv_in, h)
            lin(f"{b}.{part}.output.dense", h, h)
            ln(f"{b}.{part}.output.LayerNorm", h)
        lin(b + ".intermediate.dense", h, c.intermediate_size)
        lin(b + ".output.dense", c.intermediate_size, h)
        ln(b + ".output.LayerNorm", h)
    lin("itm_head", h, 2)
    lin("vision_proj", cfg.vit.hidden_size, cfg.embed_dim)
    lin("text_proj", h, cfg.embed_dim)
    return sd


def _retrieval_checkpoint_extras(cfg: ModelConfig, sd, rng):
    """The keys a real ``model_large_retrieval_flickr.pth`` carries BEYOND
    the ITM module tree (`blip_itm_large.yaml:10` loads a blip_retrieval
    training checkpoint into the blip_image_text_matching arch).

    Derived from the vendored reference modules and the BLIP retrieval
    trainer state: momentum copies of both towers + projections, the ITC
    queues and their pointer, the distillation temperature, the
    serialized `position_ids` buffer (`med.py:78-80` register_buffer),
    and the `token_type_embeddings` table (present in the original-BLIP
    checkpoint; LAVIS med configs set add_type_embeddings=false so the
    module never instantiates it and load_state_dict(strict=False) drops
    it — `med.py:67-70,111-115`).
    """
    extras = {}
    for k, v in list(sd.items()):
        if k.startswith(("visual_encoder.", "text_encoder.")):
            root, rest = k.split(".", 1)
            extras[f"{root}_m.{rest}"] = v.copy()
    for name in ("vision_proj", "text_proj"):
        extras[f"{name}_m.weight"] = sd[f"{name}.weight"].copy()
        extras[f"{name}_m.bias"] = sd[f"{name}.bias"].copy()
    q = 17  # queue_size
    extras["image_queue"] = rng.randn(cfg.embed_dim, q).astype(np.float32)
    extras["text_queue"] = rng.randn(cfg.embed_dim, q).astype(np.float32)
    extras["idx_queue"] = np.full((1, q), -100, np.int64)
    extras["queue_ptr"] = np.zeros((1,), np.int64)
    extras["temp"] = np.asarray(0.07, np.float32)
    extras["text_encoder.embeddings.position_ids"] = np.arange(
        cfg.bert.max_position_embeddings, dtype=np.int64
    )[None]
    extras["text_encoder.embeddings.token_type_embeddings.weight"] = (
        rng.randn(2, cfg.bert.hidden_size).astype(np.float32)
    )
    return extras


def test_full_retrieval_checkpoint_layout_loads_identically(tmp_path):
    """Loading the FULL retrieval-checkpoint key inventory (momentum
    towers, queues, temp, serialized buffers, token_type table — the
    exact extras a real model_large_retrieval_flickr.pth contains) must
    yield bit-identical params to the clean ITM-only layout, through the
    real .pth load path; ditto the `text_encoder.bert.*` prefix variant
    some LAVIS exports use."""
    torch = pytest.importorskip("torch")
    from pnp_ovss_tpu.models.convert import load_torch_checkpoint

    cfg = ModelConfig.tiny()
    rng = np.random.RandomState(7)
    sd = _tiny_torch_state_dict(cfg, rng)
    want = convert_state_dict(sd, cfg, capture_layers=(0,))

    full = dict(sd)
    full.update(_retrieval_checkpoint_extras(cfg, sd, rng))
    ckpt = str(tmp_path / "model_retrieval.pth")
    torch.save(
        {"model": {k: torch.tensor(v) for k, v in full.items()},
         "epoch": 5, "config": {"image_size": 48}},
        ckpt,
    )
    got = load_torch_checkpoint(ckpt, cfg, capture_layers=(0,))
    for (kw, w), (kg, g) in zip(
        jax.tree_util.tree_flatten_with_path(want)[0],
        jax.tree_util.tree_flatten_with_path(got)[0],
    ):
        assert kw == kg
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g), err_msg=str(kw))

    # Prefix variant: every text_encoder key nested under .bert.
    pref = {
        (k.replace("text_encoder.", "text_encoder.bert.", 1)
         if k.startswith("text_encoder.") else k): v
        for k, v in full.items()
    }
    got2 = convert_state_dict(pref, cfg, capture_layers=(0,))
    for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got2)):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def _tree_shapes(tree):
    return jax.tree.map(lambda x: tuple(np.shape(x)), tree)


def test_converted_tree_matches_init_structure():
    cfg = ModelConfig.tiny()
    rng = np.random.RandomState(0)
    sd = _tiny_torch_state_dict(cfg, rng)
    converted = convert_state_dict(sd, cfg, capture_layers=(0,))
    want = init_params(jax.random.PRNGKey(0), cfg, capture_layers=(0,))
    ws, cs = _tree_shapes(want), _tree_shapes(converted)
    flat_w = dict(jax.tree_util.tree_flatten_with_path(ws)[0])
    flat_c = dict(jax.tree_util.tree_flatten_with_path(cs)[0])
    missing = set(flat_w) - set(flat_c)
    extra = set(flat_c) - set(flat_w)
    assert not missing, f"converter missing params: {sorted(missing)[:5]}"
    assert not extra, f"converter extra params: {sorted(extra)[:5]}"
    for k in flat_w:
        assert flat_w[k] == flat_c[k], (k, flat_w[k], flat_c[k])


def test_converted_params_run_and_patch_embed_matches_torch():
    torch = pytest.importorskip("torch")
    cfg = ModelConfig.tiny()
    rng = np.random.RandomState(1)
    sd = _tiny_torch_state_dict(cfg, rng)
    params = convert_state_dict(sd, cfg, capture_layers=(0,))

    model = BlipITM(cfg, capture_layers=(0,), attn_impl="xla")
    images = jnp.asarray(rng.randn(1, 48, 48, 3), jnp.float32)
    ids = jnp.asarray(rng.randint(5, 50, (1, cfg.max_text_len)), jnp.int32)
    mask = jnp.ones((1, cfg.max_text_len), jnp.int32)
    logits, probs = jax.jit(model.apply)(params, images, ids, mask)
    assert np.isfinite(np.asarray(logits)).all()

    # Patch embed numeric parity vs torch conv2d.
    w = torch.tensor(sd["visual_encoder.patch_embed.proj.weight"])
    b = torch.tensor(sd["visual_encoder.patch_embed.proj.bias"])
    x = torch.tensor(np.asarray(images).transpose(0, 3, 1, 2))
    want = torch.nn.functional.conv2d(x, w, b, stride=16)
    want = want.flatten(2).transpose(1, 2).numpy()  # [1, P, C]

    kernel = params["params"]["visual_encoder"]["patch_embed"]["kernel"]
    bias = params["params"]["visual_encoder"]["patch_embed"]["bias"]
    x_np = np.asarray(images)  # [1, 48, 48, 3]
    patches = (
        x_np.reshape(1, 3, 16, 3, 16, 3)
        .transpose(0, 1, 3, 2, 4, 5)  # [b, ph, pw, h, w, c]
        .reshape(1, 9, 16 * 16 * 3)
    )
    got = patches @ np.asarray(kernel).reshape(16 * 16 * 3, -1) + np.asarray(
        bias
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_interpolates_pos_embed_on_size_mismatch():
    cfg = ModelConfig.tiny()  # 48px -> 9 patches
    rng = np.random.RandomState(2)
    sd = _tiny_torch_state_dict(cfg, rng)
    # Pretend the checkpoint was trained at 64px -> 16 patches.
    sd["visual_encoder.pos_embed"] = rng.randn(1, 17, 32).astype(np.float32)
    converted = convert_state_dict(sd, cfg, capture_layers=(0,))
    assert converted["params"]["visual_encoder"]["pos_embed"].shape == (
        1, 10, 32,
    )


def test_grouped_and_unrolled_layouts_agree():
    """Same torch weights through the grouped (scan) and unrolled (ensemble)
    parameter layouts must give identical ITM logits — guards the stacking
    order of nn.scan parameter groups."""
    cfg = ModelConfig.tiny()
    rng = np.random.RandomState(9)
    sd = _tiny_torch_state_dict(cfg, rng)

    images = jnp.asarray(rng.randn(2, 48, 48, 3), jnp.float32)
    ids = jnp.asarray(rng.randint(5, 50, (2, cfg.max_text_len)), jnp.int32)
    mask = jnp.ones((2, cfg.max_text_len), jnp.int32)

    # Grouped: capture layer 0 -> layers_pre empty, layer_0, layer_1 unrolled
    # ... use capture (1,) to exercise a non-empty scan group.
    p_grouped = convert_state_dict(sd, cfg, capture_layers=(1,))
    m_grouped = BlipITM(cfg, capture_layers=(1,), attn_impl="xla")
    lg, _ = jax.jit(m_grouped.apply)(p_grouped, images, ids, mask)

    # Unrolled (multi-capture path).
    p_unrolled = convert_state_dict(sd, cfg, capture_layers=(0, 1))
    m_unrolled = BlipITM(cfg, capture_layers=(0, 1), attn_impl="xla")
    lu, _ = jax.jit(m_unrolled.apply)(p_unrolled, images, ids, mask)

    np.testing.assert_allclose(
        np.asarray(lg), np.asarray(lu), rtol=1e-4, atol=1e-4
    )


def test_orbax_param_cache(tmp_path):
    """load_params_cached converts once then restores from the orbax cache."""
    torch = pytest.importorskip("torch")
    from pnp_ovss_tpu.models.cache import load_params_cached

    cfg = ModelConfig.tiny()
    sd = _tiny_torch_state_dict(cfg, np.random.RandomState(4))
    ckpt_path = str(tmp_path / "model.pth")
    torch.save({"model": {k: torch.tensor(v) for k, v in sd.items()}},
               ckpt_path)

    cache_dir = str(tmp_path / "cache")
    p1 = load_params_cached(ckpt_path, cfg, (0,), cache_dir=cache_dir)
    stores = list((tmp_path / "cache" / "params").iterdir())
    assert len(stores) == 1
    p2 = load_params_cached(ckpt_path, cfg, (0,), cache_dir=cache_dir)
    a = jax.tree.leaves(p1)
    b = jax.tree.leaves(p2)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
