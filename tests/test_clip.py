"""CLIP reward model tests: torch oracle parity, converter, BPE tokenizer.

The search subsystem's independent reward model (reference driver
:1370-1372 loads LAVIS CLIP ViT-L-14-336). A from-scratch torch forward in
the OpenAI CLIP layout acts as the numeric oracle for the Flax towers.
"""

import math

import jax
import numpy as np
import pytest

from pnp_ovss_tpu.config import CLIPConfig
from pnp_ovss_tpu.models.clip import CLIPModel, init_clip_params
from pnp_ovss_tpu.models.convert import convert_clip_state_dict
from pnp_ovss_tpu.text.bpe import CLIPBPETokenizer

torch = pytest.importorskip("torch")


def _tiny_clip_state_dict(cfg: CLIPConfig, rng):
    """Random state dict in the OpenAI CLIP layout (tiny config)."""
    sd = {}

    def lin(name, i, o):
        sd[name + ".weight"] = rng.randn(o, i).astype(np.float32) * 0.05
        sd[name + ".bias"] = rng.randn(o).astype(np.float32) * 0.05

    def ln(name, n):
        sd[name + ".weight"] = 1 + rng.randn(n).astype(np.float32) * 0.02
        sd[name + ".bias"] = rng.randn(n).astype(np.float32) * 0.02

    def resblocks(prefix, n, w):
        for i in range(n):
            b = f"{prefix}.resblocks.{i}"
            ln(b + ".ln_1", w)
            sd[b + ".attn.in_proj_weight"] = (
                rng.randn(3 * w, w).astype(np.float32) * 0.05
            )
            sd[b + ".attn.in_proj_bias"] = (
                rng.randn(3 * w).astype(np.float32) * 0.05
            )
            lin(b + ".attn.out_proj", w, w)
            ln(b + ".ln_2", w)
            lin(b + ".mlp.c_fc", w, 4 * w)
            lin(b + ".mlp.c_proj", 4 * w, w)

    v, t = cfg.vision, cfg.text
    sd["visual.conv1.weight"] = (
        rng.randn(v.hidden_size, 3, v.patch_size, v.patch_size).astype(
            np.float32
        )
        * 0.05
    )
    sd["visual.class_embedding"] = rng.randn(v.hidden_size).astype(np.float32)
    sd["visual.positional_embedding"] = (
        rng.randn(v.num_patches + 1, v.hidden_size).astype(np.float32) * 0.05
    )
    ln("visual.ln_pre", v.hidden_size)
    resblocks("visual.transformer", v.num_layers, v.hidden_size)
    ln("visual.ln_post", v.hidden_size)
    sd["visual.proj"] = (
        rng.randn(v.hidden_size, v.embed_dim).astype(np.float32) * 0.05
    )

    sd["token_embedding.weight"] = (
        rng.randn(t.vocab_size, t.hidden_size).astype(np.float32) * 0.05
    )
    sd["positional_embedding"] = (
        rng.randn(t.context_length, t.hidden_size).astype(np.float32) * 0.05
    )
    resblocks("transformer", t.num_layers, t.hidden_size)
    ln("ln_final", t.hidden_size)
    sd["text_projection"] = (
        rng.randn(t.hidden_size, t.embed_dim).astype(np.float32) * 0.05
    )
    return sd


def _torch_clip(sd, cfg, images_nchw, ids):
    """Functional torch forward in the OpenAI layout (both towers)."""
    import torch.nn.functional as F

    t = {k: torch.tensor(v) for k, v in sd.items()}

    def ln(x, name, eps):
        mu = x.mean(-1, keepdim=True)
        var = x.var(-1, unbiased=False, keepdim=True)
        return (x - mu) / torch.sqrt(var + eps) * t[name + ".weight"] + t[
            name + ".bias"
        ]

    def transformer(x, prefix, n, heads, causal):
        B, S, W = x.shape
        hd = W // heads
        mask = None
        if causal:
            mask = torch.triu(torch.full((S, S), -1e9), diagonal=1)
        for i in range(n):
            b = f"{prefix}.resblocks.{i}"
            h = ln(x, b + ".ln_1", 1e-5)
            qkv = h @ t[b + ".attn.in_proj_weight"].T + t[
                b + ".attn.in_proj_bias"
            ]
            q, k, v = qkv.chunk(3, dim=-1)

            def split(z):
                return z.reshape(B, S, heads, hd).transpose(1, 2)

            q, k, v = split(q), split(k), split(v)
            att = q @ k.transpose(-1, -2) / math.sqrt(hd)
            if mask is not None:
                att = att + mask
            att = torch.softmax(att, -1)
            o = (att @ v).transpose(1, 2).reshape(B, S, W)
            x = x + o @ t[b + ".attn.out_proj.weight"].T + t[
                b + ".attn.out_proj.bias"
            ]
            h = ln(x, b + ".ln_2", 1e-5)
            h = h @ t[b + ".mlp.c_fc.weight"].T + t[b + ".mlp.c_fc.bias"]
            h = h * torch.sigmoid(1.702 * h)  # quickGELU
            x = x + h @ t[b + ".mlp.c_proj.weight"].T + t[
                b + ".mlp.c_proj.bias"
            ]
        return x

    v = cfg.vision
    B = images_nchw.shape[0]
    x = F.conv2d(images_nchw, t["visual.conv1.weight"], stride=v.patch_size)
    x = x.flatten(2).transpose(1, 2)
    cls = t["visual.class_embedding"].expand(B, 1, -1)
    x = torch.cat([cls, x], dim=1) + t["visual.positional_embedding"]
    x = ln(x, "visual.ln_pre", 1e-5)
    x = transformer(x, "visual.transformer", v.num_layers, v.num_heads,
                    causal=False)
    img_z = ln(x[:, 0], "visual.ln_post", 1e-5) @ t["visual.proj"]
    img_z = img_z / img_z.norm(dim=-1, keepdim=True)

    c = cfg.text
    x = t["token_embedding.weight"][ids] + t["positional_embedding"]
    x = transformer(x, "transformer", c.num_layers, c.num_heads, causal=True)
    x = ln(x, "ln_final", 1e-5)
    eot = ids.argmax(dim=-1)
    txt_z = x[torch.arange(x.shape[0]), eot] @ t["text_projection"]
    txt_z = txt_z / txt_z.norm(dim=-1, keepdim=True)
    return img_z, txt_z


def test_clip_matches_torch_oracle():
    cfg = CLIPConfig.tiny()
    rng = np.random.RandomState(3)
    sd = _tiny_clip_state_dict(cfg, rng)

    B = 2
    images = rng.randn(
        B, cfg.vision.image_size, cfg.vision.image_size, 3
    ).astype(np.float32)
    ids = np.zeros((B, cfg.text.context_length), np.int64)
    ids[:, 0] = 126  # SOT-ish
    ids[0, 1:4] = [5, 9, 127]
    ids[1, 1:6] = [7, 7, 2, 4, 127]

    img_t, txt_t = _torch_clip(
        sd, cfg, torch.tensor(images.transpose(0, 3, 1, 2)),
        torch.tensor(ids),
    )

    params = convert_clip_state_dict(sd, cfg)
    model = CLIPModel(cfg)
    img_j, txt_j = jax.jit(
        lambda im, i: model.apply(params, im, i)
    )(images, ids.astype(np.int32))

    np.testing.assert_allclose(
        np.asarray(img_j), img_t.numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(txt_j), txt_t.numpy(), rtol=2e-4, atol=2e-4
    )


def test_clip_converter_matches_init_structure():
    cfg = CLIPConfig.tiny()
    rng = np.random.RandomState(0)
    sd = _tiny_clip_state_dict(cfg, rng)
    converted = convert_clip_state_dict(sd, cfg)
    init = init_clip_params(jax.random.PRNGKey(0), cfg)
    conv_shapes = jax.tree.map(lambda x: tuple(np.shape(x)), converted)
    init_shapes = jax.tree.map(lambda x: tuple(np.shape(x)), init)
    assert conv_shapes == init_shapes


def test_clip_torchscript_archive_loads(tmp_path):
    """OpenAI ships ViT-L-14-336px.pt as a TorchScript archive (not a
    plain pickle): load_clip_checkpoint must read it via torch.jit.load
    and convert identically to the raw state dict."""
    from pnp_ovss_tpu.models.convert import load_clip_checkpoint

    cfg = CLIPConfig.tiny()
    rng = np.random.RandomState(4)
    sd = _tiny_clip_state_dict(cfg, rng)

    class Holder(torch.nn.Module):
        def forward(self):
            return 0

    root = Holder()
    for k, v in sd.items():
        parts = k.split(".")
        m = root
        for p in parts[:-1]:
            if not hasattr(m, p):
                m.add_module(p, Holder())
            m = getattr(m, p)
        m.register_buffer(parts[-1], torch.tensor(np.asarray(v)))
    path = str(tmp_path / "clip_tiny.pt")
    torch.jit.save(torch.jit.script(root), path)

    got = load_clip_checkpoint(path, cfg)
    want = convert_clip_state_dict(sd, cfg)
    flat_g = jax.tree_util.tree_leaves_with_path(got)
    flat_w = dict(jax.tree_util.tree_leaves_with_path(want))
    assert len(flat_g) == len(flat_w)
    for p, leaf in flat_g:
        np.testing.assert_allclose(leaf, flat_w[p], rtol=1e-6, atol=1e-7)


def test_clip_scorer_end_to_end():
    from pnp_ovss_tpu.cli.search import make_clip_scorer

    cfg = CLIPConfig.tiny()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    tok = CLIPBPETokenizer.toy(["dog", "cat", "grass"])
    scorer = make_clip_scorer(
        CLIPModel(cfg), params, tok,
        image_size=cfg.vision.image_size,
        context_length=cfg.text.context_length,
    )
    rng = np.random.RandomState(0)
    images = rng.rand(4, 40, 40, 3).astype(np.float32)  # resized inside
    probs = scorer(images, ["dog", "cat", "grass"])
    assert probs.shape == (4, 3)
    np.testing.assert_allclose(probs.sum(-1), np.ones(4), rtol=1e-5)


def test_bpe_toy_single_token_words():
    tok = CLIPBPETokenizer.toy(["dog", "cat"])
    ids = tok.encode("a Dog and a cat")
    # "dog" and "cat" collapse to single merged tokens.
    assert tok.decoder[ids[-1]] == "cat</w>"
    assert "dog</w>" in [tok.decoder[i] for i in ids]
    batch = tok.encode_batch(["dog", "cat dog"], context_length=8)
    assert batch.shape == (2, 8)
    assert (batch[:, 0] == tok.sot_id).all()
    assert tok.eot_id in batch[0] and tok.eot_id in batch[1]
    # EOT is the largest id => argmax finds it (the text tower's pooling).
    assert batch[0].argmax() == list(batch[0]).index(tok.eot_id)


def test_bpe_merge_order_is_rank_greedy():
    """BPE must apply the LOWEST-rank merge first, not left-to-right."""
    chars = list("abcd")
    from pnp_ovss_tpu.text.bpe import bytes_to_unicode

    vocab = list(bytes_to_unicode().values())
    vocab += [c + "</w>" for c in vocab]
    merges = [("b", "c"), ("a", "bc"), ("abc", "d</w>")]
    vocab += ["bc", "abc", "abcd</w>", CLIPBPETokenizer.SOT,
              CLIPBPETokenizer.EOT]
    tok = CLIPBPETokenizer(merges, vocab)
    assert tok.bpe("abcd") == "abcd</w>"
    # A word the merges don't fully cover falls back to chars.
    assert tok.bpe("ba") == "b a</w>"


def test_clip_block_pallas_flat_matches_xla():
    """CLIPBlock vision path with impl='pallas' (qkv-view flat flash
    kernel, no head transposes) == the einsum path, at a flat-supported
    shape (s=150, d=64)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pnp_ovss_tpu.models.clip import CLIPBlock

    b, s, hidden, heads = 2, 150, 128, 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, s, hidden) * 0.1, jnp.float32)

    def run(impl):
        blk = CLIPBlock(hidden_size=hidden, num_heads=heads, mlp_ratio=4.0,
                        eps=1e-5, dtype="float32", causal=False, impl=impl)
        p = blk.init(jax.random.PRNGKey(0), x)
        return np.asarray(blk.apply(p, x))

    np.testing.assert_allclose(run("pallas"), run("xla"),
                               rtol=2e-4, atol=2e-4)
