"""Forward parity: our JAX ViT vs an independent torch re-derivation of the
reference forward math (vit_face.py:523-548), sharing weights through the
reference state_dict naming (export -> torch compute -> compare)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslora_tpu.config import LoraConfig, ViTConfig
from gslora_tpu.models.import_torch import from_state_dict, to_state_dict
from gslora_tpu.models.vit import init_vit_params, vit_apply

CFG = ViTConfig(image_size=32, patch_size=8, dim=64, depth=3, heads=4,
                dim_head=16, mlp_dim=128, num_class=10, dropout=0.0,
                emb_dropout=0.0)
LORA = LoraConfig(rank=4)


def _torch_reference_forward(sd, img_np, cfg: ViTConfig, lora_r: int,
                             labels_np):
    """Independent torch implementation of the reference ViT_face eval-mode
    forward, directly from the state_dict."""
    import torch
    import torch.nn.functional as F
    from einops import rearrange as rr

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    x = torch.from_numpy(img_np)
    p = cfg.patch_size
    x = rr(x, "b c (h p1) (w p2) -> b (h w) (p1 p2 c)", p1=p, p2=p)
    x = x @ t["patch_to_embedding.weight"].T + t["patch_to_embedding.bias"]
    b = x.shape[0]
    cls = t["cls_token"].expand(b, 1, cfg.dim)
    x = torch.cat([cls, x], dim=1)
    x = x + t["pos_embedding"][:, : x.shape[1]]
    scaling = 1.0 / lora_r
    for i in range(cfg.depth):
        pre = f"transformer.layers.{i}"
        h = F.layer_norm(x, (cfg.dim,), t[f"{pre}.0.fn.norm.weight"],
                         t[f"{pre}.0.fn.norm.bias"])
        qkv = h @ t[f"{pre}.0.fn.fn.to_qkv.weight"].T
        q, k, v = qkv.chunk(3, dim=-1)
        q = rr(q, "b n (h d) -> b h n d", h=cfg.heads)
        k = rr(k, "b n (h d) -> b h n d", h=cfg.heads)
        v = rr(v, "b n (h d) -> b h n d", h=cfg.heads)
        dots = torch.einsum("bhid,bhjd->bhij", q, k) * cfg.dim ** -0.5
        attn = dots.softmax(dim=-1)
        out = torch.einsum("bhij,bhjd->bhid", attn, v)
        out = rr(out, "b h n d -> b n (h d)")
        out = out @ t[f"{pre}.0.fn.fn.to_out.0.weight"].T + \
            t[f"{pre}.0.fn.fn.to_out.0.bias"]
        x = x + out
        h = F.layer_norm(x, (cfg.dim,), t[f"{pre}.1.fn.norm.weight"],
                         t[f"{pre}.1.fn.norm.bias"])
        u = h @ t[f"{pre}.1.fn.fn.net.0.weight"].T + \
            t[f"{pre}.1.fn.fn.net.0.bias"]
        u = u + (h @ t[f"{pre}.1.fn.fn.net.0.lora_A"].T) @ \
            t[f"{pre}.1.fn.fn.net.0.lora_B"].T * scaling
        u = F.gelu(u)  # exact erf gelu (torch default)
        y = u @ t[f"{pre}.1.fn.fn.net.3.weight"].T + \
            t[f"{pre}.1.fn.fn.net.3.bias"]
        y = y + (u @ t[f"{pre}.1.fn.fn.net.3.lora_A"].T) @ \
            t[f"{pre}.1.fn.fn.net.3.lora_B"].T * scaling
        x = x + y
    pooled = x[:, 0]
    emb = F.layer_norm(pooled, (cfg.dim,), t["mlp_head.0.weight"],
                       t["mlp_head.0.bias"])
    # CosFace head (vit_face.py:171-208)
    cosine = F.linear(F.normalize(emb), F.normalize(t["loss.weight"]))
    one_hot = torch.zeros_like(cosine)
    one_hot.scatter_(1, torch.from_numpy(labels_np).view(-1, 1).long(), 1)
    logits = (one_hot * (cosine - 0.35) + (1 - one_hot) * cosine) * 64.0
    return logits.numpy(), emb.numpy()


def test_forward_parity_with_torch_rederivation():
    pytest.importorskip("torch")
    params = init_vit_params(jax.random.key(0), CFG, LORA)
    # make LoRA non-trivial so the LoRA path is checked too
    params["lora"]["ffn"]["B1"] = 0.3 * jax.random.normal(
        jax.random.key(1), params["lora"]["ffn"]["B1"].shape)
    params["lora"]["ffn"]["B2"] = 0.3 * jax.random.normal(
        jax.random.key(2), params["lora"]["ffn"]["B2"].shape)

    img = np.random.RandomState(3).rand(2, 3, 32, 32).astype(np.float32)
    labels = np.array([1, 7])
    logits_j, emb_j = vit_apply(params, jnp.asarray(img), jnp.asarray(labels),
                                CFG, LORA, train=False,
                                compute_dtype=jnp.float32)
    sd = to_state_dict(params, CFG)
    logits_t, emb_t = _torch_reference_forward(sd, img, CFG, LORA.rank,
                                               labels)
    np.testing.assert_allclose(np.asarray(emb_j), emb_t, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t, rtol=2e-3,
                               atol=2e-3)


def test_state_dict_roundtrip():
    params = init_vit_params(jax.random.key(4), CFG, LORA)
    params["lora"]["ffn"]["B1"] = jnp.ones_like(params["lora"]["ffn"]["B1"])
    sd = to_state_dict(params, CFG)
    back = from_state_dict(sd, CFG, LORA)
    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = {jax.tree_util.keystr(p): l for p, l in
             jax.tree_util.tree_leaves_with_path(back)}
    for path, leaf in flat1:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat2[key]),
                                   rtol=1e-6, atol=1e-6, err_msg=key)


def test_missing_lora_keys_tolerated_missing_base_raises():
    params = init_vit_params(jax.random.key(5), CFG, LORA)
    sd = to_state_dict(params, CFG)
    sd_no_lora = {k: v for k, v in sd.items() if "lora" not in k}
    tree = from_state_dict(sd_no_lora, CFG, LORA)
    assert float(jnp.abs(tree["lora"]["ffn"]["A1"]).max()) == 0.0
    bad = dict(sd)
    del bad["patch_to_embedding.weight"]
    with pytest.raises(KeyError):
        from_state_dict(bad, CFG, LORA)
    # a backbone-only checkpoint against a margin-head config must fail AT
    # LOAD with the offending key named, not with a KeyError deep inside
    # the first jitted forward (the reference's strict resume check exits
    # on any missing non-lora key, train_own_forget.py:632-638)
    headless = {k: v for k, v in sd.items() if not k.startswith("loss.")}
    with pytest.raises(KeyError, match="loss.weight"):
        from_state_dict(headless, CFG, LORA)


def test_merged_attention_lora_layout():
    """Attention-placement LoRA: (3r, d)/(3*inner, r) MergedLinear layout
    maps onto (3, r, d)/(3, inner, r) and contributes per-chunk deltas."""
    import torch
    lcfg = LoraConfig(rank=2, pos="Attention")
    params = init_vit_params(jax.random.key(6), CFG, lcfg)
    params["lora"]["attn"]["B"] = 0.5 * jax.random.normal(
        jax.random.key(7), params["lora"]["attn"]["B"].shape)
    sd = to_state_dict(params, CFG)
    assert sd["transformer.layers.0.0.fn.fn.to_qkv.lora_A"].shape == (6, 64)
    back = from_state_dict(sd, CFG, lcfg)
    np.testing.assert_allclose(np.asarray(back["lora"]["attn"]["B"]),
                               np.asarray(params["lora"]["attn"]["B"]))
