"""Foreign-checkpoint ingestion drill (VERDICT r3 #5).

The importer/exporter had only ever round-tripped its OWN torch-saved
files; here genuinely foreign state_dicts are produced by torch nn.Module
graphs built to mirror the reference's module trees — the names come out
of torch's own module-walk, not our exporter — saved with torch.save,
then: load -> import -> eval-forward parity vs the torch model ->
export -> re-import -> exact equality. One drill per naming family:

* ViT_face depth-6 at flagship geometry (vit_face.py:449-548:
  ``transformer.layers.{i}.{0,1}.fn.fn...``, loralib lora.Linear on the
  FFN, CosFace ``loss.weight``)
* ViTs_face soft-split (vits_face.py:409-509: same naming, nn.Unfold
  patchify so patch_dim = c*ac_patch^2)
* loralib-surgered torchvision vit_b_16 (util/utils.py:552-576:
  ``encoder.layers.encoder_layer_{i}.mlp.{0,3}.lora_{A,B}``,
  nn.MultiheadAttention ``self_attention.in_proj_*``)

The torch modules below are independent re-derivations of the reference
semantics (loralib v0.1.2 lora.Linear: trainable lora_A (r,in), lora_B
(out,r), forward += x@A^T@B^T * alpha/r with default alpha=1) — NOT copies.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gslora_tpu.config import LoraConfig, ViTConfig  # noqa: E402
from gslora_tpu.models.import_torch import (  # noqa: E402
    from_state_dict, load_torch_state_dict, to_state_dict)
from gslora_tpu.models.vit import vit_apply  # noqa: E402
from gslora_tpu.models.vit_imagenet import (  # noqa: E402
    from_torchvision_state_dict, to_torchvision_state_dict)


class _LoraLinear(nn.Linear):
    """loralib lora.Linear semantics, re-derived: lora_A (r, in) and
    lora_B (out, r) registered as extra Parameters on the Linear (so the
    state_dict carries ``<name>.lora_A``/``.lora_B``), unmerged forward
    adds ``x @ A^T @ B^T * (alpha/r)`` with the loralib default alpha=1."""

    def __init__(self, in_f, out_f, r, gen):
        super().__init__(in_f, out_f, bias=True)
        self.r = r
        if r > 0:
            # nonzero A AND B so the adapter delta actually flows through
            # the ingestion (loralib inits B=0 which would hide bugs)
            self.lora_A = nn.Parameter(
                torch.randn(r, in_f, generator=gen) * 0.05)
            self.lora_B = nn.Parameter(
                torch.randn(out_f, r, generator=gen) * 0.05)

    def forward(self, x):
        y = super().forward(x)
        if self.r > 0:
            y = y + (x @ self.lora_A.T @ self.lora_B.T) * (1.0 / self.r)
        return y


class _Residual(nn.Module):
    def __init__(self, fn):
        super().__init__()
        self.fn = fn

    def forward(self, x):
        return self.fn(x) + x


class _PreNorm(nn.Module):
    def __init__(self, dim, fn):
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.fn = fn

    def forward(self, x):
        return self.fn(self.norm(x))


class _FaceAttention(nn.Module):
    """Manual MHA with the reference's dim**-0.5 scale quirk
    (vit_face.py:341-379) and fused biasless to_qkv."""

    def __init__(self, dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.scale = heads, dim ** -0.5
        self.to_qkv = nn.Linear(dim, inner * 3, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, dim), nn.Dropout(0.0))

    def forward(self, x):
        b, n, _ = x.shape
        q, k, v = self.to_qkv(x).chunk(3, dim=-1)
        q, k, v = (t.reshape(b, n, self.heads, -1).transpose(1, 2)
                   for t in (q, k, v))
        attn = ((q @ k.transpose(-2, -1)) * self.scale).softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, -1)
        return self.to_out(out)


class _FaceFFN(nn.Module):
    def __init__(self, dim, mlp_dim, r, gen):
        super().__init__()
        self.net = nn.Sequential(
            _LoraLinear(dim, mlp_dim, r, gen), nn.GELU(), nn.Dropout(0.0),
            _LoraLinear(mlp_dim, dim, r, gen), nn.Dropout(0.0))

    def forward(self, x):
        return self.net(x)


class _FaceTransformer(nn.Module):
    def __init__(self, cfg: ViTConfig, r, gen):
        super().__init__()
        self.layers = nn.ModuleList([
            nn.ModuleList([
                _Residual(_PreNorm(cfg.dim, _FaceAttention(
                    cfg.dim, cfg.heads, cfg.dim_head))),
                _Residual(_PreNorm(cfg.dim, _FaceFFN(
                    cfg.dim, cfg.mlp_dim, r, gen))),
            ]) for _ in range(cfg.depth)])

    def forward(self, x):
        for attn, ff in self.layers:
            x = ff(attn(x))
        return x


class _CosFace(nn.Module):
    """CosFace head (vit_face.py:146-208): s*(cos - m on target); the
    single parameter lands at ``loss.weight`` like the reference."""

    def __init__(self, dim, num_class, gen):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(num_class, dim,
                                               generator=gen))

    def forward(self, emb, labels, s=64.0, m=0.35):
        cos = F.normalize(emb) @ F.normalize(self.weight).T
        one_hot = torch.zeros_like(cos)
        one_hot.scatter_(1, labels.view(-1, 1).long(), 1.0)
        return s * (cos - one_hot * m)


class _TorchViTFace(nn.Module):
    """Reference ViT_face/ViTs_face module tree re-derivation: exact
    state_dict naming (patch_to_embedding, cls_token, pos_embedding,
    transformer.layers.{i}.{0,1}.fn.{norm,fn}..., mlp_head.0, loss)."""

    def __init__(self, cfg: ViTConfig, r, gen):
        super().__init__()
        self.cfg = cfg
        if cfg.soft_split:
            self.soft_split = nn.Unfold(
                kernel_size=cfg.ac_patch_size, stride=cfg.patch_size,
                padding=cfg.pad)
        self.patch_to_embedding = nn.Linear(cfg.patch_dim, cfg.dim)
        self.cls_token = nn.Parameter(torch.randn(1, 1, cfg.dim,
                                                  generator=gen) * 0.02)
        self.pos_embedding = nn.Parameter(
            torch.randn(1, cfg.seq_len, cfg.dim, generator=gen) * 0.02)
        self.transformer = _FaceTransformer(cfg, r, gen)
        self.mlp_head = nn.Sequential(nn.LayerNorm(cfg.dim))
        self.loss = _CosFace(cfg.dim, cfg.num_class, gen)

    def forward(self, img, labels):
        cfg = self.cfg
        if cfg.soft_split:
            x = self.soft_split(img).transpose(1, 2)
        else:
            b, c, h, w = img.shape
            p = cfg.patch_size
            # rearrange 'b c (h p1) (w p2) -> b (h w) (p1 p2 c)'
            # (vit_face.py:530 patchify layout)
            x = (img.reshape(b, c, h // p, p, w // p, p)
                 .permute(0, 2, 4, 3, 5, 1).reshape(b, -1, p * p * c))
        x = self.patch_to_embedding(x)
        x = torch.cat([self.cls_token.expand(x.shape[0], -1, -1), x], dim=1)
        x = x + self.pos_embedding
        x = self.transformer(x)
        emb = self.mlp_head(x[:, 0])
        return self.loss(emb, labels), emb


class _TvBlock(nn.Module):
    def __init__(self, dim, heads, mlp_dim, r, gen):
        super().__init__()
        self.ln_1 = nn.LayerNorm(dim)
        self.self_attention = nn.MultiheadAttention(dim, heads,
                                                    batch_first=True)
        self.ln_2 = nn.LayerNorm(dim)
        self.mlp = nn.Sequential(
            _LoraLinear(dim, mlp_dim, r, gen), nn.GELU(), nn.Dropout(0.0),
            _LoraLinear(mlp_dim, dim, r, gen), nn.Dropout(0.0))

    def forward(self, x):
        h = self.ln_1(x)
        x = x + self.self_attention(h, h, h, need_weights=False)[0]
        return x + self.mlp(self.ln_2(x))


class _TorchTvViT(nn.Module):
    """torchvision vit_b_16 module-tree re-derivation (conv_proj,
    class_token, encoder.pos_embedding, encoder.layers.encoder_layer_{i},
    encoder.ln, heads.head) with loralib-surgered .mlp linears
    (util/utils.py:552-576)."""

    def __init__(self, cfg: ViTConfig, r, gen):
        super().__init__()
        from collections import OrderedDict
        self.conv_proj = nn.Conv2d(cfg.channels, cfg.dim,
                                   kernel_size=cfg.patch_size,
                                   stride=cfg.patch_size)
        self.class_token = nn.Parameter(torch.randn(1, 1, cfg.dim,
                                                    generator=gen) * 0.02)
        enc = nn.Module()
        enc.pos_embedding = nn.Parameter(
            torch.randn(1, cfg.seq_len, cfg.dim, generator=gen) * 0.02)
        enc.layers = nn.Sequential(OrderedDict(
            (f"encoder_layer_{i}", _TvBlock(cfg.dim, cfg.heads,
                                            cfg.mlp_dim, r, gen))
            for i in range(cfg.depth)))
        enc.ln = nn.LayerNorm(cfg.dim)
        self.encoder = enc
        self.heads = nn.Sequential(OrderedDict(
            head=nn.Linear(cfg.dim, cfg.num_class)))

    def forward(self, img):
        x = self.conv_proj(img)
        b, d = x.shape[:2]
        x = x.reshape(b, d, -1).permute(0, 2, 1)
        x = torch.cat([self.class_token.expand(b, -1, -1), x], dim=1)
        x = x + self.encoder.pos_embedding
        x = self.encoder.ln(self.encoder.layers(x))
        emb = x[:, 0]
        return self.heads(emb), emb


def _roundtrip_face(cfg: ViTConfig, tmp_path, tag: str):
    gen = torch.Generator().manual_seed(3)
    lcfg = LoraConfig(rank=4)
    tmodel = _TorchViTFace(cfg, lcfg.rank, gen).eval()
    path = str(tmp_path / f"{tag}.pth")
    torch.save(tmodel.state_dict(), path)

    sd = load_torch_state_dict(path)
    params = from_state_dict(sd, cfg, lcfg)

    rng = np.random.RandomState(0)
    img = rng.rand(2, 3, cfg.image_size, cfg.image_size).astype(np.float32)
    labels = np.array([1, 7])
    with torch.no_grad():
        logits_t, emb_t = tmodel(torch.from_numpy(img),
                                 torch.from_numpy(labels))
    logits_j, emb_j = vit_apply(params, jnp.asarray(img),
                                jnp.asarray(labels), cfg, lcfg,
                                train=False, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(emb_j), emb_t.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(),
                               rtol=2e-3, atol=2e-3)

    # export -> re-import: bit-exact round trip of every leaf
    back = from_state_dict(to_state_dict(params, cfg), cfg, lcfg)
    flat = {jax.tree_util.keystr(p): leaf for p, leaf in
            jax.tree_util.tree_leaves_with_path(back)}
    for p, leaf in jax.tree_util.tree_leaves_with_path(params):
        k = jax.tree_util.keystr(p)
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat[k]), err_msg=k)
    # ... and the exported names are exactly the foreign file's names
    assert set(to_state_dict(params, cfg)) == set(sd)


def test_foreign_vit_face_flagship(tmp_path):
    """Flagship geometry (train_own_forget.py:553-567): depth-6 dim-512
    112px p8 CosFace-100 — the shipped-checkpoint configuration."""
    cfg = ViTConfig(dropout=0.0, emb_dropout=0.0)
    _roundtrip_face(cfg, tmp_path, "vit_face_d6")


def test_foreign_vits_face_soft_split(tmp_path):
    """ViTs_face: nn.Unfold soft-split patchify (vits_face.py:446-450,
    ac_patch 12 / stride 8 / pad 4) — patch_dim 432, same naming."""
    cfg = ViTConfig(image_size=16, dim=64, depth=2, heads=2, dim_head=32,
                    mlp_dim=128, num_class=10, dropout=0.0, emb_dropout=0.0,
                    soft_split=True, ac_patch_size=12, pad=4)
    _roundtrip_face(cfg, tmp_path, "vits_face")


def test_foreign_torchvision_b16_surgered(tmp_path):
    """Surgered torchvision naming: nn.MultiheadAttention in_proj_*/
    out_proj + loralib keys on .mlp.{0,3} (replace_ffn_with_lora)."""
    import dataclasses
    cfg = dataclasses.replace(
        ViTConfig.vit_b16(num_class=10), image_size=32, dim=64, depth=2,
        heads=2, dim_head=32, mlp_dim=128)
    gen = torch.Generator().manual_seed(5)
    lcfg = LoraConfig(rank=4)
    tmodel = _TorchTvViT(cfg, lcfg.rank, gen).eval()
    path = str(tmp_path / "tv_b16.pth")
    torch.save(tmodel.state_dict(), path)

    sd = load_torch_state_dict(path)
    params = from_torchvision_state_dict(sd, cfg, lcfg)

    rng = np.random.RandomState(1)
    img = rng.rand(2, 3, 32, 32).astype(np.float32)
    labels = np.array([0, 3])
    with torch.no_grad():
        logits_t, emb_t = tmodel(torch.from_numpy(img))
    logits_j, emb_j = vit_apply(params, jnp.asarray(img),
                                jnp.asarray(labels), cfg, lcfg,
                                train=False, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(emb_j), emb_t.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(),
                               rtol=2e-3, atol=2e-3)

    out = to_torchvision_state_dict(params, cfg)
    assert set(out) == set(sd)
    back = from_torchvision_state_dict(out, cfg, lcfg)
    flat = {jax.tree_util.keystr(p): leaf for p, leaf in
            jax.tree_util.tree_leaves_with_path(back)}
    for p, leaf in jax.tree_util.tree_leaves_with_path(params):
        k = jax.tree_util.keystr(p)
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat[k]), err_msg=k)
