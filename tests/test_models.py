"""Model forward: shapes, determinism, patchify layout, head math vs torch
formulas (cross-checked against torch CPU where informative)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslora_tpu.config import LoraConfig, ViTConfig
from gslora_tpu.models.heads import (arcface_head, cosface_head, sface_head,
                                     softmax_head)
from gslora_tpu.models.vit import init_vit_params, patchify, vit_apply, \
    vit_embed

CFG = ViTConfig(image_size=32, patch_size=8, dim=64, depth=2, heads=4,
                dim_head=16, mlp_dim=128, num_class=10, dropout=0.1,
                emb_dropout=0.1)
LORA = LoraConfig(rank=4)


def _params():
    return init_vit_params(jax.random.key(0), CFG, LORA)


def test_forward_shapes_and_determinism():
    params = _params()
    x = jax.random.normal(jax.random.key(1), (3, 3, 32, 32))
    y = jnp.array([0, 1, 2])
    logits, emb = vit_apply(params, x, y, CFG, LORA, train=False,
                            compute_dtype=jnp.float32)
    assert logits.shape == (3, 10)
    assert emb.shape == (3, 64)
    logits2, _ = vit_apply(params, x, y, CFG, LORA, train=False,
                           compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2))
    # no-label path returns embedding only
    emb_only = vit_apply(params, x, None, CFG, LORA, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(emb_only), np.asarray(emb),
                               rtol=1e-5, atol=1e-5)


def test_lora_zero_init_is_identity():
    """B=0 at init ⇒ forward must equal the no-LoRA forward exactly."""
    params = _params()
    x = jax.random.normal(jax.random.key(2), (2, 3, 32, 32))
    with_lora = vit_embed(params, x, CFG, LORA, compute_dtype=jnp.float32)
    no_lora = vit_embed({"base": params["base"], "lora": {}}, x, CFG, LORA,
                        compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(with_lora), np.asarray(no_lora),
                               rtol=1e-6, atol=1e-6)


def test_nonzero_lora_changes_output():
    params = _params()
    params["lora"]["ffn"]["B1"] = jax.random.normal(
        jax.random.key(3), params["lora"]["ffn"]["B1"].shape)
    x = jax.random.normal(jax.random.key(4), (2, 3, 32, 32))
    a = vit_embed(params, x, CFG, LORA, compute_dtype=jnp.float32)
    b = vit_embed({"base": params["base"], "lora": {}}, x, CFG, LORA,
                  compute_dtype=jnp.float32)
    assert float(jnp.abs(a - b).max()) > 1e-4


def test_dropout_active_in_train_mode():
    params = _params()
    x = jax.random.normal(jax.random.key(5), (2, 3, 32, 32))
    e1 = vit_embed(params, x, CFG, LORA, train=True, rng=jax.random.key(10),
                   compute_dtype=jnp.float32)
    e2 = vit_embed(params, x, CFG, LORA, train=True, rng=jax.random.key(11),
                   compute_dtype=jnp.float32)
    assert float(jnp.abs(e1 - e2).max()) > 1e-5


def test_patchify_layout_matches_reference():
    """hard split: b c (h p1)(w p2) -> b (h w) (p1 p2 c) (vit_face.py:530)"""
    img = np.arange(2 * 3 * 16 * 16, dtype=np.float32).reshape(2, 3, 16, 16)
    cfg = ViTConfig(image_size=16, patch_size=8)
    out = np.asarray(patchify(jnp.asarray(img), cfg))
    assert out.shape == (2, 4, 192)
    # manual: patch (0,0) of batch 0: img[0,:, :8,:8] laid out (p1,p2,c)
    want = img[0, :, :8, :8].transpose(1, 2, 0).reshape(-1)
    np.testing.assert_allclose(out[0, 0], want)


def test_soft_split_matches_torch_unfold():
    torch = pytest.importorskip("torch")
    img = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
    cfg = ViTConfig(image_size=32, patch_size=8, ac_patch_size=12, pad=4,
                    soft_split=True)
    ours = np.asarray(patchify(jnp.asarray(img), cfg))
    ref = torch.nn.functional.unfold(
        torch.from_numpy(img), kernel_size=(12, 12), stride=(8, 8),
        padding=(4, 4)).transpose(1, 2).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


# ----------------------------- heads ------------------------------------


def test_cosface_margin_math():
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(10, 64).astype(np.float32))
    emb = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    labels = jnp.array([0, 3, 5, 9])
    out = np.asarray(cosface_head({"weight": w}, emb, labels))
    # manual
    wn = np.asarray(w) / np.linalg.norm(w, axis=1, keepdims=True)
    en = np.asarray(emb) / np.linalg.norm(emb, axis=1, keepdims=True)
    cos = en @ wn.T
    want = cos.copy()
    for i, l in enumerate([0, 3, 5, 9]):
        want[i, l] -= 0.35
    want *= 64.0
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_arcface_vs_torch_formula():
    torch = pytest.importorskip("torch")
    import math
    rng = np.random.RandomState(2)
    w = rng.randn(10, 64).astype(np.float32)
    emb = rng.randn(4, 64).astype(np.float32)
    labels = np.array([1, 2, 3, 4])
    ours = np.asarray(arcface_head({"weight": jnp.asarray(w)},
                                   jnp.asarray(emb), jnp.asarray(labels)))
    # torch re-derivation of vit_face.py:72-143
    tw, te = torch.from_numpy(w), torch.from_numpy(emb)
    cosine = torch.nn.functional.linear(
        torch.nn.functional.normalize(te), torch.nn.functional.normalize(tw))
    sine = torch.sqrt(torch.clamp(1.0 - cosine ** 2, min=0))
    m = 0.50
    phi = cosine * math.cos(m) - sine * math.sin(m)
    th, mm = math.cos(math.pi - m), math.sin(math.pi - m) * m
    phi = torch.where(cosine > th, phi, cosine - mm)
    one_hot = torch.zeros_like(cosine)
    one_hot.scatter_(1, torch.from_numpy(labels).view(-1, 1), 1)
    want = ((one_hot * phi) + (1 - one_hot) * cosine) * 64.0
    np.testing.assert_allclose(ours, want.numpy(), rtol=1e-4, atol=1e-4)


def test_softmax_head_is_linear():
    rng = np.random.RandomState(3)
    w = rng.randn(10, 64).astype(np.float32)
    b = rng.randn(10).astype(np.float32)
    emb = rng.randn(4, 64).astype(np.float32)
    out = np.asarray(softmax_head({"weight": jnp.asarray(w),
                                   "bias": jnp.asarray(b)},
                                  jnp.asarray(emb), jnp.array([0, 1, 2, 3])))
    np.testing.assert_allclose(out, emb @ w.T + b, rtol=1e-5, atol=1e-5)


def test_sface_returns_six_tuple():
    rng = np.random.RandomState(4)
    w = jnp.asarray(rng.randn(10, 64).astype(np.float32))
    emb = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    out = sface_head({"weight": w}, emb, jnp.array([0, 1, 2, 3]))
    assert len(out) == 6
    assert out[0].shape == (4, 10)
    assert np.isfinite(float(out[1]))


def test_attn_impl_bnhd_matches_xla():
    """The head-trailing (b,n,h,d) attention layout is a pure layout
    change — logits must match the default einsum path exactly (same
    dtype chain, same reductions)."""
    import dataclasses
    cfg = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                    dim_head=16, mlp_dim=64, num_class=6, dropout=0.0,
                    emb_dropout=0.0, head_type="Softmax")
    lora = LoraConfig(rank=4)
    params = init_vit_params(jax.random.key(0), cfg, lora)
    x = jax.random.normal(jax.random.key(1), (3, 3, 16, 16))
    y = jnp.array([0, 1, 2])
    lx, ex = vit_apply(params, x, y, cfg, lora, train=False,
                       compute_dtype=jnp.float32)
    cfg2 = dataclasses.replace(cfg, attn_impl="bnhd")
    lb, eb = vit_apply(params, x, y, cfg2, lora, train=False,
                       compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lb),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ex), np.asarray(eb),
                               rtol=1e-5, atol=1e-5)


def test_scan_unroll_preserves_forward_and_grads():
    """scan_unroll (the round-3 perf lever: full block-unroll on
    accelerators) must be numerics-preserving: unroll=depth matches the
    plain scan (unroll=1) in both the forward and the LoRA gradients.
    Measured bit-exact on TPU (DEVNOTES round 3); guarded here on CPU."""
    import dataclasses
    params = _params()
    x = jax.random.normal(jax.random.key(5), (3, 3, 32, 32))
    y = jnp.array([1, 2, 3])
    cfg_scan = dataclasses.replace(CFG, dropout=0.0, emb_dropout=0.0,
                                   scan_unroll=1)
    cfg_unrl = dataclasses.replace(cfg_scan, scan_unroll=CFG.depth)

    outs = {}
    for name, cfg in (("scan", cfg_scan), ("unroll", cfg_unrl)):
        def loss_fn(lora, cfg=cfg):
            p = {"base": params["base"], "lora": lora}
            logits, _ = vit_apply(p, x, y, cfg, LORA, train=False,
                                  compute_dtype=jnp.float32)
            lab = jax.nn.one_hot(y, cfg.num_class)
            return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * lab, -1))
        val, grads = jax.jit(jax.value_and_grad(loss_fn))(params["lora"])
        outs[name] = (float(val), grads)

    assert np.isclose(outs["scan"][0], outs["unroll"][0], rtol=1e-6)
    flat_s = {jax.tree_util.keystr(p): l for p, l in
              jax.tree_util.tree_leaves_with_path(outs["scan"][1])}
    for p, leaf in jax.tree_util.tree_leaves_with_path(outs["unroll"][1]):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_s[jax.tree_util.keystr(p)]),
            rtol=1e-5, atol=1e-7, err_msg=jax.tree_util.keystr(p))


@pytest.mark.parametrize("impl", ["bits16", "bits32", "bits8"])
def test_bits_dropout_distribution_and_values(impl):
    """dropout_impl="bits16"/"bits32"/"bits8" must behave as inverted dropout:
    outputs are exactly 0 or x/keep, keep-rate matches within
    quantization+sampling tolerance, deterministic under the same key,
    and the train forward stays dropout-active."""
    from gslora_tpu.models.vit import _dropout
    rate = 0.1
    x = jnp.ones((64, 1024), jnp.float32)
    y = _dropout(x, rate, jax.random.key(0), False, impl=impl)
    vals = np.unique(np.asarray(y).round(6))
    np.testing.assert_allclose(vals, [0.0, 1.0 / (1.0 - rate)], atol=1e-6)
    keep_frac = float((y > 0).mean())
    assert abs(keep_frac - (1.0 - rate)) < 0.01, keep_frac
    y2 = _dropout(x, rate, jax.random.key(0), False, impl=impl)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
    # odd element count exercises the bitcast pad/slice path
    xo = jnp.ones((3, 5, 7), jnp.float32)
    yo = _dropout(xo, rate, jax.random.key(1), False, impl=impl)
    assert yo.shape == xo.shape

    import dataclasses
    cfg = dataclasses.replace(CFG, dropout_impl=impl)
    params = _params()
    xb = jax.random.normal(jax.random.key(5), (2, 3, 32, 32))
    e1 = vit_embed(params, xb, cfg, LORA, train=True, rng=jax.random.key(10),
                   compute_dtype=jnp.float32)
    e2 = vit_embed(params, xb, cfg, LORA, train=True, rng=jax.random.key(11),
                   compute_dtype=jnp.float32)
    assert float(jnp.abs(e1 - e2).max()) > 1e-5
    # eval mode unaffected by the impl knob
    d1 = vit_embed(params, xb, cfg, LORA, train=False,
                   compute_dtype=jnp.float32)
    d2 = vit_embed(params, xb, CFG, LORA, train=False,
                   compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2))


def test_ln_gelu_perf_knobs():
    """ViTConfig.ln_dtype / gelu_impl (perf-ablation knobs, VERDICT r3 #4):
    with fp32 compute the "bf16" variants are exact no-ops (the input is
    already fp32, so keeping its dtype == the fp32 default), tanh GELU is
    close-but-diverging, and under bf16 compute every knob stays within
    bf16-roundoff of the parity default."""
    import dataclasses
    params = _params()
    x = jax.random.normal(jax.random.key(5), (2, 3, 32, 32))

    ref32 = vit_embed(params, x, CFG, LORA, compute_dtype=jnp.float32)
    for knob in (dict(ln_dtype="bf16"), dict(gelu_impl="erf_bf16")):
        cfg = dataclasses.replace(CFG, **knob)
        out = vit_embed(params, x, cfg, LORA, compute_dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref32),
                                      err_msg=str(knob))
    tanh = vit_embed(params, x, dataclasses.replace(CFG, gelu_impl="tanh"),
                     LORA, compute_dtype=jnp.float32)
    diff = float(jnp.abs(tanh - ref32).max())
    assert 0.0 < diff < 0.05, diff  # diverging (documented), but small

    refbf = vit_embed(params, x, CFG, LORA, compute_dtype=jnp.bfloat16)
    for knob in (dict(ln_dtype="bf16"), dict(gelu_impl="erf_bf16"),
                 dict(ln_dtype="bf16", gelu_impl="erf_bf16")):
        cfg = dataclasses.replace(CFG, **knob)
        out = vit_embed(params, x, cfg, LORA, compute_dtype=jnp.bfloat16)
        np.testing.assert_allclose(np.asarray(out), np.asarray(refbf),
                                   rtol=0.05, atol=0.15, err_msg=str(knob))
