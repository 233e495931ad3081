"""int8 serving path (ops/quant.py + ViTConfig.gemm_impl="int8").

Beyond-reference capability: W8A8 dynamic quantization of the projection
GEMMs for eval/serving (~2x MXU rate on v5e). These tests pin the
quantization math, the model-level accuracy envelope, and the train-mode
refusal."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslora_tpu.config import LoraConfig, ViTConfig
from gslora_tpu.models.vit import init_vit_params, vit_apply, vit_embed
from gslora_tpu.ops.quant import (int8_linear, quantize_per_channel,
                                  quantize_per_tensor)

CFG = ViTConfig(image_size=32, patch_size=8, dim=64, depth=2, heads=4,
                dim_head=16, mlp_dim=128, num_class=10, dropout=0.0,
                emb_dropout=0.0, head_type="Softmax")
LORA = LoraConfig(rank=4)


def test_quantize_roundtrip_exact_for_representable_values():
    # values that ARE k * (absmax/127) must round-trip exactly
    s = 0.5
    x = jnp.asarray(np.arange(-127, 128, dtype=np.float32) * s)
    q, scale = quantize_per_tensor(x)
    np.testing.assert_allclose(float(scale), s, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(q, np.float32) * float(scale),
                               np.asarray(x), rtol=1e-6)


def test_per_channel_scales_isolate_columns():
    # a huge column must not destroy a small column's resolution
    w = np.ones((8, 2), np.float32)
    w[:, 0] *= 1e-3
    w[:, 1] *= 1e3
    q, s = quantize_per_channel(jnp.asarray(w))
    deq = np.asarray(q, np.float32) * np.asarray(s)
    np.testing.assert_allclose(deq, w, rtol=0.01)


def test_int8_linear_error_envelope():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 96).astype(np.float32))
    w = jnp.asarray(rng.randn(96, 128).astype(np.float32))
    y = int8_linear(x, w, out_dtype=jnp.float32)
    ref = x @ w
    # per-element worst case scales with K; normalized RMS error is the
    # meaningful envelope for W8A8 (~1/127 per factor)
    err = float(jnp.sqrt(jnp.mean((y - ref) ** 2)) /
                jnp.sqrt(jnp.mean(ref ** 2)))
    assert err < 0.02, err
    assert y.shape == ref.shape
    # leading dims preserved
    y3 = int8_linear(x.reshape(4, 16, 96), w)
    np.testing.assert_allclose(np.asarray(y3).reshape(64, 128),
                               np.asarray(y), rtol=1e-5, atol=1e-5)


def test_int8_linear_zero_input():
    y = int8_linear(jnp.zeros((4, 8)), jnp.zeros((8, 3)))
    np.testing.assert_array_equal(np.asarray(y), 0.0)


def test_model_int8_eval_close_to_fp32():
    """Model-level envelope: int8 eval logits must track fp32 closely
    enough to preserve rankings on a real (trained-ish) head."""
    params = init_vit_params(jax.random.key(0), CFG, LORA)
    x = jax.random.normal(jax.random.key(1), (16, 3, 32, 32))
    y = jnp.arange(16, dtype=jnp.int32) % 10
    cfg8 = dataclasses.replace(CFG, gemm_impl="int8")
    lg32, emb32 = vit_apply(params, x, y, CFG, LORA, train=False,
                            compute_dtype=jnp.float32)
    lg8, emb8 = vit_apply(params, x, y, cfg8, LORA, train=False,
                          compute_dtype=jnp.float32)
    cos = np.sum(np.asarray(emb32) * np.asarray(emb8), axis=1) / (
        np.linalg.norm(np.asarray(emb32), axis=1) *
        np.linalg.norm(np.asarray(emb8), axis=1) + 1e-12)
    assert cos.min() > 0.99, cos.min()
    # top-1 agreement on the logits
    agree = (np.argmax(np.asarray(lg32), 1) ==
             np.argmax(np.asarray(lg8), 1)).mean()
    assert agree >= 0.9, agree


def test_int8_refuses_train_mode():
    params = init_vit_params(jax.random.key(0), CFG, LORA)
    x = jnp.zeros((2, 3, 32, 32))
    cfg8 = dataclasses.replace(CFG, gemm_impl="int8")
    with pytest.raises(ValueError, match="inference/serving"):
        vit_embed(params, x, cfg8, LORA, train=True,
                  rng=jax.random.key(1), compute_dtype=jnp.float32)
