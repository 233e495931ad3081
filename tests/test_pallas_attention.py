"""Fused Pallas attention vs the XLA path: forward + gradients (interpret
mode on CPU), and the full-model attn_impl switch."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gslora_tpu.config import LoraConfig, ViTConfig
from gslora_tpu.models.vit import init_vit_params, vit_apply
from gslora_tpu.ops.attention import fused_attention


def _xla_attn(q, k, v, scale):
    dots = jnp.einsum("xid,xjd->xij", q, k) * scale
    p = jax.nn.softmax(dots.astype(jnp.float32), -1).astype(q.dtype)
    return jnp.einsum("xij,xjd->xid", p, v)


def test_forward_matches_xla():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(6, 17, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(6, 17, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(6, 17, 8).astype(np.float32))
    out = fused_attention(q, k, v, 0.25)
    want = _xla_attn(q, k, v, 0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_xla():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(4, 11, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(4, 11, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(4, 11, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 11, 8).astype(np.float32))

    def loss_pallas(q, k, v):
        return jnp.sum(fused_attention(q, k, v, 0.25) * w)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attn(q, k, v, 0.25) * w)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_model_attn_impl_switch():
    cfg = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                    dim_head=16, mlp_dim=64, num_class=6, dropout=0.0,
                    emb_dropout=0.0, head_type="Softmax")
    lora = LoraConfig(rank=4)
    params = init_vit_params(jax.random.key(0), cfg, lora)
    x = jax.random.normal(jax.random.key(1), (2, 3, 16, 16))
    y = jnp.array([0, 1])
    l_xla, _ = vit_apply(params, x, y, cfg, lora, compute_dtype=jnp.float32)
    cfg_p = dataclasses.replace(cfg, attn_impl="pallas")
    l_pal, _ = vit_apply(params, x, y, cfg_p, lora,
                         compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(l_xla), np.asarray(l_pal),
                               rtol=2e-4, atol=2e-4)


def test_sharded_pallas_attention_matches_single_device():
    """fused_attention_bhnd under an 8-device mesh (shard_map over the
    data axis) == single-device kernel == XLA einsums, values and grads."""
    from gslora_tpu.ops.attention import fused_attention_bhnd
    from gslora_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    rng = np.random.RandomState(2)
    b, h, n, d = 8, 2, 17, 8  # b divisible by the data axis (4)
    q = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))
    w = jnp.asarray(rng.randn(b, h, n, d).astype(np.float32))

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) * w)

    local = lambda q, k, v: fused_attention_bhnd(q, k, v, 0.25)  # noqa: E731
    sharded = lambda q, k, v: fused_attention_bhnd(  # noqa: E731
        q, k, v, 0.25, mesh=mesh)
    ref = lambda q, k, v: _xla_attn(  # noqa: E731
        q.reshape(b * h, n, d), k.reshape(b * h, n, d),
        v.reshape(b * h, n, d), 0.25).reshape(b, h, n, d)

    np.testing.assert_allclose(np.asarray(jax.jit(sharded)(q, k, v)),
                               np.asarray(ref(q, k, v)),
                               rtol=2e-5, atol=2e-5)
    gs = jax.jit(jax.grad(loss(sharded), argnums=(0, 1, 2)))(q, k, v)
    g1 = jax.grad(loss(local), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gs, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_mesh_registered_pallas_model_forward():
    """With an attention mesh registered, attn_impl='pallas' through the
    full model (scan + shard_map) matches the XLA path on sharded
    batches."""
    from gslora_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                          set_attention_mesh)

    cfg = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                    dim_head=16, mlp_dim=64, num_class=6, dropout=0.0,
                    emb_dropout=0.0, head_type="Softmax")
    lora = LoraConfig(rank=4)
    params = init_vit_params(jax.random.key(0), cfg, lora)
    mesh = make_mesh()
    x = jax.random.normal(jax.random.key(1), (8, 3, 16, 16))
    y = jnp.arange(8, dtype=jnp.int32) % 6
    l_xla, _ = vit_apply(params, x, y, cfg, lora, compute_dtype=jnp.float32)
    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    set_attention_mesh(mesh)
    try:
        cfg_p = dataclasses.replace(cfg, attn_impl="pallas")
        l_pal, _ = jax.jit(
            lambda p, x, y: vit_apply(p, x, y, cfg_p, lora,
                                      compute_dtype=jnp.float32))(
            params, xs, ys)
    finally:
        set_attention_mesh(None)
    np.testing.assert_allclose(np.asarray(l_xla), np.asarray(l_pal),
                               rtol=2e-4, atol=2e-4)


def test_model_dpa_impl_matches_xla():
    cfg = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                    dim_head=16, mlp_dim=64, num_class=6, dropout=0.0,
                    emb_dropout=0.0, head_type="Softmax")
    lora = LoraConfig(rank=4)
    params = init_vit_params(jax.random.key(0), cfg, lora)
    x = jax.random.normal(jax.random.key(1), (2, 3, 16, 16))
    y = jnp.array([0, 1])
    l_xla, _ = vit_apply(params, x, y, cfg, lora, compute_dtype=jnp.float32)
    cfg_d = dataclasses.replace(cfg, attn_impl="dpa")
    l_dpa, _ = vit_apply(params, x, y, cfg_d, lora,
                         compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(l_xla), np.asarray(l_dpa),
                               rtol=2e-4, atol=2e-4)
