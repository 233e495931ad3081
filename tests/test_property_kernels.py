"""Property-based kernel equivalence: the Pallas ops must match their XLA
reference formulations across randomized shapes/values (hypothesis), not
just the hand-picked test shapes. Interpret-mode on the CPU conftest."""
import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st


def _xla_attn(q, k, v, scale):
    dots = jnp.einsum("xid,xjd->xij", q, k) * scale
    p = jax.nn.softmax(dots.astype(jnp.float32), -1).astype(q.dtype)
    return jnp.einsum("xij,xjd->xid", p, v)


@settings(max_examples=12, deadline=None)
@given(bh=st.integers(1, 9), n=st.integers(1, 31), d=st.integers(1, 17),
       seed=st.integers(0, 2**31 - 1))
def test_fused_attention_matches_xla_any_shape(bh, n, d, seed):
    """Forward + grads agree with the einsum reference for arbitrary
    (BH, n, d) — incl. shapes where BH is not divisible by BLOCK_SLICES
    (the _block fallback) and tiny n/d."""
    from gslora_tpu.ops.attention import fused_attention

    rng = np.random.RandomState(seed % (2**31))
    q, k, v, w = (jnp.asarray(rng.randn(bh, n, d).astype(np.float32) * 0.5)
                  for _ in range(4))
    scale = float(d) ** -0.5

    out = fused_attention(q, k, v, scale)
    want = _xla_attn(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    gp = jax.grad(lambda a, b, c: jnp.sum(fused_attention(a, b, c, scale)
                                          * w), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda a, b, c: jnp.sum(_xla_attn(a, b, c, scale) * w),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


@settings(max_examples=12, deadline=None)
@given(L=st.integers(1, 6), r=st.integers(1, 8), d=st.integers(1, 24),
       m=st.integers(1, 24), seed=st.integers(0, 2**31 - 1),
       zero_layer=st.booleans())
def test_group_lasso_pallas_matches_reference_any_shape(L, r, d, m, seed,
                                                        zero_layer):
    """Fused Pallas group-Lasso (value+grad) == the vectorized layer-axis
    reduction for arbitrary stacked LoRA shapes, including an all-zero
    group (the subgradient edge)."""
    from gslora_tpu.lora.core import group_lasso
    from gslora_tpu.ops.group_lasso import group_lasso_pallas

    rng = np.random.RandomState(seed % (2**31))

    def mk(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.3

    tree = {"ffn": {"A1": mk(L, r, d), "B1": mk(L, m, r),
                    "A2": mk(L, r, m), "B2": mk(L, d, r)}}
    if zero_layer:
        for k in tree["ffn"]:
            tree["ffn"][k][0] = 0.0
    tree = jax.tree.map(jnp.asarray, tree)

    f = tree["ffn"]

    ref = float(group_lasso(tree, "block", "FFN"))
    got = float(group_lasso_pallas(f["A1"], f["B1"], f["A2"], f["B2"]))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    g_ref = jax.grad(lambda t: group_lasso(t, "block", "FFN"))(tree)["ffn"]
    g_got = jax.grad(
        lambda a1, b1, a2, b2: group_lasso_pallas(a1, b1, a2, b2),
        argnums=(0, 1, 2, 3))(f["A1"], f["B1"], f["A2"], f["B2"])
    for key, g in zip(("A1", "B1", "A2", "B2"), g_got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref[key]),
                                   rtol=1e-4, atol=1e-5)


@settings(max_examples=12, deadline=None)
@given(L=st.integers(1, 6), r=st.integers(1, 6), d=st.integers(1, 16),
       m=st.integers(1, 16), thr=st.floats(0.0, 5.0),
       seed=st.integers(0, 2**31 - 1), zero_layer=st.booleans())
def test_group_prox_pallas_soft_threshold_property(L, r, d, m, thr, seed,
                                                   zero_layer):
    """Fused proximal update: each block's post-norm equals
    max(0, ||theta_l|| - thr) and the direction is preserved (all-zero
    blocks stay zero)."""
    from gslora_tpu.ops.group_lasso import group_prox_pallas

    rng = np.random.RandomState(seed % (2**31))

    def mk(*shape):
        return rng.randn(*shape).astype(np.float32) * 0.3

    parts = [mk(L, r, d), mk(L, m, r), mk(L, r, m), mk(L, d, r)]
    if zero_layer:
        for p in parts:
            p[0] = 0.0
    A1, B1, A2, B2 = (jnp.asarray(p) for p in parts)
    o1, ob1, o2, ob2 = group_prox_pallas(A1, B1, A2, B2, float(thr))

    for layer in range(L):
        pre = np.sqrt(sum(float(jnp.sum(t[layer] ** 2))
                          for t in (A1, B1, A2, B2)))
        post = np.sqrt(sum(float(jnp.sum(t[layer] ** 2))
                           for t in (o1, ob1, o2, ob2)))
        np.testing.assert_allclose(post, max(0.0, pre - thr),
                                   rtol=1e-4, atol=1e-5)
        if pre > thr + 1e-6:
            # direction preserved: out = scale * in with scale >= 0
            scale = (pre - thr) / pre
            np.testing.assert_allclose(np.asarray(o1[layer]),
                                       np.asarray(A1[layer]) * scale,
                                       rtol=1e-4, atol=1e-5)
