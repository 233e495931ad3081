"""Pallas fused group-Lasso: value + grad parity vs the plain-JAX path,
prox soft-threshold semantics (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from gslora_tpu.config import ForgetConfig, LoraConfig, OptimConfig, ViTConfig
from gslora_tpu.lora.core import group_lasso, init_lora, lora_group_norms
from gslora_tpu.ops.group_lasso import (group_lasso_pallas,
                                        group_prox_pallas, lora_group_prox)

CFG = ViTConfig(depth=3, dim=64, mlp_dim=128, heads=4, dim_head=16,
                image_size=32, patch_size=8, num_class=10)
LORA = LoraConfig(rank=4)


def _tree():
    t = init_lora(jax.random.key(0), CFG, LORA)
    k = jax.random.key(1)
    for n in ("B1", "B2"):
        k, s = jax.random.split(k)
        t["ffn"][n] = jax.random.normal(s, t["ffn"][n].shape)
    return t


def test_value_matches_plain_jax():
    f = _tree()["ffn"]
    got = float(group_lasso_pallas(f["A1"], f["B1"], f["A2"], f["B2"]))
    want = float(group_lasso({"ffn": f}, "block", "FFN"))
    assert abs(got - want) < 1e-3


def test_grad_matches_plain_jax():
    f = _tree()["ffn"]
    args = (f["A1"], f["B1"], f["A2"], f["B2"])
    g_pallas = jax.grad(lambda *a: group_lasso_pallas(*a),
                        argnums=(0, 1, 2, 3))(*args)
    g_ref = jax.grad(
        lambda a1, b1, a2, b2: group_lasso(
            {"ffn": {"A1": a1, "B1": b1, "A2": a2, "B2": b2}},
            "block", "FFN"), argnums=(0, 1, 2, 3))(*args)
    for gp, gr in zip(g_pallas, g_ref):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   rtol=1e-4, atol=1e-5)


def test_prox_soft_threshold():
    f = _tree()["ffn"]
    norms = np.asarray(lora_group_norms({"ffn": f}))
    # threshold between the two smallest norms kills exactly the small ones
    thr = float(np.sort(norms)[0]) + 1e-3
    A1, B1, A2, B2 = group_prox_pallas(f["A1"], f["B1"], f["A2"], f["B2"],
                                       jnp.float32(thr))
    new_norms = np.asarray(lora_group_norms(
        {"ffn": {"A1": A1, "B1": B1, "A2": A2, "B2": B2}}))
    killed = norms <= thr
    assert killed.any()
    assert np.allclose(new_norms[killed], 0.0, atol=1e-5)
    # survivors shrink by exactly thr
    np.testing.assert_allclose(new_norms[~killed], norms[~killed] - thr,
                               rtol=1e-4, atol=1e-4)


def test_prox_mode_in_forget_step_sparsifies():
    from gslora_tpu.engine.forget import make_forget_step
    from gslora_tpu.engine.state import ForgetState, make_optimizer
    from gslora_tpu.models.vit import init_vit_params

    model = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                      dim_head=16, mlp_dim=64, num_class=8, dropout=0.0,
                      emb_dropout=0.0)
    lora = LoraConfig(rank=4)
    params = init_vit_params(jax.random.key(0), model, lora)
    params["lora"]["ffn"]["B1"] = 0.01 * jax.random.normal(
        jax.random.key(1), params["lora"]["ffn"]["B1"].shape)
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-3))
    state = ForgetState.create(params, opt)
    step = make_forget_step(model, lora, ForgetConfig(), opt,
                            compute_dtype=jnp.float32,
                            use_prototype=False, structure_mode="prox")
    x = jax.random.normal(jax.random.key(2), (4, 3, 16, 16))
    y = jnp.array([0, 1, 2, 3])
    protos = jnp.zeros((8, 32))
    # threshold per step = lr*alpha = 10 >> any group norm: one prox zeroes
    sc = {k: jnp.float32(v) for k, v in dict(
        beta=0.0, alpha=1e4, lr=1e-3, bnd=10.0, bnd_pro=18.0,
        w_pro_f=0.0, w_pro_r=0.0).items()}
    for i in range(3):
        state, m = step(state, x, y, x, y, protos, sc, jax.random.key(i))
    norms = lora_group_norms(state.lora)
    assert all(n < 1e-4 for n in norms), norms
    assert float(m["loss_structure"]) == 0.0  # not in the loss in prox mode
