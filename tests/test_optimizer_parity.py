"""optax.adamw must match torch.optim.AdamW step-for-step with the
reference hyperparameters (timm default surface: lr, wd 0.05, betas
(0.9, 0.999), eps 1e-8) — the optimizer is part of the ±0.5% accuracy
parity contract."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslora_tpu.config import OptimConfig
from gslora_tpu.engine.forget import _with_lr
from gslora_tpu.engine.state import make_optimizer


def test_adamw_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    w0 = rng.randn(6, 5).astype(np.float32)
    grads = [rng.randn(6, 5).astype(np.float32) for _ in range(10)]

    # torch
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.AdamW([tw], lr=1e-2, betas=(0.9, 0.999), eps=1e-8,
                             weight_decay=0.05)
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    # optax via our factory
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-2,
                                     weight_decay=0.05))
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    for g in grads:
        state = _with_lr(state, jnp.float32(1e-2))
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("name", ["sgd", "adam"])
def test_coupled_weight_decay_matches_torch(name):
    """torch-style COUPLED weight decay (grad += wd*p before the update
    rule) for the non-adamw family — the reference SCRUB sgda optimizers
    pass weight_decay to SGD/Adam/RMSprop (train_own_forget_cl.py:860-879);
    silently dropping it trains a different objective."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(2)
    w0 = rng.randn(4, 3).astype(np.float32)
    grads = [rng.randn(4, 3).astype(np.float32) for _ in range(6)]
    wd = 5e-4

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    if name == "sgd":
        topt = torch.optim.SGD([tw], lr=1e-2, momentum=0.9, weight_decay=wd)
        cfg = OptimConfig(opt="sgd", lr=1e-2, momentum=0.9, weight_decay=wd)
    else:
        topt = torch.optim.Adam([tw], lr=1e-2, betas=(0.9, 0.999),
                                eps=1e-8, weight_decay=wd)
        cfg = OptimConfig(opt="adam", lr=1e-2, weight_decay=wd)
    for g in grads:
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    opt = make_optimizer(cfg)
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    for g in grads:
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_scrub_step_decay_is_strictly_after():
    """sgda LR decay counts np.sum(epoch > decay) (util/sgda_utils.py:13):
    the decay epoch itself still runs undecayed."""
    from gslora_tpu.engine.schedule import step_decay_lr
    assert step_decay_lr(1.0, 99, [100]) == 1.0
    assert step_decay_lr(1.0, 100, [100]) == 1.0  # strictly after
    assert abs(step_decay_lr(1.0, 101, [100]) - 0.1) < 1e-12


def test_sgd_momentum_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    w0 = rng.randn(4, 3).astype(np.float32)
    grads = [rng.randn(4, 3).astype(np.float32) for _ in range(5)]

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.SGD([tw], lr=1e-2, momentum=0.9)
    for g in grads:
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    opt = make_optimizer(OptimConfig(opt="sgd", lr=1e-2, momentum=0.9,
                                     weight_decay=0.0))
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    for g in grads:
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_bf16_params_adamw_hyperparams_stay_fp32():
    """inject_hyperparams casts its stored hyperparams to the params'
    dtype at update time unless hyperparam_dtype is pinned — with bf16
    params b2=0.999 rounds to exactly 1.0, the Adam bias correction
    1-b2^t becomes 0, and EVERY update is NaN on the first step (found
    by perf_pretrain_lab --numerics in round 5; the bf16-param configs
    are the perf labs, bench.py's pretrain probe, and any
    --param_dtype bfloat16 run)."""
    params = {"w": jnp.ones((4,), jnp.bfloat16)}
    grads = {"w": jnp.full((4,), 1e-3, jnp.bfloat16)}
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-4))
    state = _with_lr(opt.init(params), jnp.float32(1e-4))
    updates, state = opt.update(grads, state, params)
    u = np.asarray(updates["w"], np.float32)
    assert np.isfinite(u).all(), u
    assert (np.abs(u) > 1e-6).all(), u  # a real first Adam step, not zeros
    # b1/b2/eps/weight_decay are static_args now — python floats baked
    # into the transform, never arrays that inject_hyperparams could cast
    assert set(state.hyperparams) == {"learning_rate"}
    assert np.asarray(state.hyperparams["learning_rate"]).dtype == np.float32
    # the coupled-decay family keeps its injected lr fp32 too
    opt2 = make_optimizer(OptimConfig(opt="adam", lr=1e-4))
    st2 = _with_lr(opt2.init(params), jnp.float32(1e-4))
    upd2, st2 = opt2.update(grads, st2, params)
    assert np.isfinite(np.asarray(upd2["w"], np.float32)).all()
    assert np.asarray(st2.hyperparams["learning_rate"]).dtype == np.float32


def test_bf16_params_adamw_scan_chain_stable():
    """The bench/labs chain steps via lax.scan with the optimizer state
    as carry: moment dtypes must be update-stable (an fp32-array b1 would
    promote the bf16 moments to fp32 on the first update and break the
    carry — the failure mode of the first round-5 fix attempt) and the
    chained losses must stay finite."""
    import jax.tree_util as jtu

    from gslora_tpu.config import LoraConfig, ViTConfig
    from gslora_tpu.engine.pretrain import PretrainState, make_pretrain_step
    from gslora_tpu.models.vit import init_vit_params

    cfg = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                    mlp_dim=64, num_class=6, head_type="Softmax")
    lora = LoraConfig(rank=4)
    params = init_vit_params(jax.random.key(0), cfg, lora,
                             param_dtype=jnp.bfloat16)
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-4))
    state = PretrainState.create(params, opt)
    step = make_pretrain_step(cfg, lora, opt, compute_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.key(1), (4, 3, 16, 16))
    y = jnp.array([0, 1, 2, 3])

    @jax.jit
    def chain(s, keys):
        def body(c, k):
            c2, m = step(c, x, y, jnp.float32(1e-4), k)
            return c2, m["loss"]
        return jax.lax.scan(body, s, keys)

    out, losses = chain(state, jax.random.split(jax.random.key(7), 3))
    assert np.isfinite(np.asarray(losses, np.float32)).all(), losses
    for (pa, a), (pb, b) in zip(jtu.tree_leaves_with_path(state),
                                jtu.tree_leaves_with_path(out)):
        assert a.dtype == b.dtype, (jtu.keystr(pa), a.dtype, b.dtype)
