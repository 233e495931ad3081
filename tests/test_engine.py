"""Engine: jitted forget step end-to-end on tiny shapes; EMA; schedule;
8-device CPU mesh sharding."""
import jax
import jax.numpy as jnp
import numpy as np

from gslora_tpu.config import (ForgetConfig, LoraConfig, OptimConfig,
                               ViTConfig)
from gslora_tpu.engine.ema import ema_init, ema_update, merged_params
from gslora_tpu.engine.evaluate import h_mean, make_eval_step
from gslora_tpu.engine.forget import make_forget_step
from gslora_tpu.engine.schedule import timm_cosine_lr
from gslora_tpu.engine.state import ForgetState, make_optimizer
from gslora_tpu.lora.core import lora_group_norms
from gslora_tpu.models.vit import init_vit_params, vit_apply
from gslora_tpu.parallel.mesh import make_mesh, replicate, shard_batch

CFG = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                dim_head=16, mlp_dim=64, num_class=8, dropout=0.0,
                emb_dropout=0.0)
LORA = LoraConfig(rank=4)
FCFG = ForgetConfig(bnd=30.0, beta=0.5, alpha=0.01, prototype=True,
                    pro_f_weight=0.1, pro_r_weight=0.1, bnd_pro=18.0)


def _setup(prototype=True):
    params = init_vit_params(jax.random.key(0), CFG, LORA)
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-2))
    state = ForgetState.create(params, opt)
    fcfg = FCFG if prototype else ForgetConfig(bnd=30.0, beta=0.5,
                                               alpha=0.01, prototype=False)
    step = make_forget_step(CFG, LORA, fcfg, opt, compute_dtype=jnp.float32)
    return state, step


def _batches():
    kx = jax.random.key(1)
    xf = jax.random.normal(kx, (4, 3, 16, 16))
    yf = jnp.array([0, 1, 0, 1])
    xr = jax.random.normal(jax.random.key(2), (4, 3, 16, 16))
    yr = jnp.array([2, 3, 4, 5])
    protos = jax.random.normal(jax.random.key(3), (8, 32))
    return xf, yf, xr, yr, protos


SCALARS = {k: jnp.float32(v) for k, v in dict(
    beta=0.5, alpha=0.01, lr=1e-2, bnd=30.0, bnd_pro=18.0, w_pro_f=0.1,
    w_pro_r=0.1).items()}


def test_forget_step_trains_only_lora():
    state, step = _setup()
    xf, yf, xr, yr, protos = _batches()
    base_before = jax.tree.map(lambda a: np.asarray(a), state.base)
    lora_before = jax.tree.map(lambda a: np.asarray(a), state.lora)
    metrics = None
    for i in range(3):
        state, metrics = step(state, xf, yf, xr, yr, protos, SCALARS,
                              jax.random.key(i))
    # base frozen, lora changed
    for a, b in zip(jax.tree.leaves(base_before), jax.tree.leaves(state.base)):
        np.testing.assert_array_equal(a, np.asarray(b))
    diffs = [np.abs(a - np.asarray(b)).max() for a, b in
             zip(jax.tree.leaves(lora_before), jax.tree.leaves(state.lora))]
    assert max(diffs) > 1e-6
    assert int(state.step) == 3
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_forget_step_rank0_trains_all_params():
    """lora_rank 0 → the reference trains ALL parameters under the same
    dual-batch loss (train_own_forget_open.py:699-706, the open-set
    recipes). trainable="base" updates the full base tree."""
    lora0 = LoraConfig(rank=0)
    params = init_vit_params(jax.random.key(0), CFG, lora0)
    assert params["lora"] == {}
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-2))
    state = ForgetState.create(params, opt, trainable="base")
    fcfg = ForgetConfig(bnd=30.0, beta=0.5, alpha=0.0, prototype=False)
    step = make_forget_step(CFG, lora0, fcfg, opt, compute_dtype=jnp.float32,
                            trainable="base")
    xf, yf, xr, yr, protos = _batches()
    base_before = jax.tree.map(lambda a: np.asarray(a), state.base)
    for i in range(3):
        state, metrics = step(state, xf, yf, xr, yr, protos, SCALARS,
                              jax.random.key(i))
    diffs = [np.abs(a - np.asarray(b)).max() for a, b in
             zip(jax.tree.leaves(base_before), jax.tree.leaves(state.base))]
    assert max(diffs) > 1e-6  # the backbone itself moved
    assert int(state.step) == 3
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_run_forget_training_rank0(tmp_path):
    """The loop auto-selects full-model training when the LoRA tree is
    empty (the open-set recipe path) and still forgets."""
    from gslora_tpu.config import DataConfig, RunConfig
    from gslora_tpu.data.splits import make_order_list, split_by_class_window
    from gslora_tpu.data.synthetic import synthetic_face_dataset
    from gslora_tpu.engine.loop import ForgetData, run_forget_training
    from gslora_tpu.engine.pretrain import pretrain
    from gslora_tpu.data.pipeline import BatchLoader

    model = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                      dim_head=16, mlp_dim=64, num_class=6, dropout=0.0,
                      emb_dropout=0.0, head_type="Softmax")
    lora0 = LoraConfig(rank=0)
    train = synthetic_face_dataset(num_classes=6, per_class=12,
                                   image_size=16, seed=0, noise=1.2)
    test = synthetic_face_dataset(num_classes=6, per_class=6, image_size=16,
                                  seed=99, noise=1.2)
    cfg = RunConfig(model=model, lora=lora0,
                    optim=OptimConfig(opt="adamw", lr=1e-3, warmup_epochs=0,
                                      epochs=6),
                    forget=ForgetConfig(bnd=8.0, beta=0.5, alpha=0.0,
                                        prototype=False, per_forget_cls=2),
                    data=DataConfig(batch_size=12), num_epoch=6,
                    ver_freq=10_000, compute_dtype="float32")
    params = init_vit_params(jax.random.key(0), model, lora0)
    state, _ = pretrain(cfg, params,
                        lambda: BatchLoader(train, 12, seed=3, prefetch=0),
                        epochs=8, compute_dtype=jnp.float32, lr=3e-3)
    order = make_order_list(6, seed=1337)
    remain_tr, forget_tr = split_by_class_window(train, order, 0, 4, 4, 6)
    remain_te, forget_te = split_by_class_window(test, order, 0, 4, 4, 6)
    res = run_forget_training(
        cfg, state.params,
        ForgetData(forget_tr, remain_tr, forget_te, remain_te))
    assert res.forget_acc < res.forget_acc_before
    assert res.norm_list == []  # no LoRA groups at rank 0


def test_forget_dynamics_move_losses_the_right_way():
    """Forget CE should rise (bounded ascent), remain CE should fall."""
    state, step = _setup(prototype=False)
    xf, yf, xr, yr, protos = _batches()
    sc = dict(SCALARS)
    sc["w_pro_f"] = sc["w_pro_r"] = jnp.float32(0.0)
    sc["bnd"] = jnp.float32(200.0)  # above initial CE so the hinge is live
    first = last = None
    for i in range(25):
        state, m = step(state, xf, yf, xr, yr, protos, sc, jax.random.key(i))
        if first is None:
            first = {k: float(v) for k, v in m.items()}
        last = {k: float(v) for k, v in m.items()}
    assert last["loss_remain"] < first["loss_remain"]
    # bounded forget loss shrinks as forget CE climbs toward BND
    assert last["loss_forget"] < first["loss_forget"]


def test_alpha_shrinks_group_norms():
    state, step = _setup(prototype=False)
    xf, yf, xr, yr, protos = _batches()
    sc = dict(SCALARS)
    sc.update(beta=jnp.float32(0.0), alpha=jnp.float32(10.0),
              w_pro_f=jnp.float32(0.0), w_pro_r=jnp.float32(0.0))
    # push some mass into lora first so norms are nonzero
    warm = dict(sc)
    warm.update(alpha=jnp.float32(0.0), beta=jnp.float32(0.5))
    for i in range(5):
        state, _ = step(state, xf, yf, xr, yr, protos, warm, jax.random.key(i))
    n0 = sum(lora_group_norms(state.lora))
    for i in range(10):
        state, _ = step(state, xf, yf, xr, yr, protos, sc,
                        jax.random.key(100 + i))
    n1 = sum(lora_group_norms(state.lora))
    assert n1 < n0


def test_eval_step_and_hmean():
    state, _ = _setup()
    ev = make_eval_step(CFG, LORA, compute_dtype=jnp.float32)
    xf, yf, *_ = _batches()
    c, n = ev(state.params, xf, yf)
    assert 0 <= int(c) <= int(n) == 4
    assert h_mean(90.0, 10.0, 80.0) == 2 * 80 * 80 / 160
    assert h_mean(90.0, 90.0, 0.0) == 0.0


def test_merged_equals_functional_forward():
    state, step = _setup()
    xf, yf, xr, yr, protos = _batches()
    for i in range(3):
        state, _ = step(state, xf, yf, xr, yr, protos, SCALARS,
                        jax.random.key(i))
    m = merged_params(state.base, state.lora, LORA.scaling)
    e_merged = vit_apply({"base": m, "lora": {}}, xf, None, CFG, LORA,
                         compute_dtype=jnp.float32)
    e_func = vit_apply(state.params, xf, None, CFG, LORA,
                       compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(e_merged), np.asarray(e_func),
                               rtol=2e-4, atol=2e-4)


def test_ema_semantics():
    state, _ = _setup()
    ema = ema_init(state.base, state.lora, LORA.scaling)
    # with no lora drift, ema_update is a fixed point
    ema2 = ema_update(ema, state.base, state.lora, LORA.scaling, 0.9)
    for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(ema2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-6)


def test_ema_accumulates_in_fp32_under_bf16_params():
    """Regression: a bf16 EMA accumulator silently freezes — the
    0.01*(target-ema) contribution is below the bf16 ulp for typical
    per-epoch deltas. ema_init must promote to fp32 (torch EMAs fp32)."""
    from gslora_tpu.engine.ema import ema_init, ema_update
    base = {"blocks": {"fc1": {"kernel": jnp.full((2, 2), 100.0,
                                                  jnp.bfloat16)}}}
    ema = ema_init(base, {}, 1.0)
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(ema))
    drift = {"blocks": {"fc1": {"kernel": jnp.full((2, 2), 100.5,
                                                   jnp.bfloat16)}}}
    # 100.5 is exactly representable in bf16 (ulp(100)=0.5); the per-update
    # contribution 0.01*0.5 is far below ulp/2, so a bf16 accumulator
    # would round back to 100.0 every time
    e = ema
    for _ in range(5):
        e = ema_update(e, drift, {}, 1.0, decay=0.99)
    moved = float(e["blocks"]["fc1"]["kernel"][0, 0]) - 100.0
    assert moved > 0.02  # ~0.5 * (1 - 0.99^5) ≈ 0.0245


def test_schedule():
    oc = OptimConfig(lr=1e-2, warmup_lr=1e-6, min_lr=1e-5, warmup_epochs=3,
                     epochs=100)
    assert abs(timm_cosine_lr(oc, 0) - 1e-6) < 1e-9
    assert timm_cosine_lr(oc, 1) < timm_cosine_lr(oc, 2) < 1e-2
    assert abs(timm_cosine_lr(oc, 100) - 1e-5) < 1e-9


def test_step_on_8_device_mesh():
    """DP over the forced 8-CPU-device mesh: params replicated, batch
    sharded over the data axis."""
    mesh = make_mesh()
    assert mesh.devices.size == 8
    state, step = _setup()
    xf, yf, xr, yr, protos = _batches()
    # batch 8 so it splits evenly over 8 data shards
    xf = jnp.tile(xf, (2, 1, 1, 1))
    yf = jnp.tile(yf, (2,))
    xr = jnp.tile(xr, (2, 1, 1, 1))
    yr = jnp.tile(yr, (2,))
    state = jax.device_put(state, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    xf, yf, xr, yr = shard_batch(mesh, xf, yf, xr, yr)
    state2, metrics = step(state, xf, yf, xr, yr,
                           replicate(mesh, protos), SCALARS,
                           jax.random.key(0))
    assert np.isfinite(float(metrics["loss_total"]))
    assert int(state2.step) == 1
