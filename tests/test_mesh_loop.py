"""Data-parallel correctness of the training loop on the 8-device CPU mesh.

test_dp_equivalence is the certifying test: run_forget_training with
identical seeds on 1 device and on the 8-device data mesh must produce the
same final LoRA params and the same metric history (grads all-reduced by
XLA over the data axis == the unsharded gradient), up to fp reassociation
tolerance. Dataset sizes are chosen divisible by the batch so no padding
path interferes (padding itself is covered by test_data/test_losses).
"""
import jax
import jax.numpy as jnp
import numpy as np

from gslora_tpu.config import (DataConfig, ForgetConfig, LoraConfig,
                               MeshConfig, OptimConfig, RunConfig, ViTConfig)
from gslora_tpu.data.splits import make_order_list, split_by_class_window
from gslora_tpu.data.synthetic import synthetic_face_dataset
from gslora_tpu.engine.loop import ForgetData, run_forget_training
from gslora_tpu.models.vit import init_vit_params
from gslora_tpu.parallel.mesh import make_mesh
from gslora_tpu.utils.profiling import forward_throughput

MODEL = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                  dim_head=16, mlp_dim=64, num_class=6, dropout=0.0,
                  emb_dropout=0.0, head_type="Softmax")
LORA = LoraConfig(rank=4)


def _data():
    train = synthetic_face_dataset(num_classes=6, per_class=16,
                                   image_size=16, seed=0, noise=1.0)
    test = synthetic_face_dataset(num_classes=6, per_class=8, image_size=16,
                                  seed=9, noise=1.0)
    order = make_order_list(6, seed=1337)
    remain_tr, forget_tr = split_by_class_window(train, order, 0, 4, 4, 6)
    remain_te, forget_te = split_by_class_window(test, order, 0, 4, 4, 6)
    return ForgetData(train_forget=forget_tr, train_remain=remain_tr,
                      test_forget=forget_te, test_remain=remain_te)


def _cfg():
    return RunConfig(model=MODEL, lora=LORA,
                     optim=OptimConfig(lr=1e-3, warmup_epochs=0, epochs=2),
                     forget=ForgetConfig(bnd=10.0, beta=0.3, alpha=1e-4,
                                         alpha_epoch=0),
                     data=DataConfig(batch_size=16),  # 16 % 8 == 0; 64/16,
                     num_epoch=2, ver_freq=10_000,    # 32/16: no ragged tail
                     compute_dtype="float32")


import pytest


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)],
                         ids=["dp8", "dp4xtp2"])
def test_dp_equivalence(mesh_shape):
    """1-device vs mesh: same seeds -> same dynamics. (8,1) certifies
    pure data parallelism; (4,2) additionally shards the head weight over
    the `model` axis via placement() — the loop-level analogue of
    test_model_parallel_head_equivalence."""
    from gslora_tpu.config import MeshConfig

    data = _data()
    cfg = _cfg()

    params0 = init_vit_params(jax.random.key(0), MODEL, LORA)
    res_single = run_forget_training(cfg, params0, data, mesh=None)

    params1 = init_vit_params(jax.random.key(0), MODEL, LORA)
    d, m = mesh_shape
    mesh = make_mesh(MeshConfig(data=d, model=m))
    assert mesh.shape["data"] * mesh.shape["model"] == len(jax.devices())
    res_mesh = run_forget_training(cfg, params1, data, mesh=mesh)

    # final trainable (LoRA) params identical up to all-reduce reassociation
    flat_s = jax.tree_util.tree_leaves(res_single.state.lora)
    flat_m = jax.tree_util.tree_leaves(res_mesh.state.lora)
    for a, b in zip(flat_s, flat_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    # metric history (per-eval accuracies + H) matches
    assert len(res_single.history) == len(res_mesh.history)
    for hs, hm in zip(res_single.history, res_mesh.history):
        for k in ("Test forget Accuracy", "Test remain Accuracy", "H_mean"):
            assert abs(hs[k] - hm[k]) < 1e-3, (k, hs[k], hm[k])
    assert abs(res_single.best_h - res_mesh.best_h) < 1e-3


def test_distill_dp_equivalence_with_ragged_tails():
    """Baseline family under a mesh: the mesh run pads tail batches
    (mask_padding) while the single-device run keeps reference-faithful
    ragged tails — the pad-sentinel masking in the DER/KD losses must make
    both produce the same dynamics. Dataset sizes are chosen NON-divisible
    by the batch so the padding path is actually exercised."""
    from gslora_tpu.baselines.distill import run_distill_task
    from gslora_tpu.config import BaselineConfig
    from gslora_tpu.data.pipeline import BatchLoader, CyclingLoader
    from gslora_tpu.data.splits import random_relabel

    train = synthetic_face_dataset(num_classes=6, per_class=14,  # ragged
                                   image_size=16, seed=0, noise=1.0)
    test = synthetic_face_dataset(num_classes=6, per_class=8, image_size=16,
                                  seed=9, noise=1.0)
    order = make_order_list(6, seed=1337)
    remain_tr, forget_tr = split_by_class_window(train, order, 0, 4, 4, 6)
    remain_te, forget_te = split_by_class_window(test, order, 0, 4, 4, 6)
    # 2 forget classes x 14 = 28 samples; bs 16 -> ragged 12-sample tail
    relabeled = random_relabel(forget_tr, 6, seed=5)

    cfg = RunConfig(model=MODEL, lora=LORA,
                    optim=OptimConfig(opt="adamw", lr=1e-3, warmup_epochs=0,
                                      epochs=2),
                    forget=ForgetConfig(per_forget_cls=2),
                    baseline=BaselineConfig(method="der", der_lambda=0.1),
                    data=DataConfig(batch_size=16), num_epoch=2,
                    ver_freq=10_000, compute_dtype="float32")
    params = init_vit_params(jax.random.key(0), MODEL, LORA)

    def run(mesh):
        pad = mesh is not None
        fl = BatchLoader(relabeled, 16, seed=7, mask_padding=pad)
        rl = BatchLoader(remain_tr, 16, seed=8, mask_padding=pad)
        tbf = lambda: BatchLoader(forget_te, 32, shuffle=False,  # noqa: E731
                                  prefetch=0, mask_padding=pad)
        tbr = lambda: BatchLoader(remain_te, 32, shuffle=False,  # noqa: E731
                                  prefetch=0, mask_padding=pad)
        return run_distill_task(cfg, params, params, lambda: iter(fl),
                                CyclingLoader(rl), tbf, tbr, mesh=mesh)

    single = run(None)
    meshed = run(make_mesh())
    for k in ("forget_acc_before", "forget_acc", "remain_acc", "best_h"):
        assert abs(single[k] - meshed[k]) < 1e-3, (k, single[k], meshed[k])
    # final params identical up to all-reduce reassociation — would fail if
    # any loss term double-counted the wrap-padded tail samples
    for a, b in zip(jax.tree_util.tree_leaves(single["params"]),
                    jax.tree_util.tree_leaves(meshed["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_mesh_scaling_step_times():
    """Scaling-evidence artifact: the SAME global-batch jitted train step
    compiles and runs on 1/2/4/8-device data meshes; step times recorded
    (virtual CPU devices share cores, so no speedup assertion — the test
    certifies the sharded programs execute and stay numerically finite)."""
    import time

    from gslora_tpu.engine.forget import make_forget_step
    from gslora_tpu.engine.state import ForgetState, make_optimizer
    from gslora_tpu.parallel.mesh import placement

    data_sizes = [1, 2, 4, 8]
    opt = make_optimizer(OptimConfig(lr=1e-3))
    fcfg = ForgetConfig(bnd=10.0, beta=0.3, alpha=1e-4, alpha_epoch=0)
    step = make_forget_step(MODEL, LORA, fcfg, opt,
                            compute_dtype=jnp.float32)
    protos = jnp.zeros((MODEL.num_class, MODEL.dim), jnp.float32)
    scalars = {k: jnp.float32(v) for k, v in dict(
        beta=0.3, alpha=1e-4, lr=1e-3, bnd=10.0, bnd_pro=0.0,
        w_pro_f=0.0, w_pro_r=0.0).items()}
    x = np.random.RandomState(0).rand(16, 3, 16, 16).astype(np.float32)
    y = (np.arange(16) % 6).astype(np.int32)

    times = {}
    for n in data_sizes:
        mesh = make_mesh(MeshConfig(data=n, model=1),
                         devices=jax.devices()[:n])
        put_params, put_batch = placement(mesh)
        params = put_params(init_vit_params(jax.random.key(0), MODEL, LORA))
        state = ForgetState.create(params, opt)
        xb, yb = put_batch(x, y)
        state, m = step(state, xb, yb, xb, yb, protos, scalars,
                        jax.random.key(1))  # compile + warmup
        t0 = time.perf_counter()
        for _ in range(3):
            state, m = step(state, xb, yb, xb, yb, protos, scalars,
                            jax.random.key(2))
        float(m["loss_total"])  # host readback = real sync
        times[n] = (time.perf_counter() - t0) / 3
        assert np.isfinite(float(m["loss_total"]))
    print("mesh scaling step times (fixed global batch 16):",
          {n: round(t * 1e3, 2) for n, t in times.items()}, "ms")


def test_forward_throughput_probe():
    from gslora_tpu.models.vit import vit_apply
    params = init_vit_params(jax.random.key(0), MODEL, LORA)
    batch = np.random.RandomState(0).rand(8, 3, 16, 16).astype(np.float32)
    ips = forward_throughput(
        lambda x: vit_apply(params, x, None, MODEL, LORA,
                            compute_dtype=jnp.float32),
        batch, iters=5)
    assert ips > 0


def test_model_parallel_head_equivalence():
    """data x model mesh (4,2): the (C, d) head weight sharded over the
    model axis must produce the same training dynamics as unsharded
    single-device — XLA inserts the right collectives for the head matmul
    + CE logsumexp (capability parity with the reference's chunked
    model-parallel heads, vit_face.py:37-51)."""
    from gslora_tpu.config import MeshConfig
    from gslora_tpu.engine.forget import make_forget_step
    from gslora_tpu.engine.state import ForgetState, make_optimizer
    from gslora_tpu.parallel.mesh import batch_sharding, replicate

    opt = make_optimizer(OptimConfig(lr=1e-3))
    fcfg = ForgetConfig(bnd=10.0, beta=0.3, alpha=1e-4, alpha_epoch=0)
    step = make_forget_step(MODEL, LORA, fcfg, opt,
                            compute_dtype=jnp.float32)
    protos = jnp.zeros((MODEL.num_class, MODEL.dim), jnp.float32)
    scalars = {k: jnp.float32(v) for k, v in dict(
        beta=0.3, alpha=1e-4, lr=1e-3, bnd=10.0, bnd_pro=0.0,
        w_pro_f=0.0, w_pro_r=0.0).items()}
    x = np.random.RandomState(0).rand(8, 3, 16, 16).astype(np.float32)
    y = (np.arange(8) % 6).astype(np.int32)

    def run(mesh):
        params = init_vit_params(jax.random.key(0), MODEL, LORA)
        if mesh is not None:
            params = replicate(mesh, params)  # head sharded over `model`
            sh = batch_sharding(mesh)
            xb = jax.device_put(x, sh)
            yb = jax.device_put(y, sh)
        else:
            xb, yb = jnp.asarray(x), jnp.asarray(y)
        state = ForgetState.create(params, opt)
        for i in range(3):
            state, m = step(state, xb, yb, xb, yb, protos, scalars,
                            jax.random.key(i))
        return state, m

    s0, m0 = run(None)
    mesh = make_mesh(MeshConfig(data=4, model=2))
    # head weight really is sharded over the model axis
    params1 = replicate(mesh, init_vit_params(jax.random.key(0), MODEL, LORA))
    hsh = params1["base"]["head"]["weight"].sharding
    assert hsh.spec[0] == "model", hsh
    s1, m1 = run(mesh)
    for k in m0:
        np.testing.assert_allclose(float(m0[k]), float(m1[k]),
                                   rtol=2e-4, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s0.lora),
                    jax.tree_util.tree_leaves(s1.lora)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mesh_shape,lora_apply",
                         [((4, 2), "factored"), ((2, 2), "merged")],
                         ids=["dp4tp2_factored", "dp2tp2_merged"])
def test_tp_equivalence(mesh_shape, lora_apply):
    """MeshConfig(tp=True): Megatron-style tensor parallelism — FFN hidden
    dims (fc1 cols / fc2 rows + LoRA B1/A2) and the head's class dim sharded
    over the ``model`` axis purely via NamedShardings — must reproduce the
    single-device training dynamics to fp-reassociation tolerance in BOTH
    LoRA apply modes (the merged fold adds sharded B@A to the sharded fc
    kernels; the factored path contracts deltas over the sharded hidden
    dim)."""
    import dataclasses as _dc

    from gslora_tpu.parallel.mesh import param_shardings

    data = _data()
    d, m = mesh_shape
    cfg = _dc.replace(_cfg(), mesh=MeshConfig(data=d, model=m, tp=True),
                      lora_apply=lora_apply)

    params0 = init_vit_params(jax.random.key(0), MODEL, LORA)
    res_single = run_forget_training(_dc.replace(cfg, mesh=MeshConfig()),
                                     params0, data, mesh=None)

    params1 = init_vit_params(jax.random.key(0), MODEL, LORA)
    mesh = make_mesh(cfg.mesh)
    # the TP leaves really are sharded over the model axis
    sh = param_shardings(mesh, params1, tp=True)
    assert sh["base"]["blocks"]["fc1"]["kernel"].spec[2] == "model"
    assert sh["base"]["blocks"]["fc2"]["kernel"].spec[1] == "model"
    assert sh["lora"]["ffn"]["B1"].spec[1] == "model"
    assert sh["lora"]["ffn"]["A2"].spec[2] == "model"
    res_mesh = run_forget_training(cfg, params1, data, mesh=mesh)

    for a, b in zip(jax.tree_util.tree_leaves(res_single.state.lora),
                    jax.tree_util.tree_leaves(res_mesh.state.lora)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    assert len(res_single.history) == len(res_mesh.history)
    for hs, hm in zip(res_single.history, res_mesh.history):
        for k in ("Test forget Accuracy", "Test remain Accuracy", "H_mean"):
            assert abs(hs[k] - hm[k]) < 1e-3, (k, hs[k], hm[k])


def test_tp_divisibility_error():
    """A hidden dim not divisible by the model axis must fail loudly at
    placement time (GSPMD's own error at compile time is far less
    actionable)."""
    from gslora_tpu.parallel.mesh import param_shardings

    model = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                      dim_head=16, mlp_dim=60, num_class=6,
                      head_type="Softmax")
    params = init_vit_params(jax.random.key(0), model, LORA)
    mesh = make_mesh(MeshConfig(data=1, model=8))
    with pytest.raises(ValueError, match="not divisible"):
        param_shardings(mesh, params, tp=True)


@pytest.mark.parametrize("mesh_shape,tp",
                         [((8, 1), False), ((4, 2), True)],
                         ids=["fsdp8", "fsdp4_tp2"])
def test_fsdp_equivalence(mesh_shape, tp):
    """MeshConfig(fsdp=True): block kernels (+ optimizer moments via
    zeros_like inheritance) sharded over the ``data`` axis, alone and
    composed with tp — single-device dynamics must be reproduced, and the
    moments really are sharded (the ZeRO memory claim)."""
    import dataclasses as _dc

    from gslora_tpu.parallel.mesh import param_shardings

    data = _data()
    d, m = mesh_shape
    cfg = _dc.replace(_cfg(), mesh=MeshConfig(data=d, model=m, tp=tp,
                                              fsdp=True))

    params0 = init_vit_params(jax.random.key(0), MODEL, LORA)
    res_single = run_forget_training(_dc.replace(cfg, mesh=MeshConfig()),
                                     params0, data, mesh=None)

    params1 = init_vit_params(jax.random.key(0), MODEL, LORA)
    mesh = make_mesh(cfg.mesh)
    sh = param_shardings(mesh, params1, tp=tp, fsdp=True)
    assert sh["base"]["blocks"]["qkv"]["kernel"].spec[1] == "data"
    assert sh["base"]["blocks"]["fc2"]["kernel"].spec[2] == "data"
    if tp:  # composed: fc1 (L, d, m) -> P(None, data, model)
        assert sh["base"]["blocks"]["fc1"]["kernel"].spec[1:] == ("data",
                                                                  "model")
    res_mesh = run_forget_training(cfg, params1, data, mesh=mesh)

    for a, b in zip(jax.tree_util.tree_leaves(res_single.state.lora),
                    jax.tree_util.tree_leaves(res_mesh.state.lora)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    for hs, hm in zip(res_single.history, res_mesh.history):
        for k in ("Test forget Accuracy", "Test remain Accuracy", "H_mean"):
            assert abs(hs[k] - hm[k]) < 1e-3, (k, hs[k], hm[k])


@pytest.mark.parametrize("mesh_shape,depth,micro",
                         [((4, 2), 2, 2), ((2, 4), 4, 2)],
                         ids=["dp4pp2", "dp2pp4"])
def test_pp_equivalence(mesh_shape, depth, micro):
    """MeshConfig(pp=True): GPipe pipeline parallelism — stacked layer dim
    sharded over `model`, microbatches flow stage-to-stage via ppermute
    inside one shard_map (parallel/pipeline.py). No ViT layer op reduces
    over the batch dim, so the pipelined training dynamics must match
    single-device to fp tolerance."""
    import dataclasses as _dc

    from gslora_tpu.parallel.mesh import param_shardings

    model = _dc.replace(MODEL, depth=depth)
    data = _data()
    d, m = mesh_shape
    cfg = _dc.replace(_cfg(), model=model,
                      mesh=MeshConfig(data=d, model=m, pp=True,
                                      pp_micro=micro))

    params0 = init_vit_params(jax.random.key(0), model, LORA)
    res_single = run_forget_training(_dc.replace(cfg, mesh=MeshConfig()),
                                     params0, data, mesh=None)

    params1 = init_vit_params(jax.random.key(0), model, LORA)
    mesh = make_mesh(cfg.mesh)
    sh = param_shardings(mesh, params1, pp=True)
    assert sh["base"]["blocks"]["qkv"]["kernel"].spec[0] == "model"
    assert sh["lora"]["ffn"]["B1"].spec[0] == "model"
    res_mesh = run_forget_training(cfg, params1, data, mesh=mesh)

    for a, b in zip(jax.tree_util.tree_leaves(res_single.state.lora),
                    jax.tree_util.tree_leaves(res_mesh.state.lora)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    for hs, hm in zip(res_single.history, res_mesh.history):
        for k in ("Test forget Accuracy", "Test remain Accuracy", "H_mean"):
            assert abs(hs[k] - hm[k]) < 1e-3, (k, hs[k], hm[k])


def test_pp_excludes_tp_fsdp():
    from gslora_tpu.parallel.mesh import param_shardings

    params = init_vit_params(jax.random.key(0), MODEL, LORA)
    mesh = make_mesh(MeshConfig(data=4, model=2))
    with pytest.raises(ValueError, match="pp excludes"):
        param_shardings(mesh, params, pp=True, tp=True)


def test_pp_dropout_smoke():
    """The pipeline path every real pp training run hits: dropout > 0, so
    pipeline_transformer's fold_in(microbatch) RNG branch is exercised
    through a full run_forget_training (microbatch masks legitimately
    differ from single-device partitioning, so no equivalence — finite
    dynamics + the LoRA params actually moving is the contract)."""
    import dataclasses as _dc

    model = _dc.replace(MODEL, depth=4, dropout=0.1, emb_dropout=0.1)
    data = _data()
    cfg = _dc.replace(_cfg(), model=model, num_epoch=1,
                      mesh=MeshConfig(data=4, model=2, pp=True, pp_micro=2))
    params = init_vit_params(jax.random.key(0), model, LORA)
    lora0 = jax.tree.map(np.asarray, params["lora"])
    res = run_forget_training(cfg, params, data, mesh=make_mesh(cfg.mesh))
    assert np.isfinite(res.best_h)
    for h in res.history:
        for k in ("Test forget Accuracy", "Test remain Accuracy", "H_mean"):
            assert np.isfinite(h[k]), (k, h)
    moved = any(
        not np.allclose(np.asarray(a), b)
        for a, b in zip(jax.tree_util.tree_leaves(res.state.lora),
                        jax.tree_util.tree_leaves(lora0)))
    assert moved, "pp+dropout step did not update the LoRA params"


def test_pp_remat_grad_equivalence():
    """model.remat must apply INSIDE the pipeline body (review finding:
    the early return used to skip the jax.checkpoint wrap): gradients
    through the rematerialized pipeline equal the non-remat pipeline's."""
    import dataclasses as _dc

    from gslora_tpu.models.vit import vit_apply
    from gslora_tpu.parallel.mesh import (batch_sharding, replicate,
                                          set_pipeline)

    model = _dc.replace(MODEL, depth=4)
    model_r = _dc.replace(model, remat=True)
    mesh = make_mesh(MeshConfig(data=4, model=2))
    params = replicate(mesh, init_vit_params(jax.random.key(0), model, LORA),
                       pp=True)
    x = jax.device_put(
        np.random.RandomState(0).rand(8, 3, 16, 16).astype(np.float32),
        batch_sharding(mesh))

    def loss(mcfg):
        def f(lora_tree, base, xb):
            emb = vit_apply({"base": base, "lora": lora_tree}, xb, None,
                            mcfg, LORA, train=False,
                            compute_dtype=jnp.float32)
            return jnp.sum(emb ** 2)
        return jax.jit(jax.grad(f))

    set_pipeline(mesh, 2)
    try:
        g_plain = loss(model)(params["lora"], params["base"], x)
        g_remat = loss(model_r)(params["lora"], params["base"], x)
    finally:
        set_pipeline(None)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_parallel_flags_reject_inert_mesh():
    """tp/pp on a model axis of 1, fsdp on a data axis of 1, or any of
    them without a mesh would silently no-op (everything replicated) —
    placement() must fail loudly instead (review finding)."""
    from gslora_tpu.parallel.mesh import placement

    with pytest.raises(ValueError, match="need a device mesh"):
        placement(None, tp=True)
    mesh_dp = make_mesh(MeshConfig(data=8, model=1))
    with pytest.raises(ValueError, match="model axis"):
        placement(mesh_dp, tp=True)
    with pytest.raises(ValueError, match="model axis"):
        placement(mesh_dp, pp=True)
    mesh_mp = make_mesh(MeshConfig(data=1, model=8))
    with pytest.raises(ValueError, match="data axis"):
        placement(mesh_mp, fsdp=True)


def test_eval_step_cache_keys_on_pipeline():
    """make_eval_step's lru cache must key on the pipeline registry: two
    runs differing only in pp/pp_micro must NOT share a traced eval step
    (review finding — the train step was protected, eval was not)."""
    from gslora_tpu.engine.evaluate import make_eval_step
    from gslora_tpu.engine.prototypes import _embed_builder
    from gslora_tpu.parallel.mesh import set_pipeline

    e_none = make_eval_step(MODEL, LORA, jnp.float32)
    p_none = _embed_builder(MODEL, LORA, jnp.float32)
    mesh = make_mesh(MeshConfig(data=4, model=2))
    set_pipeline(mesh, 2)
    try:
        e_pp2 = make_eval_step(MODEL, LORA, jnp.float32)
        p_pp2 = _embed_builder(MODEL, LORA, jnp.float32)
        set_pipeline(mesh, 4)
        e_pp4 = make_eval_step(MODEL, LORA, jnp.float32)
    finally:
        set_pipeline(None)
    assert e_pp2 is not e_none and e_pp4 is not e_pp2
    assert p_pp2 is not p_none
    assert make_eval_step(MODEL, LORA, jnp.float32) is e_none


def test_baselines_reject_pp():
    """--pp reaching a baseline runner must raise, not silently train
    unpipelined (review finding: their placement() calls never register
    a pipeline)."""
    import dataclasses as _dc

    from gslora_tpu.baselines.distill import run_distill_task
    from gslora_tpu.baselines.regularization import run_regularization_task
    from gslora_tpu.config import BaselineConfig

    cfg = _dc.replace(_cfg(), baseline=BaselineConfig(method="der"),
                      mesh=MeshConfig(data=4, model=2, pp=True))
    params = init_vit_params(jax.random.key(0), MODEL, LORA)
    with pytest.raises(ValueError, match="pp is supported"):
        run_distill_task(cfg, params, params, lambda: iter([]), None,
                         lambda: iter([]), lambda: iter([]), mesh=None)
    with pytest.raises(ValueError, match="pp is supported"):
        run_regularization_task(cfg, params, lambda: iter([]),
                                lambda: iter([]), lambda: iter([]),
                                lam=0.0, anchors=[], importances=[],
                                mesh=None)


@pytest.mark.parametrize("mesh_shape,tp",
                         [((4, 2), False), ((2, 2), True)],
                         ids=["sp2", "sp2_tp2"])
def test_sp_equivalence(mesh_shape, tp):
    """MeshConfig(sp=True): Megatron-style sequence parallelism — the
    token dim of the block activations sharded over ``model`` between
    matmul regions via with_sharding_constraints (no param layout change),
    alone and composed with tp. The 5-token sequence (16px / patch 8 + CLS)
    is NOT divisible by the model axis, exercising GSPMD's internal
    padding. Dynamics must match single-device to fp tolerance."""
    import dataclasses as _dc

    data = _data()
    d, m = mesh_shape
    cfg = _dc.replace(_cfg(), mesh=MeshConfig(data=d, model=m, tp=tp,
                                              sp=True))

    params0 = init_vit_params(jax.random.key(0), MODEL, LORA)
    res_single = run_forget_training(_dc.replace(cfg, mesh=MeshConfig()),
                                     params0, data, mesh=None)

    params1 = init_vit_params(jax.random.key(0), MODEL, LORA)
    mesh = make_mesh(cfg.mesh)
    res_mesh = run_forget_training(cfg, params1, data, mesh=mesh)

    for a, b in zip(jax.tree_util.tree_leaves(res_single.state.lora),
                    jax.tree_util.tree_leaves(res_mesh.state.lora)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    assert len(res_single.history) == len(res_mesh.history)
    for hs, hm in zip(res_single.history, res_mesh.history):
        for k in ("Test forget Accuracy", "Test remain Accuracy", "H_mean"):
            assert abs(hs[k] - hm[k]) < 1e-3, (k, hs[k], hm[k])


def test_sp_guards():
    """sp on a model axis of 1 or without a mesh is a silent no-op —
    rejected; sp+pp is unsupported (the pipeline body is a manual
    shard_map over the same axis) — rejected."""
    from gslora_tpu.parallel.mesh import placement

    with pytest.raises(ValueError, match="need a device mesh"):
        placement(None, sp=True)
    with pytest.raises(ValueError, match="model axis"):
        placement(make_mesh(MeshConfig(data=8, model=1)), sp=True)
    with pytest.raises(ValueError, match="sp excludes pp"):
        placement(make_mesh(MeshConfig(data=4, model=2)), sp=True, pp=True)


def test_step_cache_keys_on_sequence_sharding():
    """step_cache folds the SPMD registry into every builder's key: a
    builder invoked with identical args under different sequence-sharding
    registrations must not share a traced step."""
    from gslora_tpu.engine.loop import step_cache
    from gslora_tpu.parallel.mesh import set_sequence_sharding

    # registries persist until the next placement() call (by design — the
    # attention mesh works the same way); a prior sp test may have left
    # one registered, so start from a known-clean state
    set_sequence_sharding(None)
    calls = []

    @step_cache
    def build(tag):
        calls.append(tag)
        return object()

    a = build("x")
    assert build("x") is a  # plain cache hit
    mesh = make_mesh(MeshConfig(data=4, model=2))
    set_sequence_sharding(mesh)
    try:
        b = build("x")
    finally:
        set_sequence_sharding(None)
    assert b is not a
    assert build("x") is a
    assert calls == ["x", "x"]
