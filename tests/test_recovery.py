"""Fault recovery (SURVEY §5.3: the reference loses in-task progress on
crash): save the full ForgetState mid-run, 'crash', restore, continue —
the continuation must be bitwise-identical to the uninterrupted run."""
import jax
import jax.numpy as jnp
import numpy as np

from gslora_tpu.checkpoints.io import restore_train_state, save_train_state
from gslora_tpu.config import (ForgetConfig, LoraConfig, OptimConfig,
                               ViTConfig)
from gslora_tpu.engine.forget import make_forget_step
from gslora_tpu.engine.state import ForgetState, make_optimizer
from gslora_tpu.models.vit import init_vit_params

MODEL = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                  dim_head=16, mlp_dim=64, num_class=6, dropout=0.0,
                  emb_dropout=0.0, head_type="Softmax")
LORA = LoraConfig(rank=4)


def test_mid_task_recovery_is_exact(tmp_path):
    params = init_vit_params(jax.random.key(0), MODEL, LORA)
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-3))
    step = make_forget_step(MODEL, LORA, ForgetConfig(bnd=10.0), opt,
                            compute_dtype=jnp.float32, use_prototype=False)
    xf = jax.random.normal(jax.random.key(1), (4, 3, 16, 16))
    yf = jnp.array([0, 1, 0, 1])
    xr = jax.random.normal(jax.random.key(2), (4, 3, 16, 16))
    yr = jnp.array([2, 3, 4, 5])
    protos = jnp.zeros((6, 32))
    sc = {k: jnp.float32(v) for k, v in dict(
        beta=0.3, alpha=1e-4, lr=1e-3, bnd=10.0, bnd_pro=18.0, w_pro_f=0.0,
        w_pro_r=0.0).items()}

    def run(state, start, end):
        for i in range(start, end):
            state, _ = step(state, xf, yf, xr, yr, protos, sc,
                            jax.random.key(i))
        return state

    # uninterrupted: 10 steps
    ref = run(ForgetState.create(params, opt), 0, 10)

    # interrupted at step 6 + restore + continue
    mid = run(ForgetState.create(params, opt), 0, 6)
    path = str(tmp_path / "state.msgpack")
    save_train_state(path, mid)
    del mid  # "crash"
    template = ForgetState.create(params, opt)
    resumed = restore_train_state(path, template)
    assert int(resumed.step) == 6
    final = run(resumed, 6, 10)

    for a, b in zip(jax.tree.leaves(ref.lora), jax.tree.leaves(final.lora)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ref.opt_state),
                    jax.tree.leaves(final.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_recovery_restores_layouts(tmp_path):
    """Recovery under a tp+fsdp mesh: restore_train_state returns host
    numpy; parallel.mesh.place_like must re-apply the template's
    NamedShardings (ZeRO moments included) and the continuation must match
    the uninterrupted sharded run bitwise."""
    import dataclasses as _dc

    from gslora_tpu.config import MeshConfig
    from gslora_tpu.parallel.mesh import (make_mesh, place_like, placement,
                                          shard_batch)

    model = _dc.replace(MODEL, dim=32, mlp_dim=64, heads=2, dim_head=16)
    mesh = make_mesh(MeshConfig(data=4, model=2))
    put_params, _ = placement(mesh, tp=True, fsdp=True)
    try:
        params = put_params(init_vit_params(jax.random.key(0), model, LORA))
        opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-3))
        step = make_forget_step(model, LORA, ForgetConfig(bnd=10.0), opt,
                                compute_dtype=jnp.float32,
                                use_prototype=False)
        xf = shard_batch(mesh,
                         jax.random.normal(jax.random.key(1), (4, 3, 16, 16)))
        yf = shard_batch(mesh, jnp.array([0, 1, 0, 1]))
        xr = shard_batch(mesh,
                         jax.random.normal(jax.random.key(2), (4, 3, 16, 16)))
        yr = shard_batch(mesh, jnp.array([2, 3, 4, 5]))
        protos = jnp.zeros((6, 32))
        sc = {k: jnp.float32(v) for k, v in dict(
            beta=0.3, alpha=1e-4, lr=1e-3, bnd=10.0, bnd_pro=18.0,
            w_pro_f=0.0, w_pro_r=0.0).items()}

        def run(state, start, end):
            for i in range(start, end):
                state, _ = step(state, xf, yf, xr, yr, protos, sc,
                                jax.random.key(i))
            return state

        ref = run(ForgetState.create(params, opt), 0, 10)

        mid = run(ForgetState.create(params, opt), 0, 6)
        path = str(tmp_path / "state.msgpack")
        save_train_state(path, mid)
        del mid  # "crash"
        template = ForgetState.create(params, opt)
        resumed = place_like(template,
                             restore_train_state(path, template))
        # layouts restored, not just values: fsdp shards the fc1 kernel
        # (and its adamw moments via zeros_like) over `data`
        def fc1_kernel(tree):
            return tree["base"]["blocks"]["fc1"]["kernel"]
        assert fc1_kernel(resumed.params).sharding == \
            fc1_kernel(template.params).sharding
        moment_shardings = {
            leaf.sharding
            for leaf in jax.tree.leaves(resumed.opt_state)
            if isinstance(leaf, jax.Array) and leaf.ndim >= 3}
        assert moment_shardings == {
            leaf.sharding
            for leaf in jax.tree.leaves(template.opt_state)
            if isinstance(leaf, jax.Array) and leaf.ndim >= 3}
        final = run(resumed, 6, 10)

        for a, b in zip(jax.tree.leaves(ref.lora),
                        jax.tree.leaves(final.lora)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(ref.opt_state),
                        jax.tree.leaves(final.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    finally:
        placement(None)  # clear trace-time registries for later tests
