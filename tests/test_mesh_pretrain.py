"""Pretrain-engine parallelism equivalence (cli/train_pretrain wires
placement() with tp/fsdp/sp/pp, mirroring the reference's DataParallel
pretrain path train_own.py:403-406): the sharded pretrain step must match
single-device dynamics to fp tolerance for every supported layout."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslora_tpu.config import (LoraConfig, MeshConfig, OptimConfig,
                               ViTConfig)
from gslora_tpu.engine.pretrain import PretrainState, make_pretrain_step
from gslora_tpu.engine.state import make_optimizer
from gslora_tpu.models.vit import init_vit_params
from gslora_tpu.parallel.mesh import make_mesh, placement, shard_batch

MODEL = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                  dim_head=16, mlp_dim=64, num_class=8, dropout=0.0,
                  emb_dropout=0.0, head_type="Softmax")
LORA = LoraConfig(rank=0)


def _run(mesh_cfg, steps=4, grad_accum=1):
    """N pretrain steps under the given MeshConfig (None = single device);
    returns the final param tree as host numpy."""
    params = init_vit_params(jax.random.key(0), MODEL, LORA)
    x = jax.random.normal(jax.random.key(1), (8, 3, 16, 16))
    y = jnp.arange(8, dtype=jnp.int32) % 8
    if mesh_cfg is None:
        mesh = None
        put_params, _ = placement(None)
    else:
        mesh = make_mesh(mesh_cfg)
        put_params, _ = placement(mesh, tp=mesh_cfg.tp, fsdp=mesh_cfg.fsdp,
                                  pp=mesh_cfg.pp, sp=mesh_cfg.sp)
        x, y = shard_batch(mesh, x, y)
    try:
        params = put_params(params)
        opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-3))
        state = PretrainState.create(params, opt)
        # built AFTER placement(): the traced forward reads the SPMD
        # registries (pipeline/sequence sharding) at trace time
        step = make_pretrain_step(MODEL, LORA, opt,
                                  compute_dtype=jnp.float32,
                                  grad_accum=grad_accum)
        for i in range(steps):
            state, metrics = step(state, x, y, jnp.float32(1e-3),
                                  jax.random.key(i))
        jax.block_until_ready(state.params)
        return jax.tree.map(np.asarray, state.params), float(metrics["loss"])
    finally:
        placement(None)  # clear trace-time registries for later tests


@pytest.mark.parametrize(
    "mesh_cfg",
    [MeshConfig(data=8, model=1),
     MeshConfig(data=4, model=2, tp=True),
     MeshConfig(data=4, model=2, tp=True, fsdp=True),
     MeshConfig(data=4, model=2, tp=True, fsdp=True, sp=True),
     MeshConfig(data=4, model=2, pp=True)],
    ids=["dp", "tp", "tp_fsdp", "tp_fsdp_sp", "pp"])
def test_pretrain_parallelism_equivalence(mesh_cfg):
    ref, ref_loss = _run(None)
    got, got_loss = _run(mesh_cfg)
    assert abs(ref_loss - got_loss) < 1e-4
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_pretrain_grad_accum_under_dp_mesh():
    """--grad_accum composes with the dp mesh: the (B,...) -> (N, B/N, ...)
    microbatch reshape of a data-sharded batch must preserve dynamics (the
    micro slices stay batch-sharded; GSPMD reshards as needed)."""
    ref, ref_loss = _run(None)
    got, got_loss = _run(MeshConfig(data=8, model=1), grad_accum=2)
    assert abs(ref_loss - got_loss) < 1e-4
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
