"""Multi-slice (DCN-axis) data parallelism — MeshConfig.slices /
--mesh_slices. Beyond the reference (nn.DataParallel is single-node,
train_own.py:403-406): an outermost ``dcn`` mesh axis carries pure data
parallelism across pod slices while tp/pp/sp (``model``) and the fsdp
weight shards (``data``) stay within a slice on ICI. On the virtual CPU
mesh the dcn axis is a plain slice-major reshape (topologically
equivalent); these tests certify the dynamics match single-device for
every composition."""
import dataclasses as dc

import jax
import numpy as np
import pytest

from gslora_tpu.config import MeshConfig
from gslora_tpu.models.vit import init_vit_params
from gslora_tpu.parallel.mesh import (batch_axes, batch_sharding,
                                      data_parallel_size, make_mesh)
from tests.test_mesh_loop import LORA, MODEL, _cfg, _data

from gslora_tpu.engine.loop import run_forget_training


def test_multislice_mesh_layout():
    mesh = make_mesh(MeshConfig(data=2, model=2, slices=2))
    assert mesh.axis_names == ("dcn", "data", "model")
    assert mesh.devices.shape == (2, 2, 2)
    assert data_parallel_size(mesh) == 4
    assert batch_axes(mesh) == ("dcn", "data")
    spec = batch_sharding(mesh).spec
    assert spec == jax.sharding.PartitionSpec(("dcn", "data"))
    # slices=1 keeps the 2-axis mesh (no behavior change anywhere)
    mesh2 = make_mesh(MeshConfig(data=4, model=2))
    assert mesh2.axis_names == ("data", "model")
    assert data_parallel_size(mesh2) == 4
    # data=-1 distributes what's left after model x slices
    mesh3 = make_mesh(MeshConfig(model=2, slices=2))
    assert mesh3.devices.shape == (2, 2, 2)


@pytest.mark.parametrize(
    "mesh_cfg",
    [MeshConfig(data=4, model=1, slices=2),
     MeshConfig(data=2, model=2, slices=2, tp=True, fsdp=True, sp=True),
     MeshConfig(data=2, model=2, slices=2, pp=True)],
    ids=["dcn_dp", "dcn_tp_fsdp_sp", "dcn_pp"])
def test_multislice_equivalence(mesh_cfg):
    """run_forget_training over a 3-axis dcn mesh == single-device, for
    pure cross-slice DP and composed with every within-slice layout."""
    data = _data()
    cfg = dc.replace(_cfg(), mesh=mesh_cfg)

    params0 = init_vit_params(jax.random.key(0), MODEL, LORA)
    res_single = run_forget_training(dc.replace(cfg, mesh=MeshConfig()),
                                     params0, data, mesh=None)

    params1 = init_vit_params(jax.random.key(0), MODEL, LORA)
    mesh = make_mesh(mesh_cfg)
    assert mesh.devices.size == len(jax.devices())
    res_mesh = run_forget_training(cfg, params1, data, mesh=mesh)

    for a, b in zip(jax.tree_util.tree_leaves(res_single.state.lora),
                    jax.tree_util.tree_leaves(res_mesh.state.lora)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    assert len(res_single.history) == len(res_mesh.history)
    for hs, hm in zip(res_single.history, res_mesh.history):
        for k in ("Test forget Accuracy", "Test remain Accuracy", "H_mean"):
            assert abs(hs[k] - hm[k]) < 1e-3, (k, hs[k], hm[k])


def test_multislice_batch_divisibility():
    """batch_size must divide dcn x data, not just data."""
    data = _data()
    cfg = dc.replace(_cfg(), mesh=MeshConfig(data=4, model=1, slices=2))
    cfg = dc.replace(cfg, data=dc.replace(cfg.data, batch_size=12))
    params = init_vit_params(jax.random.key(0), MODEL, LORA)
    mesh = make_mesh(cfg.mesh)
    with pytest.raises(ValueError, match="data-parallel ways"):
        run_forget_training(cfg, params, data, mesh=mesh)


def test_oversubscribed_mesh_fails_loudly():
    """A mesh that cannot fit the devices must fail at make_mesh, not
    produce a degenerate 0-sized data axis that crashes minutes later
    with ZeroDivisionError / cryptic placement errors."""
    with pytest.raises(AssertionError, match="does not fit"):
        make_mesh(MeshConfig(model=4, slices=4))  # 8 devices: data -> 0
    with pytest.raises(AssertionError, match="does not fit"):
        make_mesh(MeshConfig(data=4, model=4))  # 16 > 8
