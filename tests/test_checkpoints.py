"""Checkpoint IO: pytree round-trip, full train-state resume, best-H
retention policy."""
import jax
import jax.numpy as jnp
import numpy as np

from gslora_tpu.checkpoints.io import (BestHCheckpointer, load_pytree,
                                       restore_train_state, save_pytree,
                                       save_train_state)
from gslora_tpu.config import LoraConfig, OptimConfig, ViTConfig
from gslora_tpu.engine.state import ForgetState, make_optimizer
from gslora_tpu.models.vit import init_vit_params

CFG = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                dim_head=16, mlp_dim=64, num_class=6, dropout=0.0,
                emb_dropout=0.0)
LORA = LoraConfig(rank=4)


def test_pytree_roundtrip(tmp_path):
    params = init_vit_params(jax.random.key(0), CFG, LORA)
    p = str(tmp_path / "ckpt.msgpack")
    save_pytree(p, params)
    back = load_pytree(p, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_state_resume(tmp_path):
    params = init_vit_params(jax.random.key(1), CFG, LORA)
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-3))
    state = ForgetState.create(params, opt)
    state = state.replace(step=jnp.int32(17))
    p = str(tmp_path / "state.msgpack")
    save_train_state(p, state)
    template = ForgetState.create(
        init_vit_params(jax.random.key(2), CFG, LORA), opt)
    back = restore_train_state(p, template)
    assert int(back.step) == 17
    np.testing.assert_array_equal(np.asarray(back.lora["ffn"]["A1"]),
                                  np.asarray(state.lora["ffn"]["A1"]))


def test_best_h_retention(tmp_path):
    ck = BestHCheckpointer(str(tmp_path), name="VIT", keep=2)
    ck.save_config("{}")
    tree = {"w": jnp.ones((2,))}
    assert ck.maybe_save(10.0, tree, 0, 0)
    assert not ck.maybe_save(5.0, tree, 1, 10)  # worse H: not saved
    assert ck.maybe_save(20.0, tree, 2, 20)
    assert ck.maybe_save(30.0, tree, 3, 30)
    ckpts = list(tmp_path.glob("*.msgpack"))
    assert len(ckpts) == 2  # pruned to keep=2
    assert (tmp_path / "config.txt").exists()


def test_orbax_roundtrip(tmp_path):
    import pytest
    ocp = pytest.importorskip("orbax.checkpoint")
    from gslora_tpu.checkpoints.orbax_io import load_orbax, save_orbax
    params = init_vit_params(jax.random.key(3), CFG, LORA)
    path = str(tmp_path / "orbax_ckpt")
    save_orbax(path, params)
    back = load_orbax(path, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_async_saver(tmp_path):
    import pytest
    pytest.importorskip("orbax.checkpoint")
    import numpy as np

    from gslora_tpu.checkpoints.orbax_io import AsyncSaver, load_orbax

    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": {"c": np.float32(3.5)}}
    s = AsyncSaver()
    s.save(str(tmp_path / "ck1"), tree)
    s.wait()
    back = load_orbax(str(tmp_path / "ck1"))
    np.testing.assert_array_equal(back["a"], tree["a"])
    assert float(back["b"]["c"]) == 3.5
    # overlapping saves serialize correctly
    s.save(str(tmp_path / "ck2"), {"x": np.ones(4)})
    s.close()
    assert (tmp_path / "ck2").exists()


def test_best_h_async_save(tmp_path):
    import numpy as np

    from gslora_tpu.checkpoints.io import BestHCheckpointer, load_pytree

    ck = BestHCheckpointer(str(tmp_path), keep=2, async_save=True)
    tree = {"w": np.arange(4, dtype=np.float32)}
    assert ck.maybe_save(1.0, tree, 0, 0)
    assert not ck.maybe_save(0.5, tree, 0, 1)  # gate still applies
    assert ck.maybe_save(2.0, {"w": np.ones(4, np.float32) * 7}, 1, 2)
    ck.wait()
    back = load_pytree(ck.latest(), tree)
    np.testing.assert_array_equal(back["w"], np.ones(4) * 7)


def test_best_h_async_save_surfaces_write_failure(tmp_path):
    """A failed background write must raise at the next wait(), not leave
    a phantom 'best' checkpoint that was never written."""
    import pytest

    from gslora_tpu.checkpoints.io import BestHCheckpointer

    ck = BestHCheckpointer(str(tmp_path), keep=2, async_save=True)
    # unserializable leaf -> background save_pytree raises
    assert ck.maybe_save(1.0, {"w": object()}, 0, 0)
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        ck.wait()
    # the error is consumed; the checkpointer remains usable
    import numpy as np
    assert ck.maybe_save(2.0, {"w": np.ones(2, np.float32)}, 0, 1)
    ck.wait()
