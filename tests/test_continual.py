"""Continual forgetting over 2 tasks on synthetic data: each task erases
its window, previously-forgotten classes STAY forgotten (old acc low),
remaining classes stay correct."""
import dataclasses

import jax
import jax.numpy as jnp
import pytest

from gslora_tpu.config import (DataConfig, ForgetConfig, LoraConfig,
                               OptimConfig, RunConfig, ViTConfig)
from gslora_tpu.data.pipeline import BatchLoader
from gslora_tpu.data.splits import make_order_list
from gslora_tpu.data.synthetic import synthetic_face_dataset
from gslora_tpu.engine.continual import run_continual_forgetting, \
    split_task_data
from gslora_tpu.engine.pretrain import pretrain
from gslora_tpu.models.vit import init_vit_params

MODEL = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                  dim_head=16, mlp_dim=64, num_class=8, dropout=0.0,
                  emb_dropout=0.0, head_type="Softmax")
LORA = LoraConfig(rank=4)


def test_split_task_data_windows():
    cfg = RunConfig(model=MODEL, lora=LORA,
                    forget=ForgetConfig(num_of_first_cls=6, per_forget_cls=2,
                                        few_shot=True, few_shot_num=2,
                                        num_tasks=2),
                    data=DataConfig(batch_size=4))
    train = synthetic_face_dataset(num_classes=8, per_class=6, image_size=16)
    test = synthetic_face_dataset(num_classes=8, per_class=4, image_size=16,
                                  seed=5)
    order = make_order_list(8, seed=1337)
    d0, old0 = split_task_data(cfg, train, test, order, 0, 0)
    assert old0 is None
    assert set(d0.train_forget.targets) == set(order[6:8])
    assert set(d0.train_remain.targets) == set(order[0:6])
    d1, old1 = split_task_data(cfg, train, test, order, 1, 0)
    assert set(d1.train_forget.targets) == set(order[4:6])
    assert set(old1.targets) == set(order[6:8])


@pytest.mark.slow
def test_two_task_continual_forgetting(tmp_path):
    train = synthetic_face_dataset(num_classes=8, per_class=12,
                                   image_size=16, seed=0, noise=1.2)
    test = synthetic_face_dataset(num_classes=8, per_class=6, image_size=16,
                                  seed=99, noise=1.2)
    pre_cfg = RunConfig(model=MODEL, lora=LORA,
                        optim=OptimConfig(lr=3e-3, warmup_epochs=0,
                                          epochs=30),
                        data=DataConfig(batch_size=16))
    params = init_vit_params(jax.random.key(0), MODEL, LORA)
    state, _ = pretrain(pre_cfg, params,
                        lambda: BatchLoader(train, 16, seed=3, prefetch=0),
                        epochs=12, compute_dtype=jnp.float32, lr=3e-3)

    cfg = RunConfig(
        model=MODEL, lora=LORA,
        optim=OptimConfig(lr=1e-2, warmup_epochs=0, epochs=14),
        forget=ForgetConfig(num_of_first_cls=6, per_forget_cls=2,
                            num_tasks=2, bnd=10.0, beta=0.3, alpha=5e-4,
                            alpha_epoch=0, prototype=True,
                            cl_beta_list=(0.3, 0.3),
                            cl_prof_list=(0.01, 0.01), pro_r_weight=0.01,
                            bnd_pro=18.0, data_ratio=1.0),
        data=DataConfig(batch_size=8),
        num_epoch=14, ver_freq=10_000, compute_dtype="float32")
    order = make_order_list(8, seed=1337)
    out = run_continual_forgetting(cfg, state.params, train, test, order,
                                   workdir=str(tmp_path))
    assert len(out.tasks) == 2
    t0, t1 = out.tasks
    # task 0: classes order[6:8] forgotten, order[0:6] kept
    assert t0.result.forget_acc < 40.0
    assert t0.result.remain_acc > 70.0
    # task 1: classes order[4:6] forgotten, order[0:4] kept,
    # AND task-0 classes stay forgotten (old acc low)
    assert t1.result.forget_acc < 40.0
    assert t1.result.remain_acc > 70.0
    assert t1.old_acc is not None and t1.old_acc < 40.0
    # task-level snapshots written
    assert (tmp_path / "task-level" / "Backbone_task_0.msgpack").exists()
    assert (tmp_path / "task-level" / "Backbone_task_1.msgpack").exists()


def test_cl_alpha_gate_and_driver_stream_semantics():
    """engine_cl parity: the bare alpha_epoch structure-loss gate is
    single-step ONLY (engine.py:82-90; engine_cl applies alpha from epoch
    0), and CL epochs are always remain-driven (engine_cl.py:50-60) even
    when few-shot forget outnumbers remain."""
    import numpy as np

    from gslora_tpu.data.splits import split_by_class_window
    from gslora_tpu.engine.forget import scalars_for_epoch
    from gslora_tpu.engine.loop import ForgetData, run_forget_training
    from gslora_tpu.models.vit import init_vit_params

    model = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                      dim_head=16, mlp_dim=64, num_class=6, dropout=0.0,
                      emb_dropout=0.0, head_type="Softmax")
    cfg = RunConfig(model=model, lora=LoraConfig(rank=4),
                    optim=OptimConfig(lr=1e-3, warmup_epochs=0, epochs=2),
                    forget=ForgetConfig(bnd=10.0, beta=0.3, alpha=0.5,
                                        alpha_epoch=20, few_shot=True,
                                        few_shot_num=4, per_forget_cls=4),
                    data=DataConfig(batch_size=4), num_epoch=2,
                    ver_freq=10_000, compute_dtype="float32")
    # single-step: gated to 0 before alpha_epoch; continual: alpha live
    assert float(scalars_for_epoch(cfg, 5)["alpha"]) == 0.0
    assert float(scalars_for_epoch(cfg, 5, continual=True)["alpha"]) == 0.5

    train = synthetic_face_dataset(num_classes=6, per_class=8,
                                   image_size=16, seed=0)
    test = synthetic_face_dataset(num_classes=6, per_class=4, image_size=16,
                                  seed=9)
    order = make_order_list(6, seed=1337)
    # forget = 4 classes (32 samples), remain = 2 classes (16) -> with
    # few_shot off the subsets are the raw splits and forget is LONGER
    cfg = dataclasses.replace(
        cfg, forget=dataclasses.replace(cfg.forget, few_shot=True))
    remain_tr, forget_tr = split_by_class_window(train, order, 0, 2, 2, 6)
    remain_te, forget_te = split_by_class_window(test, order, 0, 2, 2, 6)
    data = ForgetData(train_forget=forget_tr, train_remain=remain_tr,
                      test_forget=forget_te, test_remain=remain_te)
    n_forget_batches = int(np.ceil(len(forget_tr) / 4))
    n_remain_batches = int(np.ceil(len(remain_tr) / 4))
    assert n_forget_batches > n_remain_batches

    params = init_vit_params(jax.random.key(0), model, cfg.lora)
    res_ss = run_forget_training(cfg, params, data)
    assert int(res_ss.state.step) == cfg.num_epoch * n_forget_batches
    res_cl = run_forget_training(cfg, params, data, continual=True)
    assert int(res_cl.state.step) == cfg.num_epoch * n_remain_batches
