"""End-to-end tiny forgetting run: pretrain a small ViT on synthetic
class-blobs, then GS-LoRA-forget two classes; forget accuracy must crater
while remain accuracy holds (the reference's core behavioral contract)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslora_tpu.config import (DataConfig, ForgetConfig, LoraConfig,
                               OptimConfig, RunConfig, ViTConfig)
from gslora_tpu.data.pipeline import BatchLoader
from gslora_tpu.data.splits import make_order_list, split_by_class_window
from gslora_tpu.data.synthetic import synthetic_face_dataset
from gslora_tpu.engine.evaluate import eval_accuracy, make_eval_step
from gslora_tpu.engine.loop import ForgetData, run_forget_training
from gslora_tpu.engine.pretrain import pretrain
from gslora_tpu.models.vit import init_vit_params

# Softmax head + overlapping blobs: CosFace s=64 saturates CE to exactly 0
# on a separable toy task, killing ascent grads (a synthetic-data artifact,
# not a framework property)
MODEL = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                  dim_head=16, mlp_dim=64, num_class=6, dropout=0.0,
                  emb_dropout=0.0, head_type="Softmax")
LORA = LoraConfig(rank=4)


@pytest.fixture(scope="module")
def pretrained():
    cfg = RunConfig(model=MODEL, lora=LORA,
                    optim=OptimConfig(lr=3e-3, warmup_epochs=0, epochs=30),
                    data=DataConfig(batch_size=16, data_mode="synthetic"))
    train = synthetic_face_dataset(num_classes=6, per_class=12,
                                   image_size=16, seed=0, noise=1.2)
    test = synthetic_face_dataset(num_classes=6, per_class=6, image_size=16,
                                  seed=99, noise=1.2)
    params = init_vit_params(jax.random.key(0), MODEL, LORA)
    state, _ = pretrain(cfg, params,
                        lambda: BatchLoader(train, 16, seed=3, prefetch=0),
                        epochs=10, compute_dtype=jnp.float32, lr=3e-3)
    return cfg, state.params, train, test


def test_pretrain_reaches_high_accuracy(pretrained):
    cfg, params, train, test = pretrained
    ev = make_eval_step(MODEL, LORA, compute_dtype=jnp.float32)
    acc = eval_accuracy(ev, params, BatchLoader(test, 36, shuffle=False,
                                                prefetch=0))
    assert acc > 90.0, f"pretrain acc too low: {acc}"


def test_forget_run_end_to_end(pretrained, tmp_path):
    cfg, params, train, test = pretrained
    order = make_order_list(6, seed=1337)
    remain_tr, forget_tr = split_by_class_window(train, order, 0, 4, 4, 6)
    remain_te, forget_te = split_by_class_window(test, order, 0, 4, 4, 6)
    data = ForgetData(train_forget=forget_tr, train_remain=remain_tr,
                      test_forget=forget_te, test_remain=remain_te)

    fcfg = RunConfig(
        model=MODEL, lora=LORA,
        optim=OptimConfig(lr=1e-2, warmup_epochs=0, epochs=14),
        forget=ForgetConfig(bnd=10.0, beta=0.3, alpha=5e-4,
                            alpha_epoch=0, prototype=True, pro_f_weight=0.01,
                            pro_r_weight=0.01, bnd_pro=18.0,
                            average_weight=True, ema_epoch=6,
                            ema_decay=0.9),
        data=DataConfig(batch_size=8, data_mode="synthetic"),
        num_epoch=14, ver_freq=10_000, compute_dtype="float32")

    res = run_forget_training(fcfg, params, data, workdir=str(tmp_path))
    assert res.forget_acc_before > 80.0
    # the contract: forget classes erased, remain classes preserved
    assert res.forget_acc < 40.0, f"forget acc didn't drop: {res.forget_acc}"
    assert res.remain_acc > 75.0, f"remain acc collapsed: {res.remain_acc}"
    assert res.best_h > 0
    assert len(res.norm_list) == MODEL.depth
    assert res.ema is not None
    # checkpoint + config written
    files = list(tmp_path.iterdir())
    assert any(f.name == "config.txt" for f in files)
    assert any(f.suffix == ".msgpack" for f in files)
    # base params untouched by the run
    np.testing.assert_array_equal(
        np.asarray(params["base"]["patch"]["kernel"]),
        np.asarray(res.state.base["patch"]["kernel"]))


def test_forget_open_set_end_to_end(pretrained):
    """Single-step OPEN-SET run (reference train_own_forget_open.py /
    scripts/run_forget_open.sh): 3-way split remain/open/forget where open
    classes are excluded from training; forget craters, remain holds, and
    open-class accuracy is reported (it may degrade — that's the effect the
    open-set protocol studies)."""
    from gslora_tpu.data.splits import open_single_windows
    cfg, params, train, test = pretrained
    order = make_order_list(6, seed=1337)
    # first 4 classes with 2 of them open: remain [0,2), open [2,4),
    # forget [4,6)
    (rs, re), (fs, fe), (os_, oe) = open_single_windows(4, 2, 2)
    remain_tr, forget_tr = split_by_class_window(train, order, rs, re, fs, fe)
    remain_te, forget_te = split_by_class_window(test, order, rs, re, fs, fe)
    _, open_te = split_by_class_window(test, order, 0, 0, os_, oe)
    assert len(open_te) > 0
    data = ForgetData(train_forget=forget_tr, train_remain=remain_tr,
                      test_forget=forget_te, test_remain=remain_te,
                      test_open=open_te)

    fcfg = RunConfig(
        model=MODEL, lora=LORA,
        optim=OptimConfig(lr=1e-2, warmup_epochs=0, epochs=30),
        forget=ForgetConfig(bnd=10.0, beta=0.5, alpha=5e-4, alpha_epoch=0,
                            open_cls_num=2),
        data=DataConfig(batch_size=8, data_mode="synthetic"),
        num_epoch=30, ver_freq=10_000, compute_dtype="float32")

    res = run_forget_training(fcfg, params, data)
    assert res.forget_acc_before > 80.0
    assert res.forget_acc < 40.0, f"forget acc didn't drop: {res.forget_acc}"
    assert res.remain_acc > 75.0, f"remain acc collapsed: {res.remain_acc}"
    assert res.open_acc is not None and 0.0 <= res.open_acc <= 100.0
