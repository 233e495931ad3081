"""Cross-task semantics of the CL baseline loop (run_baseline_continual).

The reference creates the distill/SCRUB teacher, the SWA model and the four
LIRF models ONCE before the task loop (train_own_forget_cl.py:330-476, loop
at :515): every task anchors to the ORIGINAL pretrained model and SCRUB's
AveragedModel / LIRF's student persist. These tests pin that wiring (a
regression here silently changes every multi-task baseline objective) plus
the frozen-deposit / optimizer-scope semantics of LIRF.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslora_tpu.baselines.lirf import low_slice, run_lirf_task
from gslora_tpu.baselines.scrub import run_scrub_task
from gslora_tpu.config import (BaselineConfig, DataConfig, ForgetConfig,
                               LoraConfig, OptimConfig, RunConfig, ViTConfig)
from gslora_tpu.data.pipeline import BatchLoader, CyclingLoader
from gslora_tpu.data.splits import make_order_list
from gslora_tpu.data.synthetic import synthetic_face_dataset
from gslora_tpu.models.vit import init_vit_params

MODEL = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                  dim_head=16, mlp_dim=64, num_class=6, dropout=0.0,
                  emb_dropout=0.0, head_type="Softmax")
LORA = LoraConfig(rank=0)


def _cfg(method, num_tasks=2, epochs=1):
    return RunConfig(
        model=MODEL, lora=LORA,
        optim=OptimConfig(opt="adamw", lr=1e-3, warmup_epochs=0,
                          epochs=epochs),
        forget=ForgetConfig(num_of_first_cls=4, per_forget_cls=1,
                            num_tasks=num_tasks, data_ratio=1.0),
        baseline=BaselineConfig(method=method, scrub_superepoch=1,
                                sgda_learning_rate=5e-4),
        data=DataConfig(batch_size=8),
        num_epoch=epochs, ver_freq=10_000, compute_dtype="float32")


@pytest.fixture(scope="module")
def data():
    train = synthetic_face_dataset(num_classes=6, per_class=8,
                                   image_size=16, seed=0, noise=1.2)
    test = synthetic_face_dataset(num_classes=6, per_class=4, image_size=16,
                                  seed=99, noise=1.2)
    order = make_order_list(6, seed=1337)
    params = init_vit_params(jax.random.key(0), MODEL, LORA)
    return train, test, order, params


def _tree_equal(a, b):
    return all(bool(jnp.all(x == y))
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def test_distill_teacher_is_pretrained_every_task(data, monkeypatch):
    """Task t's teacher must be the ORIGINAL pretrained params, not the
    task t-1 student (reference deepcopies once, cl.py:453-476)."""
    from gslora_tpu.cli import train_forget_cl as cli
    train, test, order, params = data
    calls = []

    def fake_distill(cfg, p, teacher, *a, **k):
        calls.append((p, teacher))
        drifted = jax.tree.map(lambda x: x + 1.0, p)
        return {"params": drifted, "forget_acc_before": 1.0,
                "forget_acc": 0.0, "remain_acc": 0.0, "open_acc": None,
                "best_h": 0.0}

    monkeypatch.setattr(cli, "run_distill_task", fake_distill)
    from gslora_tpu.metrics.logging import MetricLogger
    cli.run_baseline_continual(_cfg("lwf"), params, train, test, order,
                               MetricLogger(), None)
    assert len(calls) == 2
    # task 1 trains the drifted student but distills from the pretrained
    assert not _tree_equal(calls[1][0], params)
    assert _tree_equal(calls[1][1], params)


def test_scrub_teacher_swa_persist_across_tasks(data, monkeypatch):
    """SCRUB's teacher and AveragedModel are created once (cl.py:441-451):
    the CLI must thread swa/n_averaged from task t into task t+1."""
    from gslora_tpu.cli import train_forget_cl as cli
    train, test, order, params = data
    calls = []

    def fake_scrub(cfg, p, *a, teacher=None, swa=None, n_averaged=0, **k):
        calls.append({"teacher": teacher, "swa": swa, "n": n_averaged})
        drifted = jax.tree.map(lambda x: x + 1.0, p)
        return {"params": drifted, "swa": drifted, "teacher": teacher,
                "n_averaged": n_averaged + 3, "forget_acc_before": 1.0,
                "forget_acc": 0.0, "remain_acc": 0.0, "open_acc": None,
                "best_h": 0.0}

    monkeypatch.setattr(cli, "run_scrub_task", fake_scrub)
    from gslora_tpu.metrics.logging import MetricLogger
    cli.run_baseline_continual(_cfg("scrub"), params, train, test, order,
                               MetricLogger(), None)
    assert calls[0]["n"] == 0 and calls[1]["n"] == 3
    assert _tree_equal(calls[0]["teacher"], params)
    assert _tree_equal(calls[1]["teacher"], params)  # still pretrained
    assert calls[0]["swa"] is None  # first task: AveragedModel fresh
    assert calls[1]["swa"] is not None  # task 1 continues task 0's SWA


def test_lirf_carry_threads_across_tasks(data, monkeypatch):
    """LIRF's 4 models are built once from the pretrained checkpoint
    (cl.py:330-422); the student keeps training across tasks."""
    from gslora_tpu.cli import train_forget_cl as cli
    train, test, order, params = data
    calls = []
    half = MODEL.depth // 2

    def fake_lirf(cfg, p, *a, carry=None, **k):
        calls.append(carry)
        teacher = carry["teacher"] if carry else p["base"]
        student = jax.tree.map(lambda x: x + 1.0,
                               carry["student_low"] if carry
                               else low_slice(teacher, half))
        deposit = carry["deposit_low"] if carry else low_slice(teacher, half)
        return {"teacher": teacher, "student_low": student,
                "deposit_low": deposit, "forget_acc_before": 1.0,
                "forget_acc": 0.0, "remain_acc": 0.0, "open_acc": None,
                "best_h": 0.0}

    monkeypatch.setattr(cli, "run_lirf_task", fake_lirf)
    from gslora_tpu.metrics.logging import MetricLogger
    cli.run_baseline_continual(_cfg("lirf"), params, train, test, order,
                               MetricLogger(), None)
    assert calls[0] is None  # task 0 builds from pretrained
    assert calls[1] is not None
    # task 1 continues task 0's (drifted) student, frozen teacher/deposit
    assert _tree_equal(calls[1]["teacher"], params["base"])
    assert _tree_equal(calls[1]["deposit_low"],
                       low_slice(params["base"], half))
    assert not _tree_equal(calls[1]["student_low"],
                           low_slice(params["base"], half))


def test_lirf_deposit_frozen_and_student_scoped(data):
    """Real (non-mocked) LIRF task: the deposit model never updates (the
    reference optimizer covers only student_model_low, cl.py:811) and the
    trainable student is exactly the low-half subtree."""
    train, test, order, params = data
    fl = BatchLoader(train, 8, seed=1)
    rl = BatchLoader(train, 8, seed=2)
    tbf = lambda: BatchLoader(test, 24, shuffle=False, prefetch=0)  # noqa: E731
    cfg = _cfg("lirf", num_tasks=1, epochs=1)
    out = run_lirf_task(cfg, params, lambda: iter(fl), CyclingLoader(rl),
                        tbf, tbf, num_epoch=1)
    half = MODEL.depth // 2
    want = low_slice(params["base"], half)
    # deposit pristine
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), out["deposit_low"], want)
    # student is a low-half subtree (half-depth block stack) and has moved
    assert set(out["student_low"]) == {"patch", "cls_token", "pos_embed",
                                       "blocks"}
    assert out["student_low"]["blocks"]["fc1"]["kernel"].shape[0] == half
    moved = any(
        not bool(jnp.all(a == b))
        for a, b in zip(jax.tree.leaves(out["student_low"]),
                        jax.tree.leaves(want)))
    assert moved


def test_scrub_single_task_returns_swa_counter(data):
    train, test, order, params = data
    fl = BatchLoader(train, 8, seed=1)
    rl = BatchLoader(train, 8, seed=2)
    tbf = lambda: BatchLoader(test, 24, shuffle=False, prefetch=0)  # noqa: E731
    cfg = _cfg("scrub", num_tasks=1, epochs=1)
    out = run_scrub_task(cfg, params, lambda: iter(fl), lambda: iter(rl),
                         tbf, tbf)
    assert out["n_averaged"] == cfg.baseline.scrub_superepoch
    assert _tree_equal(out["teacher"], params)
