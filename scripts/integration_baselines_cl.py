"""MULTI-TASK baseline integration at flagship scale on real TPU.

integration_baselines.py certifies each unlearning baseline for ONE task;
this script runs the four methods with CROSS-TASK state (SCRUB's
teacher+SWA, LwF's teacher, LIRF's four models, EWC's growing
anchor/importance lists) through the real CL driver path
(cli/train_forget_cl.run_baseline_continual) for 2 tasks on the
unsaturated synthetic stand-in — at-scale evidence that the reference's
create-models-ONCE-before-the-task-loop semantics
(train_own_forget_cl.py:330-476, loop at :515) hold beyond the CPU unit
tests (tests/test_baseline_continual.py).

Reuses the cached unsaturated pretrain checkpoint (shared with
integration_baselines.py --unsaturated). Writes
/tmp/integration_baselines_cl.json.
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")

from gslora_tpu.checkpoints.io import load_pytree, save_pytree
from gslora_tpu.config import (BaselineConfig, DataConfig, ForgetConfig,
                               LoraConfig, OptimConfig, RunConfig, ViTConfig)
from gslora_tpu.data.pipeline import BatchLoader
from gslora_tpu.data.splits import make_order_list
from gslora_tpu.data.synthetic import synthetic_face_dataset
from gslora_tpu.engine.pretrain import pretrain
from gslora_tpu.models.vit import init_vit_params

# unsaturated stand-in (see BASELINE.md saturation-artifact analysis):
# Softmax head + noise 2.4 + the short pretrain budget leave CE unsaturated
# so grad-based baselines (EWC importance, relabel-CE) have real signal
MODEL = ViTConfig(image_size=112, patch_size=8, dim=512, depth=6, heads=8,
                  dim_head=64, mlp_dim=2048, num_class=100, dropout=0.1,
                  emb_dropout=0.1, head_type="Softmax")
LORA = LoraConfig(rank=8)
CKPT = os.environ.get("PRETRAIN_CKPT",
                      "/tmp/flagship_pretrained.msgpack").replace(
                          ".msgpack", "_unsat.msgpack")
BS = 48
NOISE = 2.4


def _pretrained(train):
    params = init_vit_params(jax.random.key(0), MODEL, LORA,
                             param_dtype=jnp.float32)
    if os.path.exists(CKPT):
        params = load_pytree(CKPT, params)
        print("loaded pretrained", CKPT, flush=True)
        return params
    t0 = time.time()
    pre_cfg = RunConfig(
        model=dataclasses.replace(MODEL, remat=True), lora=LORA,
        optim=OptimConfig(lr=3e-4, warmup_epochs=2, epochs=12),
        data=DataConfig(batch_size=240))
    state, _ = pretrain(pre_cfg, params,
                        lambda: BatchLoader(train, 240, seed=3),
                        epochs=12, compute_dtype=jnp.bfloat16)
    save_pytree(CKPT, state.params)
    print("pretrained + saved", round(time.time() - t0, 1), "s", flush=True)
    return state.params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", default="scrub,lwf,lirf,ewc",
                    help="comma list of the cross-task-stateful methods")
    ap.add_argument("--num_tasks", default=2, type=int)
    ap.add_argument("--tiny", action="store_true",
                    help="CPU wiring smoke: 16-px depth-2 model, tiny data")
    a = ap.parse_args()
    methods = [m.strip() for m in a.methods.split(",") if m.strip()]
    global MODEL, CKPT, BS
    if a.tiny:
        jax.config.update("jax_platforms", "cpu")
        MODEL = dataclasses.replace(MODEL, image_size=16, dim=64, depth=2,
                                    heads=2, dim_head=32, mlp_dim=128,
                                    dropout=0.0, emb_dropout=0.0)
        CKPT = CKPT.replace(".msgpack", "_tiny.msgpack")
        BS = 8

    from gslora_tpu.cli.common import setup_jax_runtime
    setup_jax_runtime()  # persistent compile cache (1-2 min/compile saved)
    from gslora_tpu.cli.train_forget_cl import run_baseline_continual
    from gslora_tpu.engine.evaluate import eval_accuracy, make_eval_step
    from gslora_tpu.metrics.logging import MetricLogger

    t0 = time.time()
    train = synthetic_face_dataset(num_classes=100, per_class=24,
                                   image_size=MODEL.image_size, seed=0,
                                   noise=NOISE)
    test = synthetic_face_dataset(num_classes=100, per_class=5,
                                  image_size=MODEL.image_size, seed=77,
                                  noise=NOISE)
    params = _pretrained(train)
    ev = make_eval_step(MODEL, LORA, compute_dtype=jnp.bfloat16)
    pre_acc = eval_accuracy(ev, params, BatchLoader(test, 240, shuffle=False,
                                                    prefetch=0,
                                                    mask_padding=True))
    print("pretrain test acc", pre_acc, flush=True)
    order = make_order_list(100, seed=1337)

    report = {"pretrain_test_acc": pre_acc, "num_tasks": a.num_tasks}
    # per-family hyperparameters mirror integration_baselines.py (reference
    # recipe lambdas; SCRUB superepoch 2 suffices on the stand-in)
    recipes = {
        "lwf": dict(n_ep=6, baseline=BaselineConfig(
            method="lwf", lwf_lambda_kd=0.5, lwf_lambda_remain=1.0)),
        "lirf": dict(n_ep=6, baseline=BaselineConfig(method="lirf")),
        "ewc": dict(n_ep=6, baseline=BaselineConfig(method="ewc",
                                                    ewc_lambda=10.0)),
        "scrub": dict(n_ep=10, baseline=BaselineConfig(
            method="scrub", scrub_superepoch=2, sgda_learning_rate=5e-4,
            sgda_gamma=0.99, sgda_alpha=0.001)),
        # distill family: same lambdas as the single-task matrix
        "der": dict(n_ep=6, baseline=BaselineConfig(method="der",
                                                    der_lambda=0.1)),
        "der_plus": dict(n_ep=6, baseline=BaselineConfig(
            method="der_plus", der_lambda=0.1, der_plus_lambda=0.1)),
        "fdr": dict(n_ep=6, baseline=BaselineConfig(method="fdr",
                                                    fdr_lambda=0.1)),
        # regularization family lambdas from the reference recipe templates
        "mas": dict(n_ep=6, baseline=BaselineConfig(method="mas",
                                                    mas_lambda=5.0)),
        "l2": dict(n_ep=6, baseline=BaselineConfig(method="l2",
                                                   l2_lambda=0.1)),
        "replay": dict(n_ep=6, baseline=BaselineConfig(method="replay")),
        # retrain is from-scratch per task: give it the full pretrain
        # budget (see the single-task matrix footnote)
        "retrain": dict(n_ep=12, lr=3e-4,
                        baseline=BaselineConfig(method="retrain")),
    }
    for m in methods:
        r = recipes[m]
        t1 = time.time()
        cfg = RunConfig(
            model=MODEL, lora=LORA,
            optim=OptimConfig(opt="adamw", lr=r.get("lr", 1e-4),
                              warmup_epochs=0,
                              epochs=r["n_ep"]),
            forget=ForgetConfig(num_of_first_cls=80, per_forget_cls=10,
                                num_tasks=a.num_tasks, data_ratio=0.4),
            baseline=r["baseline"],
            data=DataConfig(batch_size=BS), num_epoch=r["n_ep"],
            ver_freq=10_000, compute_dtype="bfloat16")
        results, _ = run_baseline_continual(cfg, params, train, test, order,
                                            MetricLogger(), workdir=None)
        report[m] = {"tasks": results,
                     "wallclock_s": round(time.time() - t1, 1)}
        print(m, json.dumps(report[m]), flush=True)
        _flush(dict(report), t0)
    _flush(report, t0)


def _flush(report, t0):
    report["total_wallclock_s"] = round(time.time() - t0, 1)
    out_path = "/tmp/integration_baselines_cl.json"
    merged = {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                merged = json.load(f)
        except Exception:
            merged = {}
    merged.update(report)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=2)
    print(json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
