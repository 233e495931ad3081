"""Flagship-scale CONTINUAL integration: 4-task GS-LoRA++ on the synthetic
CASIA-100 stand-in (ViT-P8S8 19.2M params, bf16, real TPU): classes are
erased task by task; previously-forgotten classes must stay forgotten.

Modes (VERDICT r3 #2/#3):
  --unsaturated  re-base on the UNSATURATED pretrain the baseline zoo uses
                 (Softmax head, noise 2.4, 62-65% test acc — CosFace s=64
                 saturates CE to 0 on separable blobs and flatters the
                 relu(BND-CE) ascent term); shares the cached checkpoint
                 with integration_baselines*.py.
  --boundary keep   A/B the task-boundary fold: keep adapters across tasks
                 instead of the reference's merge+reinit (cl.py:523-536) —
                 attributes old-class resurfacing to fold vs dynamics.
  --few_shot     the run_cl_forget.sh few-shot recipe (4-shot).

Reports old_acc_before (post-fold, pre-training) AND old_acc per task.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")

import dataclasses

from gslora_tpu.checkpoints.io import load_pytree, save_pytree
from gslora_tpu.config import (DataConfig, ForgetConfig, LoraConfig,
                               OptimConfig, RunConfig, ViTConfig)
from gslora_tpu.data.pipeline import BatchLoader
from gslora_tpu.data.splits import make_order_list
from gslora_tpu.data.synthetic import synthetic_face_dataset
from gslora_tpu.engine.continual import run_continual_forgetting
from gslora_tpu.engine.evaluate import eval_accuracy, make_eval_step
from gslora_tpu.engine.pretrain import pretrain
from gslora_tpu.models.vit import init_vit_params

MODEL = ViTConfig(image_size=112, patch_size=8, dim=512, depth=6, heads=8,
                  dim_head=64, mlp_dim=2048, num_class=100, dropout=0.1,
                  emb_dropout=0.1, head_type="CosFace")
LORA = LoraConfig(rank=8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--unsaturated", action="store_true")
    ap.add_argument("--boundary", default="merge_reinit",
                    choices=["merge_reinit", "keep"])
    ap.add_argument("--few_shot", action="store_true")
    ap.add_argument("--out", default=None)
    a = ap.parse_args()

    global MODEL
    ckpt = os.environ.get("PRETRAIN_CKPT", "/tmp/flagship_pretrained.msgpack")
    noise, pre_epochs = 1.0, 25
    if a.unsaturated:
        MODEL = dataclasses.replace(MODEL, head_type="Softmax")
        ckpt = ckpt.replace(".msgpack", "_unsat.msgpack")
        noise, pre_epochs = 2.4, 12

    from gslora_tpu.cli.common import setup_jax_runtime
    setup_jax_runtime()

    t0 = time.time()
    train = synthetic_face_dataset(num_classes=100, per_class=24,
                                   image_size=112, seed=0, noise=noise)
    test = synthetic_face_dataset(num_classes=100, per_class=5,
                                  image_size=112, seed=77, noise=noise)
    params = init_vit_params(jax.random.key(0), MODEL, LORA,
                             param_dtype=jnp.float32)
    if os.path.exists(ckpt):
        params = load_pytree(ckpt, params)
        print("loaded pretrained", ckpt, flush=True)
    else:
        pre_cfg = RunConfig(
            model=dataclasses.replace(MODEL, remat=True), lora=LORA,
            optim=OptimConfig(lr=3e-4, warmup_epochs=2, epochs=pre_epochs),
            data=DataConfig(batch_size=240))
        state, _ = pretrain(pre_cfg, params,
                            lambda: BatchLoader(train, 240, seed=3),
                            epochs=pre_epochs, compute_dtype=jnp.bfloat16)
        params = state.params
        save_pytree(ckpt, params)
        print("pretrained + saved", round(time.time() - t0, 1), "s",
              flush=True)
    ev = make_eval_step(MODEL, LORA, compute_dtype=jnp.bfloat16)
    acc = eval_accuracy(ev, params, BatchLoader(test, 250, shuffle=False,
                                                prefetch=0))
    print("pretrain test acc", acc, flush=True)

    # BND is a bound on forget-batch CE: 105 suits CosFace's s=64 logit
    # scale (run_cl_forget.sh:9-22); a Softmax head's CE lives near
    # ln(100)~4.6, so the unsaturated runs use the single-task zoo's 10.0
    fcfg = ForgetConfig(num_of_first_cls=80, per_forget_cls=20,
                        num_tasks=4,
                        bnd=105.0 if MODEL.head_type == "CosFace" else 10.0,
                        cl_beta_list=(0.3, 0.4, 0.28, 0.2),
                        alpha=1e-4, alpha_epoch=0,
                        prototype=True, bnd_pro=50.0,
                        cl_prof_list=(0.015, 0.06, 0.025, 0.012),
                        pro_r_weight=0.0, data_ratio=0.4)
    if a.few_shot:
        fcfg = dataclasses.replace(fcfg, few_shot=True, few_shot_num=4)
    cfg = RunConfig(
        model=MODEL, lora=LORA,
        optim=OptimConfig(lr=1e-2, warmup_epochs=0, epochs=12),
        forget=fcfg,
        data=DataConfig(batch_size=4 if a.few_shot else 48),
        num_epoch=12, ver_freq=10_000, compute_dtype="bfloat16",
        lora_apply="merged", fused_batch=True)
    order = make_order_list(100, seed=1337)
    out = run_continual_forgetting(cfg, params, train, test, order,
                                   boundary=a.boundary)
    report = {"pretrain_test_acc": acc,
              "head": MODEL.head_type, "noise": noise,
              "boundary": a.boundary, "few_shot": a.few_shot,
              "tasks": [
        {"task": t.task,
         "forget_before": t.result.forget_acc_before,
         "forget_after": t.result.forget_acc,
         "remain_after": t.result.remain_acc,
         "old_acc_before": t.old_acc_before,
         "old_acc": t.old_acc,
         "best_H": t.result.best_h} for t in out.tasks],
        "wallclock_s": round(time.time() - t0, 1)}
    print(json.dumps(report, indent=2), flush=True)
    tag = ("_unsat" if a.unsaturated else "") + \
        ("_keep" if a.boundary == "keep" else "") + \
        ("_fs" if a.few_shot else "")
    with open(a.out or f"/tmp/integration_cl_report{tag}.json", "w") as f:
        json.dump(report, f)


if __name__ == "__main__":
    main()
