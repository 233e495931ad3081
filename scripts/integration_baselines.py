"""Flagship-scale BASELINE integration on real TPU: one forgetting task of
EWC (regularization family) and SCRUB (teacher-student family) on the
synthetic CASIA-100 stand-in at the reference model scale (ViT-P8S8 19.2M
params, bf16, bs 48). Complements integration_continual.py (GS-LoRA++):
certifies the baseline zoo's TPU path — padded static-shape loaders,
importance estimation, max/min KD — at scale, not just on the CPU test
shapes.

Reuses the cached pretrain checkpoint (PRETRAIN_CKPT, shared with
integration_continual.py). Writes /tmp/integration_baselines.json.
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

from gslora_tpu.baselines.regularization import (estimate_importance,
                                                 run_regularization_task)
from gslora_tpu.baselines.scrub import run_scrub_task
from gslora_tpu.checkpoints.io import load_pytree, save_pytree
from gslora_tpu.config import (BaselineConfig, DataConfig, ForgetConfig,
                               LoraConfig, OptimConfig, RunConfig, ViTConfig)
from gslora_tpu.data.pipeline import BatchLoader
from gslora_tpu.data.splits import (make_order_list, random_relabel,
                                    ratio_subset, split_by_class_window)
from gslora_tpu.data.synthetic import synthetic_face_dataset
from gslora_tpu.engine.pretrain import pretrain
from gslora_tpu.models.vit import init_vit_params

MODEL = ViTConfig(image_size=112, patch_size=8, dim=512, depth=6, heads=8,
                  dim_head=64, mlp_dim=2048, num_class=100, dropout=0.1,
                  emb_dropout=0.1, head_type="CosFace")
LORA = LoraConfig(rank=8)
CKPT = os.environ.get("PRETRAIN_CKPT", "/tmp/flagship_pretrained.msgpack")
BS = 48


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", default="ewc,scrub",
                    help="comma list of ewc,scrub,lwf,lirf")
    ap.add_argument("--unsaturated", action="store_true",
                    help="harder stand-in (noise 2.4, Softmax head, fewer "
                         "pretrain epochs) so CE is NOT saturated — the "
                         "regime where grad-based baselines (EWC "
                         "importance, LIRF relabel-CE) have real signal; "
                         "see the saturation artifact in BASELINE.md")
    a = ap.parse_args()
    methods = {m.strip() for m in a.methods.split(",") if m.strip()}
    known = {"ewc", "mas", "l2", "retrain", "replay", "scrub", "lwf",
             "lirf", "gs_lora", "der", "der_plus", "fdr"}
    unknown = methods - known
    if unknown or not methods:
        raise SystemExit(f"unknown --methods {sorted(unknown)}; "
                         f"choose from {sorted(known)}")
    global MODEL, CKPT
    noise = 1.0
    if a.unsaturated:
        MODEL = dataclasses.replace(MODEL, head_type="Softmax")
        CKPT = CKPT.replace(".msgpack", "_unsat.msgpack")
        noise = 2.4
    t0 = time.time()
    train = synthetic_face_dataset(num_classes=100, per_class=24,
                                   image_size=112, seed=0, noise=noise)
    test = synthetic_face_dataset(num_classes=100, per_class=5,
                                  image_size=112, seed=77, noise=noise)
    params = init_vit_params(jax.random.key(0), MODEL, LORA,
                             param_dtype=jnp.float32)
    if os.path.exists(CKPT):
        params = load_pytree(CKPT, params)
        print("loaded pretrained", CKPT, flush=True)
    else:
        n_ep = 12 if a.unsaturated else 25
        pre_cfg = RunConfig(
            model=dataclasses.replace(MODEL, remat=True), lora=LORA,
            optim=OptimConfig(lr=3e-4, warmup_epochs=2, epochs=n_ep),
            data=DataConfig(batch_size=240))
        state, _ = pretrain(pre_cfg, params,
                            lambda: BatchLoader(train, 240, seed=3),
                            epochs=n_ep, compute_dtype=jnp.bfloat16)
        params = state.params
        save_pytree(CKPT, params)
        print("pretrained + saved", round(time.time() - t0, 1), "s",
              flush=True)
    from gslora_tpu.engine.evaluate import eval_accuracy, make_eval_step
    ev = make_eval_step(MODEL, LORA, compute_dtype=jnp.bfloat16)
    pre_acc = eval_accuracy(ev, params, BatchLoader(test, 240, shuffle=False,
                                                    prefetch=0,
                                                    mask_padding=True))
    print("pretrain test acc", pre_acc, flush=True)

    order = make_order_list(100, seed=1337)
    remain_tr, forget_tr = split_by_class_window(train, order, 0, 80, 80, 100)
    remain_te, forget_te = split_by_class_window(test, order, 0, 80, 80, 100)
    forget_sub = ratio_subset(forget_tr, 0.4, 1337)
    remain_sub = ratio_subset(remain_tr, 0.4, 1337)
    relabeled = random_relabel(forget_sub, 100, seed=1337)

    tbf = lambda: BatchLoader(forget_te, 240, shuffle=False, prefetch=0,  # noqa: E731
                              mask_padding=True)
    tbr = lambda: BatchLoader(remain_te, 240, shuffle=False, prefetch=0,  # noqa: E731
                              mask_padding=True)

    sfx = "_unsat" if a.unsaturated else ""
    report = {"pretrain_test_acc" + sfx: pre_acc}

    if "gs_lora" in methods:
        # --- GS-LoRA(++) headline method: bounded ascent + remain CE +
        # group-Lasso over rank-8 FFN LoRA (true forget labels)
        t1 = time.time()
        from gslora_tpu.engine.loop import ForgetData, run_forget_training
        cfg = RunConfig(
            model=MODEL, lora=LORA,
            optim=OptimConfig(opt="adamw", lr=1e-2, warmup_epochs=0,
                              epochs=12),
            forget=ForgetConfig(num_of_first_cls=80, per_forget_cls=20,
                                bnd=110.0 if MODEL.head_type == "CosFace"
                                else 10.0,
                                beta=0.15, alpha=1e-4, alpha_epoch=0),
            data=DataConfig(batch_size=BS), num_epoch=12, ver_freq=10_000,
            compute_dtype="bfloat16", lora_apply="merged", fused_batch=True)
        data = ForgetData(train_forget=forget_sub, train_remain=remain_sub,
                          test_forget=forget_te, test_remain=remain_te)
        res = run_forget_training(cfg, params, data)
        report['gs_lora' + sfx] = {
            "forget_acc_before": res.forget_acc_before,
            "forget_acc": res.forget_acc, "remain_acc": res.remain_acc,
            "best_h": res.best_h,
            "wallclock_s": round(time.time() - t1, 1)}
        print("GS-LoRA:", json.dumps(report['gs_lora' + sfx]), flush=True)
        _finish(dict(report), t0)

    for dm in ("lwf", "der", "der_plus", "fdr"):
        if dm not in methods:
            continue
        # --- teacher-student family (teacher frozen at task start)
        t1 = time.time()
        from gslora_tpu.baselines.distill import run_distill_task
        from gslora_tpu.data.pipeline import CyclingLoader
        cfg = RunConfig(
            model=MODEL, lora=LORA,
            optim=OptimConfig(opt="adamw", lr=1e-4, warmup_epochs=0,
                              epochs=6),
            forget=ForgetConfig(num_of_first_cls=80, per_forget_cls=20),
            baseline=BaselineConfig(method=dm, lwf_lambda_kd=0.5,
                                    lwf_lambda_remain=1.0, der_lambda=0.1,
                                    der_plus_lambda=0.1, fdr_lambda=0.1),
            data=DataConfig(batch_size=BS), num_epoch=6, ver_freq=10_000,
            compute_dtype="bfloat16")
        fl = BatchLoader(relabeled, BS, seed=4, mask_padding=True)
        rl = BatchLoader(remain_sub, BS, seed=5, mask_padding=True)
        out = run_distill_task(cfg, params, params, lambda: iter(fl),
                               CyclingLoader(rl), tbf, tbr)
        report[dm + sfx] = {k: out[k] for k in
                            ("forget_acc_before", "forget_acc",
                             "remain_acc", "best_h")}
        report[dm + sfx]["wallclock_s"] = round(time.time() - t1, 1)
        print(f"{dm}:", json.dumps(report[dm + sfx]), flush=True)
        _finish(dict(report), t0)

    if "lirf" in methods:
        # --- LIRF (low/up split, AT + class-slice KD, deposit model)
        t1 = time.time()
        from gslora_tpu.baselines.lirf import run_lirf_task
        from gslora_tpu.data.pipeline import CyclingLoader
        cfg = RunConfig(
            model=MODEL, lora=LORA,
            optim=OptimConfig(opt="adamw", lr=1e-4, warmup_epochs=0,
                              epochs=6),
            forget=ForgetConfig(num_of_first_cls=80, per_forget_cls=20),
            baseline=BaselineConfig(method="lirf"),
            data=DataConfig(batch_size=BS), num_epoch=6, ver_freq=10_000,
            compute_dtype="bfloat16")
        fl = BatchLoader(relabeled, BS, seed=6, mask_padding=True)
        rl = BatchLoader(remain_sub, BS, seed=7, mask_padding=True)
        out = run_lirf_task(cfg, params, lambda: iter(fl),
                            CyclingLoader(rl), tbf, tbr)
        report['lirf' + sfx] = {k: out[k] for k in
                         ("forget_acc_before", "forget_acc", "remain_acc",
                          "best_h")}
        report['lirf' + sfx]["wallclock_s"] = round(time.time() - t1, 1)
        print("LIRF:", json.dumps(report['lirf' + sfx]), flush=True)
        _finish(dict(report), t0)

    # --- regularization family (train_one_epoch_regularzation):
    # EWC/MAS/L2 quadratic penalties on relabeled forget data; lambdas from
    # the reference recipes (run_cl_forget.sh templates: ewc 10, MAS 5,
    # l2 0.1; run_forget_open.sh confirms ewc 10)
    for rm, lam in (("ewc", 10.0), ("mas", 5.0), ("l2", 0.1)):
        if rm not in methods:
            continue
        t1 = time.time()
        cfg = RunConfig(
            model=MODEL, lora=LORA,
            optim=OptimConfig(opt="adamw", lr=1e-4, warmup_epochs=0,
                              epochs=6),
            forget=ForgetConfig(num_of_first_cls=80, per_forget_cls=20),
            baseline=BaselineConfig(method=rm, **{rm + "_lambda": lam}),
            data=DataConfig(batch_size=BS), num_epoch=6, ver_freq=10_000,
            compute_dtype="bfloat16")
        imp = estimate_importance(
            rm, params,
            BatchLoader(remain_sub, BS, shuffle=False, prefetch=0,
                        mask_padding=True),
            MODEL, LORA, jnp.bfloat16)
        fl = BatchLoader(relabeled, BS, seed=1, mask_padding=True)
        out = run_regularization_task(cfg, params, lambda: iter(fl), tbf,
                                      tbr, lam=lam, anchors=[params],
                                      importances=[imp])
        report[rm + sfx] = {k: out[k] for k in
                            ("forget_acc_before", "forget_acc",
                             "remain_acc", "best_h")}
        report[rm + sfx]["wallclock_s"] = round(time.time() - t1, 1)
        print(f"{rm}:", json.dumps(report[rm + sfx]), flush=True)
        _finish(dict(report), t0)

    for rm in ("retrain", "replay"):
        if rm not in methods:
            continue
        # --- retrain: FRESH model on remain only (cl.py:1108-1189);
        # --- replay: pretrained model on relabeled-forget + remain concat
        # (cl.py:691-695); both through the lam=0 regularization loop
        t1 = time.time()
        # retrain is FROM SCRATCH: give it the full pretrain recipe
        # (same lr/epoch budget the pretrained model got) — with only the
        # fine-tune budget a fresh ViT can't learn anything and the row
        # is uninformative; the honest comparison is "recovers remain to
        # the data's ceiling, but costs the whole from-scratch budget"
        lr, n_ep = (3e-4, 12) if rm == "retrain" else (1e-4, 6)
        cfg = RunConfig(
            model=MODEL, lora=LORA,
            optim=OptimConfig(opt="adamw", lr=lr, warmup_epochs=0,
                              epochs=n_ep),
            forget=ForgetConfig(num_of_first_cls=80, per_forget_cls=20),
            baseline=BaselineConfig(method=rm),
            data=DataConfig(batch_size=BS), num_epoch=n_ep, ver_freq=10_000,
            compute_dtype="bfloat16")
        if rm == "retrain":
            start = init_vit_params(jax.random.key(11), MODEL, LORA,
                                    param_dtype=jnp.float32)
            tl = BatchLoader(remain_sub, BS, seed=8, mask_padding=True)
        else:
            from gslora_tpu.data.folders import ConcatDataset
            start = params
            tl = BatchLoader(ConcatDataset(relabeled, remain_sub), BS,
                             seed=9, mask_padding=True)
        out = run_regularization_task(cfg, start, lambda: iter(tl), tbf,
                                      tbr, lam=0.0, anchors=[],
                                      importances=[])
        report[rm + sfx] = {k: out[k] for k in
                            ("forget_acc_before", "forget_acc",
                             "remain_acc", "best_h")}
        report[rm + sfx]["wallclock_s"] = round(time.time() - t1, 1)
        print(f"{rm}:", json.dumps(report[rm + sfx]), flush=True)
        _finish(dict(report), t0)

    if "scrub" in methods:
        # --- SCRUB (max/min KD, SWA, sgda optimizer; true forget labels)
        t2 = time.time()
        cfg = RunConfig(
            model=MODEL, lora=LORA,
            optim=OptimConfig(opt="adamw", lr=1e-4, warmup_epochs=0,
                              epochs=10),
            forget=ForgetConfig(num_of_first_cls=80, per_forget_cls=20),
            baseline=BaselineConfig(method="scrub", scrub_superepoch=2,
                                    sgda_learning_rate=5e-4,
                                    sgda_gamma=0.99, sgda_alpha=0.001),
            data=DataConfig(batch_size=BS), num_epoch=10, ver_freq=10_000,
            compute_dtype="bfloat16")
        fl_true = BatchLoader(forget_sub, BS, seed=2, mask_padding=True)
        rl = BatchLoader(remain_sub, BS, seed=3, mask_padding=True)
        out = run_scrub_task(cfg, params, lambda: iter(fl_true),
                             lambda: iter(rl), tbf, tbr)
        report['scrub' + sfx] = {k: out[k] for k in
                           ("forget_acc_before", "forget_acc",
                            "remain_acc", "best_h")}
        report['scrub' + sfx]["wallclock_s"] = round(time.time() - t2, 1)
        print("SCRUB:", json.dumps(report['scrub' + sfx]), flush=True)
        _finish(dict(report), t0)

    _finish(report, t0)


def _finish(report, t0):
    report["total_wallclock_s"] = round(time.time() - t0, 1)
    print(json.dumps(report, indent=2), flush=True)
    out_path = "/tmp/integration_baselines.json"
    merged = {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                merged = json.load(f)
        except Exception:
            merged = {}
    merged.update(report)
    with open(out_path, "w") as f:
        json.dump(merged, f)


if __name__ == "__main__":
    main()
