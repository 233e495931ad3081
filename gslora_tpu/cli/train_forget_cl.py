"""Continual forgetting driver — the flagship (reference
train/train_own_forget_cl.py; recipe scripts/run_cl_forget.sh).

Dispatches on method: GS-LoRA(++) (--one_stage), Retrain, Replay, L2/EWC/MAS,
LwF, DER/DER++, FDR, SCRUB, LIRF — all against the same per-task class-window
protocol, with per-task checkpoints and old-class eval.

Usage (GS-LoRA++ main-table recipe):
  python -m gslora_tpu.cli.train_forget_cl --one_stage --num_tasks 4 \
      --num_of_first_cls 80 --per_forget_cls 20 --few_shot --few_shot_num 4 \
      --lr 1e-2 -b 4 -e 100 --BND 105 --cl_beta_list 0.3 0.4 0.28 0.2 \
      --prototype --BND_pro 50 --cl_prof_list 0.015 0.06 0.025 0.012 \
      --average_weight --ema_epoch 30 -r <pretrained.pth>
"""
from __future__ import annotations

import json
import os

import jax

from gslora_tpu.baselines.distill import run_distill_task
from gslora_tpu.baselines.lirf import run_lirf_task
from gslora_tpu.baselines.regularization import (estimate_importance,
                                                 run_regularization_task)
from gslora_tpu.baselines.scrub import run_scrub_task
from gslora_tpu.checkpoints.io import save_task_checkpoint
from gslora_tpu.config import RunConfig, build_parser, config_from_args
from gslora_tpu.cli.common import build_datasets, build_params
from gslora_tpu.data.folders import ConcatDataset as _ConcatDataset
from gslora_tpu.data.pipeline import BatchLoader, CyclingLoader
from gslora_tpu.data.splits import (few_shot_subset, make_order_list,
                                    open_task_windows, random_relabel,
                                    ratio_subset, split_by_class_window,
                                    task_windows, unique_classes)
from gslora_tpu.engine.continual import run_continual_forgetting
from gslora_tpu.engine.evaluate import eval_accuracy, make_eval_step
from gslora_tpu.engine.loop import _dtype
from gslora_tpu.metrics.logging import MetricLogger


def run_baseline_continual(cfg: RunConfig, params, train_ds, test_ds,
                           order, logger, workdir, mesh=None):
    """Task loop for every non-GS-LoRA method. ``mesh``: optional device
    mesh — forwarded to every task runner (params replicate, batches shard
    over the data axis)."""
    f, b = cfg.forget, cfg.baseline
    method = b.method
    cdt = _dtype(cfg)
    eval_step = make_eval_step(cfg.model, cfg.lora, compute_dtype=cdt)
    bs = cfg.data.batch_size
    test_bs = bs * cfg.data.test_batch_scale
    # static shapes under a mesh / on TPU (see engine.loop auto_pad)
    pad = mesh is not None or jax.default_backend() != "cpu"
    # uint8 host->device transfer (face path only); shadows the module
    # import so every loader in this task loop inherits the flag
    from functools import partial
    from gslora_tpu.data import pipeline as _pl
    BatchLoader = partial(_pl.BatchLoader,
                          uint8_transfer=cfg.data.uint8_transfer)
    from gslora_tpu.parallel.mesh import check_batch_divisible
    check_batch_divisible(mesh, bs)
    results = []
    anchors, importances = [], []
    lam = {"l2": b.l2_lambda, "ewc": b.ewc_lambda,
           "mas": b.mas_lambda}.get(method, 0.0)
    # cross-task state: the reference creates the distill/SCRUB teacher,
    # the SWA model and the four LIRF models ONCE before the task loop
    # (train_own_forget_cl.py:330-476, loop at :515) — every task anchors
    # to the ORIGINAL pretrained model, not the previous task's student
    pretrained = params
    scrub_swa, scrub_teacher, scrub_n_avg = None, None, 0
    lirf_carry = None

    for task in range(f.num_tasks):
        open_te = None
        if f.open_cls_num > 0:
            # open classes at the order-list front, never replayed
            (s1, e1), (s2, e2), (os_, oe) = open_task_windows(
                f.num_of_first_cls, f.per_forget_cls, f.open_cls_num, task)
            _, open_te = split_by_class_window(test_ds, order, 0, 0, os_, oe)
        else:
            s1, e1, s2, e2 = task_windows(f.num_of_first_cls,
                                          f.per_forget_cls, task)
        remain_tr, forget_tr = split_by_class_window(train_ds, order, s1, e1,
                                                     s2, e2)
        remain_te, forget_te = split_by_class_window(test_ds, order, s1, e1,
                                                     s2, e2)
        if f.few_shot:
            forget_sub = few_shot_subset(forget_tr, f.few_shot_num,
                                         cfg.data.seed + task)
            remain_sub = few_shot_subset(remain_tr, f.few_shot_num,
                                         cfg.data.seed + task + 7919)
        else:
            forget_sub = ratio_subset(forget_tr, f.data_ratio,
                                      cfg.data.seed + task)
            remain_sub = ratio_subset(remain_tr, f.data_ratio,
                                      cfg.data.seed + task)

        tbf = lambda: BatchLoader(forget_te, test_bs, shuffle=False,  # noqa: E731
                                  prefetch=0, mask_padding=pad)
        tbr = lambda: BatchLoader(remain_te, test_bs, shuffle=False,  # noqa: E731
                                  prefetch=0, mask_padding=pad)
        tbo = None
        if open_te is not None and len(open_te):
            tbo = lambda: BatchLoader(open_te, test_bs, shuffle=False,  # noqa: E731
                                      prefetch=0, mask_padding=pad)
        relabeled = random_relabel(forget_sub, cfg.model.num_class,
                                   seed=cfg.data.seed + task)
        fl = BatchLoader(relabeled, bs, seed=cfg.data.seed + task,
                         mask_padding=pad)
        rl = BatchLoader(remain_sub, bs, seed=cfg.data.seed + task + 1,
                         mask_padding=pad)

        if method in ("l2", "ewc", "mas"):
            if task == 0:
                anchors.append(params)
                names, n_cls = unique_classes(remain_sub)
                print("importance class", names, n_cls)  # cl_open.py:707
                # the loader streams decode; estimate_importance consumes
                # it batch-by-batch (materializing the split would cost
                # tens of GB at ImageNet scale)
                importances.append(estimate_importance(
                    method, params,
                    BatchLoader(remain_sub, bs, shuffle=False, prefetch=0,
                                mask_padding=pad),
                    cfg.model, cfg.lora, cdt))
            out = run_regularization_task(
                cfg, params, lambda: iter(fl), tbf, tbr, lam=lam,
                anchors=anchors, importances=importances, logger=logger,
                test_batches_open=tbo, mesh=mesh)
            params = out["params"]
            if task < f.num_tasks - 1:
                # next-task importance over the NEXT task's FULL remain
                # split (cl.py:1637-1692)
                anchors.append(params)
                ns1, ne1, _, _ = task_windows(
                    f.num_of_first_cls, f.per_forget_cls, task + 1)
                next_remain, _ = split_by_class_window(train_ds, order,
                                                       ns1, ne1, 0, 0)
                importances.append(estimate_importance(
                    method, params,
                    BatchLoader(next_remain, bs, shuffle=False, prefetch=0,
                                mask_padding=pad),
                    cfg.model, cfg.lora, cdt))
        elif method == "retrain":
            fresh = build_params(
                RunConfig(net=cfg.net, model=cfg.model, lora=cfg.lora,
                          data=cfg.data, param_dtype=cfg.param_dtype,
                          compute_dtype=cfg.compute_dtype),
                seed=cfg.data.seed + 7 + task)
            out = run_regularization_task(
                cfg, fresh, lambda: iter(rl), tbf, tbr, lam=0.0,
                anchors=[], importances=[], logger=logger,
                test_batches_open=tbo, mesh=mesh)
            params = out["params"]
        elif method == "replay":
            total = _ConcatDataset(relabeled, remain_sub)
            tl = BatchLoader(total, bs, seed=cfg.data.seed + task,
                             mask_padding=pad)
            out = run_regularization_task(
                cfg, params, lambda: iter(tl), tbf, tbr, lam=0.0,
                anchors=[], importances=[], logger=logger,
                test_batches_open=tbo, mesh=mesh)
            params = out["params"]
        elif method in ("lwf", "der", "der_plus", "fdr"):
            # teacher = the pretrained model, every task (cl.py:453-476)
            out = run_distill_task(cfg, params, pretrained,
                                   lambda: iter(fl),
                                   CyclingLoader(rl), tbf, tbr,
                                   logger=logger, test_batches_open=tbo,
                                   mesh=mesh)
            params = out["params"]
        elif method == "scrub":
            # SCRUB uses TRUE labels on the forget set
            fl_true = BatchLoader(forget_sub, bs, seed=cfg.data.seed + task,
                                  mask_padding=pad)
            out = run_scrub_task(cfg, params, lambda: iter(fl_true),
                                 lambda: iter(rl), tbf, tbr, logger=logger,
                                 test_batches_open=tbo, mesh=mesh,
                                 teacher=(scrub_teacher if scrub_teacher
                                          is not None else pretrained),
                                 swa=scrub_swa, n_averaged=scrub_n_avg)
            params = out["params"]
            # SWA/teacher persist across tasks (cl.py:441-451)
            scrub_teacher = out["teacher"]
            scrub_swa = out["swa"]
            scrub_n_avg = out["n_averaged"]
        elif method == "lirf":
            out = run_lirf_task(cfg, params, lambda: iter(fl),
                                CyclingLoader(rl), tbf, tbr, logger=logger,
                                test_batches_open=tbo, mesh=mesh,
                                carry=lirf_carry)
            lirf_carry = {"teacher": out["teacher"],
                          "student_low": out["student_low"],
                          "deposit_low": out["deposit_low"]}
            # LIRF's deployable model is teacher_up(student_low); the
            # student is the low-half SUBTREE (its block stack has depth//2
            # layers — baselines.lirf.low_slice)
            base = dict(out["teacher"])
            half = cfg.model.depth // 2
            merged_blocks = jax.tree.map(
                lambda s, t: t.at[:half].set(s),
                out["student_low"]["blocks"], base["blocks"])
            base["blocks"] = merged_blocks
            for k in ("patch", "cls_token", "pos_embed"):
                base[k] = out["student_low"][k]
            # any LoRA was folded into the teacher at task entry — carrying
            # the old adapters forward would double-apply them at eval
            params = {"base": base, "lora": {}}
        else:
            raise ValueError(f"unknown method {method}")

        old_acc = None
        if task > 0:
            _, old_te = split_by_class_window(test_ds, order, 0, 0, e2,
                                              cfg.model.num_class)
            if len(old_te):
                old_acc = eval_accuracy(
                    eval_step, params,
                    BatchLoader(old_te, test_bs, shuffle=False, prefetch=0,
                                mask_padding=pad))
        out["old_acc"] = old_acc
        out.pop("params", None)
        out.pop("swa", None)
        out.pop("student_low", None)
        out.pop("deposit_low", None)
        out.pop("teacher", None)
        results.append({"task": task, **{k: v for k, v in out.items()
                                         if not hasattr(v, "shape")}})
        if workdir:
            save_task_checkpoint(workdir, task, params,
                                 extra=results[-1])
    return results, params


def main(argv=None):
    from gslora_tpu.cli.common import setup_jax_runtime
    args = build_parser().parse_args(argv)
    # --fast: hardware dropout RNG (threefry mask generation costs ~17 ms
    # of a ~48 ms step on v5e — DEVNOTES)
    setup_jax_runtime(rng_impl="rbg" if getattr(args, "fast", False)
                      else None)
    cfg = config_from_args(args)
    train_ds, test_ds = build_datasets(cfg)
    order = make_order_list(cfg.model.num_class, seed=cfg.data.seed)
    params = build_params(cfg)
    # ImageNet-100: slice a resumed 1000-way torchvision head down to the
    # run's classes; keep the original for the missing-class eval
    # (reference modify_head/resume_head flow, cl.py:180-312)
    original_head = None
    miss_ds = None
    if cfg.data.data_mode == "imagenet100":
        from gslora_tpu.cli.common import (build_missing_dataset,
                                           prepare_imagenet_head)
        params, original_head = prepare_imagenet_head(cfg, params, train_ds)
        miss_root = getattr(args, "imagenet_miss_root", "")
        if miss_root and original_head is not None:
            miss_ds = build_missing_dataset(cfg, miss_root)
    from gslora_tpu.utils.params import param_summary
    print("params:", json.dumps(param_summary(params)))
    logger = MetricLogger(use_wandb=cfg.log_wandb, outdir=cfg.outdir,
                          config=json.loads(cfg.to_json()))

    # one eval step for both the before and after miss evals (a fresh
    # make_eval_step per call would recompile — minutes on tunneled TPUs)
    miss_ev = make_eval_step(cfg.model, cfg.lora, compute_dtype=_dtype(cfg)) \
        if miss_ds is not None else None
    miss_pad = jax.default_backend() != "cpu"

    def missing_acc(tag, p):
        """Held-out-class accuracy with the restored 1000-way head
        (cl.py:294-312, :1738-1763)."""
        if miss_ds is None:
            return None
        from gslora_tpu.models.vit_imagenet import resume_head
        acc = eval_accuracy(
            miss_ev, resume_head(p, original_head),
            BatchLoader(miss_ds, cfg.data.batch_size, shuffle=False,
                        prefetch=0, mask_padding=miss_pad))
        print(f"missing-class acc {tag}: {acc:.2f}%")
        logger.log({f"imagenet-val-miss_{tag}": acc})
        return acc

    missing_acc("before", params)

    # data-parallel mesh is opt-in (--dp): batch sizes must divide the
    # data-axis size (use --batch_size accordingly / pad_to_batch)
    mesh = None
    if getattr(args, "dp", False) and len(jax.devices()) > 1:
        from gslora_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(cfg.mesh)
    if cfg.baseline.method == "gs_lora" or args.one_stage:
        out = run_continual_forgetting(cfg, params, train_ds, test_ds,
                                       order, logger=logger,
                                       workdir=cfg.outdir, mesh=mesh)
        report = [{
            "task": t.task, "forget_acc_before": t.result.forget_acc_before,
            "forget_acc": t.result.forget_acc,
            "remain_acc": t.result.remain_acc, "old_acc": t.old_acc,
            "old_acc_before": t.old_acc_before,
            "open_acc": t.result.open_acc,
            "best_H_mean": t.result.best_h, "norm_list": t.result.norm_list,
            "time_to_forget_s": round(t.result.wallclock_s, 2),
        } for t in out.tasks]
        final_params = out.final_params or params
    else:
        # every baseline family accumulates exactly when --grad_accum > 1:
        # reg/SCRUB via engine.pretrain._accumulated (masked means +
        # data-independent penalties), distill and LIRF via per-stream
        # linear surrogates (their _accum_grads)
        report, final_params = run_baseline_continual(
            cfg, params, train_ds, test_ds, order, logger, cfg.outdir,
            mesh=mesh)
    missing_acc("after", final_params)

    print(json.dumps(report, indent=2))
    if cfg.outdir:
        os.makedirs(cfg.outdir, exist_ok=True)
        with open(os.path.join(cfg.outdir, "report.json"), "w") as fh:
            json.dump(report, fh, indent=2)
    from gslora_tpu.metrics.logging import make_run_name
    logger.set_run_name(make_run_name(cfg, cl=True))
    logger.finish()
    return report


if __name__ == "__main__":
    main()
