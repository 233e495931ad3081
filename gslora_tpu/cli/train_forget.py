"""Single-step GS-LoRA(++) forgetting driver (reference
train/train_own_forget.py; recipe scripts/run_forget.sh).

Usage:
  python -m gslora_tpu.cli.train_forget --net VIT --vit_depth 6 \
      --lora_rank 8 --head CosFace -r <pretrained.pth> --lr 1e-2 -b 48 \
      -e 100 --BND 110 --beta 0.15 --alpha 0.01 \
      --num_of_first_cls 90 --per_forget_cls 10 [--prototype ...]
"""
from __future__ import annotations

import dataclasses
import json
import os

from gslora_tpu.config import build_parser, config_from_args
from gslora_tpu.cli.common import build_datasets, build_params
from gslora_tpu.data.splits import (few_shot_subset, make_order_list,
                                    open_single_windows, random_relabel,
                                    ratio_subset, split_by_class_window,
                                    unique_classes)
from gslora_tpu.engine.loop import ForgetData, run_forget_training
from gslora_tpu.metrics.logging import MetricLogger

# Methods the reference's single-step open driver dispatches besides
# --one_stage (train_own_forget_open.py:837-1063). Everything else has NO
# single-step path in the reference either and must raise, never silently
# run GS-LoRA.
_SINGLE_STEP_METHODS = ("retrain", "l2", "ewc", "mas")


def run_single_step_baseline(cfg, train_ds, data: ForgetData, order,
                             logger=None, mesh=None):
    """The reference single-step driver's non-one_stage reg-family dispatch
    (train_own_forget_open.py:837-1063), previously missing here:

    * ``retrain``: the checkpoint resume is SKIPPED (":642 `if
      BACKBONE_RESUME_ROOT and not args.retrain`"), so a freshly
      initialized model trains on the remain subset with reg_lambda=0
      (:837-870).
    * ``l2``/``ewc``/``mas``: anchor at the resumed pretrained params,
      importance estimated over the FULL ``[0, first-per)`` window split
      (:687-698 — the window arithmetic reuses the CL first-task shape even
      under --open_cls_num; quirk kept), then train on
      concat(random-relabeled forget subset, remain subset) (:498-504,
      :564-573, :1039 ``train_loader_total``) under the quadratic penalty.

    All params (base + any LoRA) are trainable, as in the reference's
    baseline branch (:708-713)."""
    import jax

    from gslora_tpu.baselines.regularization import (estimate_importance,
                                                     run_regularization_task)
    from gslora_tpu.data.folders import ConcatDataset
    from gslora_tpu.engine.loop import _dtype

    f, b = cfg.forget, cfg.baseline
    method = b.method
    if method not in _SINGLE_STEP_METHODS:
        raise ValueError(
            f"method {method!r} has no single-step dispatch (the reference "
            "single-step drivers dispatch only one_stage/retrain/l2/ewc/MAS"
            " — train_own_forget_open.py:785,837,1028); run it through "
            "train_forget_cl --num_tasks 1 instead")

    pad = mesh is not None or jax.default_backend() != "cpu"
    bs = cfg.data.batch_size
    test_bs = bs * cfg.data.test_batch_scale
    from functools import partial
    from gslora_tpu.data import pipeline as _pl
    BatchLoader = partial(_pl.BatchLoader,
                          uint8_transfer=cfg.data.uint8_transfer)
    from gslora_tpu.parallel.mesh import check_batch_divisible
    check_batch_divisible(mesh, bs)

    tbf = lambda: BatchLoader(data.test_forget, test_bs, shuffle=False,  # noqa: E731
                              prefetch=0, mask_padding=pad)
    tbr = lambda: BatchLoader(data.test_remain, test_bs, shuffle=False,  # noqa: E731
                              prefetch=0, mask_padding=pad)
    tbo = None
    if data.test_open is not None and len(data.test_open):
        tbo = lambda: BatchLoader(data.test_open, test_bs, shuffle=False,  # noqa: E731
                                  prefetch=0, mask_padding=pad)

    if method == "retrain":
        params = build_params(dataclasses.replace(cfg, resume=""))
        rl = BatchLoader(data.train_remain, bs, seed=cfg.data.seed,
                         mask_padding=pad)
        out = run_regularization_task(
            cfg, params, lambda: iter(rl), tbf, tbr, lam=0.0,
            anchors=[], importances=[], logger=logger,
            test_batches_open=tbo, mesh=mesh)
    else:
        params = build_params(cfg)
        cdt = _dtype(cfg)
        # importance over the full first-task window split, not the ratio
        # subset (train_own_forget_open.py:687-698)
        imp_en1 = f.num_of_first_cls - f.per_forget_cls
        imp_ds, _ = split_by_class_window(train_ds, order, 0, imp_en1,
                                          imp_en1, f.num_of_first_cls)
        names, n_cls = unique_classes(imp_ds)
        print("importance class", names, n_cls)  # :698 print parity
        importance = estimate_importance(
            method, params,
            BatchLoader(imp_ds, bs, shuffle=False, prefetch=0,
                        mask_padding=pad),
            cfg.model, cfg.lora, cdt)
        lam = {"l2": b.l2_lambda, "ewc": b.ewc_lambda,
               "mas": b.mas_lambda}[method]
        relabeled = random_relabel(data.train_forget, cfg.model.num_class,
                                   seed=cfg.data.seed)
        total = ConcatDataset(relabeled, data.train_remain)
        tl = BatchLoader(total, bs, seed=cfg.data.seed, mask_padding=pad)
        out = run_regularization_task(
            cfg, params, lambda: iter(tl), tbf, tbr, lam=lam,
            anchors=[params], importances=[importance], logger=logger,
            test_batches_open=tbo, mesh=mesh)

    return {
        "forget_acc_before": out["forget_acc_before"],
        "forget_acc": out["forget_acc"], "remain_acc": out["remain_acc"],
        "open_acc": out["open_acc"], "best_H_mean": out["best_h"],
        "norm_list": None,  # get_norm_of_lora is one_stage-only (:1068)
    }


def main(argv=None):
    from gslora_tpu.cli.common import setup_jax_runtime
    args = build_parser().parse_args(argv)
    # --fast: hardware dropout RNG (threefry mask generation costs ~17 ms
    # of a ~48 ms step on v5e — DEVNOTES)
    setup_jax_runtime(rng_impl="rbg" if getattr(args, "fast", False)
                      else None)
    cfg = config_from_args(args)
    f = cfg.forget

    train_ds, test_ds = build_datasets(cfg)
    order = make_order_list(cfg.model.num_class, seed=cfg.data.seed)

    if f.open_cls_num > 0:
        (rs, re), (fs, fe), (os_, oe) = open_single_windows(
            f.num_of_first_cls, f.per_forget_cls, f.open_cls_num)
    else:
        rs, re = 0, f.num_of_first_cls
        fs, fe = f.num_of_first_cls, f.num_of_first_cls + f.per_forget_cls
        os_ = oe = None

    remain_tr, forget_tr = split_by_class_window(train_ds, order, rs, re,
                                                 fs, fe)
    remain_te, forget_te = split_by_class_window(test_ds, order, rs, re,
                                                 fs, fe)
    test_open = None
    if os_ is not None:
        _, test_open = split_by_class_window(test_ds, order, 0, 0, os_, oe)

    if f.few_shot:
        forget_sub = few_shot_subset(forget_tr, f.few_shot_num,
                                     cfg.data.seed)
        remain_sub = few_shot_subset(remain_tr, f.few_shot_num,
                                     cfg.data.seed + 7919)  # uncorrelated
    else:
        forget_sub = ratio_subset(forget_tr, f.data_ratio, cfg.data.seed)
        remain_sub = ratio_subset(remain_tr, f.data_ratio, cfg.data.seed)

    data = ForgetData(train_forget=forget_sub, train_remain=remain_sub,
                      test_forget=forget_te, test_remain=remain_te,
                      test_open=test_open)

    logger = MetricLogger(use_wandb=cfg.log_wandb, outdir=cfg.outdir,
                          config=json.loads(cfg.to_json()))
    mesh = None
    if getattr(args, "dp", False):
        import jax
        if len(jax.devices()) > 1:
            from gslora_tpu.parallel.mesh import (check_batch_divisible,
                                                  make_mesh)
            mesh = make_mesh(cfg.mesh)
            check_batch_divisible(mesh, cfg.data.batch_size)

    # method dispatch mirrors the reference driver: one_stage FIRST
    # (train_own_forget_open.py:785), then the reg family; anything the
    # reference can't run single-step raises in run_single_step_baseline.
    if cfg.baseline.method != "gs_lora" and not args.one_stage:
        report = run_single_step_baseline(cfg, train_ds, data, order,
                                          logger=logger, mesh=mesh)
        from gslora_tpu.metrics.logging import make_run_name
        logger.set_run_name(make_run_name(cfg))
        print(json.dumps(report, indent=2))
        if cfg.outdir:
            with open(os.path.join(cfg.outdir, "report.json"), "w") as fh:
                json.dump(report, fh, indent=2)
        logger.finish()
        return report

    params = build_params(cfg)
    from gslora_tpu.utils.params import param_summary
    print("params:", json.dumps(param_summary(params)))
    if getattr(args, "profile_dir", ""):
        # jax.profiler trace around the whole run (SURVEY §5.1; view with
        # TensorBoard). Includes compile + every step.
        from gslora_tpu.utils.profiling import trace
        with trace(args.profile_dir):
            res = run_forget_training(cfg, params, data, logger=logger,
                                      workdir=cfg.outdir, mesh=mesh)
    else:
        res = run_forget_training(cfg, params, data, logger=logger,
                                  workdir=cfg.outdir, mesh=mesh)
    # run name assembled from hyperparameters at exit
    # (train_own_forget.py:844-877)
    from gslora_tpu.metrics.logging import make_run_name
    logger.set_run_name(make_run_name(cfg))

    report = {
        "forget_acc_before": res.forget_acc_before,
        "forget_acc": res.forget_acc, "remain_acc": res.remain_acc,
        "open_acc": res.open_acc, "best_H_mean": res.best_h,
        "norm_list": res.norm_list,
    }
    print(json.dumps(report, indent=2))
    if cfg.outdir:
        with open(os.path.join(cfg.outdir, "report.json"), "w") as fh:
            json.dump(report, fh, indent=2)
    logger.finish()
    return report


if __name__ == "__main__":
    main()
