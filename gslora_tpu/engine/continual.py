"""Continual forgetting task loop (GS-LoRA / GS-LoRA++).

Re-design of train_own_forget_cl.py's flagship driver (:515-1763) for the
one_stage (GS-LoRA) method; baseline methods plug in via
gslora_tpu.baselines. TPU-native task boundary: the reference saves the
eval-mode (loralib-MERGED) state_dict at task end and re-loads + LoRA-reinits
at the next task start (:523-536, :1696-1714) — here that is the pure fold
``base <- merged(base, lora); lora <- reinit`` with no file round-trip
(task snapshots are still written for recovery parity, SURVEY §5.3/5.4).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional

import jax

from gslora_tpu.checkpoints.io import save_task_checkpoint
from gslora_tpu.config import RunConfig
from gslora_tpu.data.folders import Dataset
from gslora_tpu.data.pipeline import BatchLoader
from gslora_tpu.data.splits import (few_shot_subset, open_task_windows,
                                    ratio_subset, split_by_class_window,
                                    task_windows)
from gslora_tpu.engine.ema import merged_params
from gslora_tpu.engine.evaluate import eval_accuracy, make_eval_step
from gslora_tpu.engine.loop import ForgetData, ForgetResult, _dtype, \
    run_forget_training
from gslora_tpu.engine.prototypes import calculate_prototypes
from gslora_tpu.lora.core import reinit_lora
from gslora_tpu.metrics.logging import MetricLogger


@dataclass
class TaskResult:
    task: int
    result: ForgetResult
    old_acc: Optional[float] = None
    # old-class accuracy measured right AFTER the task-boundary fold and
    # BEFORE this task trains: separates boundary-fold effects (merge+
    # reinit) from this task's training dynamics when previously-forgotten
    # classes resurface (VERDICT r3 #3 instrumentation)
    old_acc_before: Optional[float] = None


@dataclass
class ContinualResult:
    tasks: List[TaskResult] = field(default_factory=list)
    final_params: Any = None


def split_task_data(cfg: RunConfig, train_ds: Dataset, test_ds: Dataset,
                    order_list: List[int], task: int, seed: int
                    ) -> tuple[ForgetData, Optional[Dataset]]:
    """Per-task window split + few-shot/ratio subsetting
    (train_own_forget_cl.py:546-750). Returns (data, test_old)."""
    f = cfg.forget
    test_open = None
    if f.open_cls_num > 0:
        # open classes live at the front of the order list and are never
        # replayed (train_own_forget_cl_open.py:413-463)
        (s1, e1), (s2, e2), (os_, oe) = open_task_windows(
            f.num_of_first_cls, f.per_forget_cls, f.open_cls_num, task)
        _, test_open = split_by_class_window(test_ds, order_list, 0, 0,
                                             os_, oe)
    else:
        s1, e1, s2, e2 = task_windows(f.num_of_first_cls, f.per_forget_cls,
                                      task)
    remain_train, forget_train = split_by_class_window(train_ds, order_list,
                                                       s1, e1, s2, e2)
    remain_test, forget_test = split_by_class_window(test_ds, order_list,
                                                     s1, e1, s2, e2)
    if f.few_shot:
        # distinct seeds: the forget and remain draws must be uncorrelated
        # (the reference consumes one ambient RNG stream across both calls)
        forget_sub = few_shot_subset(forget_train, f.few_shot_num, seed)
        remain_sub = few_shot_subset(remain_train, f.few_shot_num,
                                     seed + 7919)
    else:
        forget_sub = ratio_subset(forget_train, f.data_ratio, seed)
        remain_sub = ratio_subset(remain_train, f.data_ratio, seed)
    data = ForgetData(train_forget=forget_sub, train_remain=remain_sub,
                      test_forget=forget_test, test_remain=remain_test,
                      test_open=test_open)
    test_old = None
    if task > 0:
        # already-forgotten classes from previous tasks:
        # order_list[e2 : NUM_CLASS] (cl.py:543-545 old_st/old_en)
        _, test_old = split_by_class_window(test_ds, order_list, 0, 0, e2,
                                            cfg.model.num_class)
    return data, test_old


def run_continual_forgetting(cfg: RunConfig, params, train_ds: Dataset,
                             test_ds: Dataset, order_list: List[int],
                             logger: Optional[MetricLogger] = None,
                             workdir: Optional[str] = None,
                             mesh=None,
                             boundary: str = "merge_reinit"
                             ) -> ContinualResult:
    """GS-LoRA(++) over cfg.forget.num_tasks tasks. ``mesh``: optional
    device mesh for data-parallel task training (see run_forget_training).

    ``boundary``: "merge_reinit" (reference semantics — merged save +
    reload + LoRA reinit at every task start, cl.py:523-536) or "keep"
    (adapters carry over untouched; A/B knob for attributing old-class
    resurfacing to the boundary fold vs task training dynamics)."""
    logger = logger or MetricLogger()
    model, lora, f = cfg.model, cfg.lora, cfg.forget
    cdt = _dtype(cfg)
    # register before the eval step first traces so attn_impl="auto" can
    # pick the per-shard pallas kernel on multi-device runs
    from gslora_tpu.parallel.mesh import set_attention_mesh
    set_attention_mesh(mesh)
    eval_step = make_eval_step(model, lora, compute_dtype=cdt)
    test_bs = cfg.data.batch_size * cfg.data.test_batch_scale
    out = ContinualResult()
    key = jax.random.key(cfg.data.seed)

    if boundary not in ("merge_reinit", "keep"):
        raise ValueError(f"boundary must be merge_reinit|keep, "
                         f"got {boundary!r}")

    for task in range(f.num_tasks):
        if task > 0 and boundary == "merge_reinit":
            # task boundary: fold LoRA into the base, fresh LoRA
            # (reference merged-save + reload + reinit, cl.py:523-536)
            key, sub = jax.random.split(key)
            params = {
                "base": merged_params(params["base"], params["lora"],
                                      lora.scaling),
                "lora": reinit_lora(sub, params["lora"]),
            }
        data, test_old = split_task_data(cfg, train_ds, test_ds, order_list,
                                         task, cfg.data.seed + task)

        def _old_eval(p):
            return eval_accuracy(
                eval_step, p,
                BatchLoader(test_old, test_bs, shuffle=False, prefetch=0,
                            mask_padding=mesh is not None or
                            jax.default_backend() != "cpu",
                            uint8_transfer=cfg.data.uint8_transfer))

        old_acc_before = None
        if test_old is not None and len(test_old) > 0:
            # post-boundary-fold, pre-training: a bounce visible HERE is
            # the fold's doing; one appearing only after training is the
            # task's optimization dynamics
            old_acc_before = _old_eval(params)
            logger.log({f"Task {task} old Accuracy before": old_acc_before})

        protos = None
        if f.prototype:
            # prototypes from the CURRENT backbone over the task subsets
            # (cl.py:634-644, batch 500)
            pad = mesh is not None or jax.default_backend() != "cpu"
            pb = list(BatchLoader(data.train_forget, 500, shuffle=False,
                                  prefetch=0, mask_padding=pad,
                                  uint8_transfer=cfg.data.uint8_transfer)) + \
                list(BatchLoader(data.train_remain, 500, shuffle=False,
                                 prefetch=0, mask_padding=pad,
                                 uint8_transfer=cfg.data.uint8_transfer))
            protos = calculate_prototypes(params, pb, model, lora,
                                          model.num_class, compute_dtype=cdt,
                                          seed=cfg.data.seed)

        beta = f.cl_beta_list[task] if task < len(f.cl_beta_list) else f.beta
        w_pro_f = f.cl_prof_list[task] if task < len(f.cl_prof_list) else \
            f.pro_f_weight

        res = run_forget_training(
            cfg, params, data, logger=logger,
            workdir=f"{workdir}/task_{task}" if workdir else None,
            protos=protos, beta=beta, pro_f_weight=w_pro_f,
            seed_offset=task * 1000, mesh=mesh,
            h_eps=1e-8,  # CL H-mean guard (engine_cl.py:279)
            continual=True)  # engine_cl semantics: remain drives, no
        #                     bare alpha_epoch gate
        params = {"base": res.state.base, "lora": res.state.lora}

        old_acc = None
        if test_old is not None and len(test_old) > 0:
            old_acc = _old_eval(params)
            logger.log({f"Task {task} old Accuracy": old_acc})
        if workdir:
            save_task_checkpoint(
                workdir, task,
                {"base": merged_params(params["base"], params["lora"],
                                       lora.scaling)},
                extra={"task": task, "best_h": res.best_h,
                       "forget_acc": res.forget_acc,
                       "remain_acc": res.remain_acc, "old_acc": old_acc})
        out.tasks.append(TaskResult(task=task, result=res, old_acc=old_acc,
                                    old_acc_before=old_acc_before))

    out.final_params = params
    return out
