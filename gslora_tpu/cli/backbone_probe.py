"""Head-only finetune probe (reference train/backbone_forget_main.py):
freeze everything except the classification head (reference :595-600
freezes all but ``loss.*``), train on combined forget+remain data, and
track forget/remain accuracy curves, saved as .npy (:757-761).

This probes how much forgetting is achievable by the head alone — the
control experiment for GS-LoRA's claim that backbone adapters are needed.
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gslora_tpu.config import build_parser, config_from_args
from gslora_tpu.cli.common import build_datasets, build_params
from gslora_tpu.data.pipeline import BatchLoader
from gslora_tpu.data.splits import make_order_list, split_by_class_window
from gslora_tpu.engine.evaluate import eval_accuracy, make_eval_step
from gslora_tpu.engine.forget import _with_lr
from gslora_tpu.engine.pretrain import PretrainState
from gslora_tpu.engine.schedule import timm_cosine_lr
from gslora_tpu.engine.state import make_optimizer
from gslora_tpu.losses.classification import cross_entropy, top1_accuracy
from gslora_tpu.models.vit import vit_apply


def make_head_only_step(model, lora, optimizer, compute_dtype):
    def loss_fn(params, x, y, rng):
        logits, _ = vit_apply(params, x, y, model, lora, train=True,
                              rng=rng, compute_dtype=compute_dtype)
        return cross_entropy(logits, y), top1_accuracy(logits, y)

    @jax.jit
    def step(state, x, y, lr, rng):
        grads, acc = jax.grad(loss_fn, has_aux=True)(state.params, x, y, rng)
        opt_state = _with_lr(state.opt_state, lr)
        updates, opt_state = optimizer.update(grads, opt_state, state.params)
        # freeze all but the head (backbone_forget_main.py:595-600)
        base_updates = {k: (v if k == "head" else
                            jax.tree.map(jnp.zeros_like, v))
                        for k, v in updates["base"].items()}
        updates = {"base": base_updates,
                   "lora": jax.tree.map(jnp.zeros_like, updates["lora"])
                   if updates.get("lora") else updates.get("lora", {})}
        params = optax.apply_updates(state.params, updates)
        return PretrainState(params=params, opt_state=opt_state,
                             step=state.step + 1), acc

    return step


def main(argv=None):
    from gslora_tpu.cli.common import setup_jax_runtime
    setup_jax_runtime()
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    from gslora_tpu.engine.loop import _dtype
    cdt = _dtype(cfg)
    f = cfg.forget

    train_ds, test_ds = build_datasets(cfg)
    order = make_order_list(cfg.model.num_class, seed=cfg.data.seed)
    remain_tr, forget_tr = split_by_class_window(
        train_ds, order, 0, f.num_of_first_cls, f.num_of_first_cls,
        f.num_of_first_cls + f.per_forget_cls)
    remain_te, forget_te = split_by_class_window(
        test_ds, order, 0, f.num_of_first_cls, f.num_of_first_cls,
        f.num_of_first_cls + f.per_forget_cls)

    # combined forget + remain training stream (backbone_forget_main.py)
    from gslora_tpu.data.folders import ConcatDataset
    combined = ConcatDataset(forget_tr, remain_tr)
    loader = BatchLoader(combined, cfg.data.batch_size, seed=cfg.data.seed,
                         uint8_transfer=cfg.data.uint8_transfer)

    params = build_params(cfg)
    opt = make_optimizer(cfg.optim)
    state = PretrainState.create(params, opt)
    step = make_head_only_step(cfg.model, cfg.lora, opt, cdt)
    eval_step = make_eval_step(cfg.model, cfg.lora, compute_dtype=cdt)
    test_bs = cfg.data.batch_size * cfg.data.test_batch_scale

    head_before = np.asarray(state.params["base"]["head"]["weight"])
    rng = jax.random.key(cfg.data.seed)
    forget_curve, remain_curve = [], []
    for epoch in range(cfg.num_epoch):
        lr = timm_cosine_lr(cfg.optim, epoch)
        for x, y in loader:
            rng, sub = jax.random.split(rng)
            state, _ = step(state, jnp.asarray(x), jnp.asarray(y),
                            jnp.float32(lr), sub)
        forget_curve.append(eval_accuracy(
            eval_step, state.params,
            BatchLoader(forget_te, test_bs, shuffle=False, prefetch=0,
                        uint8_transfer=cfg.data.uint8_transfer)))
        remain_curve.append(eval_accuracy(
            eval_step, state.params,
            BatchLoader(remain_te, test_bs, shuffle=False, prefetch=0,
                        uint8_transfer=cfg.data.uint8_transfer)))

    # only the head moved
    backbone_same = np.array_equal(
        np.asarray(params["base"]["patch"]["kernel"]),
        np.asarray(state.params["base"]["patch"]["kernel"]))
    head_moved = not np.array_equal(
        head_before, np.asarray(state.params["base"]["head"]["weight"]))
    report = {"forget_acc_curve": forget_curve,
              "remain_acc_curve": remain_curve,
              "backbone_frozen": bool(backbone_same),
              "head_trained": bool(head_moved)}
    print(json.dumps(report, indent=2))
    if cfg.outdir:
        os.makedirs(cfg.outdir, exist_ok=True)
        np.save(os.path.join(cfg.outdir, "forget_acc_curve.npy"),
                np.asarray(forget_curve))
        np.save(os.path.join(cfg.outdir, "remain_acc_curve.npy"),
                np.asarray(remain_curve))
    return report


if __name__ == "__main__":
    main()
