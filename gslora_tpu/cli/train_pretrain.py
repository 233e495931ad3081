"""Supervised pretraining driver (reference train/train_own.py; recipe
scripts/run_sub.sh: ViT-P8S8, CASIA-100, CosFace, bs 480, lr 3e-4).

Usage:
  python -m gslora_tpu.cli.train_pretrain --net VIT --vit_depth 6 \
      --head CosFace -b 480 --lr 3e-4 -e 1200 -d casia100
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp

from gslora_tpu.checkpoints.io import BestHCheckpointer
from gslora_tpu.config import build_parser, config_from_args
from gslora_tpu.cli.common import build_datasets, build_params
from gslora_tpu.data.pipeline import BatchLoader
from gslora_tpu.engine.evaluate import eval_accuracy, make_eval_step
from gslora_tpu.engine.pretrain import PretrainState, make_pretrain_step
from gslora_tpu.engine.schedule import timm_cosine_lr
from gslora_tpu.engine.state import make_optimizer
from gslora_tpu.metrics.logging import MetricLogger


def main(argv=None):
    from gslora_tpu.cli.common import setup_jax_runtime
    args = build_parser().parse_args(argv)
    # --fast: hardware dropout RNG (threefry mask generation costs ~17 ms
    # of a ~48 ms step on v5e — DEVNOTES)
    setup_jax_runtime(rng_impl="rbg" if getattr(args, "fast", False)
                      else None)
    cfg = config_from_args(args)
    from gslora_tpu.engine.loop import _dtype
    cdt = _dtype(cfg)

    train_ds, test_ds = build_datasets(cfg)
    params = build_params(cfg)
    logger = MetricLogger(use_wandb=cfg.log_wandb, outdir=cfg.outdir,
                          config=json.loads(cfg.to_json()))

    # data-parallel mesh (--dp): the reference pretrain is the
    # nn.DataParallel 8-GPU path (train_own.py:403-406, run_sub.sh)
    mesh = None
    if getattr(args, "dp", False) and len(jax.devices()) > 1:
        from gslora_tpu.parallel.mesh import (check_batch_divisible,
                                              make_mesh)
        mesh = make_mesh(cfg.mesh)
        check_batch_divisible(mesh, cfg.data.batch_size)
    from gslora_tpu.parallel.mesh import placement
    put_params, put_batch = placement(mesh, tp=cfg.mesh.tp,
                                      fsdp=cfg.mesh.fsdp, pp=cfg.mesh.pp,
                                      pp_micro=cfg.mesh.pp_micro,
                                      sp=cfg.mesh.sp)
    params = put_params(params)

    opt = make_optimizer(cfg.optim)
    # lora-only pretraining when a rank is set AND resuming a base ckpt
    lora_only = cfg.lora.rank > 0 and bool(cfg.resume)
    state = PretrainState.create(params, opt, lora_only=lora_only)
    step = make_pretrain_step(cfg.model, cfg.lora, opt, compute_dtype=cdt,
                              lora_only=lora_only,
                              grad_accum=cfg.optim.grad_accum)
    eval_step = make_eval_step(cfg.model, cfg.lora, compute_dtype=cdt)

    pad = mesh is not None or jax.default_backend() != "cpu"
    loader = BatchLoader(train_ds, cfg.data.batch_size, seed=cfg.data.seed,
                         mask_padding=pad,
                         uint8_transfer=cfg.data.uint8_transfer)
    test_batches = lambda: BatchLoader(  # noqa: E731
        test_ds, cfg.data.batch_size * cfg.data.test_batch_scale,
        shuffle=False, prefetch=0, mask_padding=pad,
        uint8_transfer=cfg.data.uint8_transfer)

    ckpt = BestHCheckpointer(cfg.outdir, name=cfg.net) if cfg.outdir else None
    if ckpt:
        ckpt.save_config(cfg.to_json())

    # in-training LFW-style pair verification (reference train_own.py
    # evaluates perform_val + buffer_val per VER_FREQ window,
    # util/utils.py:167-232 / :298-313) when --ver_targets names .bin sets
    ver_sets = []
    targets = [t for t in getattr(args, "ver_targets", "").split(",") if t]
    if targets:
        from gslora_tpu.data.recordio import get_val_data
        from gslora_tpu.models.vit import vit_apply
        ver_sets = get_val_data(cfg.data.data_root, targets,
                                cfg.model.image_size)
        missing = sorted(set(targets) - {name for name, *_ in ver_sets})
        if missing:
            import warnings
            warnings.warn(f"verification targets without a .bin under "
                          f"{cfg.data.data_root}: {missing}")

    # jitted once; params passed as an argument so periodic verification
    # does not recompile (a fresh closure per eval would retrace each time)
    @jax.jit
    def _embed(params_now, x):
        # labels=None -> embedding-only forward: keeps the head matmul +
        # margin math out of the compiled verification graph entirely
        return vit_apply(params_now, x, None, cfg.model, cfg.lora,
                         train=False, compute_dtype=cdt)

    def run_verification(params_now, batch):
        if not ver_sets:
            return
        from gslora_tpu.evaluation.verification import perform_val
        from gslora_tpu.metrics.logging import buffer_val, gen_roc_plot

        def embed(x):
            return _embed(params_now, x)

        for name, data_set, issame in ver_sets:
            vacc, vstd, xnorm, thr, (fpr, tpr) = perform_val(
                lambda b: embed(jnp.asarray(b)), data_set, issame,
                embedding_size=cfg.model.dim, return_roc=True)
            buffer_val(logger, name, vacc, vstd, xnorm, thr,
                       gen_roc_plot(fpr, tpr), batch=batch)
    rng = jax.random.key(cfg.data.seed)
    best_acc = float("-inf")
    batch = 0
    for epoch in range(cfg.num_epoch):
        lr = timm_cosine_lr(cfg.optim, epoch)
        for x, y in loader:
            rng, sub = jax.random.split(rng)
            xb, yb = put_batch(x, y)
            state, metrics = step(state, xb, yb, jnp.float32(lr), sub)
            if (batch + 1) % cfg.disp_freq == 0:
                logger.log({k: float(v) for k, v in metrics.items()},
                           step=batch)
            # VER_FREQ=20 inline eval + best-acc ckpt (train_own.py:483-544)
            if (batch + 1) % 20 == 0:
                acc = eval_accuracy(eval_step, state.params, test_batches())
                logger.log({"Test Accuracy": acc}, step=batch)
                run_verification(state.params, batch)
                if acc > best_acc and ckpt:
                    best_acc = acc
                    ckpt.maybe_save(acc, state.params, epoch, batch)
            batch += 1

    acc = eval_accuracy(eval_step, state.params, test_batches())
    report = {"final_test_acc": acc, "best_test_acc": max(best_acc, acc)}
    print(json.dumps(report, indent=2))
    if cfg.outdir:
        os.makedirs(cfg.outdir, exist_ok=True)
        with open(os.path.join(cfg.outdir, "report.json"), "w") as fh:
            json.dump(report, fh, indent=2)
    logger.finish()
    return report


if __name__ == "__main__":
    main()
