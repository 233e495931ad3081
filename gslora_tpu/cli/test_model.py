"""Checkpoint evaluation harness (reference test/test_own.py via
scripts/test_sub.sh): overall + per-class top-1 on the test split; writes
class_accuracy.txt next to the report."""
from __future__ import annotations

import json
import os
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from gslora_tpu.config import build_parser, config_from_args
from gslora_tpu.cli.common import build_datasets, build_params
from gslora_tpu.data.pipeline import BatchLoader
from gslora_tpu.models.vit import vit_apply


def main(argv=None):
    from gslora_tpu.cli.common import setup_jax_runtime
    setup_jax_runtime()
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    from gslora_tpu.engine.loop import _dtype
    cdt = _dtype(cfg)
    _, test_ds = build_datasets(cfg)
    params = build_params(cfg)
    if cfg.data.data_mode == "imagenet100":
        # a resumed 1000-way torchvision head must be sliced to the run's
        # classes exactly like the training drivers (modify_head flow,
        # train_own_forget_cl.py:180-296) — evaluating the full head
        # against local labels would silently report ~0%
        from gslora_tpu.cli.common import prepare_imagenet_head
        params, _ = prepare_imagenet_head(cfg, params, test_ds)

    @jax.jit
    def predict(x, y):
        logits, _ = vit_apply(params, x, y, cfg.model, cfg.lora, train=False,
                              compute_dtype=cdt)
        return jnp.argmax(logits, axis=-1)

    correct = total = 0
    per_class = defaultdict(lambda: [0, 0])
    # static batch shapes on accelerators: a ragged tail would compile a
    # second executable (minutes on tunneled TPUs); pad rows carry the -1
    # label sentinel and are skipped below
    pad = jax.default_backend() != "cpu"
    for x, y in BatchLoader(test_ds, cfg.data.batch_size, shuffle=False,
                            uint8_transfer=cfg.data.uint8_transfer,
                            mask_padding=pad, prefetch=0):
        pred = np.asarray(predict(jnp.asarray(x), jnp.asarray(y)))
        for p, t in zip(pred, y):
            if t < 0:  # pad sentinel
                continue
            per_class[int(t)][1] += 1
            total += 1
            if p == t:
                per_class[int(t)][0] += 1
                correct += 1

    acc = 100.0 * correct / max(total, 1)
    class_acc = {c: 100.0 * k / max(n, 1)
                 for c, (k, n) in sorted(per_class.items())}
    report = {"test_acc": acc, "num_samples": total}

    # optional LFW-style pair verification with ROC artifacts
    # (train_own.py perform_val + util/utils.py:298-313 buffer_val tap)
    targets = [t for t in getattr(args, "ver_targets", "").split(",") if t]
    if targets:
        from gslora_tpu.data.recordio import get_val_data
        from gslora_tpu.evaluation.verification import perform_val
        from gslora_tpu.metrics.logging import (MetricLogger, buffer_val,
                                                gen_roc_plot)
        logger = MetricLogger(use_wandb=cfg.log_wandb, outdir=cfg.outdir)

        @jax.jit
        def embed(x):
            _, emb = vit_apply(params, x, jnp.zeros((x.shape[0],), jnp.int32),
                               cfg.model, cfg.lora, train=False,
                               compute_dtype=cdt)
            return emb

        found = get_val_data(cfg.data.data_root, targets,
                             cfg.model.image_size)
        missing = sorted(set(targets) - {name for name, *_ in found})
        if missing:
            # a typoed target or wrong data_root must not read as a
            # clean run with the metric silently absent
            import warnings
            warnings.warn(f"verification targets without a .bin under "
                          f"{cfg.data.data_root}: {missing}")
        for name, data_set, issame in found:
            vacc, vstd, xnorm, thr, (fpr, tpr) = perform_val(
                lambda b: embed(jnp.asarray(b)), data_set, issame,
                embedding_size=cfg.model.dim, return_roc=True)
            buffer_val(logger, name, vacc, vstd, xnorm, thr,
                       gen_roc_plot(fpr, tpr), batch=0)
            report[f"{name}_verification_acc"] = vacc
        logger.finish()
    print(json.dumps(report, indent=2))
    if cfg.outdir:
        os.makedirs(cfg.outdir, exist_ok=True)
        with open(os.path.join(cfg.outdir, "class_accuracy.txt"), "w") as fh:
            for c, a in class_acc.items():
                fh.write(f"{c}\t{a:.2f}\n")
        with open(os.path.join(cfg.outdir, "report.json"), "w") as fh:
            json.dump({**report, "class_acc": class_acc}, fh, indent=2)
    return report


if __name__ == "__main__":
    main()
