"""Metric logging: console + optional wandb (the reference's load-bearing
observability, SURVEY §5.5 — per-step loss dict every DISP_FREQ, per-eval
accuracy, task-suffixed keys, final lora norm_list)."""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, use_wandb: bool = False, project: str = "gslora_tpu",
                 run_name: Optional[str] = None, outdir: str | None = None,
                 config: dict | None = None):
        self._wandb = None
        self._jsonl = None
        if use_wandb:
            try:
                # swanlab mirrors wandb when present (reference
                # train_own_forget.py:9-11 swanlab.sync_wandb)
                try:
                    import swanlab
                    swanlab.sync_wandb(wandb_run=False)
                except ImportError:
                    pass
                import wandb
                self._wandb = wandb
                wandb.init(project=project, name=run_name, config=config)
            except Exception as e:  # wandb missing or offline: degrade
                print(f"[metrics] wandb unavailable ({e}); console only")
        if outdir:
            os.makedirs(outdir, exist_ok=True)
            self._jsonl = open(os.path.join(outdir, "metrics.jsonl"), "a")
        self._t0 = time.time()

    def log(self, metrics: Dict, step: int | None = None) -> None:
        payload = {k: (float(v) if hasattr(v, "__float__") else v)
                   for k, v in metrics.items()}
        if self._wandb is not None:
            self._wandb.log(payload, step=step)
        if self._jsonl is not None:
            rec = {"t": round(time.time() - self._t0, 3), "step": step,
                   **payload}
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()

    def set_run_name(self, name: str) -> None:
        if self._wandb is not None and self._wandb.run is not None:
            self._wandb.run.name = name

    def finish(self) -> None:
        if self._wandb is not None and self._wandb.run is not None:
            self._wandb.finish()
        if self._jsonl is not None:
            self._jsonl.close()


def make_run_name(cfg) -> str:
    """Run name assembled from hyperparameters at exit, mirroring the
    reference naming recipe (train_own_forget.py:844-877)."""
    f = cfg.forget
    parts = [
        f"start{f.num_of_first_cls}", f"forget{f.per_forget_cls}",
        f"lr{cfg.optim.lr}", f"beta{f.beta}", f"alpha{f.alpha}",
        f"epoch{cfg.num_epoch}", f"BND{f.bnd}", f"rank{cfg.lora.rank}",
    ]
    if f.prototype:
        parts += [f"fpweight{f.pro_f_weight}", f"rpweight{f.pro_r_weight}"]
    if f.few_shot:
        parts.append(f"few{f.few_shot_num}")
    if f.average_weight:
        parts.append(f"ema{f.ema_decay}@{f.ema_epoch}")
    return "-".join(parts)
