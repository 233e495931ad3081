"""Checkpointing: msgpack pytree snapshots + best-H-mean retention policy.

Reference policy (engine.py:465-497, SURVEY §5.4): save only on a new best
H-mean, keep at most 2 checkpoints next to config.txt, task-level
``Backbone_task_{i}`` snapshots between CL tasks. Format here is flax
msgpack (single file, host-independent) rather than torch pickle; orbax is
used for sharded/async saves when available.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, List

import jax
import numpy as np
from flax import serialization


def save_pytree(path: str, tree: Any) -> None:
    host_tree = jax.tree.map(np.asarray, tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host_tree))


def load_pytree(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


def get_time() -> str:
    return time.strftime("%Y-%m-%d-%H-%M-%S", time.localtime())


class BestHCheckpointer:
    """Best-H-mean gated saver, pruning to ``keep`` checkpoints.

    ``async_save=True``: the device->host copy stays inline (the values at
    save time are what land on disk) but serialization + the disk write
    move to a daemon thread, so the eval/train loop never blocks on IO."""

    def __init__(self, workdir: str, name: str = "VIT", keep: int = 2,
                 async_save: bool = False):
        self.workdir = workdir
        self.name = name
        self.keep = keep
        self.best_h = float("-inf")
        self._saved: List[str] = []
        self._pending = None
        self._error: BaseException | None = None
        self.async_save = async_save
        os.makedirs(workdir, exist_ok=True)

    def save_config(self, cfg_json: str) -> None:
        with open(os.path.join(self.workdir, "config.txt"), "w") as f:
            f.write(cfg_json)

    def maybe_save(self, h: float, tree: Any, epoch: int, batch: int) -> bool:
        """Save iff h beats the best so far (engine.py:465); prune oldest
        beyond ``keep``. Returns True if saved."""
        if h <= self.best_h:
            return False
        self.best_h = h
        fname = (f"Backbone_{self.name}_Epoch_{epoch + 1}_Batch_{batch + 1}"
                 f"_Time_{get_time()}_checkpoint.msgpack")
        path = os.path.join(self.workdir, fname)
        if self.async_save:
            import threading
            host_tree = jax.tree.map(np.asarray, tree)  # copy-out inline
            self.wait()  # raises here if the previous background save died

            def _write():
                try:
                    save_pytree(path, host_tree)
                except BaseException as e:  # surfaced by the next wait()
                    self._error = e

            t = threading.Thread(target=_write, daemon=True)
            t.start()
            self._pending = t
        else:
            save_pytree(path, tree)
        self._saved.append(path)
        while len(self._saved) > self.keep:
            old = self._saved.pop(0)
            if os.path.exists(old):
                os.remove(old)
        return True

    def wait(self) -> None:
        """Drain the in-flight async save; re-raise a background write
        failure instead of silently reporting a checkpoint that was never
        written."""
        if self._pending is not None:
            self._pending.join()
            self._pending = None
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError(
                f"async checkpoint write failed: {err!r}") from err

    def latest(self) -> str | None:
        return self._saved[-1] if self._saved else None


def save_train_state(path: str, state: Any) -> None:
    """Full-fidelity snapshot (params + optimizer state + step) for
    mid-task recovery — finer-grained than the reference's per-task
    granularity (SURVEY §5.3: crashes there lose in-task progress)."""
    save_pytree(path, state)


def restore_train_state(path: str, template: Any) -> Any:
    return load_pytree(path, template)


def save_task_checkpoint(workdir: str, task: int, tree: Any,
                         extra: dict | None = None) -> str:
    """Per-task snapshot (train_own_forget_cl.py:1696-1714)."""
    tdir = os.path.join(workdir, "task-level")
    os.makedirs(tdir, exist_ok=True)
    path = os.path.join(tdir, f"Backbone_task_{task}.msgpack")
    save_pytree(path, tree)
    if extra:
        with open(os.path.join(tdir, f"task_{task}_meta.json"), "w") as f:
            json.dump(extra, f, indent=2)
    return path
