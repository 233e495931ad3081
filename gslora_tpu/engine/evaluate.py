"""Evaluation: jitted batch accuracy + H-mean selection metric.

The reference deep-copies the model and flips to eval mode, which merges
LoRA statefully (engine.py:436-529). Functionally, eval == forward with
dropout off; the LoRA contribution is identical whether merged or applied
low-rank, so no copy/merge is needed.
"""
from __future__ import annotations

from typing import Iterable, Tuple

import jax
import jax.numpy as jnp

from gslora_tpu.config import LoraConfig, ViTConfig
from gslora_tpu.models.vit import vit_apply


import functools


def make_eval_step(model: ViTConfig, lora: LoraConfig,
                   compute_dtype=jnp.bfloat16):
    """eval_step(params, x, y) -> (n_correct, n_total) for one batch.

    Cached per (model, lora, dtype, pipeline registry) — configs are
    frozen dataclasses, so repeated construction (per CL task, per runner)
    returns the SAME jitted function and reuses its XLA executables
    instead of recompiling (minutes each on tunneled TPUs). The SPMD
    registry key matters because the traced forward embeds the pipeline
    shard_map / sequence-sharding constraints (both read at trace
    time)."""
    from gslora_tpu.parallel.mesh import spmd_cache_key
    return _make_eval_step(model, lora, compute_dtype, spmd_cache_key())


@functools.lru_cache(maxsize=32)
def _make_eval_step(model: ViTConfig, lora: LoraConfig,
                    compute_dtype, spmd_key):
    del spmd_key  # cache-key only
    if model.head_type == "None":
        # vit_apply returns the bare embedding (no logits) for headless
        # configs; the tuple unpack below would mis-split it along axis 0
        raise ValueError(
            "make_eval_step needs a classification head; head_type='None' "
            "has no logits to score (use vit_apply(labels=None) for "
            "embedding evals)")

    @jax.jit
    def eval_step(params, x, y):
        logits, _ = vit_apply(params, x, y, model, lora, train=False,
                              compute_dtype=compute_dtype)
        pred = jnp.argmax(logits, axis=-1)
        return jnp.sum((pred == y).astype(jnp.int32)), y.shape[0]

    return eval_step


def eval_accuracy(eval_step, params, batches: Iterable[Tuple]) -> float:
    """Top-1 accuracy in percent over an iterable of (x, y) host batches
    (reference engine.eval_data semantics).

    Counts stay on device until the end — a per-batch int() readback would
    serialize dispatch against the device (and cost a full RTT per batch on
    tunneled TPU platforms)."""
    import numpy as np
    corrects = []
    total = 0
    for x, y in batches:
        c, n = eval_step(params, x, y)
        corrects.append(c)
        # host-known valid count, no device sync; label -1 = pad sentinel
        # (never equals an argmax, so the correct count needs no mask)
        total += int((np.asarray(y) >= 0).sum())
    if not corrects:
        return 0.0
    correct = int(sum(corrects[1:], corrects[0]))
    return 100.0 * correct / max(total, 1)


def h_mean(forget_acc_before: float, forget_acc: float,
           remain_acc: float, eps: float = 0.0) -> float:
    """Checkpoint-selection metric (engine.py:461-462):
    H = 2 * forget_drop * remain_acc / (forget_drop + remain_acc).
    engine_cl.py:279 adds a +1e-8 guard — pass eps for that variant."""
    drop = forget_acc_before - forget_acc
    denom = drop + remain_acc + eps
    if denom == 0:
        return 0.0
    return 2.0 * drop * remain_acc / denom
