"""Distillation losses shared by the teacher-student baselines.

* kd_kl_loss    — temperature KD: KL(softmax(t/T) || softmax(s/T)) * T^2,
                  the DistillKL used by SCRUB (baselines/SCRUBtrain.py) and
                  the class-slice KD of LIRF (baselines/LIRFtrain.py).
* lwf_kd_loss   — LwF's custom soft-target loss with temperature *power*
                  (baselines/Lwftrain.py:12-27 L_old_kd_loss).
* attention_transfer_loss — LIRF's AT loss over token maps
                  (baselines/LIRFtrain.py:17-40).

Every loss takes an optional ``labels`` array: rows whose label is the
-1 pad sentinel (BatchLoader(mask_padding=True), used for static batch
shapes on TPU/mesh runs) are excluded from the reduction, so padded tail
batches produce the same loss values as the unpadded reference batches.
With ``labels=None`` (or no padded rows) the reductions are the exact
reference batch reductions.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _row_mask(labels: Optional[jax.Array], n: int) -> jax.Array:
    if labels is None:
        return jnp.ones((n,), jnp.float32)
    return (labels >= 0).astype(jnp.float32)


def _masked_row_mean(per_row: jax.Array,
                     labels: Optional[jax.Array]) -> jax.Array:
    w = _row_mask(labels, per_row.shape[0])
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


def kd_kl_loss(student_logits, teacher_logits, T: float,
               labels: Optional[jax.Array] = None) -> jax.Array:
    """KL(teacher || student) with temperature, scaled by T^2, batchmean
    over valid rows."""
    s = jax.nn.log_softmax(student_logits.astype(jnp.float32) / T, axis=1)
    t = jax.nn.softmax(teacher_logits.astype(jnp.float32) / T, axis=1)
    kl = jnp.sum(t * (jnp.log(jnp.clip(t, 1e-12)) - s), axis=1)
    return _masked_row_mean(kl, labels) * (T ** 2)


def lwf_kd_loss(student_logits, teacher_logits, T: float,
                labels: Optional[jax.Array] = None) -> jax.Array:
    """The INTENDED LwF soft-target loss (Lwftrain.py:12-27 recipe):
    softmaxes raised to 1/T and renormalized, then -mean(sum(t' * log s'))
    over valid rows. NOTE the reference's own implementation double-logs
    (log of log_softmax) and NaN-scrubs every entry, so its KD term is
    identically ZERO — that bit-faithful behavior lives behind
    make_distill_step(faithful_zero_kd=True), not here."""
    s = jax.nn.softmax(student_logits.astype(jnp.float32), axis=1)
    t = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=1)
    s = s ** (1.0 / T)
    t = t ** (1.0 / T)
    s = s / jnp.sum(s, axis=1, keepdims=True)
    t = t / jnp.sum(t, axis=1, keepdims=True)
    per_row = -jnp.sum(t * jnp.log(jnp.clip(s, 1e-12)), axis=1)
    return _masked_row_mean(per_row, labels)


def attention_transfer_loss(student_tokens, teacher_tokens,
                            labels: Optional[jax.Array] = None) -> jax.Array:
    """LIRF attention transfer (LIRFtrain.py:42-55 ``at``/``at_loss``):
    per-channel energy map x.pow(2).mean(axis=1) -> L2-normalize per sample
    -> zero entries < 0.005 -> MSE between student and teacher maps
    (mean over valid samples)."""
    def at_map(x):
        x = x.astype(jnp.float32)
        a = jnp.mean(x ** 2, axis=1).reshape(x.shape[0], -1)
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True),
                            1e-12)
        return jnp.where(a < 0.005, 0.0, a)
    per_row = jnp.mean((at_map(student_tokens) - at_map(teacher_tokens)) ** 2,
                       axis=1)
    return _masked_row_mean(per_row, labels)
