"""Data losses: remain CE + bounded forget CE (engine.py:248,261).

All reductions mask label -1, the pad sentinel BatchLoader(mask_padding=
True) emits so TPU runs keep static batch shapes (no recompiles on ragged
tails) without double-weighting wrap-padded samples. Unpadded batches
(all labels >= 0) reduce to the exact torch-default batch mean.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def _masked_mean(per_sample: jax.Array, labels: jax.Array) -> jax.Array:
    w = (labels >= 0).astype(jnp.float32)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE over valid samples (torch nn.CrossEntropyLoss default on
    unpadded batches)."""
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), jnp.maximum(labels, 0))
    return _masked_mean(ce, labels)


def bounded_forget_loss(logits: jax.Array, labels: jax.Array,
                        bnd: float | jax.Array) -> jax.Array:
    """Bounded gradient-ascent loss ``relu(BND - CE)`` (engine.py:77,261):
    pushes forget-class CE up until it clears BND, then yields zero grad."""
    return jax.nn.relu(bnd - cross_entropy(logits, labels))


def top1_accuracy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Top-1 accuracy in percent (util/utils.py train_accuracy topk=(1,));
    the k=1 case of topk_accuracy (top_k and argmax share first-index
    tie-breaking) — one masked-accuracy implementation to keep in sync."""
    return topk_accuracy(logits, labels, (1,))[0]


def topk_accuracy(logits: jax.Array, labels: jax.Array,
                  topk=(1,)) -> tuple:
    """Precision@k for each k (util/utils.py:354-368 train_accuracy):
    returns a tuple of scalar percentages, pad sentinel (-1) masked."""
    maxk = max(topk)
    _, pred = jax.lax.top_k(logits, maxk)  # (..., maxk), ties broken by idx
    hit = (pred == labels[..., None]).astype(jnp.float32)  # (..., maxk)
    return tuple(
        100.0 * _masked_mean(jnp.sum(hit[..., :k], axis=-1), labels)
        for k in topk)
