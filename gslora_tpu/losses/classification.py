"""Data losses: remain CE + bounded forget CE (engine.py:248,261)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE over the batch (torch nn.CrossEntropyLoss default)."""
    return optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels).mean()


def bounded_forget_loss(logits: jax.Array, labels: jax.Array,
                        bnd: float | jax.Array) -> jax.Array:
    """Bounded gradient-ascent loss ``relu(BND - CE)`` (engine.py:77,261):
    pushes forget-class CE up until it clears BND, then yields zero grad."""
    return jax.nn.relu(bnd - cross_entropy(logits, labels))


def top1_accuracy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Top-1 accuracy in percent (util/utils.py train_accuracy topk=(1,))."""
    pred = jnp.argmax(logits, axis=-1)
    return 100.0 * jnp.mean((pred == labels).astype(jnp.float32))
