"""Class prototypes = mean embedding per class under the pretrained model
(util/utils.py:502-549 calculate_prototypes).

TPU-native form: a dense (num_class, dim) fp32 table — unseen classes stay
zero and are never gathered. Optional few-shot augmentation replication
(aug_num>0: RandAugment x20 in the reference) is approximated on-device
with random flips+crops repeated ``aug_repeat`` times; exact RandAugment
parity is host-side policy, not accuracy-critical (prototypes are means).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gslora_tpu.config import LoraConfig, ViTConfig
from gslora_tpu.models.vit import vit_apply


def _augment(x: jax.Array, rng) -> jax.Array:
    """Light on-device augmentation: random horizontal flip + random shift."""
    r1, r2, r3 = jax.random.split(rng, 3)
    flip = jax.random.bernoulli(r1, 0.5, (x.shape[0], 1, 1, 1))
    x = jnp.where(flip, x[..., ::-1], x)
    shift = jax.random.randint(r2, (2,), -2, 3)
    x = jnp.roll(x, (shift[0], shift[1]), axis=(2, 3))
    noise = 0.01 * jax.random.normal(r3, x.shape, x.dtype)
    return x + noise


def calculate_prototypes(params, batches, model: ViTConfig, lora: LoraConfig,
                         num_classes: int, compute_dtype=jnp.bfloat16,
                         aug_repeat: int = 0, seed: int = 0) -> jax.Array:
    """Stream (x, y) batches through the (pretrained) model, return the
    dense class-mean embedding table (num_classes, dim) fp32."""

    @jax.jit
    def embed(x):
        return vit_apply(params, x, None, model, lora, train=False,
                         compute_dtype=compute_dtype)

    @jax.jit
    def embed_aug(x, rng):
        return vit_apply(params, _augment(x, rng), None, model, lora,
                         train=False, compute_dtype=compute_dtype)

    sums = np.zeros((num_classes, model.dim), np.float64)
    counts = np.zeros((num_classes,), np.int64)
    key = jax.random.key(seed)
    for x, y in batches:
        x = jnp.asarray(x)
        embs = [np.asarray(embed(x))]
        for _ in range(aug_repeat):
            key, sub = jax.random.split(key)
            embs.append(np.asarray(embed_aug(x, sub)))
        y = np.asarray(y)
        keep = y >= 0  # drop mask_padding sentinel slots
        yk = y[keep]
        for e in embs:
            np.add.at(sums, yk, e[keep].astype(np.float64))
            np.add.at(counts, yk, 1)
    safe = np.maximum(counts, 1)[:, None]
    return jnp.asarray((sums / safe).astype(np.float32))
