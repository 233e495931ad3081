"""Class prototypes = mean embedding per class under the pretrained model
(util/utils.py:502-549 calculate_prototypes).

TPU-native form: a dense (num_class, dim) fp32 table — unseen classes stay
zero and are never gathered. Few-shot replication (aug_repeat>0) uses the
reference's exact policy: torchvision-RandAugment(num_ops=2,
magnitude=aug_num) on every one of the x20 dataset copies (no clean copy —
util/utils.py:508-523 replaces the dataset transform before replicating),
re-implemented host-side in gslora_tpu.data.randaugment.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gslora_tpu.config import (IMAGENET_MEAN, IMAGENET_STD, LoraConfig,
                               ViTConfig)
from gslora_tpu.models.vit import vit_apply

import functools


def _embed_builder(model: ViTConfig, lora: LoraConfig, compute_dtype):
    """Cached jitted embed (params passed as an argument so per-task
    parameter updates don't retrace): per-call closures would recompile
    on every CL task (minutes each on tunneled TPUs). Keyed on the SPMD
    registry too — the traced forward embeds the pipeline shard_map /
    sequence-sharding constraints."""
    from gslora_tpu.parallel.mesh import spmd_cache_key
    return _embed_builder_cached(model, lora, compute_dtype,
                                 spmd_cache_key())


@functools.lru_cache(maxsize=16)
def _embed_builder_cached(model: ViTConfig, lora: LoraConfig, compute_dtype,
                          spmd_key):
    del spmd_key  # cache-key only

    @jax.jit
    def embed(params, x):
        return vit_apply(params, x, None, model, lora, train=False,
                         compute_dtype=compute_dtype)

    return embed


def calculate_prototypes(params, batches, model: ViTConfig, lora: LoraConfig,
                         num_classes: int, compute_dtype=jnp.bfloat16,
                         aug_repeat: int = 0, seed: int = 0,
                         aug_magnitude: int = 9) -> jax.Array:
    """Stream (x, y) batches through the (pretrained) model, return the
    dense class-mean embedding table (num_classes, dim) fp32.

    aug_repeat=0: clean images once (the non-few-shot reference path).
    aug_repeat=k: k RandAugment(magnitude=aug_magnitude) views per image,
    no clean view (reference x20 replication)."""
    ebuilder = _embed_builder(model, lora, compute_dtype)

    def embed(x):
        return ebuilder(params, x)

    aug = None
    if aug_repeat > 0:
        from gslora_tpu.data.randaugment import RandAugment
        aug = RandAugment(num_ops=2, magnitude=aug_magnitude, seed=seed)

    mean = np.asarray(IMAGENET_MEAN, np.float32).reshape(1, 3, 1, 1)
    std = np.asarray(IMAGENET_STD, np.float32).reshape(1, 3, 1, 1)
    renorm = model.input_norm == "imagenet"
    sums = np.zeros((num_classes, model.dim), np.float64)
    counts = np.zeros((num_classes,), np.int64)
    for x, y in batches:
        x = np.asarray(x)
        if aug is None:
            # uint8-transfer batches pass straight through (vit_embed
            # dequantizes + input_norm-normalizes on device)
            embs = [np.asarray(embed(jnp.asarray(x)))]
        else:
            # RandAugment operates on [0,1] pixels (the reference augments
            # PIL images BEFORE ToTensor+Normalize, util/utils.py:508-523),
            # and vit_embed treats fp32 input as fully host-normalized —
            # so: get to pixel space, augment, re-apply the model's norm.
            if x.dtype == np.uint8:
                x = x.astype(np.float32) / np.float32(255.0)
            elif renorm:
                # host-normalized ImageNet fp32 -> back to pixel space
                x = x * std + mean
            embs = []
            for _ in range(aug_repeat):
                v = aug.apply_batch(x)
                if renorm:
                    v = (v - mean) / std
                embs.append(np.asarray(embed(jnp.asarray(v))))
        y = np.asarray(y)
        keep = y >= 0  # drop mask_padding sentinel slots
        yk = y[keep]
        for e in embs:
            np.add.at(sums, yk, e[keep].astype(np.float64))
            np.add.at(counts, yk, 1)
    safe = np.maximum(counts, 1)[:, None]
    return jnp.asarray((sums / safe).astype(np.float32))
