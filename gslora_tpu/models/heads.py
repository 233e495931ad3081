"""Margin-based classification heads as pure functions.

Re-designs of the reference's stateful head modules (vit_face.py:14-304).
The reference's manual per-GPU weight chunking (vit_face.py:37-51 etc.) is
deleted: on TPU the (C, d) head matmul is partitioned by XLA when the weight
carries a NamedSharding over the optional ``model`` mesh axis (see
gslora_tpu.parallel.mesh) — same capability, zero bookkeeping.

All heads compute in fp32 regardless of backbone compute dtype: the margin
branches (ArcFace th/mm fallback) and one-hot scatter are numerically
sensitive in bf16.
"""
from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _l2norm(x, axis=-1, eps=1e-12):
    # torch F.normalize: x / max(||x||, eps)
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def _cosine(emb: jax.Array, weight: jax.Array) -> jax.Array:
    """cos(theta) between embeddings (B, d) and class weights (C, d)."""
    e = _l2norm(emb.astype(jnp.float32))
    w = _l2norm(weight.astype(jnp.float32))
    return jnp.einsum("bd,cd->bc", e, w)


def softmax_head(params: Dict, emb: jax.Array, labels: jax.Array) -> jax.Array:
    """Plain FC head (vit_face.py:14-69; F.linear(x, W, b))."""
    del labels
    out = jnp.einsum("bd,cd->bc", emb.astype(jnp.float32),
                     params["weight"].astype(jnp.float32))
    return out + params["bias"].astype(jnp.float32)


def cosface_head(params: Dict, emb: jax.Array, labels: jax.Array,
                 s: float = 64.0, m: float = 0.35) -> jax.Array:
    """CosFace additive-cosine margin s*(cos(theta) - m on target)
    (vit_face.py:146-208) — the head of all GS-LoRA experiments."""
    cos = _cosine(emb, params["weight"])
    one_hot = jax.nn.one_hot(labels, cos.shape[-1], dtype=cos.dtype)
    return s * (cos - one_hot * m)


def arcface_head(params: Dict, emb: jax.Array, labels: jax.Array,
                 s: float = 64.0, m: float = 0.50,
                 easy_margin: bool = False) -> jax.Array:
    """ArcFace additive-angular margin s*cos(theta+m) (vit_face.py:72-143)."""
    cos = _cosine(emb, params["weight"])
    sin = jnp.sqrt(jnp.clip(1.0 - cos**2, 0.0, None))
    cos_m, sin_m = math.cos(m), math.sin(m)
    phi = cos * cos_m - sin * sin_m
    if easy_margin:
        phi = jnp.where(cos > 0, phi, cos)
    else:
        th = math.cos(math.pi - m)
        mm = math.sin(math.pi - m) * m
        phi = jnp.where(cos > th, phi, cos - mm)
    one_hot = jax.nn.one_hot(labels, cos.shape[-1], dtype=cos.dtype)
    return s * (one_hot * phi + (1.0 - one_hot) * cos)


def sface_head(params: Dict, emb: jax.Array, labels: jax.Array,
               s: float = 64.0, k: float = 80.0, a: float = 0.80,
               b: float = 1.22) -> Tuple[jax.Array, ...]:
    """SFace sigmoid-weighted intra/inter loss (vit_face.py:226-304).
    Returns (output, loss, intra_mean, inter_mean, Wyi_s_mean, Wj_s_mean)."""
    cos = _cosine(emb, params["weight"])
    output = cos * s
    C = cos.shape[-1]
    one_hot = jax.nn.one_hot(labels, C, dtype=cos.dtype)
    zero_hot = 1.0 - one_hot

    WyiX = jnp.sum(one_hot * output, axis=1)
    theta_yi = jnp.arccos(jnp.clip(jax.lax.stop_gradient(WyiX) / s, -1, 1))
    weight_yi = 1.0 / (1.0 + jnp.exp(-k * (theta_yi - a)))
    intra = -weight_yi * WyiX

    Wj = zero_hot * output
    theta_j = jnp.arccos(jnp.clip(jax.lax.stop_gradient(Wj) / s, -1, 1))
    weight_j = 1.0 / (1.0 + jnp.exp(k * (theta_j - b)))
    inter = jnp.sum(weight_j * Wj, axis=1)

    # mask pad-sentinel rows (label -1, BatchLoader mask_padding): their
    # zero_hot row is all-ones and would pollute the inter mean
    w = (labels >= 0).astype(cos.dtype)
    denom = jnp.maximum(jnp.sum(w), 1.0)

    def _mean(v):
        return jnp.sum(v * w) / denom

    loss = _mean(intra) + _mean(inter)
    return output, loss, _mean(intra), _mean(inter), _mean(WyiX / s), \
        jnp.sum((Wj / s) * w[:, None]) / (denom * Wj.shape[-1])


HEAD_FNS = {
    "Softmax": softmax_head,
    "CosFace": cosface_head,
    "ArcFace": arcface_head,
}


def apply_head(head_type: str, params: Dict, emb: jax.Array,
               labels: jax.Array) -> jax.Array:
    """Dispatch to a head; for SFace returns only the logits."""
    if head_type == "SFace":
        return sface_head(params, emb, labels)[0]
    return HEAD_FNS[head_type](params, emb, labels)
