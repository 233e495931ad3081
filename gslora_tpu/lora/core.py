"""Stacked LoRA parameter trees: init / merge / reinit / group-Lasso.

TPU-first re-design of the reference's loralib usage (vit_face.py:326-355)
and its name-template group machinery (engine.py:532-687, util/cal_norm.py):

* LoRA factors for all L transformer blocks are stacked on a leading layer
  axis — ``A1[L, r, d]``, ``B1[L, m, r]`` … — so "mark only LoRA as
  trainable" (loralib mark_only_lora_as_trainable) is a pytree split, and
  the group-Lasso over per-block groups is a single vectorized reduction
  over the layer axis instead of string-keyed parameter lookups.
* Merge (loralib's stateful ``.eval()`` merge, relied on at
  train_own_forget.py:796-797) is the pure function
  ``merged = base + scaling * A^T B^T`` — jit-safe, no mode flags.

loralib semantics reproduced exactly: forward adds ``x @ A^T @ B^T * (alpha/r)``;
init A ~ kaiming-uniform(a=sqrt(5)), B = 0; between continual tasks A is
re-drawn with a=sqrt(50) and B zeroed (util/utils.py:428-441).
"""
from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp

from gslora_tpu.config import LoraConfig, ViTConfig
from gslora_tpu.utils.inits import kaiming_uniform

LoraTree = Dict[str, Dict[str, jax.Array]]


# ---------------------------------------------------------------------------
# init / reinit
# ---------------------------------------------------------------------------


def _init_stacked_A(key, depth: int, rank: int, fan_in: int, a: float, dtype):
    # one independent kaiming draw per layer, stacked on axis 0
    keys = jax.random.split(key, depth)
    return jnp.stack([
        kaiming_uniform(k, (rank, fan_in), a=a, dtype=dtype) for k in keys
    ])


def init_lora(key, model: ViTConfig, lora: LoraConfig,
              dtype=jnp.float32) -> LoraTree:
    """Fresh LoRA tree for the configured placement.

    FFN placement (default; vit_face.py FeedForward):
      fc1 (d->m): A1 (L, r, d), B1 (L, m, r)
      fc2 (m->d): A2 (L, r, m), B2 (L, d, r)
    Attention placement (vit_face.py:349-355 MergedLinear on fused qkv,
    enable_lora=[T,T,T] == one independent (A,B) per q/k/v chunk):
      A (L, 3, r, d), B (L, 3, inner, r)
    """
    if lora.rank <= 0:
        return {}
    L, d, m, r = model.depth, model.dim, model.mlp_dim, lora.rank
    inner = model.inner_dim
    a = math.sqrt(5)
    k1, k2, k3 = jax.random.split(key, 3)
    tree: LoraTree = {}
    if lora.pos == "FFN":
        tree["ffn"] = {
            "A1": _init_stacked_A(k1, L, r, d, a, dtype),
            "B1": jnp.zeros((L, m, r), dtype),
            "A2": _init_stacked_A(k2, L, r, m, a, dtype),
            "B2": jnp.zeros((L, d, r), dtype),
        }
    elif lora.pos == "Attention":
        keys = jax.random.split(k3, 3)
        A = jnp.stack([_init_stacked_A(k, L, r, d, a, dtype) for k in keys],
                      axis=1)  # (L, 3, r, d)
        tree["attn"] = {
            "A": A,
            "B": jnp.zeros((L, 3, inner, r), dtype),
        }
    else:
        raise ValueError(f"unknown lora pos {lora.pos}")
    return tree


def reinit_lora(key, lora_tree: LoraTree, a: float = math.sqrt(50)) -> LoraTree:
    """Between continual tasks: A <- kaiming-uniform(a=sqrt(50)) (~=0), B <- 0
    (util/utils.py:428-441)."""
    out: LoraTree = {}
    for pos, sub in lora_tree.items():
        out[pos] = {}
        for name, arr in sub.items():
            if name.startswith("A"):
                key, sub_key = jax.random.split(key)
                if arr.ndim == 3:  # (L, r, fan_in)
                    L = arr.shape[0]
                    ks = jax.random.split(sub_key, L)
                    out[pos][name] = jnp.stack([
                        kaiming_uniform(k, arr.shape[1:], a=a, dtype=arr.dtype)
                        for k in ks
                    ])
                else:  # (L, 3, r, fan_in)
                    L, C = arr.shape[0], arr.shape[1]
                    ks = jax.random.split(sub_key, L * C)
                    flat = [kaiming_uniform(k, arr.shape[2:], a=a, dtype=arr.dtype)
                            for k in ks]
                    out[pos][name] = jnp.stack(flat).reshape(arr.shape)
            else:
                out[pos][name] = jnp.zeros_like(arr)
    return out


# ---------------------------------------------------------------------------
# apply / merge
# ---------------------------------------------------------------------------


def lora_delta(x: jax.Array, A: jax.Array, B: jax.Array,
               scaling: float) -> jax.Array:
    """Low-rank update ``x @ A^T @ B^T * scaling`` for one layer.

    x: (..., fan_in); A: (r, fan_in); B: (fan_out, r).
    Kept as two skinny matmuls — at r=8 never materialize B@A (d x m).
    """
    h = jnp.einsum("...d,rd->...r", x, A.astype(x.dtype))
    return jnp.einsum("...r,or->...o", h, B.astype(x.dtype)) * scaling


def merge_lora(base_blocks: dict, lora_tree: LoraTree,
               scaling: float) -> dict:
    """Pure merge: returns block params with ``kernel += scaling * (B A)^T``.

    Kernels are stored (fan_in, fan_out) [jax convention], LoRA factors
    follow loralib layout A (r, fan_in), B (fan_out, r); delta per layer is
    ``A^T @ B^T`` — vectorized over the stacked layer axis with einsum.
    """
    blocks = dict(base_blocks)
    if not lora_tree:
        return blocks
    if "ffn" in lora_tree:
        f = lora_tree["ffn"]
        d1 = jnp.einsum("lrd,lmr->ldm", f["A1"], f["B1"]) * scaling
        d2 = jnp.einsum("lrm,ldr->lmd", f["A2"], f["B2"]) * scaling
        fc1 = dict(blocks["fc1"])
        fc2 = dict(blocks["fc2"])
        fc1["kernel"] = blocks["fc1"]["kernel"] + d1.astype(fc1["kernel"].dtype)
        fc2["kernel"] = blocks["fc2"]["kernel"] + d2.astype(fc2["kernel"].dtype)
        blocks["fc1"], blocks["fc2"] = fc1, fc2
    if "attn" in lora_tree:
        a = lora_tree["attn"]
        # (L, 3, r, d) x (L, 3, inner, r) -> (L, d, 3, inner) -> (L, d, 3*inner)
        delta = jnp.einsum("lcrd,lcor->ldco", a["A"], a["B"]) * scaling
        L, d = delta.shape[0], delta.shape[1]
        delta = delta.reshape(L, d, -1)
        qkv = dict(blocks["qkv"])
        qkv["kernel"] = blocks["qkv"]["kernel"] + delta.astype(
            qkv["kernel"].dtype)
        blocks["qkv"] = qkv
    return blocks


# ---------------------------------------------------------------------------
# group-Lasso + diagnostics
# ---------------------------------------------------------------------------


def _per_layer_sq(arr: jax.Array) -> jax.Array:
    """Sum of squares per leading-layer index -> (L,) in fp32."""
    a = arr.astype(jnp.float32)
    return jnp.sum(a.reshape(a.shape[0], -1) ** 2, axis=-1)


def group_lasso(lora_tree: LoraTree, group_type: str = "block",
                group_pos: str = "FFN") -> jax.Array:
    """Sparse group-Lasso  sum_g sqrt(sum_{p in g} ||p||^2).

    Semantics of engine.py:532-687 with groups re-expressed as reductions
    over the stacked layer axis:
      block  — one group per transformer block {A1,B1,A2,B2}      (L groups)
      lora   — per block {A1,B1} and {A2,B2}                       (2L groups)
      matrix — every tensor its own group                          (4L groups)
    Attention placement groups {A,B} per block (engine.py:652-656).
    """
    if not lora_tree:
        return jnp.float32(0.0)
    # eps inside the sqrt keeps the subgradient finite for all-zero groups
    # (B=0 at init): d/dp sqrt(sum p^2 + eps) = p/sqrt(.) = 0 at p = 0.
    # The reference's torch sqrt produces inf/NaN grads there and only
    # avoids it via the ALPHA_EPOCH gate; value shift is sqrt(eps) = 1e-6.
    eps = 1e-12

    def root(s):
        return jnp.sqrt(s + eps)

    if group_pos == "FFN":
        f = lora_tree["ffn"]
        sq = {k: _per_layer_sq(v) for k, v in f.items()}
        if group_type == "block":
            return jnp.sum(root(sq["A1"] + sq["B1"] + sq["A2"] + sq["B2"]))
        if group_type == "lora":
            return jnp.sum(root(sq["A1"] + sq["B1"])) + jnp.sum(
                root(sq["A2"] + sq["B2"]))
        if group_type == "matrix":
            return sum(jnp.sum(root(s)) for s in sq.values())
        raise ValueError("group_type should be block or lora or matrix")
    if group_pos == "Attention":
        a = lora_tree["attn"]
        return jnp.sum(root(_per_layer_sq(a["A"]) + _per_layer_sq(a["B"])))
    raise ValueError(f"unknown group_pos {group_pos}")


def lora_group_norms(lora_tree: LoraTree, group_pos: str = "FFN",
                     ord: int = 2) -> List[float]:
    """Per-block group norms (diagnostic of selected/zeroed groups,
    reference util/cal_norm.py:get_norm_of_lora)."""
    if not lora_tree:
        return []
    if group_pos == "FFN":
        f = lora_tree["ffn"]
        if ord == 2:
            sq = _per_layer_sq(f["A1"]) + _per_layer_sq(f["B1"]) + \
                _per_layer_sq(f["A2"]) + _per_layer_sq(f["B2"])
            return [float(x) for x in jnp.sqrt(sq)]
        norms = None
        for arr in f.values():
            a = jnp.abs(arr.astype(jnp.float32)).reshape(arr.shape[0], -1)
            s = jnp.sum(a, axis=-1)
            norms = s if norms is None else norms + s
        return [float(x) for x in norms]
    a = lora_tree["attn"]
    sq = _per_layer_sq(a["A"]) + _per_layer_sq(a["B"])
    return [float(x) for x in jnp.sqrt(sq)]
