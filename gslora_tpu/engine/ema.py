"""EMA of the *merged* model (train_own_forget.py:783-826).

The reference deep-copies the net and calls .eval() so loralib folds B@A
into the frozen weights, then EMAs the folded copy:
  epoch == ema_epoch:  ema <- merged(model)
  epoch  > ema_epoch:  ema <- ema * decay + merged(model) * (1 - decay)
Here ``merged_params`` is the pure fold (lora.core.merge_lora) and the EMA
is a jitted tree lerp.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gslora_tpu.lora.core import merge_lora


def merged_params(base, lora_tree, scaling: float):
    """Pure equivalent of loralib's stateful eval-merge: base params with
    LoRA folded into the qkv/fc kernels; returns a params dict usable with
    vit_apply({"base": merged, "lora": {}})."""
    merged = dict(base)
    merged["blocks"] = merge_lora(base["blocks"], lora_tree, scaling)
    return merged


def ema_init(base, lora_tree, scaling: float):
    """EMA accumulator in fp32 regardless of param dtype: with bf16 params
    the (1-decay)*delta contribution is usually below the accumulator's ulp
    and a bf16 EMA silently freezes at its init value (torch EMAs fp32
    tensors). vit_apply casts to the compute dtype at use."""
    return jax.tree.map(lambda a: a.astype(jnp.float32),
                        merged_params(base, lora_tree, scaling))


@jax.jit
def _lerp(ema, target, decay):
    return jax.tree.map(
        lambda e, t: e * decay + t.astype(jnp.float32) * (1.0 - decay),
        ema, target)


def ema_update(ema, base, lora_tree, scaling: float, decay: float):
    return _lerp(ema, merged_params(base, lora_tree, scaling),
                 jnp.float32(decay))
