"""Dynamic int8 GEMM for serving (inference-path quantization).

The v5e MXU runs int8 x int8 -> int32 at ~2x the bf16 rate (measured
302.9 TOPS vs the 161 TF/s bf16 roof on this chip — scripts/
roofline_probe --int8). This module quantizes the transformer's
projection GEMMs on the fly:

* activations: per-tensor dynamic absmax -> int8 (one fp32 reduction per
  GEMM; post-LayerNorm activations are well-bounded so a single scale
  holds the whole tensor's dynamic range);
* weights: per-output-channel absmax -> int8 (the standard W8A8 recipe —
  per-channel keeps columns with small norms from losing their entire
  mantissa to one large column);
* accumulation in int32 on the MXU, rescale to fp32, cast to the compute
  dtype.

This is a *beyond-reference* serving capability (the reference serves
fp32/TF32 torch eval); it is eval-only — the rounding has zero gradient,
so vit_apply refuses to trace it under train=True rather than silently
producing dead gradients. Weight quantization happens in-graph per call:
its cost is O(K*N), negligible next to the (B*N_tok, K) x (K, N) GEMM it
feeds, and XLA folds it when params are compile-time constants.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_per_tensor(x: jax.Array):
    """fp -> (int8, fp32 scale) with symmetric per-tensor absmax."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf)) / 127.0
    s = jnp.maximum(s, 1e-12)  # all-zero tensors quantize to zeros
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_per_channel(w: jax.Array):
    """(K, N) fp -> (int8, (1, N) fp32 scales), symmetric absmax per
    output channel."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return q, s


def int8_linear(x: jax.Array, w: jax.Array, out_dtype=None) -> jax.Array:
    """``x @ w`` with W8A8 dynamic quantization.

    x: (..., K) activations; w: (K, N) weights. Returns (..., N) in
    ``out_dtype`` (default: x.dtype). int32 accumulation cannot overflow:
    |q| <= 127 so each product is <= 16129 and K <= 2^17 keeps the sum
    under 2^31.
    """
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    k = x.shape[-1]
    qx, sx = quantize_per_tensor(x.reshape(-1, k))
    qw, sw = quantize_per_channel(w)
    acc = jax.lax.dot_general(qx, qw, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * sw)
    return y.reshape(*lead, w.shape[-1]).astype(out_dtype)
