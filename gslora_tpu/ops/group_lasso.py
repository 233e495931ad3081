"""Fused Pallas kernels for the per-block LoRA group-Lasso.

Two entry points over the stacked FFN LoRA tree {A1,B1,A2,B2} (layer-major):

* ``group_lasso_pallas`` — the differentiated loss term of the reference
  (engine.py:532-687) as ONE pass over the four tensors per block: each
  grid step (one transformer block) loads its four slices into VMEM,
  reduces the squared sums, emits the block norm. custom_vjp backward
  rescales each slice by g/norm in a second fused pass — the
  name-template + python-loop group machinery of the reference collapses
  into two memory sweeps.
* ``group_prox_pallas`` — the opt-in PROXIMAL variant (SURVEY §7.3): after
  the data-loss optimizer step, apply the group soft-threshold
  ``theta_g *= max(0, 1 - eta*alpha/||theta_g||)`` in one fused pass.
  Unlike the subgradient path this drives groups EXACTLY to zero —
  sparser group selection at the same alpha.

Shapes are tiny (rank-8 LoRA), so these kernels are about fusion (one HBM
sweep instead of a dozen XLA reductions) and about establishing the Pallas
pattern for the framework; they run in interpret mode on CPU for tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _is_cpu() -> bool:
    return jax.devices()[0].platform == "cpu"


def _layer_specs(shapes):
    """BlockSpecs selecting one layer slice of each stacked tensor."""
    return [pl.BlockSpec((1,) + s[1:], lambda l: (l, 0, 0),
                         memory_space=pltpu.VMEM) for s in shapes]


# ---------------------------------------------------------------------------
# forward: per-block norms
# ---------------------------------------------------------------------------


def _sqsum_kernel(a1, b1, a2, b2, out):
    s = (jnp.sum(a1[:].astype(jnp.float32) ** 2) +
         jnp.sum(b1[:].astype(jnp.float32) ** 2) +
         jnp.sum(a2[:].astype(jnp.float32) ** 2) +
         jnp.sum(b2[:].astype(jnp.float32) ** 2))
    out[0, 0] = jnp.sqrt(s)


def _block_norms(A1, B1, A2, B2):
    L = A1.shape[0]
    norms = pl.pallas_call(
        _sqsum_kernel,
        grid=(L,),
        in_specs=_layer_specs([A1.shape, B1.shape, A2.shape, B2.shape]),
        out_specs=pl.BlockSpec((1, 1), lambda l: (l, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((L, 1), jnp.float32),
        interpret=_is_cpu(),
    )(A1, B1, A2, B2)
    return norms[:, 0]


def _scale_kernel(a1, b1, a2, b2, scale, o1, o2, o3, o4):
    s = scale[0, 0]
    o1[:] = a1[:] * s
    o2[:] = b1[:] * s
    o3[:] = a2[:] * s
    o4[:] = b2[:] * s


def _scale_by_layer(A1, B1, A2, B2, scales):
    """theta_l * scales[l] for all four stacked tensors in one pass."""
    L = A1.shape[0]
    shapes = [A1.shape, B1.shape, A2.shape, B2.shape]
    outs = pl.pallas_call(
        _scale_kernel,
        grid=(L,),
        in_specs=_layer_specs(shapes) + [
            pl.BlockSpec((1, 1), lambda l: (l, 0),
                         memory_space=pltpu.SMEM)],
        out_specs=tuple(_layer_specs(shapes)),
        out_shape=tuple(jax.ShapeDtypeStruct(s, A1.dtype) for s in shapes),
        interpret=_is_cpu(),
    )(A1, B1, A2, B2, scales.reshape(-1, 1).astype(A1.dtype))
    return outs


# ---------------------------------------------------------------------------
# loss with custom VJP
# ---------------------------------------------------------------------------


@jax.custom_vjp
def group_lasso_pallas(A1, B1, A2, B2):
    """sum_l ||(A1_l, B1_l, A2_l, B2_l)||_2  — fused block norms."""
    return jnp.sum(_block_norms(A1, B1, A2, B2))


def _gl_fwd(A1, B1, A2, B2):
    norms = _block_norms(A1, B1, A2, B2)
    return jnp.sum(norms), (A1, B1, A2, B2, norms)


def _gl_bwd(res, g):
    A1, B1, A2, B2, norms = res
    # d/dtheta sum_l ||theta_l|| = theta_l / ||theta_l||; guard zero norms
    inv = g / jnp.maximum(norms, 1e-12)
    return _scale_by_layer(A1, B1, A2, B2, inv)


group_lasso_pallas.defvjp(_gl_fwd, _gl_bwd)


# ---------------------------------------------------------------------------
# proximal soft-threshold
# ---------------------------------------------------------------------------


def _prox_kernel(a1, b1, a2, b2, thr, o1, o2, o3, o4):
    s = (jnp.sum(a1[:].astype(jnp.float32) ** 2) +
         jnp.sum(b1[:].astype(jnp.float32) ** 2) +
         jnp.sum(a2[:].astype(jnp.float32) ** 2) +
         jnp.sum(b2[:].astype(jnp.float32) ** 2))
    norm = jnp.sqrt(s)
    scale = jnp.maximum(0.0, 1.0 - thr[0, 0] / jnp.maximum(norm, 1e-12))
    scale = scale.astype(a1.dtype)
    o1[:] = a1[:] * scale
    o2[:] = b1[:] * scale
    o3[:] = a2[:] * scale
    o4[:] = b2[:] * scale


@functools.partial(jax.jit, static_argnames=())
def group_prox_pallas(A1, B1, A2, B2, threshold):
    """Group soft-threshold: per block l,
    theta_l <- theta_l * max(0, 1 - threshold/||theta_l||).
    Fuses norm + rescale of all four tensors into one sweep."""
    L = A1.shape[0]
    shapes = [A1.shape, B1.shape, A2.shape, B2.shape]
    thr = jnp.full((L, 1), threshold, jnp.float32)
    return pl.pallas_call(
        _prox_kernel,
        grid=(L,),
        in_specs=_layer_specs(shapes) + [
            pl.BlockSpec((1, 1), lambda l: (l, 0),
                         memory_space=pltpu.SMEM)],
        out_specs=tuple(_layer_specs(shapes)),
        out_shape=tuple(jax.ShapeDtypeStruct(s, A1.dtype) for s in shapes),
        interpret=_is_cpu(),
    )(A1, B1, A2, B2, thr)


def lora_group_prox(lora_tree, threshold):
    """Apply the fused prox to an FFN LoRA tree; no-op for empty trees."""
    if not lora_tree or "ffn" not in lora_tree:
        return lora_tree
    f = lora_tree["ffn"]
    A1, B1, A2, B2 = group_prox_pallas(f["A1"], f["B1"], f["A2"], f["B2"],
                                       threshold)
    return {**lora_tree, "ffn": {"A1": A1, "B1": B1, "A2": A2, "B2": B2}}
