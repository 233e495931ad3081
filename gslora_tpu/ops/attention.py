"""Fused multi-head attention kernel (Pallas, TPU).

At the face-transformer's shapes (n=197 tokens, d_head=64, B*H up to ~768)
the XLA path materializes the (BH, n, n) attention matrix in HBM three
times per layer (dots → fp32 softmax → probs) plus residuals for backward.
This kernel computes one (b,h) slice entirely in VMEM — a 197x197 fp32
scratch is ~155 KB — with a recompute backward (no attention residuals in
HBM at all):

  fwd:  per program: dots = q kᵀ · scale; p = softmax_fp32(dots); o = p v
  bwd:  recompute p, then dv = pᵀ g, dp = g vᵀ,
        ddots = p * (dp - rowsum(dp ⊙ p)), dq = ddots k · scale,
        dk = ddotsᵀ q · scale

Numerics match the model's XLA path: bf16 matmuls with fp32 accumulation,
fp32 softmax. Runs in interpret mode on CPU for tests.

Measured on v5e (full forget train step, dual-48 batch): with
BLOCK_SLICES=8 (b,h) slices per program this kernel BEATS the XLA einsum
path — 42.2 vs 44.5 ms/step (2277 vs 2153 img/s). The per-slice version
(BLOCK_SLICES=1) loses by ~3 ms: at n=197/d=64 each GEMM underfills the
MXU and per-program pipeline bubbles dominate; batching 8 slices into one
program amortizes them. 16/32 slices exceed VMEM at compile. Selected by
default on TPU via ViTConfig.attn_impl="auto". The residual attention-core
cost (~12 ms of the 42 ms step) is MXU-geometry-bound: per-head GEMMs
contract over d_head=64 (half the 128-deep MXU) with 197-token tiles —
no layout exists that fills the array without changing the math.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _is_cpu() -> bool:
    return jax.devices()[0].platform == "cpu"


import os

# (b,h) slices per program — amortizes per-GEMM pipeline bubbles on the
# MXU (per-slice GEMMs at n=197/d=64 run ~11 TF/s under XLA; blocking 8
# slices into one program measured +5% full-step throughput on v5e).
# Clamped to >=1: 0/negative/garbage would divide the grid by zero.
try:
    BLOCK_SLICES = max(1, int(os.environ.get("GSLORA_ATTN_BLOCK", "8")))
except ValueError:
    import warnings
    warnings.warn("GSLORA_ATTN_BLOCK is not an integer; using 8")
    BLOCK_SLICES = 8


def _qkv_specs(g, n, d):
    spec = pl.BlockSpec((g, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return [spec, spec, spec]


_ABLATE = os.environ.get("GSLORA_ATTN_ABLATE", "")  # perf-lab only
_UNROLL = os.environ.get("GSLORA_ATTN_UNROLL", "") == "1"  # perf-lab only


def _softmax(dots):
    if _ABLATE == "nosoftmax":  # measure the VPU share (WRONG math)
        return dots * (1.0 / 197.0)
    return jax.nn.softmax(dots, axis=-1)


def _fwd_kernel(scale_ref, q_ref, k_ref, v_ref, o_ref):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    if _UNROLL:
        # statically unrolled per-slice chain: independent instruction
        # streams let Mosaic overlap slice i's softmax (VPU) with slice
        # i+1's dots (MXU)
        for i in range(q.shape[0]):
            dots = jax.lax.dot_general(
                q[i], k[i], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale_ref[0]
            p = _softmax(dots)
            o = jax.lax.dot_general(p.astype(q.dtype), v[i],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[i] = o.astype(o_ref.dtype)
        return
    dots = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale_ref[0]
    p = _softmax(dots)
    o = jax.lax.dot_general(p.astype(q.dtype), v,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _bwd_kernel(scale_ref, q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref,
                dv_ref):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    g = g_ref[...]
    scale = scale_ref[0]
    dots = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    p = _softmax(dots)  # (g, n, n) fp32, recomputed
    pb = p.astype(q.dtype)
    # dv = pᵀ g
    dv = jax.lax.dot_general(pb, g, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    # dp = g vᵀ
    dp = jax.lax.dot_general(g, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    ddots = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dd = ddots.astype(q.dtype)
    dq = jax.lax.dot_general(dd, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(dd, q, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32) * scale
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _compiler_params():
    # grid steps are independent (b,h) chunks — let Mosaic pipeline them
    try:
        return pltpu.CompilerParams(dimension_semantics=("parallel",))
    except (AttributeError, TypeError):
        try:
            return pltpu.TPUCompilerParams(dimension_semantics=("parallel",))
        except (AttributeError, TypeError):
            return None


def _block(bh: int) -> int:
    g = BLOCK_SLICES
    while g > 1 and bh % g:
        g //= 2
    return g


def _fwd_call(q, k, v, scale):
    bh, n, d = q.shape
    g = _block(bh)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(bh // g,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
        _qkv_specs(g, n, d),
        out_specs=pl.BlockSpec((g, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        compiler_params=_compiler_params(),
        interpret=_is_cpu(),
    )(jnp.full((1,), scale, jnp.float32), q, k, v)


@jax.custom_vjp
def fused_attention(q, k, v, scale: float):
    """softmax(q kᵀ · scale) v over (BH, n, d) slices, fused in blocks of
    BLOCK_SLICES (b,h) slices per program."""
    return _fwd_call(q, k, v, scale)


def _fa_fwd(q, k, v, scale):
    return _fwd_call(q, k, v, scale), (q, k, v, scale)


def _fa_bwd(res, g):
    q, k, v, scale = res
    bh, n, d = q.shape
    gg = _block(bh)
    spec = pl.BlockSpec((gg, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        _bwd_kernel,
        grid=(bh // gg,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
        _qkv_specs(gg, n, d) + [spec],
        out_specs=(spec, spec, spec),
        out_shape=tuple(jax.ShapeDtypeStruct((bh, n, d), q.dtype)
                        for _ in range(3)),
        compiler_params=_compiler_params(),
        interpret=_is_cpu(),
    )(jnp.full((1,), scale, jnp.float32), q, k, v, g.astype(q.dtype))
    return dq, dk, dv, None


fused_attention.defvjp(_fa_fwd, _fa_bwd)


def fused_attention_bhnd(q, k, v, scale: float, mesh=None):
    """(b, h, n, d) front-end for :func:`fused_attention`.

    Single device (mesh=None): flatten (b, h) and call the kernel. With a
    mesh whose ``data`` axis is >1: run the kernel PER SHARD under
    jax.shard_map — the batch dim stays sharded exactly as the surrounding
    einsums leave it (no replication, no collectives: attention is
    embarrassingly parallel over the batch), which is what GSPMD cannot
    infer for a Mosaic custom call on its own."""
    b, h, n, d = q.shape

    def local(ql, kl, vl):
        bl = ql.shape[0]
        o = fused_attention(ql.reshape(bl * h, n, d),
                            kl.reshape(bl * h, n, d),
                            vl.reshape(bl * h, n, d), scale)
        return o.reshape(bl, h, n, d)

    from gslora_tpu.parallel.mesh import batch_axes, data_parallel_size
    dsize = data_parallel_size(mesh) if mesh is not None else 1
    if dsize > 1 and b % dsize == 0:
        # non-divisible batches (e.g. a caller outside the padded train
        # loop) skip the wrapper and keep single-device kernel semantics
        from jax.sharding import PartitionSpec as P
        spec = P(batch_axes(mesh), None, None, None)
        # check_vma=False: pallas_call's out_shape carries no varying-mesh
        # annotation; the kernel is per-shard pure so the check adds nothing
        return jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                             out_specs=spec, check_vma=False)(q, k, v)
    return local(q, k, v)
