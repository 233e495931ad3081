"""GPipe-style pipeline parallelism over the stacked transformer layers.

Beyond the reference (whose only parallelism is nn.DataParallel,
train_own.py:403-406): the stacked (L, ...) block parameters are sharded
over the ``model`` mesh axis — S stages of L/S layers each — and the batch
is split into M microbatches that flow stage-to-stage via lax.ppermute
inside one jax.shard_map. The schedule is plain GPipe: T = M + S - 1 ticks;
at tick t, stage s runs its local layers on microbatch t - s (bubble
ticks compute on clipped repeats whose outputs never reach the last stage
— wasted FLOPs, zero gradient). Everything is differentiable (ppermute
transposes to the reverse shift), so the same jitted train step works.

Numerics: no ViT layer op reduces over the batch dim (LayerNorm is
per-token, softmax per-head-row), so microbatched outputs equal the
full-batch forward up to fp order — the equivalence test holds at tight
tolerance.

Composition limits (guarded in parallel.mesh.placement):
* pp reuses the ``model`` axis, so it excludes tp (same axis, different
  dims) and fsdp (whose data-axis weight shards would be visible inside
  the fully-manual shard_map body).
* attention runs the XLA einsum path inside the pipeline body (a nested
  pallas shard_map would need its own partitioning rules).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gslora_tpu.parallel.mesh import MODEL_AXIS, batch_axes


def pipeline_transformer(x: jax.Array, blocks, lora_tree,
                         layer_rngs, layer_fn: Callable, mesh: Mesh,
                         n_micro: int, unroll: int = 1) -> jax.Array:
    """Run ``layer_fn(x, blk, lora_blk, rngs_row)`` over all L stacked
    layers, pipelined over the ``model`` axis of ``mesh``.

    ``x``: (B, n, d) tokens, batch sharded over the data-parallel axes
    (``data``, or dcn x data on a multi-slice mesh; replicated over
    ``model``). ``blocks`` / ``lora_tree`` / ``layer_rngs``: stacked trees
    with leading dim L, sharded over ``model`` (placement(pp=True) lays
    them out; shard_map slices them per stage). ``n_micro``: microbatches
    per local batch (local batch must divide evenly).
    """
    S = mesh.shape[MODEL_AXIS]
    M = n_micro
    has_lora = bool(lora_tree)
    has_rng = layer_rngs is not None

    def spmd_fn(x_loc, blocks_loc, lora_loc, rngs_loc):
        s = jax.lax.axis_index(MODEL_AXIS)
        b_loc = x_loc.shape[0]
        assert b_loc % M == 0, (
            f"pipeline: local batch {b_loc} not divisible by "
            f"pp_micro={M}")
        mb = b_loc // M
        x_mb = x_loc.reshape(M, mb, *x_loc.shape[1:])

        def stage_body(x_in, m_idx):
            def body(carry, xs):
                blk, lblk, rr = xs
                if rr is not None:
                    # fold the microbatch index in so each microbatch
                    # draws its own dropout masks (the full-batch mask
                    # partitioning differs from single-device either way)
                    rr = [jax.random.fold_in(rr[i], m_idx)
                          for i in range(rr.shape[0])]
                return layer_fn(carry, blk, lblk, rr), None

            xs = (blocks_loc, lora_loc if has_lora else None,
                  rngs_loc if has_rng else None)
            n_local = jax.tree_util.tree_leaves(blocks_loc)[0].shape[0]
            y, _ = jax.lax.scan(body, x_in, xs, length=n_local,
                                unroll=max(1, min(unroll, n_local)))
            return y

        buf = jnp.zeros((mb, *x_loc.shape[1:]), x_loc.dtype)
        out0 = jnp.zeros_like(x_mb)

        def tick(carry, t):
            buf, out = carry
            inj = jax.lax.dynamic_index_in_dim(
                x_mb, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            x_in = jnp.where(s == 0, inj, buf)
            m_idx = jnp.clip(t - s, 0, M - 1)
            y = stage_body(x_in, m_idx)
            # the last stage commits microbatch t - (S-1) to the output
            m_out = jnp.clip(t - (S - 1), 0, M - 1)
            prev = jax.lax.dynamic_index_in_dim(out, m_out, 0,
                                                keepdims=False)
            write = jnp.logical_and(s == S - 1, t >= S - 1)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(write, y, prev), m_out, 0)
            # shift activations one stage down the ring
            if S > 1:
                buf = jax.lax.ppermute(
                    y, MODEL_AXIS, [(i, i + 1) for i in range(S - 1)])
            return (buf, out), None

        (_, out), _ = jax.lax.scan(tick, (buf, out0),
                                   jnp.arange(M + S - 1))
        # only the last stage holds real outputs; psum-mask replicates
        # them over the stage axis (one nonzero term per element)
        out = jax.lax.psum(
            jnp.where(s == S - 1, out, jnp.zeros_like(out)), MODEL_AXIS)
        return out.reshape(b_loc, *x_loc.shape[1:])

    stage_spec = P(MODEL_AXIS)
    # batch stays sharded exactly as the loop placed it (dcn x data on a
    # multi-slice mesh) — the schedule only communicates over `model`
    x_spec = P(batch_axes(mesh))
    in_specs = (x_spec,
                jax.tree.map(lambda _: stage_spec, blocks),
                jax.tree.map(lambda _: stage_spec, lora_tree)
                if has_lora else None,
                stage_spec if has_rng else None)
    return jax.shard_map(spmd_fn, mesh=mesh, in_specs=in_specs,
                         out_specs=x_spec, check_vma=False)(
        x, blocks, lora_tree if has_lora else None,
        layer_rngs if has_rng else None)
