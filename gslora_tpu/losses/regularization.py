"""Quadratic importance penalties for EWC / MAS / L2 baselines
(engine_cl.py:435-460 get_reg_loss): sum_tasks sum_n imp_n * (p - p*_n)^2 * lambda."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quadratic_penalty(params, anchors, importances, lam: float | jax.Array):
    """params / each anchors[i] / importances[i] are matching pytrees;
    anchors+importances are lists (one per past task)."""
    total = jnp.float32(0.0)
    for anchor, imp in zip(anchors, importances):
        leaves = jax.tree.leaves(
            jax.tree.map(
                lambda p, a, w: jnp.sum(
                    w.astype(jnp.float32) *
                    (p.astype(jnp.float32) - a.astype(jnp.float32)) ** 2),
                params, anchor, imp))
        total = total + sum(leaves)
    return lam * total
