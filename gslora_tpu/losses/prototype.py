"""GS-LoRA++ prototype regularizer (engine.py:690-722, engine_cl.py:571-603).

Prototypes are class-mean embeddings of the *pretrained* model
(util/utils.py:502-549). The reference stores them in a python dict keyed by
label; TPU-native form is a dense table ``protos[C, d]`` gathered by label
inside the jitted step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def prototype_loss(emb: jax.Array, labels: jax.Array, protos: jax.Array,
                   distance: str = "kl") -> jax.Array:
    """Distance between each sample's embedding and its class prototype.

    kl (default): ``KL(log_softmax(emb) || log_softmax(proto))`` batchmean
    with log-target semantics — i.e. sum(p_proto * (log p_proto - log p_emb))
    / batch, matching torch F.kl_div(features_log, prototype_log,
    reduction="batchmean", log_target=True).
    l2: mean squared error.
    """
    emb = emb.astype(jnp.float32)
    target = protos[jnp.maximum(labels, 0)].astype(jnp.float32)  # (B, d)
    # label -1 marks pad slots (BatchLoader mask_padding) — drop them from
    # the batch mean; all-valid batches reduce to the exact torch mean
    w = (labels >= 0).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    if distance == "l2":
        per = jnp.mean((emb - target) ** 2, axis=1)
        return jnp.sum(per * w) / denom
    if distance == "kl":
        logp = jax.nn.log_softmax(emb, axis=1)
        logq = jax.nn.log_softmax(target, axis=1)
        kl = jnp.sum(jnp.exp(logq) * (logq - logp), axis=1)
        return jnp.sum(kl * w) / denom
    raise ValueError(f"unknown distance {distance}")


def hinged_prototype_losses(emb_forget, labels_forget, emb_remain,
                            labels_remain, protos, *, w_forget, w_remain,
                            bnd_pro, distance: str = "kl"):
    """Combined GS-LoRA++ prototype term (engine.py:96-107):
    forget side hinged AWAY from its prototype: relu(BND_pro - L_pro_f);
    remain side pulled toward: + w_r * L_pro_r.

    Returns (total, hinged_forget_term, remain_term)."""
    lf = prototype_loss(emb_forget, labels_forget, protos, distance)
    lr = prototype_loss(emb_remain, labels_remain, protos, distance)
    hinged = jax.nn.relu(bnd_pro - lf)
    return w_forget * hinged + w_remain * lr, hinged, lr
