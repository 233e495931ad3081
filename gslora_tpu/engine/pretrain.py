"""Supervised pretraining engine (reference train/train_own.py).

One jitted step: forward + CE (or SFace's built-in loss) + grad + update
over ALL params (or LoRA-only when lora_rank>0 and lora_only=True, matching
train_own.py:385-386).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from gslora_tpu.config import LoraConfig, ViTConfig
from gslora_tpu.engine.forget import _with_lr
from gslora_tpu.losses.classification import cross_entropy, top1_accuracy
from gslora_tpu.models.heads import sface_head
from gslora_tpu.models.vit import vit_apply, vit_embed


@struct.dataclass
class PretrainState:
    params: Any
    opt_state: Any
    step: jax.Array

    @classmethod
    def create(cls, params, optimizer, lora_only: bool = False):
        """``lora_only``: optimizer state covers ONLY the ``lora`` subtree.
        Matches the reference exactly — torch optimizers skip params whose
        grad stays None (mark_only_lora_as_trainable, train_own.py:386), so
        no base moments or weight decay ever exist there; initializing over
        the full tree would also hold two needless full-model Adam moment
        buffers."""
        sub = params["lora"] if lora_only else params
        return cls(params=params, opt_state=optimizer.init(sub),
                   step=jnp.int32(0))


def make_pretrain_step(model: ViTConfig, lora: LoraConfig, optimizer,
                       compute_dtype=jnp.bfloat16, lora_only: bool = False):
    """pretrain_step(state, x, y, lr, rng) -> (state, metrics)."""

    def loss_fn(params, x, y, rng):
        if model.head_type == "SFace":
            emb = vit_embed(params, x, model, lora, train=True, rng=rng,
                            compute_dtype=compute_dtype)
            logits, loss, *_ = sface_head(params["base"]["head"], emb, y)
        else:
            logits, _ = vit_apply(params, x, y, model, lora, train=True,
                                  rng=rng, compute_dtype=compute_dtype)
            loss = cross_entropy(logits, y)
        return loss, {"loss": loss, "acc": top1_accuracy(logits, y)}

    if lora_only:
        # loralib mark_only_lora_as_trainable (train_own.py:386): grad,
        # moments and weight decay exist ONLY for the lora subtree — the
        # state must be built with PretrainState.create(..., lora_only=True)
        def lora_loss(lora_tree, base, x, y, rng):
            return loss_fn({"base": base, "lora": lora_tree}, x, y, rng)

        @jax.jit
        def lstep(state: PretrainState, x, y, lr, rng):
            grads, metrics = jax.grad(lora_loss, has_aux=True)(
                state.params["lora"], state.params["base"], x, y, rng)
            opt_state = _with_lr(state.opt_state, lr)
            updates, opt_state = optimizer.update(grads, opt_state,
                                                  state.params["lora"])
            new_lora = optax.apply_updates(state.params["lora"], updates)
            return PretrainState(
                params={"base": state.params["base"], "lora": new_lora},
                opt_state=opt_state, step=state.step + 1), metrics

        return lstep

    @jax.jit
    def step(state: PretrainState, x, y, lr, rng):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params, x, y,
                                                         rng)
        opt_state = _with_lr(state.opt_state, lr)
        updates, opt_state = optimizer.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return PretrainState(params=new_params, opt_state=opt_state,
                             step=state.step + 1), metrics

    return step


def pretrain(cfg, params, train_batches_fn, epochs: int,
             compute_dtype=jnp.bfloat16, lr: Optional[float] = None,
             seed: int = 0, lora_only: bool = False):
    """Minimal pretraining loop over a callable returning an epoch iterator."""
    from gslora_tpu.engine.schedule import timm_cosine_lr
    from gslora_tpu.engine.state import make_optimizer

    opt = make_optimizer(cfg.optim)
    state = PretrainState.create(params, opt, lora_only=lora_only)
    step = make_pretrain_step(cfg.model, cfg.lora, opt,
                              compute_dtype=compute_dtype,
                              lora_only=lora_only)
    rng = jax.random.key(seed)
    metrics = {}
    for epoch in range(epochs):
        ep_lr = lr if lr is not None else timm_cosine_lr(cfg.optim, epoch)
        for x, y in train_batches_fn():
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, jnp.asarray(x), jnp.asarray(y),
                                  jnp.float32(ep_lr), sub)
    return state, metrics
