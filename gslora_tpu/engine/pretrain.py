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


def _accumulated(grad_fn, n: int, accum_dtype=jnp.float32):
    """Wrap ``grad_fn(x, y, rng) -> (grads, metrics)`` to run over ``n``
    equal microbatch slices via lax.scan, weighted to the exact full-batch
    masked mean.

    This is gradient accumulation INSIDE the one jitted step (a TPU-native
    addition — the reference has no accumulation, its nn.DataParallel path
    fits the full batch on 8 GPUs, train_own.py:403-406): only one
    microbatch's activations are ever live, so the effective batch scales
    past a single chip's activation memory at the cost of n sequential
    passes.

    Each slice's (grads, metrics) — masked MEANS over that slice's valid
    samples (label >= 0; -1 is the mask_padding sentinel) — is scaled by
    the slice's valid count, which by linearity recovers the grad/metric
    of the masked SUM; dividing the accumulated sums by the global valid
    count then equals the full-batch masked mean exactly, for full AND
    padded-tail batches (a slice holding one valid sample contributes
    1/total_valid per sample, never 1/(n*slice_valid); all-padding slices
    contribute zero). Floating-point leaves accumulate in ``accum_dtype``
    (default float32) even when params/grads are bfloat16 (an n-way bf16
    sum compounds rounding the full-batch backward's fp32 reduction
    accumulators never see) and are cast back after normalization;
    ``accum_dtype=jnp.bfloat16`` halves the carry's HBM traffic at the
    cost of that compounding (measured in scripts/perf_pretrain_lab.py).
    A batch whose size ``n`` does not divide (an unpadded ragged tail)
    falls back to one full-batch call — trace-time static-shape branch —
    instead of raising mid-run.
    """
    def accum(x, y, rng):
        b = x.shape[0]
        if b % n:  # ragged unpadded tail: run it unaccumulated
            return grad_fn(x, y, rng)
        xs = (x.reshape(n, b // n, *x.shape[1:]),
              y.reshape(n, b // n, *y.shape[1:]),
              jax.random.split(rng, n))
        shapes = jax.eval_shape(grad_fn, *(jax.tree.map(lambda t: t[0], xs)))
        zeros = jax.tree.map(
            lambda s: jnp.zeros(
                s.shape,
                accum_dtype if jnp.issubdtype(s.dtype, jnp.floating)
                else s.dtype),
            shapes)

        def body(carry, micro):
            total, count = carry
            valid = jnp.sum((micro[1] >= 0).astype(jnp.float32))
            out = grad_fn(*micro)
            total = jax.tree.map(
                lambda c, o: c + o.astype(c.dtype) * valid.astype(c.dtype),
                total, out)
            return (total, count + valid), None

        (total, count), _ = jax.lax.scan(body, (zeros, jnp.float32(0.0)), xs)
        denom = jnp.maximum(count, 1.0)
        return jax.tree.map(lambda t, s: (t / denom).astype(s.dtype),
                            total, shapes)

    return accum


def make_pretrain_step(model: ViTConfig, lora: LoraConfig, optimizer,
                       compute_dtype=jnp.bfloat16, lora_only: bool = False,
                       grad_accum: int = 1, accum_dtype=jnp.float32):
    """pretrain_step(state, x, y, lr, rng) -> (state, metrics).

    ``grad_accum > 1`` splits each batch into that many microbatches inside
    the jitted step (see ``_accumulated``) — one optimizer update per batch,
    activation memory divided by the accumulation factor. ``accum_dtype``
    is the micro-grad carry dtype (see ``_accumulated``)."""

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
            def gfn(xm, ym, rm):
                return jax.grad(lora_loss, has_aux=True)(
                    state.params["lora"], state.params["base"], xm, ym, rm)
            grads, metrics = (
                _accumulated(gfn, grad_accum, accum_dtype)(x, y, rng)
                if grad_accum > 1 else gfn(x, y, rng))
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
        def gfn(xm, ym, rm):
            return jax.grad(loss_fn, has_aux=True)(state.params, xm, ym, rm)
        grads, metrics = (
            _accumulated(gfn, grad_accum, accum_dtype)(x, y, rng)
            if grad_accum > 1 else gfn(x, y, rng))
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
                              lora_only=lora_only,
                              grad_accum=cfg.optim.grad_accum)
    rng = jax.random.key(seed)
    metrics = {}
    for epoch in range(epochs):
        ep_lr = lr if lr is not None else timm_cosine_lr(cfg.optim, epoch)
        for x, y in train_batches_fn():
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, jnp.asarray(x), jnp.asarray(y),
                                  jnp.float32(ep_lr), sub)
    return state, metrics
