"""The GS-LoRA(++) forgetting train step — ONE compiled XLA program.

Re-design of the reference hot loop (engine.py:13-433 / engine_cl.py:12-244):
the reference runs two forwards, python-side loss bookkeeping, backward and
optimizer step as separate CUDA launches; here forward(forget) +
forward(remain) + L_forget/L_remain/L_structure/L_prototype + grad +
AdamW update fuse into one jit'd step. Loss weights (beta/alpha/lr/bnd...)
enter as traced scalars so per-epoch schedules (alpha warmup
train_own_forget.py:723-732, cl_beta_list) never trigger recompiles.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from gslora_tpu.config import ForgetConfig, LoraConfig, RunConfig, ViTConfig
from gslora_tpu.engine.state import ForgetState
from gslora_tpu.lora.core import group_lasso
from gslora_tpu.losses.classification import (bounded_forget_loss,
                                              cross_entropy, top1_accuracy)
from gslora_tpu.losses.prototype import hinged_prototype_losses
from gslora_tpu.models.vit import vit_apply


def _with_lr(opt_state, lr):
    """Functionally set the LR inside an inject_hyperparams state."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = lr
    return opt_state._replace(hyperparams=hp)


def make_forget_step(model: ViTConfig, lora: LoraConfig, fcfg: ForgetConfig,
                     optimizer, compute_dtype=jnp.bfloat16,
                     use_prototype: Optional[bool] = None,
                     structure_mode: str = "loss",
                     lora_apply: str = "factored",
                     fused_batch: bool = False,
                     trainable: str = "lora"):
    """Build the jitted dual-batch train step.

    step(state, xf, yf, xr, yr, protos, scalars, rng) -> (state, metrics)
    scalars: dict of traced floats {beta, alpha, lr, bnd, bnd_pro, w_pro_f,
    w_pro_r}.

    structure_mode:
      "loss" — reference-faithful: alpha * group-Lasso as a differentiated
               term under AdamW (engine.py:269-274);
      "prox" — fused Pallas proximal soft-threshold applied AFTER the data
               step with threshold lr*alpha (drives groups exactly to zero;
               SURVEY §7.3 opt-in mode).

    trainable:
      "lora" — only the LoRA subtree updates (mark_only_lora_as_trainable,
               train_own_forget.py:650-651);
      "base" — ALL parameters update: the reference's lora_rank=0 one-stage
               path ("train all parameters",
               train_own_forget_open.py:699-706) used by the open-set
               recipes. The state must be created with
               ForgetState.create(..., trainable="base").
    """
    use_proto = fcfg.prototype if use_prototype is None else use_prototype
    use_prox = structure_mode == "prox"
    if use_prox and lora.rank > 0 and lora.pos != "FFN":
        # lora_group_prox only handles the FFN placement; silently training
        # with NO structure pressure would corrupt experiments
        raise ValueError(
            "structure_mode='prox' supports lora_pos='FFN' only; use the "
            "reference-faithful structure_mode='loss' for Attention LoRA")
    train_base = trainable == "base"

    def loss_fn(train_tree, other, xf, yf, xr, yr, protos, sc, rng):
        if train_base:
            base, lora_tree = train_tree, other
        else:
            base, lora_tree = other, train_tree
        params = {"base": base, "lora": lora_tree}
        if fused_batch:
            # one forward over [forget; remain] — fewer, bigger matmuls
            # (identical math; dropout masks stay iid per sample)
            x = jnp.concatenate([xf, xr], axis=0)
            y = jnp.concatenate([yf, yr], axis=0)
            logits, emb = vit_apply(params, x, y, model, lora, train=True,
                                    rng=rng, compute_dtype=compute_dtype,
                                    lora_apply=lora_apply)
            nf = xf.shape[0]
            logits_f, logits_r = logits[:nf], logits[nf:]
            emb_f, emb_r = emb[:nf], emb[nf:]
        else:
            rf, rr = jax.random.split(rng)
            logits_f, emb_f = vit_apply(params, xf, yf, model, lora,
                                        train=True, rng=rf,
                                        compute_dtype=compute_dtype,
                                        lora_apply=lora_apply)
            logits_r, emb_r = vit_apply(params, xr, yr, model, lora,
                                        train=True, rng=rr,
                                        compute_dtype=compute_dtype,
                                        lora_apply=lora_apply)

        ce_r = cross_entropy(logits_r, yr)
        l_forget = bounded_forget_loss(logits_f, yf, sc["bnd"])
        l_struct = jnp.float32(0.0) if use_prox else \
            group_lasso(lora_tree, fcfg.group_type, fcfg.group_pos)

        if use_proto:
            l_proto, l_pro_f_hinged, l_pro_r = hinged_prototype_losses(
                emb_f, yf, emb_r, yr, protos,
                w_forget=sc["w_pro_f"], w_remain=sc["w_pro_r"],
                bnd_pro=sc["bnd_pro"], distance=fcfg.prototype_distance)
        else:
            l_proto = l_pro_f_hinged = l_pro_r = jnp.float32(0.0)

        total = sc["beta"] * l_forget + ce_r + sc["alpha"] * l_struct + \
            l_proto
        metrics = {
            "loss_total": total,
            "loss_forget": sc["beta"] * l_forget,
            "loss_remain": ce_r,
            "loss_structure": sc["alpha"] * l_struct,
            "loss_prototype_forget": sc["w_pro_f"] * l_pro_f_hinged,
            "loss_prototype_remain": sc["w_pro_r"] * l_pro_r,
            "acc_forget": top1_accuracy(logits_f, yf),
            "acc_remain": top1_accuracy(logits_r, yr),
        }
        return total, metrics

    # note: no buffer donation — the large base subtree passes through
    # unchanged (XLA aliases it), and donating would invalidate the
    # caller-held initial params on TPU
    @jax.jit
    def step(state: ForgetState, xf, yf, xr, yr, protos, scalars, rng):
        train_tree = state.base if train_base else state.lora
        other = state.lora if train_base else state.base
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            train_tree, other, xf, yf, xr, yr, protos, scalars, rng)
        opt_state = _with_lr(state.opt_state, scalars["lr"])
        updates, opt_state = optimizer.update(grads, opt_state, train_tree)
        new_tree = optax.apply_updates(train_tree, updates)
        if train_base:
            return state.replace(base=new_tree, opt_state=opt_state,
                                 step=state.step + 1), metrics
        if use_prox:
            from gslora_tpu.ops.group_lasso import lora_group_prox
            new_tree = lora_group_prox(
                new_tree, scalars["lr"] * scalars["alpha"])
        return state.replace(lora=new_tree, opt_state=opt_state,
                             step=state.step + 1), metrics

    return step


def scalars_for_epoch(cfg: RunConfig, epoch: int, *, beta=None, alpha=None,
                      w_pro_f=None, w_pro_r=None, lr: float = 0.0,
                      continual: bool = False):
    """Host-side per-epoch loss-weight schedule → traced scalar dict.

    Reproduces: alpha warmup (alpha=0 before alpha_epoch, then big_alpha —
    train_own_forget.py:723-727, also present in the CL driver
    cl.py:1007-1011); beta decay (:728-732). The bare epoch<ALPHA_EPOCH
    structure-loss gate (engine.py:82-90) exists ONLY in the single-step
    engine — engine_cl applies the structure loss every epoch, so
    ``continual=True`` skips it.
    """
    f = cfg.forget
    b = f.beta if beta is None else beta
    a = f.alpha if alpha is None else alpha
    if f.warmup_alpha:
        a = 0.0 if epoch < f.alpha_epoch else f.big_alpha
    elif not continual and epoch < f.alpha_epoch and f.alpha_epoch > 0:
        # engine.py:82-90: structure loss only from ALPHA_EPOCH on
        a = 0.0
    if f.beta_decay and epoch >= 50:
        b = f.small_beta
    return {
        "beta": jnp.float32(b),
        "alpha": jnp.float32(a),
        "lr": jnp.float32(lr),
        "bnd": jnp.float32(f.bnd),
        "bnd_pro": jnp.float32(f.bnd_pro),
        "w_pro_f": jnp.float32(f.pro_f_weight if w_pro_f is None else w_pro_f),
        "w_pro_r": jnp.float32(f.pro_r_weight if w_pro_r is None else w_pro_r),
    }
