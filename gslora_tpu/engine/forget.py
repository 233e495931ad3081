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
                     trainable: str = "lora",
                     grad_accum: int = 1):
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

    grad_accum > 1 runs each dual batch as that many microbatch pairs
    inside the jitted step (TPU-native addition — the reference has no
    accumulation; nn.DataParallel spreads the batch over 8 GPUs,
    train_own.py:403-406). The GS-LoRA loss is NOT a plain per-sample
    mean: ``relu(BND - CE_f)`` and ``relu(BND_pro - L_pro_f)`` gate on
    GLOBAL batch means, so naively averaging per-micro losses would relu
    each micro separately and change the gradient whenever micro CEs
    straddle the bound. Exactness comes from a two-phase scheme (see
    ``_accum_grads``): a forward-only gate pass computes the global means
    (and all metrics), then the grad pass differentiates a gated-LINEAR
    surrogate whose micro-gradient sum equals the full-batch gradient
    identically (same dropout masks per micro in both phases). Cost: one
    extra forward (~+1/3 step FLOPs) for activation memory divided by
    grad_accum; batches not divisible by grad_accum (in either stream)
    fall back to the unaccumulated path at trace time.
    """
    use_proto = fcfg.prototype if use_prototype is None else use_prototype
    use_prox = structure_mode == "prox"
    if use_prox and lora.rank > 0 and lora.pos != "FFN":
        # lora_group_prox only handles the FFN placement; silently training
        # with NO structure pressure would corrupt experiments
        raise ValueError(
            "structure_mode='prox' supports lora_pos='FFN' only; use the "
            "reference-faithful structure_mode='loss' for Attention LoRA")
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    train_base = trainable == "base"

    def _tree(train_tree, other):
        if train_base:
            return {"base": train_tree, "lora": other}, other
        return {"base": other, "lora": train_tree}, train_tree

    def forward(params, xf, yf, xr, yr, rng):
        """Dual-stream forward -> (logits_f, emb_f, logits_r, emb_r)."""
        if fused_batch:
            # one forward over [forget; remain] — fewer, bigger matmuls
            # (identical math; dropout masks stay iid per sample)
            x = jnp.concatenate([xf, xr], axis=0)
            y = jnp.concatenate([yf, yr], axis=0)
            logits, emb = vit_apply(params, x, y, model, lora, train=True,
                                    rng=rng, compute_dtype=compute_dtype,
                                    lora_apply=lora_apply)
            nf = xf.shape[0]
            return logits[:nf], emb[:nf], logits[nf:], emb[nf:]
        rf, rr = jax.random.split(rng)
        logits_f, emb_f = vit_apply(params, xf, yf, model, lora,
                                    train=True, rng=rf,
                                    compute_dtype=compute_dtype,
                                    lora_apply=lora_apply)
        logits_r, emb_r = vit_apply(params, xr, yr, model, lora,
                                    train=True, rng=rr,
                                    compute_dtype=compute_dtype,
                                    lora_apply=lora_apply)
        return logits_f, emb_f, logits_r, emb_r

    def loss_fn(train_tree, other, xf, yf, xr, yr, protos, sc, rng):
        params, lora_tree = _tree(train_tree, other)
        logits_f, emb_f, logits_r, emb_r = forward(params, xf, yf, xr, yr,
                                                   rng)

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

    def _micro_sums(params, xf, yf, xr, yr, protos, rng):
        """Masked per-sample SUMS (+ valid counts) of every data-dependent
        term over one microbatch pair. The losses are masked MEANS with a
        max(valid, 1) denominator, so mean * valid recovers the masked sum
        exactly (an all-padding slice contributes 0, never NaN)."""
        logits_f, emb_f, logits_r, emb_r = forward(params, xf, yf, xr, yr,
                                                   rng)
        wf = jnp.sum((yf >= 0).astype(jnp.float32))
        wr = jnp.sum((yr >= 0).astype(jnp.float32))
        s = {
            "nf": wf, "nr": wr,
            "ce_f": cross_entropy(logits_f, yf) * wf,
            "ce_r": cross_entropy(logits_r, yr) * wr,
            "acc_f": top1_accuracy(logits_f, yf) * wf,
            "acc_r": top1_accuracy(logits_r, yr) * wr,
        }
        if use_proto:
            from gslora_tpu.losses.prototype import prototype_loss
            s["pro_f"] = prototype_loss(emb_f, yf, protos,
                                        fcfg.prototype_distance) * wf
            s["pro_r"] = prototype_loss(emb_r, yr, protos,
                                        fcfg.prototype_distance) * wr
        return s

    def _accum_grads(train_tree, other, xf, yf, xr, yr, protos, sc, rng):
        """Gradient accumulation over ``grad_accum`` microbatch pairs,
        EXACTLY equal to the full-batch gradient (see make_forget_step
        docstring — the bounded/hinged terms gate on global batch means,
        so per-micro loss averaging would be wrong whenever micro CEs
        straddle the bound).

        Phase 1 (gate pass, forward-only scan): accumulate masked sums of
        CE/prototype/accuracy per stream -> global means, relu gates and
        the step metrics. Phase 2 (grad scan, same per-micro dropout
        keys): differentiate the gated-linear surrogate
          -beta*g_f*CE_f - w_f*g_p*L_pro_f + CE_r + w_r*L_pro_r
          (+ alpha*L_struct, data-independent)
        whose per-micro pieces sum to the true gradient by linearity;
        gradients accumulate in fp32 regardless of param dtype."""
        n = grad_accum
        params, lora_tree = _tree(train_tree, other)
        keys = jax.random.split(rng, n)
        xs = tuple(t.reshape(n, t.shape[0] // n, *t.shape[1:])
                   for t in (xf, yf, xr, yr)) + (keys,)

        def fwd_body(carry, micro):
            s = _micro_sums(params, *micro[:4], protos, micro[4])
            return jax.tree.map(jnp.add, carry, s), None

        zeros = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(lambda m: _micro_sums(params, *m[:4], protos,
                                                 m[4]),
                           jax.tree.map(lambda t: t[0], xs)))
        sums, _ = jax.lax.scan(fwd_body, zeros, xs)
        nf = jnp.maximum(sums["nf"], 1.0)
        nr = jnp.maximum(sums["nr"], 1.0)
        ce_f, ce_r = sums["ce_f"] / nf, sums["ce_r"] / nr
        l_forget = jax.nn.relu(sc["bnd"] - ce_f)
        # relu' convention: jax.nn.relu has zero derivative AT the kink,
        # so the gate is the STRICT inequality
        gate_f = (sc["bnd"] - ce_f > 0).astype(jnp.float32)
        l_struct = jnp.float32(0.0) if use_prox else \
            group_lasso(lora_tree, fcfg.group_type, fcfg.group_pos)
        if use_proto:
            l_pro_f, l_pro_r = sums["pro_f"] / nf, sums["pro_r"] / nr
            hinged = jax.nn.relu(sc["bnd_pro"] - l_pro_f)
            gate_p = (sc["bnd_pro"] - l_pro_f > 0).astype(jnp.float32)
            l_proto = sc["w_pro_f"] * hinged + sc["w_pro_r"] * l_pro_r
        else:
            hinged = l_pro_r = l_proto = jnp.float32(0.0)
            gate_p = jnp.float32(0.0)
        total = sc["beta"] * l_forget + ce_r + sc["alpha"] * l_struct + \
            l_proto
        metrics = {
            "loss_total": total,
            "loss_forget": sc["beta"] * l_forget,
            "loss_remain": ce_r,
            "loss_structure": sc["alpha"] * l_struct,
            "loss_prototype_forget": sc["w_pro_f"] * hinged,
            "loss_prototype_remain": sc["w_pro_r"] * l_pro_r,
            "acc_forget": sums["acc_f"] / nf,
            "acc_remain": sums["acc_r"] / nr,
        }

        def surrogate(train_tree, micro):
            params, lora_tree = _tree(train_tree, other)
            s = _micro_sums(params, *micro[:4], protos, micro[4])
            g = (-sc["beta"] * gate_f * s["ce_f"]) / nf + s["ce_r"] / nr
            if use_proto:
                g = g + (-sc["w_pro_f"] * gate_p * s["pro_f"]) / nf \
                    + sc["w_pro_r"] * s["pro_r"] / nr
            if not train_base and not use_prox:
                # data-independent; 1/n per micro sums to alpha*L_struct
                g = g + sc["alpha"] * group_lasso(
                    lora_tree, fcfg.group_type, fcfg.group_pos) / n
            return g

        def grad_body(carry, micro):
            g = jax.grad(surrogate)(train_tree, micro)
            return jax.tree.map(lambda c, gi: c + gi.astype(c.dtype),
                                carry, g), None

        gzeros = jax.tree.map(
            lambda t: jnp.zeros(t.shape, jnp.float32), train_tree)
        gsum, _ = jax.lax.scan(grad_body, gzeros, xs)
        grads = jax.tree.map(lambda g, t: g.astype(t.dtype), gsum,
                             train_tree)
        return grads, metrics

    # note: no buffer donation — the large base subtree passes through
    # unchanged (XLA aliases it), and donating would invalidate the
    # caller-held initial params on TPU
    @jax.jit
    def step(state: ForgetState, xf, yf, xr, yr, protos, scalars, rng):
        train_tree = state.base if train_base else state.lora
        other = state.lora if train_base else state.base
        if grad_accum > 1 and xf.shape[0] % grad_accum == 0 and \
                xr.shape[0] % grad_accum == 0:
            grads, metrics = _accum_grads(
                train_tree, other, xf, yf, xr, yr, protos, scalars, rng)
        else:
            # grad_accum == 1, or a ragged unpadded tail batch that the
            # micro split cannot slice evenly — run it unaccumulated
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
