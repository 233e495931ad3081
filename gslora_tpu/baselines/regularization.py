"""Regularization baseline family: Retrain / Replay / L2 / EWC / MAS.

Reference mechanics (engine_cl.py:463-568 train_one_epoch_regularzation +
closures train_own_forget_cl.py:1414-1692):
* train on the RANDOM-RELABELED forget subset ("forget by wrong label",
  CLDatasetWrapper); Replay concatenates relabeled-forget + remain; Retrain
  trains a FRESH model on remain only with lambda=0;
* loss = CE + lambda * sum_tasks sum_n importance_n * (p - p*_n)^2;
* importance: L2 -> ones; EWC -> accumulated squared CE grads weighted
  len(batch)/len(loader); MAS -> accumulated |grad| of mean squared logits
  / len(loader);
* after each task: anchor current params + new importance appended
  (online mode replaces term 0).

Trainable scope: the whole network EXCEPT the margin head, which every
reference baseline branch freezes unless --ffn_open (cl.py:426; see
baselines/freeze.py — round-5 parity fix). --only_ffn narrows it to the
FFN Linears + head.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import optax

from gslora_tpu.config import LoraConfig, RunConfig, ViTConfig
from gslora_tpu.engine.evaluate import eval_accuracy, h_mean, make_eval_step
from gslora_tpu.engine.forget import _with_lr
from gslora_tpu.engine.loop import step_cache
from gslora_tpu.engine.pretrain import PretrainState
from gslora_tpu.engine.schedule import timm_cosine_lr
from gslora_tpu.losses.classification import cross_entropy, top1_accuracy
from gslora_tpu.losses.regularization import quadratic_penalty
from gslora_tpu.models.vit import vit_apply


def make_reg_step(model: ViTConfig, lora: LoraConfig, optimizer, n_terms: int,
                  compute_dtype=jnp.bfloat16, grad_accum: int = 1,
                  freeze: Optional[dict] = None):
    """step(state, x, y, anchors, importances, lam, lr, rng).
    anchors/importances are tuples of length n_terms (static).

    ``freeze`` (baselines/freeze.freeze_flags): static mask kwargs — the
    reference freezes the margin head in every baseline branch unless
    --ffn_open (cl.py:426), realized here by zeroing the frozen leaves of
    the update pytree (trajectory-identical to torch's grad=None skip).

    ``grad_accum > 1`` microbatches the batch inside the jitted step via
    engine.pretrain._accumulated — EXACT here because the loss is a
    masked-mean CE plus a data-independent quadratic penalty (the
    valid-count weighting recovers the global masked mean, and a
    data-independent term contributes sum_i v*n_i/N = v unchanged);
    indivisible batches fall back to one unaccumulated call."""

    def loss_fn(params, x, y, anchors, importances, lam, rng):
        logits, _ = vit_apply(params, x, y, model, lora, train=True, rng=rng,
                              compute_dtype=compute_dtype)
        ce = cross_entropy(logits, y)
        reg = quadratic_penalty(params, anchors, importances, lam) \
            if n_terms else jnp.float32(0.0)
        total = ce + reg
        return total, {"loss_CE": ce, "loss_regularization": reg,
                       "loss_total": total, "acc": top1_accuracy(logits, y)}

    @jax.jit
    def step(state: PretrainState, x, y, anchors, importances, lam, lr, rng):
        def gfn(xx, yy, rr):
            return jax.grad(loss_fn, has_aux=True)(
                state.params, xx, yy, anchors, importances, lam, rr)
        if grad_accum > 1:
            from gslora_tpu.engine.pretrain import _accumulated
            grads, metrics = _accumulated(gfn, grad_accum)(x, y, rng)
        else:
            grads, metrics = gfn(x, y, rng)
        opt_state = _with_lr(state.opt_state, lr)
        updates, opt_state = optimizer.update(grads, opt_state, state.params)
        if freeze is not None:
            from gslora_tpu.baselines.freeze import mask_updates
            updates = mask_updates(updates, **freeze)
        params = optax.apply_updates(state.params, updates)
        return PretrainState(params=params, opt_state=opt_state,
                             step=state.step + 1), metrics

    return step


@step_cache
def _cached_reg_step(model, lora, optim_cfg, n_terms: int, cdt,
                     freeze_key: tuple = ()):
    """(optimizer, jitted step) cached per configuration (shared policy in
    engine.loop.step_cache): retrain/replay and same-n_terms tasks reuse
    the compiled step instead of paying a fresh XLA compile per task.
    (EWC/MAS tasks grow n_terms, whose penalty structure is static — those
    recompile by necessity.)"""
    from gslora_tpu.engine.state import make_optimizer
    opt = make_optimizer(optim_cfg)
    return opt, make_reg_step(model, lora, opt, n_terms, compute_dtype=cdt,
                              grad_accum=optim_cfg.grad_accum,
                              freeze=dict(freeze_key) if freeze_key else None)


def estimate_importance(method: str, params, batches, model: ViTConfig,
                        lora: LoraConfig, compute_dtype=jnp.bfloat16):
    """Importance pytree for one task (train_own_forget_cl.py:1425-1569)."""
    if method == "l2":
        return jax.tree.map(jnp.ones_like, params)

    if method == "ewc":
        def ce_loss(p, x, y):
            logits, _ = vit_apply(p, x, y, model, lora, train=False,
                                  compute_dtype=compute_dtype)
            return cross_entropy(logits, y)  # masks the -1 pad sentinel
        grad_fn = jax.jit(jax.grad(ce_loss))
    elif method == "mas":
        def mas_loss(p, x, y):
            logits, _ = vit_apply(p, x, y, model, lora, train=False,
                                  compute_dtype=compute_dtype)
            # mean of logits^2 over valid rows only (pad rows excluded so
            # padded tail batches match the reference's unpadded batch)
            sq = jnp.mean(logits.astype(jnp.float32) ** 2, axis=1)
            w = (y >= 0).astype(jnp.float32)
            return jnp.sum(sq * w) / jnp.maximum(jnp.sum(w), 1.0)
        grad_fn = jax.jit(jax.grad(mas_loss))
    else:
        raise ValueError(f"unknown importance method {method}")

    # stream the batches: len() is available on BatchLoader, and
    # materializing a full decoded split (list(...)) costs tens of GB of
    # host RAM at ImageNet scale
    try:
        n = len(batches)
    except TypeError:
        batches = list(batches)
        n = len(batches)
    imp = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
    for x, y in batches:
        y = jnp.asarray(y)
        g = grad_fn(params, jnp.asarray(x), y)
        if method == "ewc":
            # weight len(batch)/len(loader) like the reference (:1505-1510);
            # count only valid (non-pad) rows
            w = float(jnp.sum(y >= 0)) / n
            imp = jax.tree.map(
                lambda i, gg: i + (gg.astype(jnp.float32) ** 2) * w, imp, g)
        else:
            imp = jax.tree.map(
                lambda i, gg: i + jnp.abs(gg.astype(jnp.float32)) / n, imp, g)
    return imp


def run_regularization_task(cfg: RunConfig, params, train_loader_factory,
                            test_batches_f: Callable, test_batches_r: Callable,
                            *, lam: float, anchors: List, importances: List,
                            num_epoch: Optional[int] = None, logger=None,
                            eval_every: Optional[int] = None,
                            test_batches_open: Optional[Callable] = None,
                            mesh=None) -> Dict[str, Any]:
    """One task of reg-baseline training. train_loader_factory() yields the
    epoch iterator (relabeled forget / remain-for-retrain / concat-replay).
    ``mesh``: optional device mesh — params replicate, batches shard over
    the ``data`` axis (parallel.mesh.placement)."""
    from gslora_tpu.engine.loop import _dtype
    from gslora_tpu.metrics.logging import MetricLogger
    from gslora_tpu.parallel.mesh import placement

    cdt = _dtype(cfg)
    logger = logger or MetricLogger()
    if cfg.mesh.pp:
        # placement() below is called without pp=..., so it never
        # registers a pipeline and --pp would be a SILENT no-op here
        # (step_cache keys baseline steps on the SPMD registry, but the
        # registry stays empty for baselines); fail loudly instead
        raise ValueError(
            "MeshConfig.pp is supported by the GS-LoRA forget and "
            "pretrain engines only; baseline runners support "
            "dp/tp/fsdp")
    put_params, put_batch = placement(mesh, tp=cfg.mesh.tp,
                                      fsdp=cfg.mesh.fsdp,
                                      sp=cfg.mesh.sp)
    params = put_params(params)
    anchors = [put_params(a) for a in anchors]
    importances = [put_params(i) for i in importances]
    from gslora_tpu.baselines.freeze import freeze_flags
    opt, step = _cached_reg_step(cfg.model, cfg.lora, cfg.optim,
                                 len(anchors), cdt,
                                 tuple(sorted(freeze_flags(cfg).items())))
    state = PretrainState.create(params, opt)
    eval_step = make_eval_step(cfg.model, cfg.lora, compute_dtype=cdt)
    anchors_t = tuple(anchors)
    imps_t = tuple(importances)

    facc_before = eval_accuracy(eval_step, state.params, test_batches_f())
    best_h = float("-inf")
    rng = jax.random.key(cfg.data.seed)
    batch = 0
    n_ep = num_epoch if num_epoch is not None else cfg.num_epoch
    eval_every = eval_every or cfg.ver_freq
    for epoch in range(n_ep):
        lr = timm_cosine_lr(cfg.optim, epoch)
        for x, y in train_loader_factory():
            rng, sub = jax.random.split(rng)
            x, y = put_batch(x, y)
            state, metrics = step(state, x, y,
                                  anchors_t, imps_t, jnp.float32(lam),
                                  jnp.float32(lr), sub)
            if (batch + 1) % cfg.disp_freq == 0:
                logger.log({k: float(v) for k, v in metrics.items()},
                           step=batch)
            if (batch + 1) % eval_every == 0:
                facc = eval_accuracy(eval_step, state.params,
                                     test_batches_f())
                racc = eval_accuracy(eval_step, state.params,
                                     test_batches_r())
                best_h = max(best_h, h_mean(facc_before, facc, racc,
                                            eps=1e-8))
            batch += 1

    facc = eval_accuracy(eval_step, state.params, test_batches_f())
    racc = eval_accuracy(eval_step, state.params, test_batches_r())
    oacc = eval_accuracy(eval_step, state.params, test_batches_open()) \
        if test_batches_open else None
    best_h = max(best_h, h_mean(facc_before, facc, racc, eps=1e-8))
    return {"params": state.params, "forget_acc_before": facc_before,
            "forget_acc": facc, "remain_acc": racc, "open_acc": oacc,
            "best_h": best_h}
