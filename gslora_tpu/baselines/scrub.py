"""SCRUB: teacher-student max/min knowledge distillation with SWA smoothing
(baselines/SCRUBtrain.py:11-291; setup train_own_forget_cl.py:440-451,
optimizer swap :860-879).

Superepoch = 10 inner epochs: the first 5 run a MAX pass over the forget
loader (loss = -KD(s,t) + smoothing * sum_p ||theta_p - theta_swa_p||_F)
followed by a MIN pass over remain (gamma*CE + alpha*KD + sgda); the last 5
run the MIN pass only. After each superepoch the SWA model absorbs the
student: swa <- 0.9*swa + 0.1*student (first update copies — torch
AveragedModel semantics). The sgda optimizer (SGD by default) uses step-decay
LR (util/sgda_utils.py:7-19). Teacher and SWA live ACROSS tasks (created
once before the reference's CL task loop) — see run_scrub_task.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from gslora_tpu.baselines.freeze import freeze_flags
from gslora_tpu.config import LoraConfig, RunConfig, ViTConfig
from gslora_tpu.engine.evaluate import eval_accuracy, h_mean, make_eval_step
from gslora_tpu.engine.forget import _with_lr
from gslora_tpu.engine.loop import step_cache
from gslora_tpu.engine.pretrain import PretrainState
from gslora_tpu.engine.schedule import step_decay_lr
from gslora_tpu.losses.classification import cross_entropy
from gslora_tpu.losses.distillation import kd_kl_loss
from gslora_tpu.models.vit import vit_apply


def param_dist(params, swa_params, p: float) -> jax.Array:
    """p * sum over tensors of frobenius norm of (theta - theta_swa)
    (util/sgda_utils.py:36-41)."""
    if p == 0.0:
        return jnp.float32(0.0)
    # clamped sqrt: params == swa at the start of a superepoch, and the raw
    # norm's gradient at exactly 0 is NaN (0/0); clamping gives the correct
    # zero subgradient
    norms = jax.tree.map(
        lambda a, b: jnp.sqrt(jnp.maximum(jnp.sum(
            (a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2), 1e-24)),
        params, swa_params)
    return p * sum(jax.tree.leaves(norms))


def swa_update(swa_params, student_params, n_averaged: int,
               beta: float = 0.1):
    """torch AveragedModel with avg_fn = (1-beta)*avg + beta*new; first
    update copies (train_own_forget_cl.py:446-450)."""
    if n_averaged == 0:
        return jax.tree.map(lambda x: x, student_params)
    return jax.tree.map(
        lambda a, s: ((1 - beta) * a.astype(jnp.float32) +
                      beta * s.astype(jnp.float32)).astype(a.dtype),
        swa_params, student_params)


def make_scrub_steps(model: ViTConfig, lora: LoraConfig, optimizer,
                     kd_T: float, smoothing: float, gamma: float,
                     alpha: float, compute_dtype=jnp.bfloat16,
                     grad_accum: int = 1, freeze: Optional[dict] = None):
    """Returns (max_step, min_step), both jitted.

    ``grad_accum > 1`` microbatches both sgda passes inside the jitted
    step via engine.pretrain._accumulated — EXACT here: every
    data-dependent term (KD, CE) is a masked row mean, and the swa
    distance penalty is data-independent (contributes unchanged under
    valid-count weighting); indivisible batches fall back."""

    def max_loss(params, teacher, swa, x, y, rng):
        logits, _ = vit_apply(params, x, y, model, lora, train=True, rng=rng,
                              compute_dtype=compute_dtype)
        t_logits, _ = jax.lax.stop_gradient(
            vit_apply(teacher, x, y, model, lora, train=False,
                      compute_dtype=compute_dtype))
        kd = kd_kl_loss(logits, t_logits, kd_T, labels=y)
        sgda = param_dist(params, swa, smoothing)
        total = -kd + sgda
        return total, {"loss_kd_forget": kd, "loss_total_forget": total}

    def min_loss(params, teacher, swa, x, y, rng):
        logits, _ = vit_apply(params, x, y, model, lora, train=True, rng=rng,
                              compute_dtype=compute_dtype)
        t_logits, _ = jax.lax.stop_gradient(
            vit_apply(teacher, x, y, model, lora, train=False,
                      compute_dtype=compute_dtype))
        kd = kd_kl_loss(logits, t_logits, kd_T, labels=y)
        ce = cross_entropy(logits, y)
        total = gamma * ce + alpha * kd + param_dist(params, swa, smoothing)
        return total, {"loss_kd_remain": kd, "loss_CE": ce,
                       "loss_total_remain": total}

    def make(loss_fn):
        @jax.jit
        def step(state: PretrainState, teacher, swa, x, y, lr, rng):
            def gfn(xx, yy, rr):
                return jax.grad(loss_fn, has_aux=True)(
                    state.params, teacher, swa, xx, yy, rr)
            if grad_accum > 1:
                from gslora_tpu.engine.pretrain import _accumulated
                grads, metrics = _accumulated(gfn, grad_accum)(x, y, rng)
            else:
                grads, metrics = gfn(x, y, rng)
            opt_state = _with_lr(state.opt_state, lr)
            updates, opt_state = optimizer.update(grads, opt_state,
                                                  state.params)
            if freeze is not None:
                # SCRUB rides the reference's CL-baseline branch, so the
                # margin head is frozen there too (cl.py:425-427;
                # baselines/freeze.py)
                from gslora_tpu.baselines.freeze import mask_updates
                updates = mask_updates(updates, **freeze)
            params = optax.apply_updates(state.params, updates)
            return PretrainState(params=params, opt_state=opt_state,
                                 step=state.step + 1), metrics
        return step

    return make(max_loss), make(min_loss)


@step_cache
def _cached_scrub_steps(model, lora, optim_cfg, kd_T, smoothing, gamma,
                        alpha, cdt, freeze_key: tuple = ()):
    """(optimizer, max_step, min_step) cached per configuration (shared
    policy in engine.loop.step_cache) so a multi-task CL run re-uses the
    compiled steps (the reference re-creates only the optimizer per task,
    cl.py:811 — the cached optimizer object is pure, so re-initializing
    its state per task is equivalent)."""
    from gslora_tpu.engine.state import make_optimizer
    opt = make_optimizer(optim_cfg)
    mx, mn = make_scrub_steps(model, lora, opt, kd_T, smoothing, gamma,
                              alpha, compute_dtype=cdt,
                              grad_accum=optim_cfg.grad_accum,
                              freeze=dict(freeze_key) if freeze_key else None)
    return opt, mx, mn


def run_scrub_task(cfg: RunConfig, params, forget_loader_factory: Callable,
                   remain_loader_factory: Callable,
                   test_batches_f: Callable, test_batches_r: Callable,
                   logger=None,
                   test_batches_open: Optional[Callable] = None,
                   mesh=None, teacher=None, swa=None,
                   n_averaged: int = 0) -> Dict[str, Any]:
    """Full SCRUB task: cfg.baseline.scrub_superepoch superepochs.

    ``teacher``/``swa``/``n_averaged``: cross-task state. The reference
    creates the teacher AND the SWA AveragedModel ONCE before the CL task
    loop (train_own_forget_cl.py:441-451, loop at :515), so multi-task
    callers must thread the returned ``teacher``/``swa``/``n_averaged``
    into the next task (the CL driver does). Defaults (None/0) reproduce
    the single-task setup: teacher = entry params, first SWA update
    copies."""
    from gslora_tpu.engine.loop import _dtype
    from gslora_tpu.config import OptimConfig
    from gslora_tpu.metrics.logging import MetricLogger
    from gslora_tpu.parallel.mesh import placement

    b = cfg.baseline
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
    # the sgda optimizer replaces the main one (cl.py:860-879); its state
    # is re-initialized per task like the reference's re-created optimizer
    opt, max_step, min_step = _cached_scrub_steps(
        cfg.model, cfg.lora,
        OptimConfig(opt=b.sgda_optim, lr=b.sgda_learning_rate,
                    momentum=b.sgda_momentum,
                    weight_decay=b.sgda_weight_decay),
        b.kd_T, b.sgda_smoothing, b.sgda_gamma, b.sgda_alpha, cdt,
        tuple(sorted(freeze_flags(cfg).items())))
    state = PretrainState.create(params, opt)
    teacher = put_params(teacher) if teacher is not None \
        else jax.tree.map(lambda x: x, params)  # frozen copy
    swa = put_params(swa) if swa is not None else params
    eval_step = make_eval_step(cfg.model, cfg.lora, compute_dtype=cdt)

    facc_before = eval_accuracy(eval_step, state.params, test_batches_f())
    best_h = float("-inf")
    rng = jax.random.key(cfg.data.seed)
    decay_epochs = [b.scrub_decay_epoch]
    for superepoch in range(b.scrub_superepoch):
        for i in range(10):
            epoch = superepoch * 15 + i
            lr = step_decay_lr(b.sgda_learning_rate, epoch, decay_epochs)
            if i < 5:  # max pass over forget
                for x, y in forget_loader_factory():
                    rng, sub = jax.random.split(rng)
                    x, y = put_batch(x, y)
                    state, m = max_step(state, teacher, swa, x, y,
                                        jnp.float32(lr), sub)
            # min pass over remain (always)
            for x, y in remain_loader_factory():
                rng, sub = jax.random.split(rng)
                x, y = put_batch(x, y)
                state, m = min_step(state, teacher, swa, x, y,
                                    jnp.float32(lr), sub)
        swa = swa_update(swa, state.params, n_averaged)
        n_averaged += 1
        facc = eval_accuracy(eval_step, state.params, test_batches_f())
        racc = eval_accuracy(eval_step, state.params, test_batches_r())
        best_h = max(best_h, h_mean(facc_before, facc, racc, eps=1e-8))
        logger.log({"Test forget Accuracy": facc,
                    "Test remain Accuracy": racc}, step=superepoch)

    facc = eval_accuracy(eval_step, state.params, test_batches_f())
    racc = eval_accuracy(eval_step, state.params, test_batches_r())
    oacc = eval_accuracy(eval_step, state.params, test_batches_open()) \
        if test_batches_open else None
    return {"params": state.params, "swa": swa, "teacher": teacher,
            "n_averaged": n_averaged,
            "forget_acc_before": facc_before, "forget_acc": facc,
            "remain_acc": racc, "open_acc": oacc, "best_h": best_h}
