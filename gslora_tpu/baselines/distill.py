"""Teacher-student baseline family: LwF, DER, DER++, FDR.

One jitted step per method (reference per-method loops in
baselines/Lwftrain.py, DERtrain.py, FDRtrain.py share this shape):
student CE on the relabeled forget batch + a teacher-anchored term on a
cycled remain batch. The teacher is the ORIGINAL pretrained model: the
reference deepcopies it ONCE before the CL task loop
(train_own_forget_cl.py:453-476, loop at :515), so callers running multiple
tasks must pass the same pretrained ``teacher_params`` into every task (the
CL driver does) — anchoring task t to the task t-1 student would change
the objective.

Loss terms reproduced exactly:
* DER   (DERtrain.py:12-16):  ||emb_r - emb_teacher_r||_2^2  (SUM of squares)
  DER++ (:80-92): + lambda_plus * CE(student, second remain batch)
* FDR   (FDRtrain.py:17-19):  mean over rows of ||logits_r - logits_t||_2
* LwF   (Lwftrain.py:12-27):  temperature-power soft-target loss. NOTE the
  reference applies log() to log_softmax output, producing NaNs that are
  scrubbed to 0 — making its KD term identically zero. We implement the
  intended loss (power-temperature renormalized soft targets); pass
  faithful_zero_kd=True to reproduce the reference's no-op term exactly.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from gslora_tpu.config import LoraConfig, RunConfig, ViTConfig
from gslora_tpu.engine.evaluate import eval_accuracy, h_mean, make_eval_step
from gslora_tpu.engine.forget import _with_lr
from gslora_tpu.engine.loop import step_cache
from gslora_tpu.engine.pretrain import PretrainState
from gslora_tpu.engine.schedule import timm_cosine_lr
from gslora_tpu.losses.classification import cross_entropy
from gslora_tpu.losses.distillation import lwf_kd_loss
from gslora_tpu.models.vit import vit_apply


def der_loss(emb_s, emb_t, labels=None) -> jax.Array:
    """Squared Frobenius norm SUM (DERtrain.py:12-16) over valid rows
    (label -1 = pad sentinel, excluded)."""
    d = emb_s.astype(jnp.float32) - emb_t.astype(jnp.float32)
    per_row = jnp.sum(d * d, axis=1)
    if labels is not None:
        per_row = per_row * (labels >= 0).astype(jnp.float32)
    return jnp.sum(per_row)


def fdr_loss(logits_s, logits_t, labels=None) -> jax.Array:
    """Mean row-wise L2 (FDRtrain.py:17-19) over valid rows.

    sqrt is clamped away from 0: the student starts as an exact copy of
    the teacher, so with dropout=0 the first step has d == 0 rows and the
    raw norm's gradient there is NaN (0/0); the clamp yields the correct
    zero subgradient instead."""
    d = logits_s.astype(jnp.float32) - logits_t.astype(jnp.float32)
    per_row = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=1), 1e-24))
    if labels is None:
        return jnp.mean(per_row)
    w = (labels >= 0).astype(jnp.float32)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


def make_distill_step(method: str, model: ViTConfig, lora: LoraConfig,
                      optimizer, hp: Dict[str, float],
                      compute_dtype=jnp.bfloat16,
                      faithful_zero_kd: bool = False,
                      grad_accum: int = 1,
                      freeze: Optional[dict] = None):
    """step(state, teacher_params, xf, yf, xr, yr, xr2, yr2, lr, rng).

    ``grad_accum > 1`` microbatches all streams inside the jitted step.
    Unlike the pretrain step these losses mix MEANS over two (three for
    DER++) different streams with DER's raw SUM, so the generic
    valid-count reweighting does not apply; instead the step computes the
    GLOBAL valid count per stream from the labels up front (no forward
    needed) and differentiates a per-micro surrogate of masked SUMS
    divided by those global counts — every term is linear in per-sample
    statistics (no batch-global nonlinearity like the GS-LoRA gates), so
    the micro-gradient sum equals the full-batch gradient identically;
    gradients accumulate in fp32. Streams whose size ``grad_accum`` does
    not divide fall back to one unaccumulated call (trace-time branch)."""
    method = method.lower()

    def loss_fn(params, teacher, xf, yf, xr, yr, xr2, yr2, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        logits_f, _ = vit_apply(params, xf, yf, model, lora, train=True,
                                rng=r1, compute_dtype=compute_dtype)
        ce_f = cross_entropy(logits_f, yf)
        logits_r, emb_r = vit_apply(params, xr, yr, model, lora, train=True,
                                    rng=r2, compute_dtype=compute_dtype)
        t_logits_r, t_emb_r = jax.lax.stop_gradient(
            vit_apply(teacher, xr, yr, model, lora, train=False,
                      compute_dtype=compute_dtype))
        metrics = {"loss_CE": ce_f}
        if method == "lwf":
            kd = jnp.float32(0.0) if faithful_zero_kd else \
                lwf_kd_loss(logits_r, t_logits_r, hp["T"], labels=yr)
            ce_r = cross_entropy(logits_r, yr)
            total = ce_f + hp["lambda_kd"] * kd + hp["lambda_remain"] * ce_r
            metrics.update(loss_KD=kd, loss_remain=ce_r)
        elif method in ("der", "der_plus"):
            ld = der_loss(emb_r, t_emb_r, labels=yr)
            total = ce_f + hp["lambda_der"] * ld
            metrics.update(loss_DER=ld)
            if method == "der_plus":
                logits_r2, _ = vit_apply(params, xr2, yr2, model, lora,
                                         train=True, rng=r3,
                                         compute_dtype=compute_dtype)
                ce_r2 = cross_entropy(logits_r2, yr2)
                total = total + hp["lambda_der_plus"] * ce_r2
                metrics.update(loss_CE_next=ce_r2)
        elif method == "fdr":
            lf = fdr_loss(logits_r, t_logits_r, labels=yr)
            total = ce_f + hp["lambda_fdr"] * lf
            metrics.update(loss_FDR=lf)
        else:
            raise ValueError(f"unknown distill method {method}")
        metrics["loss_total"] = total
        return total, metrics

    def _micro_sums(params, teacher, xf, yf, xr, yr, xr2, yr2, rng):
        """Masked per-sample SUMS of every data-dependent term over one
        microbatch (masked means have a max(valid,1) denominator, so
        mean * valid recovers the masked sum exactly; DER is already a
        sum). Same forward structure/rng splits as loss_fn."""
        r1, r2, r3 = jax.random.split(rng, 3)
        vf = jnp.sum((yf >= 0).astype(jnp.float32))
        vr = jnp.sum((yr >= 0).astype(jnp.float32))
        logits_f, _ = vit_apply(params, xf, yf, model, lora, train=True,
                                rng=r1, compute_dtype=compute_dtype)
        logits_r, emb_r = vit_apply(params, xr, yr, model, lora, train=True,
                                    rng=r2, compute_dtype=compute_dtype)
        t_logits_r, t_emb_r = jax.lax.stop_gradient(
            vit_apply(teacher, xr, yr, model, lora, train=False,
                      compute_dtype=compute_dtype))
        s = {"ce_f": cross_entropy(logits_f, yf) * vf}
        if method == "lwf":
            kd = jnp.float32(0.0) if faithful_zero_kd else \
                lwf_kd_loss(logits_r, t_logits_r, hp["T"], labels=yr)
            s["kd"] = kd * vr
            s["ce_r"] = cross_entropy(logits_r, yr) * vr
        elif method in ("der", "der_plus"):
            s["der"] = der_loss(emb_r, t_emb_r, labels=yr)  # already a SUM
            if method == "der_plus":
                logits_r2, _ = vit_apply(params, xr2, yr2, model, lora,
                                         train=True, rng=r3,
                                         compute_dtype=compute_dtype)
                vr2 = jnp.sum((yr2 >= 0).astype(jnp.float32))
                s["ce_r2"] = cross_entropy(logits_r2, yr2) * vr2
        elif method == "fdr":
            s["fdr"] = fdr_loss(logits_r, t_logits_r, labels=yr) * vr
        return s

    def _accum_grads(params, teacher, xf, yf, xr, yr, xr2, yr2, rng):
        """Accumulated gradient == full-batch gradient (see docstring)."""
        n = grad_accum
        nf = jnp.maximum(jnp.sum((yf >= 0).astype(jnp.float32)), 1.0)
        nr = jnp.maximum(jnp.sum((yr >= 0).astype(jnp.float32)), 1.0)
        nr2 = jnp.maximum(jnp.sum((yr2 >= 0).astype(jnp.float32)), 1.0)
        keys = jax.random.split(rng, n)
        xs = tuple(t.reshape(n, t.shape[0] // n, *t.shape[1:])
                   for t in (xf, yf, xr, yr, xr2, yr2)) + (keys,)

        def surrogate(p, micro):
            s = _micro_sums(p, teacher, *micro[:6], micro[6])
            val = s["ce_f"] / nf
            if method == "lwf":
                val = val + hp["lambda_kd"] * s["kd"] / nr \
                    + hp["lambda_remain"] * s["ce_r"] / nr
            elif method in ("der", "der_plus"):
                val = val + hp["lambda_der"] * s["der"]
                if method == "der_plus":
                    val = val + hp["lambda_der_plus"] * s["ce_r2"] / nr2
            elif method == "fdr":
                val = val + hp["lambda_fdr"] * s["fdr"] / nr
            return val, s

        def body(carry, micro):
            gsum, ssum = carry
            g, s = jax.grad(surrogate, has_aux=True)(params, micro)
            gsum = jax.tree.map(lambda c, gi: c + gi.astype(c.dtype),
                                gsum, g)
            ssum = jax.tree.map(jnp.add, ssum, s)
            return (gsum, ssum), None

        gzeros = jax.tree.map(lambda t: jnp.zeros(t.shape, jnp.float32),
                              params)
        szeros = jax.tree.map(
            lambda sh: jnp.zeros(sh.shape, sh.dtype),
            jax.eval_shape(lambda m: _micro_sums(params, teacher, *m[:6],
                                                 m[6]),
                           jax.tree.map(lambda t: t[0], xs)))
        (gsum, ssum), _ = jax.lax.scan(body, (gzeros, szeros), xs)
        grads = jax.tree.map(lambda g, t: g.astype(t.dtype), gsum, params)
        metrics = {"loss_CE": ssum["ce_f"] / nf}
        total = metrics["loss_CE"]
        if method == "lwf":
            metrics["loss_KD"] = ssum["kd"] / nr
            metrics["loss_remain"] = ssum["ce_r"] / nr
            total = total + hp["lambda_kd"] * metrics["loss_KD"] \
                + hp["lambda_remain"] * metrics["loss_remain"]
        elif method in ("der", "der_plus"):
            metrics["loss_DER"] = ssum["der"]
            total = total + hp["lambda_der"] * metrics["loss_DER"]
            if method == "der_plus":
                metrics["loss_CE_next"] = ssum["ce_r2"] / nr2
                total = total + hp["lambda_der_plus"] * \
                    metrics["loss_CE_next"]
        elif method == "fdr":
            metrics["loss_FDR"] = ssum["fdr"] / nr
            total = total + hp["lambda_fdr"] * metrics["loss_FDR"]
        metrics["loss_total"] = total
        return grads, metrics

    @jax.jit
    def step(state: PretrainState, teacher, xf, yf, xr, yr, xr2, yr2, lr,
             rng):
        if grad_accum > 1 and not any(
                t.shape[0] % grad_accum for t in (xf, xr, xr2)):
            grads, metrics = _accum_grads(
                state.params, teacher, xf, yf, xr, yr, xr2, yr2, rng)
        else:
            # grad_accum == 1, or a stream the micro split cannot slice
            grads, metrics = jax.grad(loss_fn, has_aux=True)(
                state.params, teacher, xf, yf, xr, yr, xr2, yr2, rng)
        opt_state = _with_lr(state.opt_state, lr)
        updates, opt_state = optimizer.update(grads, opt_state, state.params)
        if freeze is not None:
            # the reference freezes the margin head in every baseline
            # branch unless --ffn_open (cl.py:426; baselines/freeze.py)
            from gslora_tpu.baselines.freeze import mask_updates
            updates = mask_updates(updates, **freeze)
        params = optax.apply_updates(state.params, updates)
        return PretrainState(params=params, opt_state=opt_state,
                             step=state.step + 1), metrics

    return step


# hyperparameters each method's traced loss actually reads — the cache key
# is restricted to these so varying an unrelated lambda (e.g. der_lambda
# during an LwF sweep) doesn't force a spurious recompile
_HP_KEYS = {"lwf": ("T", "lambda_kd", "lambda_remain"),
            "der": ("lambda_der",),
            "der_plus": ("lambda_der", "lambda_der_plus"),
            "fdr": ("lambda_fdr",)}


@step_cache
def _cached_distill_step(method: str, model, lora, optim_cfg, hp_items,
                         cdt, faithful: bool, freeze_key: tuple = ()):
    """(optimizer, jitted step) cached per configuration (shared policy in
    engine.loop.step_cache). Keys are frozen dataclasses / scalars."""
    from gslora_tpu.engine.state import make_optimizer
    opt = make_optimizer(optim_cfg)
    step = make_distill_step(method, model, lora, opt, dict(hp_items),
                             compute_dtype=cdt, faithful_zero_kd=faithful,
                             grad_accum=optim_cfg.grad_accum,
                             freeze=dict(freeze_key) if freeze_key else None)
    return opt, step


def run_distill_task(cfg: RunConfig, params, teacher_params,
                     forget_loader_factory: Callable, remain_cycler,
                     test_batches_f: Callable, test_batches_r: Callable,
                     *, method: Optional[str] = None,
                     num_epoch: Optional[int] = None, logger=None,
                     test_batches_open: Optional[Callable] = None,
                     mesh=None) -> Dict[str, Any]:
    """One task of LwF/DER/DER++/FDR: iterate the relabeled forget loader,
    cycle remain batches via ``remain_cycler.next()``."""
    from gslora_tpu.engine.loop import _dtype
    from gslora_tpu.metrics.logging import MetricLogger

    method = (method or cfg.baseline.method).lower()
    b = cfg.baseline
    hp = {"T": b.lwf_T, "lambda_kd": b.lwf_lambda_kd,
          "lambda_remain": b.lwf_lambda_remain, "lambda_der": b.der_lambda,
          "lambda_der_plus": b.der_plus_lambda, "lambda_fdr": b.fdr_lambda}
    cdt = _dtype(cfg)
    logger = logger or MetricLogger()
    from gslora_tpu.parallel.mesh import placement
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
    teacher_params = put_params(teacher_params)
    hp_key = {k: hp[k] for k in _HP_KEYS.get(method, tuple(hp))}
    from gslora_tpu.baselines.freeze import freeze_flags
    opt, step = _cached_distill_step(method, cfg.model, cfg.lora, cfg.optim,
                                     tuple(sorted(hp_key.items())), cdt,
                                     b.lwf_faithful_zero_kd,
                                     tuple(sorted(freeze_flags(cfg).items())))
    state = PretrainState.create(params, opt)
    eval_step = make_eval_step(cfg.model, cfg.lora, compute_dtype=cdt)

    facc_before = eval_accuracy(eval_step, state.params, test_batches_f())
    best_h = float("-inf")
    rng = jax.random.key(cfg.data.seed)
    batch = 0
    for epoch in range(num_epoch if num_epoch is not None else cfg.num_epoch):
        lr = timm_cosine_lr(cfg.optim, epoch)
        for xf, yf in forget_loader_factory():
            xr, yr = remain_cycler.next()
            if method == "der_plus":
                xr2, yr2 = remain_cycler.next()
            else:
                xr2, yr2 = xr, yr
            rng, sub = jax.random.split(rng)
            xf_, yf_, xr_, yr_, xr2_, yr2_ = put_batch(xf, yf, xr, yr,
                                                       xr2, yr2)
            state, metrics = step(state, teacher_params, xf_, yf_, xr_,
                                  yr_, xr2_, yr2_, jnp.float32(lr), sub)
            if (batch + 1) % cfg.disp_freq == 0:
                logger.log({k: float(v) for k, v in metrics.items()},
                           step=batch)
            if (batch + 1) % cfg.ver_freq == 0:
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
