"""LIRF: Learning-to-Impersonate-and-Recover baseline
(baselines/LIRFtrain.py:58-341; 4-model setup train_own_forget_cl.py:330-422).

The reference splits ViT_face into low (first depth//2 blocks, returns the
token sequence, vit_face.py:638-665) and up (remaining blocks + head,
``up=True`` transformer, vit_face.py:755-781) halves as separate modules;
here the split is a ``layer_range`` slice over the stacked block params —
no model surgery:

  student_low : trainable low-half subtree (patch/cls/pos + low blocks) —
                the reference optimizer covers ONLY student_model_low
                (create_optimizer(args, BACKBONE) with BACKBONE =
                student_model_low, train_own_forget_cl.py:811, :418)
  deposit_low : FROZEN low-half subtree — the reference never puts
                deposit_model_low in any optimizer, so it stays at the
                pretrained weights; its KD/CE term (loss_pt_re) is logged
                but has zero gradient w.r.t. anything trainable
  teacher (low+up) : frozen full tree; its upper half and head score
                     everything

All four live ACROSS CL tasks (created once from the pretrained checkpoint
before the reference's task loop, cl.py:330-422, loop at :515) — the CL
driver threads the returned carry into the next task.

Per step over the RELABELED forget loader (cycling remain):
  L = CE(student)·(1-alpha) - 300·AT(student_mid, teacher_mid)
      + 10·KD_T(student[:, split:] vs teacher)·alpha·T^2
      + 0.05·( KD_T(deposit[:, :split] vs teacher)·alpha·T^2
               + CE(deposit)·(1-alpha) )
      + 5·CE(student on remain)
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from gslora_tpu.config import LoraConfig, RunConfig, ViTConfig
from gslora_tpu.engine.evaluate import h_mean
from gslora_tpu.engine.forget import _with_lr
from gslora_tpu.engine.loop import step_cache
from gslora_tpu.engine.schedule import timm_cosine_lr
from gslora_tpu.losses.classification import cross_entropy
from gslora_tpu.losses.distillation import attention_transfer_loss, \
    kd_kl_loss
from gslora_tpu.models.heads import apply_head
from gslora_tpu.models.vit import vit_embed

from flax import struct


@struct.dataclass
class LIRFState:
    student_low: Any  # trainable low-half subtree
    deposit_low: Any  # frozen low-half subtree (not in the optimizer)
    opt_state: Any  # covers student_low ONLY
    step: jax.Array


def low_slice(tree, half: int):
    """The ViT_face_low parameter subset (vit_face.py:638-665): patch
    embedding + CLS + pos-embed + the first ``half`` blocks. Slicing the
    stacked-layer tree keeps optimizer state (and weight decay) scoped to
    exactly what the reference trains."""
    return {"patch": tree["patch"], "cls_token": tree["cls_token"],
            "pos_embed": tree["pos_embed"],
            "blocks": jax.tree.map(lambda a: a[:half], tree["blocks"])}


def _low_tokens(tree, x, model, lora, *, train, rng, cdt):
    """Patchify + first depth//2 blocks -> token sequence (ViT_face_low)."""
    half = model.depth // 2
    return vit_embed({"base": tree, "lora": {}}, x, model, lora, train=train,
                     rng=rng, compute_dtype=cdt, layer_range=(0, half),
                     return_tokens=True)


def _up_logits(teacher_tree, tokens, labels, model, lora, cdt):
    """Upper half + head under the frozen teacher (ViT_face_up)."""
    half = model.depth // 2
    emb = vit_embed({"base": teacher_tree, "lora": {}}, None, model, lora,
                    train=False, compute_dtype=cdt, tokens_in=tokens,
                    layer_range=(half, model.depth))
    return apply_head(model.head_type, teacher_tree["head"], emb, labels), emb


def make_lirf_step(model: ViTConfig, lora: LoraConfig, optimizer,
                   split: int, T: float, alpha: float,
                   compute_dtype=jnp.bfloat16, grad_accum: int = 1):
    """``grad_accum > 1`` microbatches both streams inside the jitted
    step. Every LIRF term is a masked row MEAN over one of the two
    streams (CE/AT/kdKP/pt_re over forget, replay-CE over remain) with no
    batch-global nonlinearity, so the linear-surrogate scheme of
    baselines/distill applies: global valid counts come from the labels
    up front, each micro differentiates masked SUMS divided by those
    counts, and the micro-gradient sum equals the full-batch gradient
    identically (fp32 accumulation; indivisible streams fall back)."""
    cdt = compute_dtype

    def loss_fn(student_low, deposit_low, teacher, xf, yf, xr, yr, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        s_mid = _low_tokens(student_low, xf, model, lora, train=True, rng=r1,
                            cdt=cdt)
        s_final, _ = _up_logits(teacher, s_mid, yf, model, lora, cdt)
        d_mid = _low_tokens(deposit_low, xf, model, lora, train=True, rng=r2,
                            cdt=cdt)
        d_final, _ = _up_logits(teacher, d_mid, yf, model, lora, cdt)
        t_mid = jax.lax.stop_gradient(
            _low_tokens(teacher, xf, model, lora, train=False, rng=None,
                        cdt=cdt))
        t_final, _ = _up_logits(teacher, t_mid, yf, model, lora, cdt)
        t_final = jax.lax.stop_gradient(t_final)

        loss_ce = cross_entropy(s_final, yf) * (1 - alpha)
        loss_at = attention_transfer_loss(s_mid, t_mid, labels=yf)
        kd_kp = kd_kl_loss(s_final[:, split:], t_final[:, split:], T,
                           labels=yf) * alpha
        loss_pt_re = kd_kl_loss(d_final[:, :split], t_final[:, :split], T,
                                labels=yf) * alpha + \
            cross_entropy(d_final, yf) * (1 - alpha)

        sr_mid = _low_tokens(student_low, xr, model, lora, train=True,
                             rng=r3, cdt=cdt)
        sr_final, _ = _up_logits(teacher, sr_mid, yr, model, lora, cdt)
        loss_replay = cross_entropy(sr_final, yr)

        total = loss_ce - 300.0 * loss_at + 10.0 * kd_kp + \
            0.05 * loss_pt_re + 5.0 * loss_replay
        return total, {"loss_CE": loss_ce, "loss_AT": loss_at,
                       "loss_kdKP": kd_kp, "loss_pt_re": loss_pt_re,
                       "loss_remain": loss_replay, "loss_total": total}

    def _micro_sums(student_low, deposit_low, teacher, xf, yf, xr, yr,
                    rng):
        """Masked per-sample SUMS of each term over one microbatch pair
        (each loss is a masked mean with a max(valid,1) denominator, so
        mean * valid == the masked sum exactly)."""
        r1, r2, r3 = jax.random.split(rng, 3)
        vf = jnp.sum((yf >= 0).astype(jnp.float32))
        vr = jnp.sum((yr >= 0).astype(jnp.float32))
        s_mid = _low_tokens(student_low, xf, model, lora, train=True,
                            rng=r1, cdt=cdt)
        s_final, _ = _up_logits(teacher, s_mid, yf, model, lora, cdt)
        d_mid = _low_tokens(deposit_low, xf, model, lora, train=True,
                            rng=r2, cdt=cdt)
        d_final, _ = _up_logits(teacher, d_mid, yf, model, lora, cdt)
        t_mid = jax.lax.stop_gradient(
            _low_tokens(teacher, xf, model, lora, train=False, rng=None,
                        cdt=cdt))
        t_final, _ = _up_logits(teacher, t_mid, yf, model, lora, cdt)
        t_final = jax.lax.stop_gradient(t_final)
        sr_mid = _low_tokens(student_low, xr, model, lora, train=True,
                             rng=r3, cdt=cdt)
        sr_final, _ = _up_logits(teacher, sr_mid, yr, model, lora, cdt)
        return {
            "ce": cross_entropy(s_final, yf) * (1 - alpha) * vf,
            "at": attention_transfer_loss(s_mid, t_mid, labels=yf) * vf,
            "kd_kp": kd_kl_loss(s_final[:, split:], t_final[:, split:], T,
                                labels=yf) * alpha * vf,
            "pt_re": (kd_kl_loss(d_final[:, :split], t_final[:, :split], T,
                                 labels=yf) * alpha +
                      cross_entropy(d_final, yf) * (1 - alpha)) * vf,
            "replay": cross_entropy(sr_final, yr) * vr,
        }

    def _accum_grads(student_low, deposit_low, teacher, xf, yf, xr, yr,
                     rng):
        n = grad_accum
        nf = jnp.maximum(jnp.sum((yf >= 0).astype(jnp.float32)), 1.0)
        nr = jnp.maximum(jnp.sum((yr >= 0).astype(jnp.float32)), 1.0)
        keys = jax.random.split(rng, n)
        xs = tuple(t.reshape(n, t.shape[0] // n, *t.shape[1:])
                   for t in (xf, yf, xr, yr)) + (keys,)

        def surrogate(sl, micro):
            s = _micro_sums(sl, deposit_low, teacher, *micro[:4], micro[4])
            val = (s["ce"] - 300.0 * s["at"] + 10.0 * s["kd_kp"] +
                   0.05 * s["pt_re"]) / nf + 5.0 * s["replay"] / nr
            return val, s

        def body(carry, micro):
            gsum, ssum = carry
            g, s = jax.grad(surrogate, has_aux=True)(student_low, micro)
            gsum = jax.tree.map(lambda c, gi: c + gi.astype(c.dtype),
                                gsum, g)
            return (gsum, jax.tree.map(jnp.add, ssum, s)), None

        gzeros = jax.tree.map(lambda t: jnp.zeros(t.shape, jnp.float32),
                              student_low)
        szeros = jax.tree.map(
            lambda sh: jnp.zeros(sh.shape, sh.dtype),
            jax.eval_shape(lambda m: _micro_sums(student_low, deposit_low,
                                                 teacher, *m[:4], m[4]),
                           jax.tree.map(lambda t: t[0], xs)))
        (gsum, ssum), _ = jax.lax.scan(body, (gzeros, szeros), xs)
        grads = jax.tree.map(lambda g, t: g.astype(t.dtype), gsum,
                             student_low)
        m = {"loss_CE": ssum["ce"] / nf, "loss_AT": ssum["at"] / nf,
             "loss_kdKP": ssum["kd_kp"] / nf,
             "loss_pt_re": ssum["pt_re"] / nf,
             "loss_remain": ssum["replay"] / nr}
        m["loss_total"] = m["loss_CE"] - 300.0 * m["loss_AT"] + \
            10.0 * m["loss_kdKP"] + 0.05 * m["loss_pt_re"] + \
            5.0 * m["loss_remain"]
        return grads, m

    @jax.jit
    def step(state: LIRFState, teacher, xf, yf, xr, yr, lr, rng):
        # gradient w.r.t. student_low ONLY: the reference optimizer covers
        # just student_model_low (cl.py:811); deposit stays pretrained
        if grad_accum > 1 and xf.shape[0] % grad_accum == 0 and \
                xr.shape[0] % grad_accum == 0:
            grads, metrics = _accum_grads(
                state.student_low, state.deposit_low, teacher, xf, yf,
                xr, yr, rng)
        else:
            grads, metrics = jax.grad(loss_fn, has_aux=True)(
                state.student_low, state.deposit_low, teacher, xf, yf,
                xr, yr, rng)
        opt_state = _with_lr(state.opt_state, lr)
        updates, opt_state = optimizer.update(grads, opt_state,
                                              state.student_low)
        s = optax.apply_updates(state.student_low, updates)
        return LIRFState(student_low=s, deposit_low=state.deposit_low,
                         opt_state=opt_state, step=state.step + 1), metrics

    return step


@step_cache
def _cached_lirf_step(model, lora, optim_cfg, split, T, alpha, cdt):
    """(optimizer, jitted step) cached per configuration (shared policy in
    engine.loop.step_cache) — multi-task runs re-use the compiled step
    (opt state is re-initialized per task like the reference's re-created
    optimizer, cl.py:811)."""
    from gslora_tpu.engine.state import make_optimizer
    opt = make_optimizer(optim_cfg)
    return opt, make_lirf_step(model, lora, opt, split=split, T=T,
                               alpha=alpha, compute_dtype=cdt,
                               grad_accum=optim_cfg.grad_accum)


@step_cache
def _make_lirf_eval(model: ViTConfig, lora: LoraConfig, compute_dtype):
    """Cached jitted composed-eval step: rebuilding the closure per call
    would defeat jax.jit's cache and recompile on every eval (minutes on
    tunneled TPUs). Configs are frozen dataclasses, hence hashable."""

    @jax.jit
    def ev(student_low, teacher, x, y):
        mid = _low_tokens(student_low, x, model, lora, train=False, rng=None,
                          cdt=compute_dtype)
        logits, _ = _up_logits(teacher, mid, y, model, lora, compute_dtype)
        pred = jnp.argmax(logits, axis=-1)
        return jnp.sum((pred == y).astype(jnp.int32))

    return ev


def lirf_eval_accuracy(teacher, student_low, batches, model: ViTConfig,
                       lora: LoraConfig, compute_dtype=jnp.bfloat16) -> float:
    """eval_data_LIRF: accuracy of teacher_up(student_low(x))."""
    import numpy as np
    ev = _make_lirf_eval(model, lora, compute_dtype)
    corrects = []
    total = 0
    for x, y in batches:
        corrects.append(ev(student_low, teacher, jnp.asarray(x),
                           jnp.asarray(y)))
        # valid rows only: label -1 is the pad sentinel (mask_padding
        # loaders on TPU/mesh); it never equals an argmax. Counts stay on
        # device until the end (no per-batch RTT).
        total += int((np.asarray(y) >= 0).sum())
    if not corrects:
        return 0.0
    correct = int(sum(corrects[1:], corrects[0]))
    return 100.0 * correct / max(total, 1)


def run_lirf_task(cfg: RunConfig, params, forget_loader_factory: Callable,
                  remain_cycler, test_batches_f: Callable,
                  test_batches_r: Callable, logger=None,
                  num_epoch: Optional[int] = None,
                  test_batches_open: Optional[Callable] = None,
                  mesh=None, carry: Optional[Dict[str, Any]] = None
                  ) -> Dict[str, Any]:
    """One LIRF task. ``carry``: cross-task state dict with keys
    ``teacher``/``student_low``/``deposit_low`` — the reference builds all
    four models ONCE from the pretrained checkpoint before the CL task
    loop (cl.py:330-422) and the student keeps training across tasks, so
    multi-task callers must thread the returned values back in (the CL
    driver does). ``carry=None`` builds them from ``params`` (single-task
    setup). The optimizer state is re-initialized per task either way
    ("create again to reinitialize optimizer", cl.py:811-815)."""
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
    b = cfg.baseline
    half = cfg.model.depth // 2
    if carry is not None:
        teacher = put_params(carry["teacher"])
        student_low = put_params(carry["student_low"])
        deposit_low = put_params(carry["deposit_low"])
    else:
        params = put_params(params)
        teacher = params["base"]
        if params.get("lora"):
            # LIRF operates on a plain backbone (the reference's baselines
            # run lora_rank 0); when handed a LoRA-carrying model, the
            # deployable teacher is the MERGED model — dropping the
            # adapters would start from a silently degraded teacher
            from gslora_tpu.engine.ema import merged_params
            teacher = merged_params(teacher, params["lora"],
                                    cfg.lora.scaling)
        student_low = low_slice(teacher, half)
        deposit_low = low_slice(teacher, half)
    opt, step = _cached_lirf_step(cfg.model, cfg.lora, cfg.optim,
                                  cfg.forget.per_forget_cls, b.lirf_T,
                                  b.lirf_alpha, cdt)
    state = LIRFState(student_low=student_low, deposit_low=deposit_low,
                      opt_state=opt.init(student_low),
                      step=jnp.int32(0))

    facc_before = lirf_eval_accuracy(teacher, state.student_low,
                                     test_batches_f(), cfg.model, cfg.lora,
                                     cdt)
    rng = jax.random.key(cfg.data.seed)
    batch = 0
    best_h = float("-inf")
    for epoch in range(num_epoch if num_epoch is not None else cfg.num_epoch):
        lr = timm_cosine_lr(cfg.optim, epoch)
        for xf, yf in forget_loader_factory():
            xr, yr = remain_cycler.next()
            rng, sub = jax.random.split(rng)
            xf_, yf_, xr_, yr_ = put_batch(xf, yf, xr, yr)
            state, metrics = step(state, teacher, xf_, yf_, xr_, yr_,
                                  jnp.float32(lr), sub)
            if (batch + 1) % cfg.disp_freq == 0:
                logger.log({k: float(v) for k, v in metrics.items()},
                           step=batch)
            batch += 1
        facc = lirf_eval_accuracy(teacher, state.student_low,
                                  test_batches_f(), cfg.model, cfg.lora, cdt)
        racc = lirf_eval_accuracy(teacher, state.student_low,
                                  test_batches_r(), cfg.model, cfg.lora, cdt)
        best_h = max(best_h, h_mean(facc_before, facc, racc, eps=1e-8))

    if (num_epoch if num_epoch is not None else cfg.num_epoch) == 0:
        # zero-epoch call: metrics must still be defined (sibling runners
        # always evaluate after the loop)
        facc = lirf_eval_accuracy(teacher, state.student_low,
                                  test_batches_f(), cfg.model, cfg.lora, cdt)
        racc = lirf_eval_accuracy(teacher, state.student_low,
                                  test_batches_r(), cfg.model, cfg.lora, cdt)
        best_h = max(best_h, h_mean(facc_before, facc, racc, eps=1e-8))
    oacc = lirf_eval_accuracy(teacher, state.student_low,
                              test_batches_open(), cfg.model, cfg.lora,
                              cdt) if test_batches_open else None
    return {"student_low": state.student_low,
            "deposit_low": state.deposit_low, "teacher": teacher,
            "forget_acc_before": facc_before, "forget_acc": facc,
            "remain_acc": racc, "open_acc": oacc, "best_h": best_h}
