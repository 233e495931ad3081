"""Single-step GS-LoRA(++) training orchestration.

The L4/L5 engine+driver of the reference (engine.py:13-433 +
train_own_forget.py:722-826) re-shaped around one jitted step:

* dual-stream epochs: the LONGER stream drives the epoch, the shorter one
  cycles mid-epoch (engine.py:53/237 branch on few_shot + loader lengths;
  cycling via data_prefetcher re-creation engine.py:416-421);
* eval on test forget/remain every VER_FREQ batches with H-mean-gated
  checkpointing (engine.py:381-409);
* per-epoch alpha-warmup/beta-decay and timm cosine LR, passed into the
  compiled step as traced scalars;
* EMA of the merged model after ema_epoch (train_own_forget.py:783-826).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from gslora_tpu.checkpoints.io import BestHCheckpointer
from gslora_tpu.config import RunConfig
from gslora_tpu.data.folders import Dataset
from gslora_tpu.data.pipeline import BatchLoader, CyclingLoader, \
    DevicePrefetcher
from gslora_tpu.engine.ema import ema_init, ema_update
from gslora_tpu.engine.evaluate import eval_accuracy, h_mean, make_eval_step
from gslora_tpu.engine.forget import make_forget_step, scalars_for_epoch
from gslora_tpu.engine.prototypes import calculate_prototypes
from gslora_tpu.engine.schedule import timm_cosine_lr
from gslora_tpu.engine.state import ForgetState, make_optimizer
from gslora_tpu.lora.core import lora_group_norms
from gslora_tpu.metrics.logging import MetricLogger


@dataclass
class ForgetData:
    train_forget: Dataset
    train_remain: Dataset
    test_forget: Dataset
    test_remain: Dataset
    test_open: Optional[Dataset] = None


@dataclass
class ForgetResult:
    state: Any
    best_h: float
    forget_acc_before: float
    forget_acc: float
    remain_acc: float
    open_acc: Optional[float] = None
    norm_list: List[float] = field(default_factory=list)
    ema: Any = None
    history: List[Dict] = field(default_factory=list)
    wallclock_s: float = 0.0  # time-to-forget (BASELINE.json metric)


def _dtype(cfg: RunConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def step_cache(builder):
    """Shared cache policy for (optimizer, jitted step) builders — one
    compiled step per frozen-config key so multi-task CL runs don't pay a
    fresh XLA compile per task (minutes on tunneled TPUs). Every engine /
    baseline cached-step builder uses this one decorator so the caching
    contract (size, keying rules: hashable frozen dataclasses + scalars
    only) lives in one place.

    The trace-time SPMD registry identity (pipeline + sequence sharding,
    parallel.mesh.spmd_cache_key) is folded into the key automatically:
    every builder here jits a step whose trace reads those registries, so
    two runs differing only in pp/pp_micro/sp must not share a traced
    step."""
    cached = functools.lru_cache(maxsize=16)(
        lambda _spmd_key, args, kwargs: builder(*args, **dict(kwargs)))

    @functools.wraps(builder)
    def wrapper(*args, **kwargs):
        from gslora_tpu.parallel.mesh import spmd_cache_key
        return cached(spmd_cache_key(), args,
                      tuple(sorted(kwargs.items())))

    return wrapper


@step_cache
def _cached_step(model, lora, fcfg, optim_cfg, cdt, lora_apply,
                 structure_mode, fused_batch, trainable):
    """(optimizer, jitted step) cached per configuration: a 4-task CL run
    otherwise rebuilds the step closure per task and pays a fresh XLA
    compile each time (minutes on tunneled TPUs). All keys are frozen
    dataclasses / strings, hence hashable (step_cache adds the SPMD
    registry key)."""
    opt = make_optimizer(optim_cfg)
    step = make_forget_step(model, lora, fcfg, opt, compute_dtype=cdt,
                            lora_apply=lora_apply,
                            structure_mode=structure_mode,
                            fused_batch=fused_batch, trainable=trainable,
                            grad_accum=optim_cfg.grad_accum)
    return opt, step


def run_forget_training(cfg: RunConfig, params, data: ForgetData,
                        logger: Optional[MetricLogger] = None,
                        workdir: Optional[str] = None,
                        protos: Optional[jax.Array] = None,
                        beta: Optional[float] = None,
                        pro_f_weight: Optional[float] = None,
                        seed_offset: int = 0, mesh=None,
                        h_eps: float = 0.0,
                        continual: bool = False) -> ForgetResult:
    """``mesh``: optional jax.sharding.Mesh — params replicate, train
    batches shard over the ``data`` axis (XLA all-reduces LoRA grads over
    ICI). Single-device runs pass None.

    ``continual``: select the engine_cl semantics for a CL task — the
    remain loader ALWAYS drives the epoch (engine_cl.py:50-60; the
    few-shot forget-drives branch is engine.py:53 single-step only) and
    the structure loss has no bare alpha_epoch gate."""
    model, lora, fcfg = cfg.model, cfg.lora, cfg.forget
    cdt = _dtype(cfg)
    logger = logger or MetricLogger()
    seed = cfg.data.seed + seed_offset

    batch_sh = None
    from gslora_tpu.parallel.mesh import placement, set_attention_mesh
    set_attention_mesh(mesh)  # pallas attention shards per-device under it
    if mesh is not None and (cfg.mesh.tp or cfg.mesh.pp) and \
            cfg.structure_mode == "prox" and \
            mesh.shape.get("model", 1) > 1:
        # the prox step applies a Mosaic kernel directly to the LoRA
        # factors; under tp/pp those are model-axis-sharded and a Mosaic
        # custom call has no GSPMD partitioning rule (with a model axis of
        # 1 the factors stay replicated and prox works — placement() also
        # rejects tp/pp there as a no-op)
        raise ValueError("structure_mode='prox' is incompatible with "
                         "MeshConfig.tp/.pp — use the default 'loss' mode")
    put_params, _ = placement(mesh, tp=cfg.mesh.tp, fsdp=cfg.mesh.fsdp,
                              pp=cfg.mesh.pp, pp_micro=cfg.mesh.pp_micro,
                              sp=cfg.mesh.sp)
    params = put_params(params)  # replicate; head over `model` axis if >1
    if mesh is not None:
        from gslora_tpu.parallel.mesh import batch_sharding
        batch_sh = batch_sharding(mesh)

    # Static batch shapes on TPU / under a mesh: every ragged tail shape
    # costs a fresh XLA compile (minutes on tunneled platforms) and breaks
    # data-axis divisibility. Pad with label -1 sentinels that every loss/
    # accuracy reduction masks (no double-weighting of wrapped samples).
    # CPU single-device runs keep reference-faithful ragged tails.
    auto_pad = mesh is not None or jax.default_backend() != "cpu"
    u8 = cfg.data.uint8_transfer
    from gslora_tpu.parallel.mesh import check_batch_divisible
    check_batch_divisible(mesh, cfg.data.batch_size)

    def put_batch(x, y):
        if batch_sh is not None:
            return (jax.device_put(jnp.asarray(x), batch_sh),
                    jax.device_put(jnp.asarray(y), batch_sh))
        return jnp.asarray(x), jnp.asarray(y)

    # lora_rank 0 → the reference trains ALL parameters under the same
    # dual-batch loss ("train all parameters",
    # train_own_forget_open.py:699-706 — the open-set recipe path)
    trainable = "lora" if params.get("lora") else "base"
    # step_cache folds the SPMD registry (pipeline/sequence sharding,
    # registered by placement() above) into the cache key
    opt, step_fn = _cached_step(model, lora, fcfg, cfg.optim, cdt,
                                cfg.lora_apply, cfg.structure_mode,
                                cfg.fused_batch, trainable)
    state = ForgetState.create(params, opt, trainable=trainable)
    eval_step = make_eval_step(model, lora, compute_dtype=cdt)

    # prototypes from the *pretrained* model over forget ∪ remain subsets
    # (train_own_forget.py:591-611)
    if fcfg.prototype and protos is None:
        proto_batches = list(BatchLoader(data.train_forget, cfg.data.batch_size,
                                         shuffle=False, prefetch=0,
                                         mask_padding=auto_pad,
                                         uint8_transfer=u8)) + \
            list(BatchLoader(data.train_remain, cfg.data.batch_size,
                             shuffle=False, prefetch=0,
                             mask_padding=auto_pad, uint8_transfer=u8))
        protos = calculate_prototypes(
            params, proto_batches, model, lora, model.num_class,
            compute_dtype=cdt,
            aug_repeat=20 if fcfg.aug_num > 0 else 0, seed=seed,
            aug_magnitude=fcfg.aug_num)  # magnitude=aug_num (utils.py:511)
    if protos is None:
        protos = jnp.zeros((model.num_class, model.dim), jnp.float32)

    bs = cfg.data.batch_size
    test_bs = bs * cfg.data.test_batch_scale
    loader_f = BatchLoader(data.train_forget, bs, seed=seed,
                           mask_padding=auto_pad, uint8_transfer=u8)
    loader_r = BatchLoader(data.train_remain, bs, seed=seed + 1,
                           mask_padding=auto_pad, uint8_transfer=u8)
    test_batches_f = lambda: BatchLoader(data.test_forget, test_bs,  # noqa: E731
                                         shuffle=False, prefetch=0,
                                         mask_padding=auto_pad,
                                         uint8_transfer=u8)
    test_batches_r = lambda: BatchLoader(data.test_remain, test_bs,  # noqa: E731
                                         shuffle=False, prefetch=0,
                                         mask_padding=auto_pad,
                                         uint8_transfer=u8)

    forget_acc_before = eval_accuracy(eval_step, state.params,
                                      test_batches_f())
    remain_acc_before = eval_accuracy(eval_step, state.params,
                                      test_batches_r())
    logger.log({"forget_acc_before": forget_acc_before,
                "remain_acc_before": remain_acc_before}, step=0)

    # async saves on accelerators: the loop never blocks on checkpoint IO
    ckpt = BestHCheckpointer(workdir, name=cfg.net,
                             async_save=jax.default_backend() != "cpu") \
        if workdir else None
    if ckpt:
        ckpt.save_config(cfg.to_json())

    # single-step: the longer stream drives the epoch (engine.py:53);
    # continual: remain always drives (engine_cl.py:50-60)
    forget_drives = (not continual and fcfg.few_shot and
                     len(loader_f) > len(loader_r))

    rng = jax.random.key(seed)
    batch = 0
    best_h = 0.0  # reference highest_H_mean init (train_own_forget.py:548)
    last = {"forget_acc": forget_acc_before, "remain_acc": remain_acc_before,
            "open_acc": None}
    ema = None
    history: List[Dict] = []

    def run_eval(epoch):
        nonlocal best_h
        facc = eval_accuracy(eval_step, state.params, test_batches_f())
        racc = eval_accuracy(eval_step, state.params, test_batches_r())
        oacc = None
        if data.test_open is not None:
            oacc = eval_accuracy(
                eval_step, state.params,
                BatchLoader(data.test_open, test_bs, shuffle=False,
                            prefetch=0, mask_padding=auto_pad,
                            uint8_transfer=u8))
        h = h_mean(forget_acc_before, facc, racc, eps=h_eps)
        payload = {"Test forget Accuracy": facc, "Test remain Accuracy": racc,
                   "H_mean": h}
        if oacc is not None:
            payload["Test open Accuracy"] = oacc
        logger.log(payload, step=batch)
        if h > best_h:
            best_h = h
            if ckpt:
                ckpt.maybe_save(h, state.params, epoch, batch)
        last.update(forget_acc=facc, remain_acc=racc, open_acc=oacc)
        history.append({"epoch": epoch, "batch": batch, **payload})

    import time as _time
    run_t0 = _time.perf_counter()
    for epoch in range(cfg.num_epoch):
        lr = timm_cosine_lr(cfg.optim, epoch)
        scalars = scalars_for_epoch(cfg, epoch, lr=lr, beta=beta,
                                    w_pro_f=pro_f_weight,
                                    continual=continual)
        ep_t0, ep_images = _time.perf_counter(), 0
        if forget_drives:
            driver, cycler = loader_f, CyclingLoader(loader_r)
        else:
            driver, cycler = loader_r, CyclingLoader(loader_f)
        # the driver stream stays 2 batches ahead ON DEVICE (async H2D
        # overlaps the previous step — the CUDA-stream prefetcher analogue)
        for xd, yd in DevicePrefetcher(iter(driver), depth=2,
                                       sharding=batch_sh):
            xc, yc = cycler.next()
            if forget_drives:
                xf, yf, xr, yr = xd, yd, xc, yc
            else:
                xf, yf, xr, yr = xc, yc, xd, yd
            rng, sub = jax.random.split(rng)
            xf, yf = put_batch(xf, yf)
            xr, yr = put_batch(xr, yr)
            state, metrics = step_fn(state, xf, yf, xr, yr, protos, scalars,
                                     sub)
            if (batch + 1) % cfg.disp_freq == 0:
                logger.log({k: float(v) for k, v in metrics.items()},
                           step=batch)
            if (batch + 1) % cfg.ver_freq == 0:
                run_eval(epoch)
            batch += 1
            ep_images += int(xf.shape[0]) + int(xr.shape[0])
        # per-epoch throughput tap (SURVEY §5.1: images/sec/chip headline)
        dt = _time.perf_counter() - ep_t0
        if dt > 0 and ep_images:
            logger.log({"images_per_sec": ep_images / dt,
                        "epoch": epoch, "lr": lr}, step=batch)

        # EMA of the merged model (train_own_forget.py:783-826)
        if fcfg.average_weight:
            if epoch == fcfg.ema_epoch:
                ema = ema_init(state.base, state.lora, lora.scaling)
            elif epoch > fcfg.ema_epoch and ema is not None:
                ema = ema_update(ema, state.base, state.lora, lora.scaling,
                                 fcfg.ema_decay)
            if ema is not None:
                ema_params = {"base": ema, "lora": {}}
                logger.log({
                    "Test forget-ema Accuracy": eval_accuracy(
                        eval_step, ema_params, test_batches_f()),
                    "Test remain-ema Accuracy": eval_accuracy(
                        eval_step, ema_params, test_batches_r()),
                }, step=batch)

    run_eval(cfg.num_epoch - 1)
    if ckpt:
        ckpt.wait()  # drain any in-flight async save before returning
    norms = lora_group_norms(state.lora, fcfg.group_pos)
    logger.log({f"norm_group_{i}": n for i, n in enumerate(norms)},
               step=batch)
    return ForgetResult(
        state=state, best_h=best_h, forget_acc_before=forget_acc_before,
        forget_acc=last["forget_acc"], remain_acc=last["remain_acc"],
        open_acc=last["open_acc"], norm_list=norms, ema=ema, history=history,
        wallclock_s=_time.perf_counter() - run_t0)
