"""Train state: frozen base + trainable LoRA + optimizer state.

The reference freezes via loralib ``mark_only_lora_as_trainable``
(train_own_forget.py:650-651); here the optimizer simply only ever sees the
``lora`` subtree — the base pytree is carried untouched through the step.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from gslora_tpu.config import OptimConfig


@struct.dataclass
class ForgetState:
    base: Any  # backbone + head params (frozen unless trainable="base")
    lora: Any  # trainable stacked LoRA tree
    opt_state: Any
    step: jax.Array  # int32 global step

    @classmethod
    def create(cls, params, optimizer,
               trainable: str = "lora") -> "ForgetState":
        """``trainable``: "lora" (default — mark_only_lora_as_trainable
        semantics) or "base" (rank 0: the reference trains ALL parameters,
        train_own_forget_open.py:699-706)."""
        import jax.numpy as jnp
        sub = params["base"] if trainable == "base" else params["lora"]
        return cls(base=params["base"], lora=params["lora"],
                   opt_state=optimizer.init(sub),
                   step=jnp.int32(0))

    @property
    def params(self):
        return {"base": self.base, "lora": self.lora}


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    """timm-style optimizer factory (util/args.py --opt; adamw default).
    Wrapped in inject_hyperparams so the per-epoch LR (engine.schedule) can
    be written into opt_state as a traced scalar — no recompiles."""
    # Only learning_rate is actually scheduled, so everything else is
    # static_args: inject_hyperparams otherwise stores b1/b2/eps as arrays
    # and casts them to the params' dtype at update time — with bfloat16
    # params b2=0.999 rounds to exactly 1.0 -> the Adam bias correction
    # 1-b2^t is 0 -> division by zero -> every update NaN on the FIRST
    # step (root-caused via perf_pretrain_lab --numerics, round 5;
    # regression: tests/test_optimizer_parity.py::test_bf16_params_adamw*).
    # Static python floats keep the moments in the params' dtype (no
    # promotion — lax.scan chains carry the opt state, so moment dtypes
    # must be update-stable) while hyperparam_dtype pins the injected lr
    # to exact fp32 (updates promote to fp32; optax.apply_updates casts
    # them back to the param dtype).
    if cfg.opt == "adamw":
        return optax.inject_hyperparams(
            optax.adamw,
            static_args=("b1", "b2", "eps", "eps_root", "weight_decay"),
            hyperparam_dtype=jnp.float32)(
            learning_rate=cfg.lr, b1=cfg.betas[0], b2=cfg.betas[1],
            eps=cfg.opt_eps, weight_decay=cfg.weight_decay)
    # torch-style COUPLED weight decay for the non-adamw family: the decay
    # term joins the gradient BEFORE momentum / moment accumulation
    # (torch.optim.SGD/Adam/RMSprop semantics — the reference passes
    # weight_decay to all three, e.g. the SCRUB sgda optimizers at
    # train_own_forget_cl.py:860-879)
    def _coupled(make_inner):
        def factory(learning_rate):
            inner = make_inner(learning_rate)
            if cfg.weight_decay:
                return optax.chain(
                    optax.add_decayed_weights(cfg.weight_decay), inner)
            return inner
        # fp32 hyperparams for the same bf16-params reason as adamw above
        # (adam's b2 lives inside the inner transform here, but the
        # injected learning_rate would still round to bf16)
        return optax.inject_hyperparams(
            factory, hyperparam_dtype=jnp.float32)(learning_rate=cfg.lr)

    if cfg.opt == "adam":
        return _coupled(lambda lr: optax.adam(
            lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.opt_eps))
    if cfg.opt == "sgd":
        return _coupled(lambda lr: optax.sgd(lr, momentum=cfg.momentum))
    if cfg.opt == "rmsprop":
        return _coupled(lambda lr: optax.rmsprop(lr, momentum=cfg.momentum))
    raise ValueError(f"unknown optimizer {cfg.opt}")


