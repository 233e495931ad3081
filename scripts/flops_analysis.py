"""Authoritative per-step FLOP accounting via XLA cost analysis.

Round-2 reported ViT-B/16 at "56% of ceiling" using 52.5 GFLOP/img — but
that denominator came from the literature's 17.6 "GFLOPs" for ViT-B/16,
which counts MACs, and ignored that the frozen-base training step skips
every dW GEMM except the LoRA-carrying FFN kernels (partial eval). This
script compiles the REAL train steps on CPU (the HLO and its FLOP count
are platform-independent at this level) and prints XLA's own cost
analysis, next to the analytic derivation, so every TF/s / MFU number in
BASELINE.md rests on the compiler's count rather than a hand estimate.

Run: python scripts/flops_analysis.py   (CPU only; safe next to TPU jobs)
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp

from gslora_tpu.config import ForgetConfig, LoraConfig, OptimConfig, ViTConfig
from gslora_tpu.engine.forget import make_forget_step
from gslora_tpu.engine.state import ForgetState, make_optimizer
from gslora_tpu.models.vit import init_vit_params


def step_flops(model: ViTConfig, lora: LoraConfig, bs: int,
               lora_apply: str) -> float:
    fcfg = ForgetConfig(bnd=110.0, beta=0.15, alpha=0.01, alpha_epoch=0)
    params = init_vit_params(jax.random.key(0), model, lora,
                             param_dtype=jnp.bfloat16)
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-2))
    state = ForgetState.create(params, opt)
    step = make_forget_step(model, lora, fcfg, opt,
                            compute_dtype=jnp.bfloat16, use_prototype=True,
                            lora_apply=lora_apply, fused_batch=True)
    hw = model.image_size
    xf = jnp.zeros((bs, 3, hw, hw), jnp.float32)
    yf = jnp.zeros((bs,), jnp.int32)
    protos = jnp.zeros((model.num_class, model.dim), jnp.float32)
    sc = {k: jnp.float32(v) for k, v in dict(
        beta=0.15, alpha=0.01, lr=1e-2, bnd=110.0, bnd_pro=18.0,
        w_pro_f=0.1, w_pro_r=0.1).items()}
    lowered = jax.jit(step).lower(state, xf, yf, xf, yf, protos, sc,
                                  jax.random.key(0))
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost["flops"])


def main():
    p8s8 = ViTConfig()  # flagship defaults
    b16 = ViTConfig.vit_b16(num_class=100)
    lora = LoraConfig(rank=8)
    out = {}
    for name, model, bs in (("p8s8", p8s8, 48), ("vit_b16", b16, 24)):
        for apply_ in ("merged", "factored"):
            f = step_flops(model, lora, bs, apply_)
            per_img = f / (2 * bs)
            out[f"{name}_{apply_}"] = {
                "step_gflop": round(f / 1e9, 1),
                "gflop_per_img": round(per_img / 1e9, 2),
            }
            print(json.dumps({f"{name}_{apply_}": out[f"{name}_{apply_}"]}),
                  flush=True)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
