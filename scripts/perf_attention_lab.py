"""Attention-utilization lab (VERDICT round-1 item #2).

Measures the FULL jitted forget step (the bench.py workload) under
attention-implementation / batch variants on the real TPU, one JSON line
per variant. Methodology identical to bench.py: K steps chained in one
compiled scan, timing closed by a scalar host readback (DEVNOTES:
block_until_ready does not sync on the tunnel).

Run: python scripts/perf_attention_lab.py [--variants xla,bnhd,...] [--k 20]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEP_GFLOP_PER_IMG = 21.3  # compiled-step accounting (BASELINE.md round 3)
CEILING_TFLOPS = 161.0  # re-probed v5e roof (scripts/roofline_probe, round 3)


def measure(model, lora, fcfg, bs: int, k: int, lora_apply: str = "merged",
            fused_batch: bool = True,
            gflop_per_img: float = STEP_GFLOP_PER_IMG,
            grad_accum: int = 1):
    import jax
    import jax.numpy as jnp

    from gslora_tpu.config import OptimConfig
    from gslora_tpu.engine.forget import make_forget_step
    from gslora_tpu.engine.state import ForgetState, make_optimizer
    from gslora_tpu.models.vit import init_vit_params

    params = init_vit_params(jax.random.key(0), model, lora,
                             param_dtype=jnp.bfloat16)
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-2))
    state = ForgetState.create(params, opt)
    step = make_forget_step(model, lora, fcfg, opt,
                            compute_dtype=jnp.bfloat16, use_prototype=True,
                            lora_apply=lora_apply, fused_batch=fused_batch,
                            grad_accum=grad_accum)
    hw = model.image_size
    xf = jax.random.normal(jax.random.key(1), (bs, 3, hw, hw), jnp.float32)
    yf = jnp.arange(bs, dtype=jnp.int32) % 10 + 90
    xr = jax.random.normal(jax.random.key(2), (bs, 3, hw, hw), jnp.float32)
    yr = jnp.arange(bs, dtype=jnp.int32) % 90
    protos = jax.random.normal(jax.random.key(3),
                               (model.num_class, model.dim), jnp.float32)
    scalars = {kk: jnp.float32(v) for kk, v in dict(
        beta=0.15, alpha=0.01, lr=1e-2, bnd=110.0, bnd_pro=18.0,
        w_pro_f=0.1, w_pro_r=0.1).items()}

    @jax.jit
    def multi(state, keys):
        def body(s, kk):
            s2, m = step(s, xf, yf, xr, yr, protos, scalars, kk)
            return s2, m["loss_total"]
        return jax.lax.scan(body, state, keys)

    keys = jax.random.split(jax.random.key(7), k)
    # slope timing shared with the headline bench (wall(M) = M*k*step + C;
    # the M=1..3 slope cancels the fixed readback RTT + dispatch cost C).
    # ips/ms_per_step keep the lab's historical M=1 inclusive convention
    # so rows stay comparable with the BASELINE.md ablation tables;
    # images_per_sec_slope is the steady-state rate.
    from bench import _time_chain
    ips_slope, ips = _time_chain(multi, state, keys, 2 * bs, k_steps=k)
    return {
        "images_per_sec": round(ips, 1),
        "images_per_sec_slope": round(ips_slope, 1),
        "ms_per_step": round(2 * bs / ips * 1e3, 2),
        "achieved_tflops": round(ips * gflop_per_img / 1e3, 1),
        "mfu_vs_ceiling": round(ips * gflop_per_img / 1e3
                                / CEILING_TFLOPS, 3),
        "achieved_tflops_slope": round(ips_slope * gflop_per_img / 1e3, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="xla,bnhd,dpa,xla_b96,bnhd_b96")
    ap.add_argument("--k", type=int, default=20)
    args = ap.parse_args()

    from gslora_tpu.cli.common import setup_jax_runtime
    setup_jax_runtime()
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")

    from __graft_entry__ import _flagship_configs
    model, lora, fcfg = _flagship_configs()

    for v in args.variants.split(","):
        # grammar: impl[_fact][_bNN][_nodrop] — "fact" switches
        # lora_apply from "merged" (fold B@A into the kernels; backward
        # pays full dW GEMMs for the merged fc1/fc2) to "factored"
        # (skinny low-rank matmuls; partial-eval drops the frozen-base
        # weight-grad GEMMs entirely)
        parts = v.split("_")
        impl = parts[0]
        lora_apply = "factored" if "fact" in parts[1:] else "merged"
        nodrop = "nodrop" in parts[1:]
        bs = next((int(p[1:]) for p in parts[1:]
                   if p.startswith("b") and p[1:].isdigit()), 48)
        unroll = next((int(p[1:]) for p in parts[1:]
                       if p.startswith("u") and p[1:].isdigit()), 1)
        m = dataclasses.replace(model, attn_impl=impl,
                                remat="remat" in parts[1:],
                                scan_unroll=unroll,
                                dropout_impl=("bits16" if "bits" in parts[1:]
                                              else "uniform"),
                                ln_dtype=("bf16" if "lnbf16" in parts[1:]
                                          else "fp32"),
                                gelu_impl=("erf_bf16" if "gelubf16"
                                           in parts[1:] else
                                           "tanh" if "gelutanh" in parts[1:]
                                           else "erf"),
                                **({"dropout": 0.0, "emb_dropout": 0.0}
                                   if nodrop else {}))
        try:
            r = measure(m, lora, fcfg, bs, args.k, lora_apply=lora_apply)
            print(json.dumps({"variant": v, "attn_impl": impl,
                              "lora_apply": lora_apply,
                              "batch_per_stream": bs, **r}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": v, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
