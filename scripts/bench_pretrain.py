"""Pretrain throughput: images/sec/chip for the FULL-MODEL supervised
pretrain step at the reference recipe batch (VERDICT r3 #6 — the only
BASELINE.json config family that had an HBM row but no measured rate).

Reference recipe: scripts/run_sub.sh:3-6 — ViT-P8S8, CosFace, bs 480,
lr 3e-4 (8 GPUs there; one v5e chip here). Measured at grad_accum 1
(b480 sits at the 16 GB ceiling, memory_report) and ga4/ga16 (the
TPU-native relief), plus the throughput-optimal smaller batch for the
rate headline.

Methodology = bench.py: K steps chained in-device via lax.scan, data
pre-staged on device, scalar host readback as the only reliable sync on
the tunneled platform (DEVNOTES), and the M=1..3 chain SLOPE as the
steady-state rate (cancels the fixed readback RTT + dispatch cost; the
inclusive M=1 rate is reported alongside).

Run: python scripts/bench_pretrain.py [--batches 480] [--ga 1,4,16]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# full-model step work: fwd 7.95 + dx ~8.4 + FULL dW ~7.6 GFLOP/img
# (flops_analysis round-3 accounting; unlike the forget step, pretrain
# differentiates every base kernel, so dW is not partial-evaluated away)
STEP_GFLOP_PER_IMG = 23.9
CEILING_TFLOPS = 161.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="480")
    ap.add_argument("--ga", default="1,4,16")
    ap.add_argument("--k", default=10, type=int)
    a = ap.parse_args()

    from gslora_tpu.cli.common import setup_jax_runtime
    setup_jax_runtime()
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_configs
    from gslora_tpu.config import OptimConfig
    from gslora_tpu.engine.pretrain import PretrainState, make_pretrain_step
    from gslora_tpu.engine.state import make_optimizer
    from gslora_tpu.models.vit import init_vit_params

    model, lora, _ = _flagship_configs()
    results = []
    for bs in [int(b) for b in a.batches.split(",")]:
        x = jax.random.normal(jax.random.key(1), (bs, 3, 112, 112),
                              jnp.float32)
        y = (jnp.arange(bs, dtype=jnp.int32) % model.num_class)
        for ga in [int(g) for g in a.ga.split(",")]:
            params = init_vit_params(jax.random.key(0), model, lora,
                                     param_dtype=jnp.bfloat16)
            opt = make_optimizer(OptimConfig(opt="adamw", lr=3e-4))
            state = PretrainState.create(params, opt)
            step = make_pretrain_step(model, lora, opt,
                                      compute_dtype=jnp.bfloat16,
                                      grad_accum=ga)

            @jax.jit
            def multi(state, keys):
                def body(s, k):
                    s2, m = step(s, x, y, jnp.float32(3e-4), k)
                    return s2, m["loss"]
                return jax.lax.scan(body, state, keys)

            keys = jax.random.split(jax.random.key(7), a.k)
            from bench import _time_chain
            ips, ips_incl = _time_chain(multi, state, keys, bs,
                                        k_steps=a.k)
            tf = ips * STEP_GFLOP_PER_IMG / 1e3
            row = {"batch": bs, "grad_accum": ga,
                   "pretrain_ips_per_chip": round(ips, 1),
                   "ips_inclusive_readback": round(ips_incl, 1),
                   "step_ms": round(bs / ips / jax.device_count() * 1e3, 2),
                   "achieved_tflops": round(tf, 1),
                   "mfu_vs_observed_ceiling": round(tf / CEILING_TFLOPS, 3)}
            results.append(row)
            print(json.dumps(row), flush=True)
    with open("/tmp/bench_pretrain.json", "w") as f:
        json.dump(results, f)


if __name__ == "__main__":
    main()
