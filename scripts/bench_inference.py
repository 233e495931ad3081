"""Serving-side throughput: eval-mode forward images/sec on the real TPU.

The reference's only inference probe is test_forward (util/utils.py:144-164,
2000 single-image forwards); real deployment serves batches. This measures
the jitted eval forward (train=False, merged LoRA fold, logits+emb) across
batch sizes for both headline models, one JSON line per point, with the
fwd-FLOP accounting from BASELINE.md (P8S8 7.95, ViT-B/16 35.1 GFLOP/img).

Methodology: K forwards chained in-device (scan + scalar readback;
block_until_ready does not sync on this tunnel), rate = the M=1..3 chain
SLOPE via bench._time_chain (cancels the fixed readback RTT + dispatch
cost, ~4-8% of the old inclusive numbers at these K — VERDICT r4 #5); the
inclusive M=1 rate is reported alongside.

Run: PYTHONPATH=. python scripts/bench_inference.py [--b16] [--k 50]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FWD_GFLOP = {"p8s8": 7.95, "b16": 35.1}  # BASELINE.md round-3 accounting
CEILING_TFLOPS = 161.0  # scripts/roofline_probe round-3 roof


def measure(model, lora, bs: int, k: int, gflop: float) -> dict:
    import jax
    import jax.numpy as jnp

    from bench import _time_chain
    from gslora_tpu.models.vit import init_vit_params, vit_apply

    params = init_vit_params(jax.random.key(0), model, lora,
                             param_dtype=jnp.bfloat16)
    labels = jnp.zeros((bs,), jnp.int32)

    def apply_fn(x):
        logits, _ = vit_apply(params, x, labels, model, lora, train=False,
                              compute_dtype=jnp.bfloat16,
                              lora_apply="merged")
        return logits

    hw = model.image_size
    x = jax.random.normal(jax.random.key(1), (bs, 3, hw, hw), jnp.float32)

    # K forwards chained in-device; the carry feeds each forward (forcing
    # sequential execution, like serving a request stream) and the LAST
    # scan output depends on every step, so reading it syncs the chain.
    # Timing = the bench's M=1..3 chain slope (cancels the fixed readback
    # RTT + dispatch cost — at the labs' K=10-50 the per-chain RTT tax was
    # 4-8% of the old inclusive numbers, VERDICT r4 #5).
    @jax.jit
    def multi(c0, _keys):
        def body(c, _):
            out = apply_fn(x * (1 + c * 1e-12))
            c2 = jnp.sum(out.astype(jnp.float32)) * 1e-9
            return c2, c2
        return jax.lax.scan(body, c0, None, length=k)

    ips, ips_incl = _time_chain(multi, jnp.float32(0.0),
                                jnp.zeros((k,), jnp.float32), bs, k_steps=k)
    return {"batch": bs, "images_per_sec": round(ips, 1),
            "ips_inclusive_readback": round(ips_incl, 1),
            "ms_per_batch": round(bs / ips * 1e3, 2),
            "achieved_tflops": round(ips * gflop / 1e3, 1),
            "mfu_vs_roof": round(ips * gflop / 1e3 / CEILING_TFLOPS, 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b16", action="store_true",
                    help="ViT-B/16 (224px) instead of ViT-P8S8")
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--batches", default="")
    ap.add_argument("--int8", action="store_true",
                    help="W8A8 dynamic quantization of the projection "
                         "GEMMs (gemm_impl='int8')")
    args = ap.parse_args()

    from gslora_tpu.cli.common import setup_jax_runtime
    setup_jax_runtime()
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")

    from gslora_tpu.config import LoraConfig, ViTConfig
    if args.b16:
        model = ViTConfig.vit_b16(num_class=100)
        batches = [32, 64, 128, 256]
        gflop = FWD_GFLOP["b16"]
    else:
        from __graft_entry__ import _flagship_configs
        model, _, _ = _flagship_configs()
        model = dataclasses.replace(model, dropout=0.0, emb_dropout=0.0)
        batches = [64, 128, 240, 512]
        gflop = FWD_GFLOP["p8s8"]
    lora = LoraConfig(rank=8)
    if args.int8:
        model = dataclasses.replace(model, gemm_impl="int8")
    if args.batches:
        batches = [int(b) for b in args.batches.split(",")]

    for bs in batches:
        try:
            r = measure(model, lora, bs, args.k, gflop)
            print(json.dumps({"model": "b16" if args.b16 else "p8s8",
                              "gemm_impl": model.gemm_impl, **r}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"batch": bs, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
