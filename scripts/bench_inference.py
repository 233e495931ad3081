"""Serving-side throughput: eval-mode forward images/sec on the real TPU.

The reference's only inference probe is test_forward (util/utils.py:144-164,
2000 single-image forwards); real deployment serves batches. This measures
the jitted eval forward (train=False, merged LoRA fold, logits+emb) across
batch sizes for both headline models, one JSON line per point, with the
fwd-FLOP accounting from BASELINE.md (P8S8 7.95, ViT-B/16 35.1 GFLOP/img).

Methodology: K forwards chained in-device (utils.profiling.forward_throughput
— scan + scalar readback; block_until_ready does not sync on this tunnel).

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

    from gslora_tpu.models.vit import init_vit_params, vit_apply
    from gslora_tpu.utils.profiling import forward_throughput

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
    best = 0.0
    for _ in range(3):
        best = max(best, forward_throughput(apply_fn, x, iters=k))
    return {"batch": bs, "images_per_sec": round(best, 1),
            "ms_per_batch": round(bs / best * 1e3, 2),
            "achieved_tflops": round(best * gflop / 1e3, 1),
            "mfu_vs_roof": round(best * gflop / 1e3 / CEILING_TFLOPS, 3)}


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
