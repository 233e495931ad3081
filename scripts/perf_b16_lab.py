"""ViT-B/16 perf campaign (VERDICT round-2 item #2).

The ImageNet-100 path (reference modified_VIT.py:5-39 +
scripts/run_cl_forget_image.sh: torchvision ViT-B/16, 224 px, rank-8 FFN
LoRA) got none of the P8S8 optimization discipline in rounds 1-2 (714
img/s at the round-2 start; 1005 img/s = 94 TF/s = 58% of the corrected
161 TF/s roof after the scan-unroll campaign — BASELINE.md). This lab
runs the same ablation grid on the FULL forget train step at dim 768:

  batch sweep (16/24/32/48 per stream), fused_batch on/off, dropout
  ablation, merged vs factored LoRA apply, attention impls at dim-768,
  conv(soft-split) vs reshape patchify, remat.

Methodology identical to perf_attention_lab.measure: K steps chained in
one compiled lax.scan, timing closed by a scalar host readback (DEVNOTES:
block_until_ready does not sync on the tunnel). One JSON line per variant.

Run: python scripts/perf_b16_lab.py [--variants a,b,c] [--k 10]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ViT-B/16 @224 merged LoRA train step: ~93.7 GFLOP/img (XLA cost
# analysis via scripts/flops_analysis — fwd ~35.1 GFLOP/img; the
# literature's "17.6 GFLOPs" counts MACs). Round 2 used 52.5 (3x a
# MAC-based fwd guess); corrected with the round-3 FLOP audit so the
# lab's achieved_tflops/mfu agree with BASELINE.md/DEVNOTES.
B16_GFLOP_PER_IMG = 93.7


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=(
        "auto_b16,auto_b24,auto_b32,auto_b48,"
        "xla_b24,bnhd_b24,dpa_b24,pallas_b24,"
        "auto_b24_fact,auto_b24_nodrop,auto_b24_nofuse,"
        "auto_b24_reshape,auto_b24_remat"))
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from gslora_tpu.cli.common import setup_jax_runtime
    setup_jax_runtime()
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")

    import sys
    sys.path.insert(0, ".")
    from perf_attention_lab import measure  # noqa: E402
    from gslora_tpu.config import ForgetConfig, LoraConfig, ViTConfig

    base = ViTConfig.vit_b16(num_class=100)
    lora = LoraConfig(rank=8)
    fcfg = ForgetConfig(bnd=110.0, beta=0.15, alpha=0.01, alpha_epoch=0)

    for v in args.variants.split(","):
        parts = v.split("_")
        impl = parts[0]
        mods = parts[1:]
        bs = next((int(p[1:]) for p in mods
                   if p.startswith("b") and p[1:].isdigit()), 24)
        over = {"attn_impl": impl}
        if "nodrop" in mods:
            over.update(dropout=0.0, emb_dropout=0.0)
        if "reshape" in mods:
            # non-overlapping p=16 conv == plain reshape patchify up to an
            # input-channel permutation of patch_to_embedding: same FLOPs,
            # different layout path (rearrange vs conv patches)
            over.update(soft_split=False)
        if "remat" in mods:
            over.update(remat=True)
        unroll = next((int(p[1:]) for p in mods
                       if p.startswith("u") and p[1:].isdigit()), 1)
        over.update(scan_unroll=unroll)
        # fgaN: per-stream grad accumulation inside the forget step (the
        # round-4 two-phase gate scheme) — the VERDICT r4 #8 row family:
        # does the P8S8 b480-ga20 throughput win transfer to the 86M-param
        # B/16, whose HBM pressure is higher (9.83 GB at b64/stream)?
        ga = next((int(p[3:]) for p in mods
                   if p.startswith("fga") and p[3:].isdigit()), 1)
        m = dataclasses.replace(base, **over)
        try:
            r = measure(m, lora, fcfg, bs, args.k,
                        lora_apply="factored" if "fact" in mods
                        else "merged",
                        fused_batch="nofuse" not in mods,
                        gflop_per_img=B16_GFLOP_PER_IMG,
                        grad_accum=ga)
            print(json.dumps({"variant": v, "batch_per_stream": bs, **r}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"variant": v, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
