"""HBM footprint report for the compiled train/eval programs.

The reference has no memory accounting at all (OOM discovery is trial and
error on the GPU); XLA exposes the compiled program's exact buffer budget,
so report it per configuration: argument (weights+opt state+batch), output,
and temp (activations/workspace) bytes for the jitted GS-LoRA forget step
and the serving forward, at the bench configs and at scaled batches. This
is the capacity-planning evidence for batch-size headroom and the remat
tradeoff on a 16 GB v5e chip.

Compile-only (lower().compile()): no step execution, safe on the tunneled
chip; the persistent compile cache makes repeat runs cheap.

Run: python scripts/memory_report.py [--variants p8s8_b24,...] [--b16]
"""
from __future__ import annotations

import argparse
import dataclasses
import json


def build_pretrain_args(model, lora, bs: int, grad_accum: int = 1):
    """Full-model pretrain step (the memory-heavy path: moments over ALL
    params, full-batch activations). grad_accum > 1 shows the temp-bytes
    division the lax.scan microbatching buys."""
    import jax
    import jax.numpy as jnp

    from gslora_tpu.config import OptimConfig
    from gslora_tpu.engine.pretrain import PretrainState, make_pretrain_step
    from gslora_tpu.engine.state import make_optimizer
    from gslora_tpu.models.vit import init_vit_params

    params = init_vit_params(jax.random.key(0), model, lora,
                             param_dtype=jnp.bfloat16)
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-3))
    state = PretrainState.create(params, opt)
    step = make_pretrain_step(model, lora, opt, compute_dtype=jnp.bfloat16,
                              grad_accum=grad_accum)
    hw = model.image_size
    x = jnp.zeros((bs, 3, hw, hw), jnp.float32)
    y = jnp.zeros((bs,), jnp.int32)
    return step, (state, x, y, jnp.float32(1e-3), jax.random.key(0))


def build_step_args(model, lora, fcfg, bs: int, train: bool = True,
                    lora_apply: str = "merged", grad_accum: int = 1):
    import jax
    import jax.numpy as jnp

    from gslora_tpu.config import OptimConfig
    from gslora_tpu.engine.forget import make_forget_step
    from gslora_tpu.engine.state import ForgetState, make_optimizer
    from gslora_tpu.models.vit import init_vit_params, vit_apply

    params = init_vit_params(jax.random.key(0), model, lora,
                             param_dtype=jnp.bfloat16)
    hw = model.image_size
    if not train:
        x = jnp.zeros((bs, 3, hw, hw), jnp.float32)

        def fwd(params, x):
            return vit_apply(params, x, None, model, lora, train=False,
                             compute_dtype=jnp.bfloat16)

        return fwd, (params, x)

    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-2))
    state = ForgetState.create(params, opt)
    step = make_forget_step(model, lora, fcfg, opt,
                            compute_dtype=jnp.bfloat16, use_prototype=True,
                            lora_apply=lora_apply, fused_batch=True,
                            grad_accum=grad_accum)
    xf = jnp.zeros((bs, 3, hw, hw), jnp.float32)
    yf = jnp.zeros((bs,), jnp.int32)
    scalars = {k: jnp.float32(v) for k, v in dict(
        beta=0.15, alpha=0.01, lr=1e-2, bnd=110.0, bnd_pro=18.0,
        w_pro_f=0.1, w_pro_r=0.1).items()}
    protos = jnp.zeros((model.num_class, model.dim), jnp.float32)
    return step, (state, xf, yf, xf, yf, protos, scalars,
                  jax.random.key(0))


def report(fn, args) -> dict:
    import jax
    compiled = jax.jit(fn).lower(*args).compile()
    ma = compiled.memory_analysis()
    if ma is None:
        return {"error": "memory_analysis unavailable on this backend"}
    out = {}
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            out[k.replace("_in_bytes", "_mb")] = round(v / 2**20, 1)
    # peak HBM = live arguments + temps (aliases overlap arguments)
    args_b = getattr(ma, "argument_size_in_bytes", 0)
    tmp_b = getattr(ma, "temp_size_in_bytes", 0)
    out_b = getattr(ma, "output_size_in_bytes", 0)
    alias_b = getattr(ma, "alias_size_in_bytes", 0)
    out["peak_hbm_gb"] = round(
        (args_b + tmp_b + out_b - alias_b) / 2**30, 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants",
                    default="p8s8_b24,p8s8_b24_remat,p8s8_b24_fact,"
                            "p8s8_b96,p8s8_b256,p8s8_eval_b128")
    ap.add_argument("--b16", action="store_true",
                    help="also compile the ViT-B/16 variants (slow cold "
                         "compile on the tunnel)")
    args = ap.parse_args()

    from gslora_tpu.cli.common import setup_jax_runtime
    setup_jax_runtime()
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")

    import sys
    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_configs
    from gslora_tpu.config import ViTConfig
    model, lora, fcfg = _flagship_configs()

    variants = args.variants.split(",")
    if args.b16:
        variants += ["b16_b24", "b16_b24_remat", "b16_eval_b64"]
    for v in variants:
        parts = v.split("_")
        m = ViTConfig.vit_b16(num_class=100) if parts[0] == "b16" else model
        train = "eval" not in parts
        # batch token comes AFTER the model token ("b16" itself would
        # match the bNN pattern)
        bs = next((int(p[1:]) for p in parts[1:]
                   if p.startswith("b") and p[1:].isdigit()), 24)
        m = dataclasses.replace(m, remat="remat" in parts)
        la = "factored" if "fact" in parts else "merged"
        # "gaN" token => full-model pretrain step with grad_accum N
        # (e.g. b16_b256_ga8); "pretrain" alone => grad_accum 1;
        # "fgaN" => the dual-batch FORGET step with grad_accum N (the
        # two-phase gate scheme, engine/forget._accum_grads)
        ga = next((int(p[2:]) for p in parts[1:]
                   if p.startswith("ga") and p[2:].isdigit()), None)
        fga = next((int(p[3:]) for p in parts[1:]
                    if p.startswith("fga") and p[3:].isdigit()), None)
        try:
            if fga is not None:
                fn, a = build_step_args(m, lora, fcfg, bs, train=True,
                                        lora_apply=la, grad_accum=fga)
            elif ga is not None or "pretrain" in parts:
                fn, a = build_pretrain_args(m, lora, bs, grad_accum=ga or 1)
            else:
                fn, a = build_step_args(m, lora, fcfg, bs, train=train,
                                        lora_apply=la)
            print(json.dumps({"variant": v, **report(fn, a)}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": v, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
