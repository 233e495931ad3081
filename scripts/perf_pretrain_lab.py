"""Pretrain dW-backward ablation lab (VERDICT r4 #3).

The full-model pretrain step tops out at 47.3% of the 161 TF/s roof
(b480-ga20, BASELINE.md "Pretrain throughput") vs the forget step's
55.7%. Round 4 inferred the gap lives in the full dW backward (the
optimizer update measured ~0.4 ms); this lab measures each candidate
lever directly at the ga-optimum geometry, plus a decomposition of the
step into forward / backward / optimizer shares.

Variants (grammar: ``gaN_bNNN[_mod...]``):
  carrybf16 — micro-grad scan carry in bf16 instead of fp32 (halves the
              accumulator HBM traffic; numerics measured by --numerics)
  nodrop    — dropout off (isolate mask+apply cost across N micros)
  fwdonly   — loss value only, no backward, no update (forward share)
  gradonly  — grads computed, optimizer update skipped (optimizer share)
  loraonly  — LoRA-only step at the same shapes (partial dW: frozen-base
              weight-grad GEMMs drop out; the full-dW cost by difference)
  softmax   — Softmax head instead of CosFace (head share)
  donate    — donate the chain's input state buffers (aliased in-place
              param/moment update at the program boundary)

--numerics: 5 full steps at b480-ga20 with fp32 vs bf16 carry from the
same init; prints the per-step loss trajectories and the final param
drift (max |delta| / rms) — the evidence for the accum_dtype default.

--gemmprobe: times the exact dW-shaped GEMMs of the micro-24 backward in
both output layouts ((d,m) = x^T@dy vs (m,d) = dy^T@x, contraction over
n tokens) against the roofline, isolating whether a dW transpose layout
lever exists at all outside the full step.

Methodology identical to bench.py: K steps chained in one compiled scan,
M=1..3 chain-slope timing, scalar-readback sync (DEVNOTES: plain
block_until_ready does not sync on the tunnel).

Run: python scripts/perf_pretrain_lab.py [--variants ...] [--numerics]
     [--gemmprobe] [--k 10]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# full-model step work (BASELINE.md round-3 accounting): fwd 7.95 +
# dx ~8.4 + FULL dW ~7.6 GFLOP/img
STEP_GFLOP_PER_IMG = 23.9
FWD_GFLOP_PER_IMG = 7.95
LORA_STEP_GFLOP_PER_IMG = 21.3  # = the forget step's partial-dW accounting
CEILING_TFLOPS = 161.0


def build(bs: int, ga: int, mods, k: int, tiny: bool = False):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_configs
    from gslora_tpu.config import OptimConfig
    from gslora_tpu.engine.pretrain import (PretrainState, _accumulated,
                                            make_pretrain_step)
    from gslora_tpu.engine.state import make_optimizer
    from gslora_tpu.models.vit import init_vit_params

    model, lora, _ = _flagship_configs(tiny=tiny)
    if "nodrop" in mods:
        model = dataclasses.replace(model, dropout=0.0, emb_dropout=0.0)
    if "bits16" in mods:
        model = dataclasses.replace(model, dropout_impl="bits16")
    if "bits32" in mods:
        model = dataclasses.replace(model, dropout_impl="bits32")
    if "bits8" in mods:
        model = dataclasses.replace(model, dropout_impl="bits8")
    if "softmax" in mods:
        model = dataclasses.replace(model, head_type="Softmax")
    hw = model.image_size
    x = jax.random.normal(jax.random.key(1), (bs, 3, hw, hw), jnp.float32)
    y = (jnp.arange(bs, dtype=jnp.int32) % model.num_class)
    params = init_vit_params(jax.random.key(0), model, lora,
                             param_dtype=jnp.bfloat16)
    opt = make_optimizer(OptimConfig(opt="adamw", lr=3e-4))
    lora_only = "loraonly" in mods
    state = PretrainState.create(params, opt, lora_only=lora_only)
    accum_dtype = jnp.bfloat16 if "carrybf16" in mods else jnp.float32

    if "fwdonly" in mods or "gradonly" in mods:
        # decomposition probes share make_pretrain_step's loss_fn shapes
        from gslora_tpu.losses.classification import (cross_entropy,
                                                      top1_accuracy)
        from gslora_tpu.models.vit import vit_apply

        def loss_fn(params, xm, ym, rm):
            logits, _ = vit_apply(params, xm, ym, model, lora, train=True,
                                  rng=rm, compute_dtype=jnp.bfloat16)
            loss = cross_entropy(logits, ym)
            return loss, {"loss": loss, "acc": top1_accuracy(logits, ym)}

        if "fwdonly" in mods:
            def gfn(xm, ym, rm):
                # value only: metrics tree matches the grad path's aux
                return loss_fn(state.params, xm, ym, rm)[1]
        else:
            def gfn(xm, ym, rm):
                return jax.grad(loss_fn, has_aux=True)(
                    state.params, xm, ym, rm)

        acc = _accumulated(gfn, ga, accum_dtype) if ga > 1 else gfn

        @jax.jit
        def step(s, xm, ym, lr, rm):
            out = acc(xm, ym, rm)
            if isinstance(out, tuple):
                g, m = out
                # fold a scalar of the grads into the output so XLA cannot
                # dead-code-eliminate the backward (caught by the CPU smoke:
                # gradonly timed FASTER than fwdonly before this)
                gsum = sum(jnp.sum(t.astype(jnp.float32))
                           for t in jax.tree.leaves(g))
                # 1e-30 (not 0.0): mul-by-zero is algebraically foldable
                m = dict(m, loss=m["loss"] + 1e-30 * gsum)
            else:
                m = out
            return s, m
    else:
        step = make_pretrain_step(model, lora, opt,
                                  compute_dtype=jnp.bfloat16,
                                  lora_only=lora_only, grad_accum=ga,
                                  accum_dtype=accum_dtype)

    def multi_fn(s0, keys):
        def body(s, kk):
            s2, m = step(s, x, y, jnp.float32(3e-4), kk)
            return s2, m["loss"]
        return jax.lax.scan(body, s0, keys)

    # donate: alias the chain's input state into its output (in-place
    # param/moment update at the program boundary). jit argnums: 0=state.
    multi = (jax.jit(multi_fn, donate_argnums=(0,)) if "donate" in mods
             else jax.jit(multi_fn))
    keys = jax.random.split(jax.random.key(7), k)
    return state, multi, keys


def time_donated(multi, state, keys, bs, k, spans=(1, 3), repeats=3):
    """Slope timing for a donated-input chain: each timed run needs a
    fresh (cloned) state because the first chain consumes the donated
    buffers. The clone happens OUTSIDE the timed window and is synced by
    a scalar readback before t0."""
    import jax
    import jax.numpy as jnp

    def clone(s):
        s2 = jax.tree.map(lambda t: t + jnp.zeros((), t.dtype), s)
        # readback sync (block_until_ready unreliable on the tunnel)
        float(jnp.asarray(jax.tree.leaves(s2)[-1]).reshape(-1)[0])
        return s2

    float(multi(clone(state), keys)[1][-1])  # compile
    walls = {}
    for m in spans:
        best = float("inf")
        for _ in range(repeats):
            s = clone(state)
            t0 = time.perf_counter()
            for _ in range(m):
                # rebind: donated input is consumed; thread the output
                s, losses = multi(s, keys)
            float(losses[-1])
            best = min(best, time.perf_counter() - t0)
        walls[m] = best
    m1, m2 = spans
    step_s = (walls[m2] - walls[m1]) / ((m2 - m1) * k)
    incl = m1 * k * bs / walls[m1]
    if step_s <= 0:
        return incl, incl
    slope = bs / step_s
    return (incl, incl) if slope > 1.5 * incl else (slope, incl)


def run_numerics():
    """5 steps at b480-ga20, fp32 vs bf16 carry, same init/data/keys.

    Softmax head + lr 1e-4: CosFace's s=64 logit scale at lr 3e-4 from a
    random init diverges to NaN by step 2 (the recipe ramps it with
    warmup), and a diverging trajectory measures nothing — the carry
    dtype's drift is head-independent."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_configs
    from gslora_tpu.config import OptimConfig
    from gslora_tpu.engine.pretrain import PretrainState, make_pretrain_step
    from gslora_tpu.engine.state import make_optimizer
    from gslora_tpu.models.vit import init_vit_params

    model, lora, _ = _flagship_configs()
    model = dataclasses.replace(model, head_type="Softmax")
    lr = 1e-4
    bs = 480
    x = jax.random.normal(jax.random.key(1), (bs, 3, 112, 112), jnp.float32)
    y = (jnp.arange(bs, dtype=jnp.int32) % model.num_class)
    params = init_vit_params(jax.random.key(0), model, lora,
                             param_dtype=jnp.bfloat16)
    opt = make_optimizer(OptimConfig(opt="adamw", lr=lr))
    out = {}
    for name, dt in [("fp32", jnp.float32), ("bf16", jnp.bfloat16)]:
        step = make_pretrain_step(model, lora, opt,
                                  compute_dtype=jnp.bfloat16,
                                  grad_accum=20, accum_dtype=dt)
        s = PretrainState.create(params, opt)
        losses = []
        for i in range(5):
            s, m = step(s, x, y, jnp.float32(lr), jax.random.key(100 + i))
            losses.append(float(m["loss"]))
        out[name] = (losses, s.params)
    l32, p32 = out["fp32"]
    l16, p16 = out["bf16"]
    deltas = jax.tree.map(
        lambda a, b: np.abs(np.asarray(a, np.float32) -
                            np.asarray(b, np.float32)), p32, p16)
    mags = jax.tree.map(lambda a: np.abs(np.asarray(a, np.float32)), p32)
    max_d = max(float(d.max()) for d in jax.tree.leaves(deltas))
    rms_d = float(np.sqrt(np.mean(np.concatenate(
        [d.ravel() ** 2 for d in jax.tree.leaves(deltas)]))))
    rms_p = float(np.sqrt(np.mean(np.concatenate(
        [m.ravel() ** 2 for m in jax.tree.leaves(mags)]))))
    print(json.dumps({
        "probe": "numerics_carry_dtype", "steps": 5, "ga": 20,
        "loss_fp32": [round(v, 5) for v in l32],
        "loss_bf16": [round(v, 5) for v in l16],
        "max_rel_loss_delta": round(max(
            abs(a - b) / max(abs(a), 1e-9) for a, b in zip(l32, l16)), 6),
        "param_drift_max_abs": float(f"{max_d:.3e}"),
        "param_drift_rms": float(f"{rms_d:.3e}"),
        "param_rms": float(f"{rms_p:.3e}")}), flush=True)


def run_gemmprobe(k: int = 2000):
    """The micro-24 backward's dW GEMMs in both output layouts, timed as
    standalone chained kernels vs the roof. n = 24*197 tokens.

    k must be large enough that k GEMMs dwarf the fixed per-chain host
    dispatch (~27 ms on the tunnel): the first cut at k=40 measured a
    flat ~680 us/GEMM for every shape — pure dispatch. The perturbation
    is ADDITIVE (``xact + cc``): a scalar MULTIPLY distributes through
    the dot, so XLA hoists the GEMM out of the scan as loop-invariant."""
    import jax
    import jax.numpy as jnp

    from bench import _time_chain

    n = 24 * 197
    shapes = [  # (name, k_in, m_out) of the P8S8 dW family at micro-24
        ("fc1", 512, 2048), ("fc2", 2048, 512), ("qkv", 512, 1536),
        ("proj", 512, 512), ("patch", 192, 512)]
    for name, d_in, d_out in shapes:
        xact = jax.random.normal(jax.random.key(1), (n, d_in), jnp.bfloat16)
        dy = jax.random.normal(jax.random.key(2), (n, d_out), jnp.bfloat16)
        for layout in ("dm", "md"):
            @jax.jit
            def chain(c, _keys, xact=xact, dy=dy, layout=layout):
                def body(cc, _):
                    xx = xact + cc.astype(jnp.bfloat16)
                    if layout == "dm":
                        w = xx.T @ dy          # (d_in, d_out)
                    else:
                        w = (dy.T @ xx).T      # (d_out, d_in) then view
                    c2 = jnp.sum(w.astype(jnp.float32)) * 1e-12
                    return c2, c2
                return jax.lax.scan(body, c, None, length=k)

            gflop = 2 * n * d_in * d_out / 1e9
            ips, _ = _time_chain(chain, jnp.float32(0.0),
                                 jnp.zeros((k,)), 1, k_steps=k)
            # ips = "1 item"/sec -> seconds per GEMM = 1/ips
            tfs = gflop * ips / 1e3
            print(json.dumps({
                "probe": "dw_gemm", "gemm": name, "layout": layout,
                "n_tokens": n, "gflop": round(gflop, 2),
                "us_per_gemm": round(1e6 / ips, 1),
                "achieved_tflops": round(tfs, 1),
                "pct_of_roof": round(100 * tfs / CEILING_TFLOPS, 1)}),
                flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=(
        "ga20_b480,ga20_b480_carrybf16,ga20_b480_nodrop,ga20_b480_donate,"
        "ga20_b480_fwdonly,ga20_b480_gradonly,ga20_b480_loraonly,"
        "ga20_b480_softmax,ga15_b480,ga10_b480,ga1_b24,ga1_b24_donate"))
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--numerics", action="store_true")
    ap.add_argument("--gemmprobe", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model (CPU logic smoke, not a perf number)")
    a = ap.parse_args()

    from gslora_tpu.cli.common import setup_jax_runtime
    setup_jax_runtime()
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")

    if a.numerics:
        run_numerics()
        return
    if a.gemmprobe:
        run_gemmprobe()
        return

    from bench import _time_chain
    for v in a.variants.split(","):
        parts = v.split("_")
        ga = int(parts[0][2:])
        bs = int(parts[1][1:])
        mods = parts[2:]
        gflop = (FWD_GFLOP_PER_IMG if "fwdonly" in mods else
                 LORA_STEP_GFLOP_PER_IMG if "loraonly" in mods else
                 STEP_GFLOP_PER_IMG)
        try:
            state, multi, keys = build(bs, ga, mods, a.k, tiny=a.tiny)
            if "donate" in mods:
                ips, incl = time_donated(multi, state, keys, bs, a.k)
            else:
                ips, incl = _time_chain(multi, state, keys, bs, k_steps=a.k)
            tf = ips * gflop / 1e3
            print(json.dumps({
                "variant": v, "batch": bs, "ga": ga,
                "ips_slope": round(ips, 1), "ips_inclusive": round(incl, 1),
                "ms_per_step": round(bs / ips * 1e3, 2),
                "achieved_tflops": round(tf, 1),
                "pct_of_roof": round(100 * tf / CEILING_TFLOPS, 1)}),
                flush=True)
        except Exception as e:
            print(json.dumps({"variant": v, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
