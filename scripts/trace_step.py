"""Per-op device trace of the flagship forget step (VERDICT r3 #4).

STATUS: documented DEAD END on this environment (kept for real TPU
hosts). Through the axon tunnel the device executes on a remote relay
and jax.profiler's trace.json.gz comes back with HOST tracks only — no
device xplane / TensorCore track — so there is nothing device-side to
aggregate (DEVNOTES round-4 session 3). On a directly-attached TPU this
script parses the perfetto trace without TensorBoard and prints the top
device ops by fusion name plus bucket subtotals (GEMM / attention-core /
elementwise / other). The per-op breakdown evidence for THIS environment
is ablation differencing: BASELINE.md "Post-unroll per-component
breakdown" (scripts/perf_attention_lab.py).

Run: python scripts/trace_step.py [--variant xla_b24_u6] [--steps 3]
"""
from __future__ import annotations

import argparse
import dataclasses
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_events(logdir: str):
    """Yield (name, dur_us) X-events from device-side tracks (any pid whose
    metadata name is not 'python')."""
    traces = sorted(glob.glob(logdir + "/plugins/profile/*/*.trace.json.gz"))
    if not traces:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    d = json.load(gzip.open(traces[-1]))
    ev = d.get("traceEvents", [])
    host_pids = {e.get("pid") for e in ev
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "python" in str(e.get("args", {}).get("name", ""))}
    # fall back: perfetto metadata may use bare 'M' rows with args.name
    for e in ev:
        if e.get("ph") == "M" and "python" in str(
                e.get("args", {}).get("name", "")):
            host_pids.add(e.get("pid"))
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") not in host_pids:
            yield e["name"], float(e.get("dur", 0.0))


BUCKETS = (
    ("attention-core", re.compile(
        r"softmax|attention|transpose.*dot|dot.*transpose")),
    ("gemm", re.compile(r"^(jit_)?.*(dot|conv|einsum|gemm)", re.I)),
    ("elementwise/LN/dropout", re.compile(
        r"fusion|loop_fusion|input_fusion|add|multiply|rng|bitcast|select",
        re.I)),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="xla_b24_u6")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--logdir", default="/tmp/gslora_trace")
    ap.add_argument("--top", type=int, default=25)
    a = ap.parse_args()

    from gslora_tpu.cli.common import setup_jax_runtime
    setup_jax_runtime()
    import jax
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_configs
    from gslora_tpu.config import OptimConfig
    from gslora_tpu.engine.forget import make_forget_step
    from gslora_tpu.engine.state import ForgetState, make_optimizer
    from gslora_tpu.models.vit import init_vit_params

    model, lora, fcfg = _flagship_configs()
    parts = a.variant.split("_")
    bs = next((int(p[1:]) for p in parts if p.startswith("b")
               and p[1:].isdigit()), 24)
    unroll = next((int(p[1:]) for p in parts if p.startswith("u")
                   and p[1:].isdigit()), 6)
    model = dataclasses.replace(model, attn_impl=parts[0],
                                scan_unroll=unroll)
    params = init_vit_params(jax.random.key(0), model, lora,
                             param_dtype=jnp.bfloat16)
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-2))
    state = ForgetState.create(params, opt)
    step = make_forget_step(model, lora, fcfg, opt,
                            compute_dtype=jnp.bfloat16, use_prototype=True,
                            lora_apply="merged", fused_batch=True)
    xf = jax.random.normal(jax.random.key(1), (bs, 3, 112, 112), jnp.float32)
    yf = jnp.arange(bs, dtype=jnp.int32) % 10 + 90
    xr = jax.random.normal(jax.random.key(2), (bs, 3, 112, 112), jnp.float32)
    yr = jnp.arange(bs, dtype=jnp.int32) % 90
    protos = jax.random.normal(jax.random.key(3),
                               (model.num_class, model.dim), jnp.float32)
    scalars = {k: jnp.float32(v) for k, v in dict(
        beta=0.15, alpha=0.01, lr=1e-2, bnd=110.0, bnd_pro=18.0,
        w_pro_f=0.1, w_pro_r=0.1).items()}

    def run(s, key):
        s, m = step(s, xf, yf, xr, yr, protos, scalars, key)
        return s, float(m["loss_total"])  # readback = real sync

    state, _ = run(state, jax.random.key(7))  # compile outside the trace

    # map HLO instruction names (the trace's event names) to semantics via
    # the optimized module text: %fusion.N = ... fusion(...), kind=...,
    # calls=%fused_computation.M { ... ROOT %op ... }
    hlo = step.lower(state, xf, yf, xr, yr, protos, scalars,
                     jax.random.key(0)).compile().as_text()
    roots = {}  # fused_computation name -> ROOT opcode
    comp = None
    for line in hlo.splitlines():
        m = re.match(r"%?([\w.\-]*fused_computation[\w.\-]*)\s*\(", line)
        if m:
            comp = m.group(1)
        rm = re.search(r"ROOT\s+%?[\w.\-]+\s*=\s*\S+\s+([\w\-]+)\(", line)
        if rm and comp:
            roots[comp] = rm.group(1)
    kinds = {}  # instruction name -> semantic label
    for m in re.finditer(
            r"%?([\w.\-]+)\s*=\s*\S+\s+fusion\(.*?kind=(\w+).*?"
            r"calls=%?([\w.\-]+)", hlo):
        name, kind, callee = m.groups()
        kinds[name] = f"{kind[1:]}:{roots.get(callee, '?')}"
    for m in re.finditer(r"%?([\w.\-]+)\s*=\s*\S+\s+([\w\-]+)\(", hlo):
        kinds.setdefault(m.group(1), m.group(2))

    with jax.profiler.trace(a.logdir):
        for i in range(a.steps):
            state, _ = run(state, jax.random.key(8 + i))

    agg = {}
    for name, dur in device_events(a.logdir):
        c, t = agg.get(name, (0, 0.0))
        agg[name] = (c + 1, t + dur)
    # keep only per-step device ops (they repeat exactly `steps` times);
    # region markers / step-number tracks appear once and would double-count
    agg = {n: ct for n, ct in agg.items()
           if ct[0] % a.steps == 0 and n != f"jit_step" and
           not n.startswith("jit_")}
    total = sum(t for _, t in agg.values())
    print(f"device op events: {sum(c for c, _ in agg.values())}, "
          f"total {total / 1e3 / a.steps:.2f} ms/step over {a.steps} steps")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])
    for name, (c, t) in rows[:a.top]:
        sem = kinds.get(name, "?")
        print(f"{t / a.steps:>9.0f} us/step x{c // a.steps:<4} "
              f"{100 * t / max(total, 1e-9):5.1f}%  {name[:40]:<40} {sem}")
    # semantic subtotals from the HLO mapping
    sub = {}
    for name, (c, t) in agg.items():
        sub.setdefault(kinds.get(name, "?"), [0, 0.0])
        sub[kinds.get(name, "?")][0] += c
        sub[kinds.get(name, "?")][1] += t
    print("\nsemantic subtotals (us/step):")
    for sem, (c, t) in sorted(sub.items(), key=lambda kv: -kv[1][1])[:20]:
        print(f"  {t / a.steps:>9.0f}  {100 * t / max(total, 1e-9):5.1f}%  "
              f"x{c // a.steps:<5} {sem}")


if __name__ == "__main__":
    main()
