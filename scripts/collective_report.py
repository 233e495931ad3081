"""Per-step collective-traffic accounting from compiled HLO (VERDICT r3 #9).

Multi-chip hardware is unavailable in this environment, but the compiled
SPMD modules are: for each parallelism mode (dp / tp / fsdp / tp+fsdp /
sp / pp / dcn multi-slice) this compiles the flagship GS-LoRA forget step
over an 8-virtual-device CPU mesh and counts the bytes moved by every
collective op (all-reduce, all-gather, reduce-scatter, collective-permute,
all-to-all) in the optimized module — the partitioned per-device view —
then projects a comm/compute overhead fraction against ICI/DCN bandwidth
assumptions for a v5e pod slice.

The reference's ceiling is nn.DataParallel: it replicates the FULL model
to every GPU each step and gathers outputs (train_own.py:403-406) — our
dp mode's only cross-chip traffic is the LoRA-gradient all-reduce.

Projection assumptions (documented, not measured — stated in BASELINE.md):
  * ICI: v5e 2D torus, ~100 GB/s/chip usable one-way for ring collectives
  * DCN: ~25 GB/s/host / 8 chips ~= 3 GB/s/chip
  * ring all-reduce moves 2*(n-1)/n * bytes per device; all-gather /
    reduce-scatter (n-1)/n; collective-permute = operand bytes
  * no comm/compute overlap (upper bound on overhead)

Run (CPU, any host):
  JAX_PLATFORMS=cpu python scripts/collective_report.py
"""
from __future__ import annotations

import json
import os
import re
import sys

# must happen before first backend use; sitecustomize has already imported
# jax with the axon TPU plugin registered — config.update still wins
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ICI_GBPS = 100.0  # usable one-way GB/s per v5e chip (ring collectives)
DCN_GBPS = 3.0    # per-chip share of host DCN
# measured v5e forget-step time at the bench optimum (BENCH_r03: 3705
# img/s at 48 img/step); used for the comm/compute overhead projection
STEP_MS_V5E = 13.0

_DTYPE_BYTES = {"f64": 8, "f32": 4, "f16": 2, "bf16": 2, "s64": 8,
                "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
                "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16}

_COLL = ("all-reduce", "all-gather", "reduce-scatter",
         "collective-permute", "all-to-all")


def _shape_bytes(shape: str) -> int:
    """'f32[512,100]' -> bytes; tuple shapes handled by caller regex."""
    m = re.match(r"([a-z0-9]+)\[([0-9,]*)\]", shape)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def collective_bytes(hlo_text: str) -> dict:
    """Sum output bytes per collective kind over the optimized module.

    HLO lines look like:
      %all-reduce.5 = f32[8,512]{1,0} all-reduce(...), replica_groups=...
      ... = (f32[2,64]{...}, f32[2,64]{...}) collective-permute(...)
    '; -start' variants (async) are counted once via the -start op.
    """
    out = {k: 0 for k in _COLL}
    counts = {k: 0 for k in _COLL}
    for line in hlo_text.splitlines():
        for kind in _COLL:
            # match the op use-site, not metadata mentions
            if re.search(rf"\)?\s{kind}(-start)?\(", line):
                if f" {kind}-done" in line:
                    continue
                lhs = line.split("=", 1)[0] if "=" in line else ""
                rhs = line.split("=", 1)[1] if "=" in line else line
                del lhs
                shapes = re.findall(r"[a-z0-9]+\[[0-9,]*\]", rhs.split(
                    f"{kind}", 1)[0])
                b = sum(_shape_bytes(s) for s in shapes)
                out[kind] += b
                counts[kind] += 1
                break
    return {"bytes": out, "counts": counts}


def ring_traffic_bytes(kind_bytes: dict, n: int) -> float:
    """Per-device wire bytes for ring algorithms at group size n."""
    ar = kind_bytes["all-reduce"] * 2 * (n - 1) / n
    ag = kind_bytes["all-gather"] * (n - 1) / n
    rs = kind_bytes["reduce-scatter"] * (n - 1) / n
    cp = kind_bytes["collective-permute"]
    a2a = kind_bytes["all-to-all"] * (n - 1) / n
    return ar + ag + rs + cp + a2a


def build_mode(mode: str, bs_per_stream: int = 32):
    """Compile the flagship forget step under one parallelism mode; returns
    (compiled, mesh_shape, group_n, dcn_bytes_fraction_hint)."""
    from __graft_entry__ import _flagship_configs
    from gslora_tpu.config import MeshConfig, OptimConfig
    from gslora_tpu.engine.forget import make_forget_step
    from gslora_tpu.engine.state import ForgetState, make_optimizer
    from gslora_tpu.models.vit import init_vit_params
    from gslora_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                          param_shardings, replicate,
                                          set_pipeline,
                                          set_sequence_sharding)

    model, lora, fcfg = _flagship_configs()
    import dataclasses
    # FULL unroll of the block axis so per-layer collectives (tp/sp) appear
    # once each in the HLO text instead of hiding inside one scan body
    model = dataclasses.replace(model, scan_unroll=model.depth)
    params = init_vit_params(jax.random.key(0), model, lora,
                             param_dtype=jnp.bfloat16)
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-2))

    devices = jax.devices()[:8]
    if mode == "dcn":
        mesh = make_mesh(MeshConfig(data=2, model=2, slices=2),
                         devices=devices)
    elif mode in ("tp", "sp"):
        mesh = Mesh(np.asarray(devices).reshape(2, 4), ("data", "model"))
    elif mode == "pp":
        mesh = Mesh(np.asarray(devices).reshape(4, 2), ("data", "model"))
    else:  # dp, fsdp, tp+fsdp
        shape = (4, 2) if mode == "tp+fsdp" else (8, 1)
        mesh = Mesh(np.asarray(devices).reshape(shape), ("data", "model"))

    kw = {}
    if mode in ("tp", "tp+fsdp", "sp"):
        kw["tp"] = True
    if mode in ("fsdp", "tp+fsdp", "sp"):
        kw["fsdp"] = mode != "sp"
    if mode == "pp":
        set_pipeline(mesh, 2)
        kw["pp"] = True
    if mode == "sp":
        set_sequence_sharding(mesh)
    try:
        if mode in ("dp", "dcn"):
            placed = replicate(mesh, params)
        else:
            placed = jax.tree.map(jax.device_put, params,
                                  param_shardings(mesh, params, **kw))
        state = ForgetState.create(placed, opt)
        step = make_forget_step(model, lora, fcfg, opt,
                                compute_dtype=jnp.bfloat16,
                                use_prototype=True, lora_apply="merged",
                                fused_batch=True)
        bsh = batch_sharding(mesh)
        bs = bs_per_stream
        xf = jax.device_put(jnp.zeros((bs, 3, 112, 112), jnp.float32), bsh)
        yf = jax.device_put(jnp.zeros((bs,), jnp.int32), bsh)
        scalars = {k: jnp.float32(v) for k, v in dict(
            beta=0.15, alpha=0.01, lr=1e-2, bnd=110.0, bnd_pro=18.0,
            w_pro_f=0.1, w_pro_r=0.1).items()}
        protos = jnp.zeros((model.num_class, model.dim), jnp.float32)
        with mesh:
            compiled = jax.jit(step).lower(
                state, xf, yf, xf, yf, protos, scalars,
                jax.random.key(0)).compile()
    finally:
        if mode == "pp":
            set_pipeline(None)
        if mode == "sp":
            set_sequence_sharding(None)
    group_n = {"dp": 8, "fsdp": 8, "tp": 4, "sp": 4, "tp+fsdp": 2,
               "pp": 2, "dcn": 2}[mode]
    return compiled, dict(zip(mesh.axis_names, mesh.devices.shape)), group_n


def main():
    modes = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "dp", "tp", "fsdp", "tp+fsdp", "sp", "pp", "dcn"]
    rows = []
    for mode in modes:
        try:
            compiled, mesh_shape, group_n = build_mode(mode)
            text = compiled.as_text()
            acc = collective_bytes(text)
            if mode == "pp":
                # the GPipe ppermute sits inside a lax.scan over ticks and
                # executes (stages + n_micro - 1) times per step (fwd) and
                # again in the transposed bwd — scale the single HLO
                # occurrence to wire reality (2 stages, 2 micro -> 3 ticks,
                # x2 for bwd)
                ticks = 2 * (2 + 2 - 1)
                acc["bytes"]["collective-permute"] *= ticks
                acc["counts"]["collective-permute (scaled xticks)"] = ticks
            wire = ring_traffic_bytes(acc["bytes"], group_n)
            bw = DCN_GBPS if mode == "dcn" else ICI_GBPS
            comm_ms = wire / (bw * 1e9) * 1e3
            overhead = comm_ms / (STEP_MS_V5E + comm_ms)
            row = {
                "mode": mode, "mesh": mesh_shape,
                "collective_counts": acc["counts"],
                "collective_mb": {k: round(v / 2**20, 3)
                                  for k, v in acc["bytes"].items() if v},
                "ring_wire_mb_per_dev": round(wire / 2**20, 3),
                "link": "dcn" if mode == "dcn" else "ici",
                "projected_comm_ms": round(comm_ms, 4),
                "projected_overhead_frac": round(overhead, 4),
                "projected_scaling_eff": round(1 - overhead, 4),
            }
        except Exception as e:
            row = {"mode": mode, "error": f"{type(e).__name__}: {e}"[:300]}
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open("collective_report.json", "w") as f:
        json.dump({"step_ms_v5e": STEP_MS_V5E, "ici_gbps": ICI_GBPS,
                   "dcn_gbps": DCN_GBPS, "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
