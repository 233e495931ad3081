"""Re-probe the single-chip bf16 matmul roofline (round 3).

DEVNOTES recorded an "observed ceiling" of ~67 TF/s bf16 (4096^3 chains)
and every MFU number was normalized against it. Round-3 evidence broke
that: the ViT-B/16 remat step sustains ~99 TF/s of counted HLO FLOPs —
impossible under a real 67 TF/s roof (v5e spec: 197 TF/s bf16). This
script re-measures the roof with several shapes, iteration counts, and a
per-iteration renormalization (bf16 chains overflow without it; an
overflowed chain can short-circuit through inf/NaN fastpaths and corrupt
the timing).

Methodology: K matmuls chained by data dependency inside one lax.scan,
timing closed by a scalar host readback (block_until_ready does not sync
on this tunnel — DEVNOTES).

Run: python scripts/roofline_probe.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(n: int, k: int, renorm: bool) -> dict:
    import jax
    import jax.numpy as jnp

    w = jax.random.normal(jax.random.key(0), (n, n), jnp.bfloat16)
    x0 = jax.random.normal(jax.random.key(1), (n, n), jnp.bfloat16)

    @jax.jit
    def chain(x):
        def body(c, _):
            y = c @ w
            if renorm:
                y = (y * jax.lax.rsqrt(
                    jnp.float32(jnp.mean(jnp.square(y.astype(jnp.float32))))
                    + 1e-20).astype(jnp.bfloat16))
            return y, ()
        out, _ = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(out.astype(jnp.float32))

    float(chain(x0))  # compile + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(x0))
        best = min(best, time.perf_counter() - t0)
    tflops = k * 2 * n**3 / best / 1e12
    return {"n": n, "k": k, "renorm": renorm,
            "seconds": round(best, 4), "tflops": round(tflops, 1)}


def probe_int8(n: int, k: int) -> dict:
    """int8 x int8 -> int32 chain: does XLA:TPU hit the v5e's 394 TOPS
    int8 MXU rate (2x bf16)? The chain re-quantizes each product back to
    int8 by a right-shift (keeps the data dependency, no float ops)."""
    import jax
    import jax.numpy as jnp

    w = jax.random.randint(jax.random.key(0), (n, n), -127, 128, jnp.int8)
    x0 = jax.random.randint(jax.random.key(1), (n, n), -127, 128, jnp.int8)

    @jax.jit
    def chain(x):
        def body(c, _):
            acc = jax.lax.dot(c, w, preferred_element_type=jnp.int32)
            y = jnp.clip(acc >> 16, -127, 127).astype(jnp.int8)
            return y, ()
        out, _ = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(out.astype(jnp.int32))

    int(chain(x0))  # compile + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(chain(x0))
        best = min(best, time.perf_counter() - t0)
    tops = k * 2 * n**3 / best / 1e12
    return {"n": n, "k": k, "dtype": "int8",
            "seconds": round(best, 4), "tops": round(tops, 1)}


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--int8", action="store_true",
                    help="probe the int8 MXU rate instead of bf16")
    args = ap.parse_args()
    from gslora_tpu.cli.common import setup_jax_runtime
    setup_jax_runtime()
    if args.int8:
        for n, k in ((4096, 64), (8192, 16), (8192, 64)):
            try:
                print(json.dumps(probe_int8(n, k)), flush=True)
            except Exception as e:
                print(json.dumps({"n": n, "k": k, "dtype": "int8",
                                  "error": str(e)[:160]}), flush=True)
        return
    for n, k in ((4096, 64), (8192, 16), (8192, 64), (16384, 8),
                 (2048, 256), (1024, 512)):
        for renorm in (True, False):
            try:
                print(json.dumps(probe(n, k, renorm)), flush=True)
            except Exception as e:
                print(json.dumps({"n": n, "k": k, "renorm": renorm,
                                  "error": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
