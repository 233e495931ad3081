"""Profiling / throughput probes (SURVEY §5.1).

* forward_throughput — the reference's only perf probe
  (util/utils.py:144-164 test_forward: N forwards -> images/sec), done
  honestly for async TPU backends: K forwards chained in-device via scan,
  closed by a scalar readback (block_until_ready is not reliable on
  tunneled platforms).
* trace — context manager around jax.profiler for TensorBoard traces.
"""
from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def forward_throughput(apply_fn, example_batch, iters: int = 50) -> float:
    """images/sec of ``apply_fn(batch) -> array`` at the given batch."""
    x = jnp.asarray(example_batch)

    @jax.jit
    def chain(x0):
        def body(c, _):
            out = apply_fn(x0 * (1 + c * 1e-12))
            return jnp.sum(out.astype(jnp.float32)) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(chain(x))  # compile
    t0 = time.perf_counter()
    float(chain(x))
    dt = time.perf_counter() - t0
    return iters * x.shape[0] / dt


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
