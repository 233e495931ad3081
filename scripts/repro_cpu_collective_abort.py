"""Minimal repro for the XLA-CPU collective-rendezvous SIGABRT.

Paper trail for the hermetic mesh-test workaround (tests/conftest.py,
tests/test_mesh_subprocess.py). The full pytest suite on this 1-core host
used to die with a hard abort ("Fatal Python error") inside
test_mesh_pretrain — the module passes in isolation every time, so the
workaround runs the mesh modules in fresh subprocesses.

Mechanism (verified against the strings compiled into
jaxlib 0.9.0 `libjax_common.so`, source `xla/core/collectives/
rendezvous.cc` in openxla/xla): every CPU collective joins a rendezvous
across the N virtual-device threads. A participant that does not arrive
within `--xla_cpu_collective_call_warn_stuck_timeout_seconds` logs

    [id=%d] This thread has been waiting for `%s` ... Expected %d threads
    to join the rendezvous, but not all of them arrived on time.

and one that stays missing past
`--xla_cpu_collective_call_terminate_timeout_seconds` (default 40 s)
triggers

    [id=%d] Termination timeout for `%s` of %d seconds exceeded. Exiting
    to ensure a consistent program state.

which is a process-level abort, not a Python exception — hence the whole
pytest process dies. On a 1-core host, 8 virtual device threads timeshare
one core; anything that deschedules a participant for longer than the
timeout (GC pauses over hundreds of live executables, a competing python
process, the OS scheduler under memory pressure) converts a *slow* step
into a *fatal* one. That is a designed-in failure mode of the rendezvous
(it prefers a crash over a silent deadlock), so the durable fixes are
(a) raise the timeouts (conftest.py sets warn=120 s / terminate=900 s)
and (b) bound in-process state accumulation (hermetic subprocesses for
the collective-heavy modules).

This script demonstrates the mechanism deterministically WITHOUT the
long suite: it shrinks the terminate timeout to 2 s and oversubscribes
the core so one rendezvous participant reliably misses the window. The
child process must die with a non-zero return code and the
"Termination timeout" message on stderr. Run:

    python scripts/repro_cpu_collective_abort.py

Exit 0 = mechanism reproduced (child aborted as predicted).
"""
import os
import subprocess
import sys

CHILD = r"""
import jax, jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

jax.config.update("jax_platforms", "cpu")
devs = jax.devices()
assert len(devs) == 8, devs
mesh = Mesh(np.asarray(devs).reshape(8), ("data",))

# Per-participant work large enough that 8 threads timesharing ONE core
# cannot all reach the rendezvous within the 2 s terminate timeout: the
# first arrivals wait on the stragglers and the rendezvous aborts the
# process. (On a real multi-core host the same code simply runs.)
x = jax.device_put(jnp.ones((8, 2048, 2048), jnp.float32),
                   NamedSharding(mesh, P("data")))

@jax.jit
def step(x):
    # a chain of large local matmuls, then a cross-device psum collective
    def body(c, _):
        return jnp.tanh(c @ c.swapaxes(-1, -2)), None
    y, _ = jax.lax.scan(body, x, None, length=24)
    return jax.lax.with_sharding_constraint(
        y.sum(axis=(1, 2), keepdims=False), NamedSharding(mesh, P())).sum()

print("child: launching collective under a 2 s terminate timeout",
      flush=True)
for i in range(4):
    v = float(step(x))
    print(f"child: step {i} -> {v}", flush=True)
print("child: survived (mechanism NOT reproduced on this host)",
      flush=True)
"""


def main() -> int:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f
             and "collective_call" not in f]
    flags += [
        "--xla_force_host_platform_device_count=8",
        "--xla_cpu_collective_call_warn_stuck_timeout_seconds=1",
        "--xla_cpu_collective_call_terminate_timeout_seconds=2",
    ]
    env["XLA_FLAGS"] = " ".join(flags)
    proc = subprocess.run([sys.executable, "-c", CHILD], env=env,
                          capture_output=True, text=True, timeout=600)
    out = proc.stdout + proc.stderr
    aborted = proc.returncode != 0
    msg_seen = "Termination timeout" in out
    print(f"child rc={proc.returncode}")
    print("--- child output tail ---")
    print(out[-2500:])
    if aborted and msg_seen:
        print("REPRODUCED: rendezvous terminate-timeout abort "
              "(xla/core/collectives/rendezvous.cc) — the full-suite "
              "SIGABRT is this mechanism triggered at the default 40 s "
              "by descheduling on a 1-core host.")
        return 0
    if not aborted:
        print("NOT reproduced: host fast enough for the 2 s window; "
              "increase scan length or re-run under load.")
    return 1


if __name__ == "__main__":
    sys.exit(main())
