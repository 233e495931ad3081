"""Test env: force an 8-device CPU platform so multi-chip sharding logic is
exercised without TPU hardware (the TPU analogue of a fake backend —
SURVEY.md §4).

NOTE: this host's sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon (remote TPU tunnel), so env vars set here are too late —
we must go through jax.config.update before any backend initializes.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # 8 virtual devices timeshare one core here; XLA's CPU collective
    # rendezvous SIGABRTs a participant descheduled past its default 40 s
    # termination timeout (observed flake) — give it headroom.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=900")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

assert jax.devices()[0].platform == "cpu"

import pytest  # noqa: E402

# The 8-virtual-device CPU collective machinery is not reliable inside a
# LONG-lived process on this 1-core host: with a ~140-test prefix the
# rendezvous in test_mesh_pretrain stalls until the terminate timeout
# SIGABRTs the whole run ("Fatal Python error", round-3 VERDICT #1;
# reproduced round 4 UNCONTENDED even with per-module cache drops). The
# modules pass in isolation, so the full suite runs them hermetically in
# fresh subprocesses (tests/test_mesh_subprocess.py) and skips direct
# collection here. Naming a mesh module on the command line (debugging) or
# setting GSLORA_MESH_DIRECT=1 (the subprocess wrapper does) runs it
# directly.
MESH_MODULES = ["test_mesh_loop.py", "test_mesh_multislice.py",
                "test_mesh_pretrain.py"]
if not os.environ.get("GSLORA_MESH_DIRECT") and \
        not any("test_mesh" in a for a in sys.argv):
    collect_ignore = MESH_MODULES


@pytest.fixture(autouse=True)
def _reset_attention_mesh():
    """The attention-mesh registry is trace-time global state set by the
    train loops; clear it between tests so runs stay order-independent."""
    yield
    from gslora_tpu.parallel.mesh import set_attention_mesh
    set_attention_mesh(None)


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_state():
    """Free accumulated XLA executables between test MODULES.

    A full-suite run accumulates hundreds of live compiled programs (jit
    caches + lru-cached step builders); round 3 ended with a reproducible
    full-suite-order-only hard abort ("Fatal Python error") inside the CPU
    collective machinery at test_mesh_pretrain[tp] — the test passes in
    isolation, so the trigger is accumulated in-process state. Dropping
    the jit caches at module boundaries bounds that accumulation (each
    module recompiles what it actually uses; measured cost is small on
    this suite, where modules share few executables)."""
    yield
    import gc
    jax.clear_caches()
    gc.collect()
