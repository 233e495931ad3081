"""Run the mesh test modules hermetically, one fresh interpreter each.

Inside a long-lived full-suite process the 8-virtual-device XLA CPU
collective rendezvous can stall and SIGABRT the whole run (conftest.py has
the history); each module passes reliably in a fresh process, so the full
suite executes them through this wrapper. conftest's collect_ignore skips
the direct modules unless one is named on the command line or
GSLORA_MESH_DIRECT=1 is set (which this wrapper sets for its children).
"""
import os
import subprocess
import sys

import pytest

import conftest  # tests/ dir is on sys.path when pytest imports this file

MESH_MODULES = conftest.MESH_MODULES

_DIRECT = bool(os.environ.get("GSLORA_MESH_DIRECT"))


@pytest.mark.skipif(_DIRECT, reason="mesh modules already run directly")
@pytest.mark.parametrize("module", MESH_MODULES)
def test_mesh_module_hermetic(module):
    env = dict(os.environ)
    env["GSLORA_MESH_DIRECT"] = "1"
    # keep the child entirely off the TPU tunnel: without the pool var,
    # sitecustomize does not register the axon plugin (DEVNOTES), and
    # conftest forces the CPU platform + 8 virtual devices as usual
    env.pop("PALLAS_AXON_POOL_IPS", None)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), module)
    r = subprocess.run(
        [sys.executable, "-m", "pytest", path, "-q", "-p",
         "no:cacheprovider"],
        capture_output=True, text=True, timeout=1800, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, (
        f"{module} failed in subprocess (rc={r.returncode})\n"
        f"--- stdout tail ---\n{r.stdout[-4000:]}\n"
        f"--- stderr tail ---\n{r.stderr[-2000:]}")
