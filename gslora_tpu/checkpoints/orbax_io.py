"""Orbax checkpoint backend (SURVEY §5.4): sharded/async-capable saves for
multi-host runs; the msgpack path (io.py) remains the single-file default.
"""
from __future__ import annotations

import os
from typing import Any


def save_orbax(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def load_orbax(path: str, template: Any | None = None) -> Any:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path, args=ocp.args.PyTreeRestore(template))
        return ckptr.restore(path)
