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


class AsyncSaver:
    """Async orbax saves: the device-to-host copy happens inline, the disk
    write on a background thread — the train loop never blocks on IO
    (replaces the reference's synchronous torch.save at best-H/task
    boundaries, engine.py:465-497). Call wait() before reading the file
    back or exiting."""

    def __init__(self):
        import orbax.checkpoint as ocp
        self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())

    def save(self, path: str, tree: Any) -> None:
        self._ckptr.save(os.path.abspath(path), tree, force=True)

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._ckptr.close()
