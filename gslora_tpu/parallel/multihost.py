"""Multi-host (multi-process) execution support.

The reference is single-node ``nn.DataParallel`` (train_own.py:403-406);
this framework claims multi-slice pods (MeshConfig.slices), and on real
pods JAX runs ONE python process per host, each seeing only its local
chips. Feeding the full global batch from every host (the single-process
habit) wastes host RAM and decode time P-fold; three pieces make
process-sharded execution real:

1. **Pure index math** — which rows of the global batch process ``k``
   must load. The batch dim shards over the flattened (dcn, data) mesh
   axes in row-major order, so the device at mesh position
   ``(dcn_i, data_j, model_k)`` owns batch block ``dcn_i*data + data_j``
   (the ``model`` axis replicates the batch). Pure functions
   (`position_block`, `blocks_to_bounds`) so the math unit-tests without
   multiple processes; `host_batch_bounds` cross-checks against JAX's own
   ``devices_indices_map`` at runtime.
2. **Process-sharded feeding** — ``BatchLoader(local_bounds=...)``
   decodes only this host's rows of each global batch (identical seed on
   every host => identical global shuffle order); `process_sharded_loader`
   wires the two together.
3. **Global-array assembly** — `make_global_batch` builds the global jax
   Array from per-process local rows via
   ``jax.make_array_from_process_local_data``; ``placement()``/
   ``shard_batch`` route through it whenever ``jax.process_count() > 1``
   and assert-guard the local shape so a full-global-batch feed fails
   loudly instead of silently mis-sharding.

Checkpointing on pods: use the orbax backend (`checkpoints/orbax_io.py`)
— orbax save/restore is multi-host-aware (every process participates with
its addressable shards; see docs/MULTIHOST.md). The msgpack path gathers
to host and is single-process only.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from gslora_tpu.parallel.mesh import (DATA_AXIS, DCN_AXIS, batch_sharding)


def device_blocks(axis_names: Sequence[str],
                  mesh_shape: Sequence[int]) -> np.ndarray:
    """Array (same shape as the mesh device array) of the batch block each
    position owns: ``dcn_i*data_size + data_j`` on a dcn mesh, ``data_j``
    otherwise."""
    names = list(axis_names)
    shape = tuple(mesh_shape)
    data_ax = names.index(DATA_AXIS)
    idx = np.indices(shape)
    blocks = idx[data_ax]
    if DCN_AXIS in names:
        dcn_ax = names.index(DCN_AXIS)
        blocks = idx[dcn_ax] * shape[data_ax] + idx[data_ax]
    return blocks


def process_block_map(axis_names: Sequence[str],
                      process_of_device: np.ndarray) -> Dict[int, List[int]]:
    """{process_id: sorted batch blocks it owns} for a mesh whose device
    array has ``process_of_device[pos] = owning process``. Pure — feed it
    simulated ownerships in tests, real ``device.process_index`` values at
    runtime."""
    blocks = device_blocks(axis_names, process_of_device.shape)
    out: Dict[int, set] = {}
    for pos in np.ndindex(process_of_device.shape):
        out.setdefault(int(process_of_device[pos]), set()).add(
            int(blocks[pos]))
    return {pid: sorted(bs) for pid, bs in out.items()}


def blocks_to_bounds(global_batch: int, n_blocks: int,
                     blocks: Sequence[int]) -> Tuple[int, int]:
    """Global-batch row bounds [start, stop) for a process owning
    ``blocks`` out of ``n_blocks``. Block ``b`` holds rows
    ``[b*gb/n, (b+1)*gb/n)``; the blocks must be contiguous (standard pod
    process layouts are — a gap would mean one host loads disjoint row
    ranges, which the loader deliberately does not support)."""
    if global_batch % n_blocks != 0:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n_blocks} data-parallel blocks")
    bs = sorted(blocks)
    if not bs:
        raise ValueError("process owns no batch blocks — is it part of "
                         "the mesh?")
    if bs != list(range(bs[0], bs[-1] + 1)):
        raise ValueError(
            f"process owns non-contiguous batch blocks {bs} — this mesh/"
            f"process layout cannot be fed with one row slice per host")
    per = global_batch // n_blocks
    return bs[0] * per, (bs[-1] + 1) * per


# Global batch sizes announced by BatchLoader construction (every loader
# registers its GLOBAL batch size — a single-process no-op). On a pod,
# make_global_batch resolves un-annotated feeds against this set, which
# turns the classic single-process habit (feeding the FULL global batch
# from every host) into an immediate error instead of a silently
# duplicated 2x batch: a full feed's row count matches no declared
# batch's per-process share (the share map B -> B*owned/n_blocks is
# strictly increasing, so at most one declared size can match).
_DECLARED_BATCHES: set = set()


def declare_global_batch(n: int) -> None:
    if n > 0:
        _DECLARED_BATCHES.add(int(n))


def _cached_by_mesh(fn):
    """Per-(mesh, args) memo — the device->process scan and the
    devices_indices_map cross-check are pure in the mesh but cost
    Python-level work proportional to mesh size x batch, and put_batch
    sits on the per-step data-feed hot path."""
    import functools
    return functools.lru_cache(maxsize=256)(fn)


@_cached_by_mesh
def _process_blocks(mesh) -> Dict[int, List[int]]:
    proc = np.vectorize(lambda d: d.process_index)(mesh.devices)
    return process_block_map(mesh.axis_names, proc)


def host_batch_bounds(mesh, global_batch: int,
                      process_index: Optional[int] = None
                      ) -> Tuple[int, int]:
    """Rows of the global batch THIS process must load, from the real
    mesh's device->process ownership. Cross-checked against JAX's own
    ``devices_indices_map`` (the authoritative sharding layout) so the
    pure math can never drift from what ``make_array_from_process_local_
    data`` expects. Memoized per (mesh, batch, process)."""
    import jax
    pid = jax.process_index() if process_index is None else process_index
    return _host_batch_bounds_cached(mesh, int(global_batch), pid)


@_cached_by_mesh
def _host_batch_bounds_cached(mesh, global_batch: int,
                              pid: int) -> Tuple[int, int]:
    blocks = _process_blocks(mesh).get(pid)
    if blocks is None:
        raise ValueError(f"process {pid} owns no devices in this mesh")
    n_blocks = int(np.prod([mesh.shape[a] for a in mesh.axis_names
                            if a in (DCN_AXIS, DATA_AXIS)]))
    start, stop = blocks_to_bounds(global_batch, n_blocks, blocks)
    # authoritative cross-check
    sh = batch_sharding(mesh)
    rows = set()
    for d, idx in sh.devices_indices_map((global_batch,)).items():
        if d.process_index == pid:
            s = idx[0]
            rows.update(range(s.start or 0,
                              global_batch if s.stop is None else s.stop))
    if rows != set(range(start, stop)):
        raise AssertionError(
            f"block math bounds [{start},{stop}) disagree with the "
            f"sharding's indices map ({sorted(rows)[:4]}...) — mesh "
            f"device order is non-standard")
    return start, stop


def make_global_batch(mesh, local: np.ndarray,
                      process_index: Optional[int] = None,
                      global_batch: Optional[int] = None):
    """Assemble the global batch Array from this process's local rows via
    ``jax.make_array_from_process_local_data``. ``local.shape[0]`` must be
    exactly this host's row span.

    With ``global_batch`` given, a wrong-sized feed (e.g. the full global
    batch from every host — the single-process habit) raises with the
    expected span. Without it, the global batch is resolved against the
    sizes every BatchLoader declares at construction
    (`declare_global_batch`): a correct process-sharded feed matches
    exactly one declared size's per-process share, while a full-batch
    feed matches none and raises IMMEDIATELY (the share map is strictly
    increasing in the batch, so the match is unique). Only when nothing
    was declared (hand-built arrays) does it fall back to the raw
    share-ratio inference, which cannot distinguish "correct shard of
    batch B" from "full batch of B*P/owned". Feed loaders through
    `process_sharded_loader` and the sizes are right by construction."""
    import jax
    sh = batch_sharding(mesh)
    n_blocks = int(np.prod([mesh.shape[a] for a in mesh.axis_names
                            if a in (DCN_AXIS, DATA_AXIS)]))
    pid = jax.process_index() if process_index is None else process_index
    owned = _process_blocks(mesh)[pid]
    if global_batch is None and len(owned) == n_blocks:
        # this process owns every batch block (single-process world):
        # the local feed IS the global batch, no resolution needed
        global_batch = len(local)
    if global_batch is None and _DECLARED_BATCHES:
        share = len(owned) / n_blocks
        matches = [b for b in _DECLARED_BATCHES
                   if b * len(owned) % n_blocks == 0
                   and b * len(owned) // n_blocks == len(local)]
        if len(matches) == 1:
            global_batch = matches[0]
        else:
            raise ValueError(
                f"process {pid}'s feed of {len(local)} rows matches "
                f"{'no' if not matches else 'several of'} the declared "
                f"global batch sizes {sorted(_DECLARED_BATCHES)} at its "
                f"{share:.3f} share — a full-global-batch feed from every "
                f"host? Use process_sharded_loader / BatchLoader("
                f"local_bounds=host_batch_bounds(mesh, B)) so each host "
                f"decodes only its row span")
    if global_batch is None:
        if (len(local) * n_blocks) % len(owned) != 0:
            raise ValueError(
                f"local rows {len(local)} cannot be {len(owned)}/"
                f"{n_blocks} of any integer global batch")
        global_batch = len(local) * n_blocks // len(owned)
    start, stop = host_batch_bounds(mesh, global_batch, process_index=pid)
    if stop - start != len(local):
        raise ValueError(
            f"process {pid} must feed rows [{start},{stop}) of the "
            f"global batch {global_batch} ({stop - start} rows), got "
            f"{len(local)} — use BatchLoader(local_bounds="
            f"host_batch_bounds(mesh, B)) / process_sharded_loader so "
            f"each host decodes only its shard")
    return jax.make_array_from_process_local_data(
        sh, np.asarray(local), (global_batch,) + tuple(local.shape[1:]))


def process_sharded_loader(mesh, dataset, batch_size: int, **kw):
    """BatchLoader decoding only this process's rows of each global batch
    (identical ``seed`` on every host keeps the global shuffle order in
    lockstep — pass the same seed everywhere). ``batch_size`` is GLOBAL;
    static shapes are required across hosts, so mask_padding defaults on."""
    from gslora_tpu.data.pipeline import BatchLoader
    kw.setdefault("mask_padding", True)
    bounds = host_batch_bounds(mesh, batch_size)
    return BatchLoader(dataset, batch_size, local_bounds=bounds, **kw)
