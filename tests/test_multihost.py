"""Multi-host (multi-process) execution readiness (parallel/multihost.py).

Single-process CPU tests: the per-process index math is pure python and is
validated against JAX's own sharding layout (``devices_indices_map``) on
real CPU meshes with SIMULATED process ownership — the same math the
runtime wrappers (`host_batch_bounds`/`make_global_batch`) apply to real
``device.process_index`` values on a pod. The reference has nothing to
compare against here (single-node nn.DataParallel, train_own.py:403-406).
"""
import numpy as np
import pytest

from gslora_tpu.data.folders import ArrayDataset
from gslora_tpu.data.pipeline import BatchLoader
from gslora_tpu.parallel.multihost import (blocks_to_bounds, device_blocks,
                                           host_batch_bounds,
                                           make_global_batch,
                                           process_block_map,
                                           process_sharded_loader)


def _dataset(n=20, c=4):
    imgs = np.arange(n * 3 * 4 * 4, dtype=np.float32).reshape(n, 3, 4, 4)
    return ArrayDataset(imgs / (n * 48.0), np.arange(n) % c)


# ---------------------------------------------------------------- pure math

def test_device_blocks_data_mesh():
    # (data=4, model=2): block = data row, model axis replicates
    b = device_blocks(("data", "model"), (4, 2))
    assert b.shape == (4, 2)
    for j in range(2):
        assert list(b[:, j]) == [0, 1, 2, 3]


def test_device_blocks_dcn_mesh():
    # (dcn=2, data=2, model=2): block = dcn*data_size + data, row-major
    b = device_blocks(("dcn", "data", "model"), (2, 2, 2))
    assert b[0, 0, 0] == 0 and b[0, 1, 0] == 1
    assert b[1, 0, 1] == 2 and b[1, 1, 1] == 3


def _block_major_procs(axis_names, shape, n_procs):
    """Standard pod process layout: processes tile the flattened
    (dcn, data) block order — every process within one slice, contiguous
    data rows."""
    blocks = device_blocks(axis_names, shape)
    n_blocks = blocks.max() + 1
    return (blocks // (n_blocks // n_procs)).astype(np.int32)


@pytest.mark.parametrize("axis_names,shape,n_procs", [
    (("data", "model"), (4, 2), 2),
    (("data", "model"), (8, 1), 4),
    (("dcn", "data", "model"), (2, 2, 2), 2),  # one process per slice
    (("dcn", "data", "model"), (2, 4, 1), 4),  # two processes per slice
])
def test_process_blocks_partition(axis_names, shape, n_procs):
    """Simulated hosts own contiguous block ranges (the standard pod
    layout): their blocks must partition [0, n_blocks) disjointly and
    each host's bounds must be contiguous."""
    proc = _block_major_procs(axis_names, shape, n_procs)
    blocks = process_block_map(axis_names, proc)
    n_blocks = int(np.prod([s for a, s in zip(axis_names, shape)
                            if a in ("dcn", "data")]))
    seen = []
    gb = n_blocks * 3
    spans = []
    for k in range(n_procs):
        seen += blocks[k]
        spans.append(blocks_to_bounds(gb, n_blocks, blocks[k]))
    assert sorted(seen) == list(range(n_blocks))
    # spans tile [0, gb) in process order for axis-contiguous ownership
    assert spans[0][0] == 0 and spans[-1][1] == gb
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert b == c


def test_process_blocks_dcn_split_is_noncontiguous():
    """A process owning the same data rows of BOTH slices holds
    non-contiguous blocks — blocks_to_bounds must refuse (one row slice
    per host cannot feed it)."""
    proc = np.zeros((2, 2, 1), np.int32)
    proc[:, 1, :] = 1  # proc 0 owns data row 0 of each slice: blocks {0, 2}
    blocks = process_block_map(("dcn", "data", "model"), proc)
    assert blocks[0] == [0, 2]
    with pytest.raises(ValueError, match="non-contiguous"):
        blocks_to_bounds(8, 4, blocks[0])


def test_blocks_to_bounds_guards():
    with pytest.raises(ValueError, match="not divisible"):
        blocks_to_bounds(10, 4, [0, 1])
    with pytest.raises(ValueError, match="no batch blocks"):
        blocks_to_bounds(8, 4, [])
    assert blocks_to_bounds(8, 4, [1, 2]) == (2, 6)


def test_block_math_matches_jax_indices_map():
    """The pure block math must agree with JAX's authoritative sharding
    layout: group a real CPU mesh's devices under simulated process ids
    and compare row sets per process."""
    import jax
    from gslora_tpu.parallel.mesh import batch_sharding, make_mesh
    from gslora_tpu.config import MeshConfig

    for mcfg, n_procs in [(MeshConfig(data=4, model=2), 2),
                          (MeshConfig(data=2, model=2, slices=2), 2)]:
        mesh = make_mesh(mcfg)
        proc = _block_major_procs(mesh.axis_names, mesh.devices.shape,
                                  n_procs)
        dev_pid = {d.id: int(proc[pos])
                   for pos, d in np.ndenumerate(mesh.devices)}
        gb = 16
        m = batch_sharding(mesh).devices_indices_map((gb,))
        blocks = process_block_map(mesh.axis_names, proc)
        n_blocks = int(np.prod([mesh.shape[a] for a in mesh.axis_names
                                if a in ("dcn", "data")]))
        for k in range(n_procs):
            start, stop = blocks_to_bounds(gb, n_blocks, blocks[k])
            rows = set()
            for d, idx in m.items():
                if dev_pid[d.id] == k:
                    s = idx[0]
                    rows.update(range(s.start or 0,
                                      gb if s.stop is None else s.stop))
            assert rows == set(range(start, stop)), (mcfg, k)


# ------------------------------------------------------- loader integration

def test_local_bounds_loaders_reassemble_global_batches():
    """Identically-seeded per-host loaders decode disjoint row ranges that
    concatenate to exactly the single-loader global batches — including
    the padded tail's -1 sentinel labels."""
    ds = _dataset(n=19)  # ragged: 19 rows, batch 8 -> padded tail
    gb = 8
    full = list(BatchLoader(ds, gb, seed=3, mask_padding=True, prefetch=0))
    bounds = [(0, 2), (2, 8)]  # uneven hosts (3-of-4 blocks on host 1)
    parts = [list(BatchLoader(ds, gb, seed=3, mask_padding=True, prefetch=0,
                              local_bounds=b)) for b in bounds]
    assert len(full) == 3
    for i, (x, y) in enumerate(full):
        x_cat = np.concatenate([parts[k][i][0] for k in range(2)])
        y_cat = np.concatenate([parts[k][i][1] for k in range(2)])
        np.testing.assert_array_equal(x_cat, x)
        np.testing.assert_array_equal(y_cat, y)
    # the tail batch is 19 - 16 = 3 valid rows: host 0 sees rows [0,2)
    # (all valid), host 1 rows [2,8) with 2..2 valid -> 5 sentinels
    assert list(parts[1][2][1][1:]) == [-1] * 5


def test_local_bounds_requires_static_shapes():
    ds = _dataset()
    with pytest.raises(ValueError, match="static"):
        BatchLoader(ds, 8, local_bounds=(0, 4))
    with pytest.raises(ValueError, match="within"):
        BatchLoader(ds, 8, local_bounds=(4, 12), mask_padding=True)
    # drop_last is an accepted static-shape mode too
    loader = BatchLoader(ds, 8, local_bounds=(0, 4), drop_last=True,
                         prefetch=0)
    xs = [x for x, _ in loader]
    assert all(x.shape[0] == 4 for x in xs)


def test_local_bounds_uint8_transfer():
    imgs = (np.arange(8 * 3 * 2 * 2, dtype=np.float32).reshape(8, 3, 2, 2)
            % 256) / np.float32(255.0)
    ds = ArrayDataset(imgs, np.arange(8) % 3)
    full = list(BatchLoader(ds, 4, seed=5, mask_padding=True, prefetch=0,
                            uint8_transfer=True))
    parts = [list(BatchLoader(ds, 4, seed=5, mask_padding=True, prefetch=0,
                              uint8_transfer=True, local_bounds=b))
             for b in [(0, 2), (2, 4)]]
    for i, (x, y) in enumerate(full):
        x_cat = np.concatenate([parts[k][i][0] for k in range(2)])
        assert x_cat.dtype == np.uint8
        np.testing.assert_array_equal(x_cat, x)


# ----------------------------------------------------- runtime wrappers

def test_host_batch_bounds_single_process_owns_everything():
    from gslora_tpu.config import MeshConfig
    from gslora_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(MeshConfig(data=4, model=2))
    assert host_batch_bounds(mesh, 16) == (0, 16)


def test_make_global_batch_single_process_matches_device_put():
    import jax
    from gslora_tpu.config import MeshConfig
    from gslora_tpu.parallel.mesh import make_mesh, shard_batch
    mesh = make_mesh(MeshConfig(data=4, model=2))
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    a = make_global_batch(mesh, x)
    b = shard_batch(mesh, x)
    assert a.sharding.is_equivalent_to(b.sharding, a.ndim)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_make_global_batch_guards_local_shape(monkeypatch):
    """On a pod, feeding the full global batch (the single-process habit)
    must raise with the expected row span — simulate a 2-process world by
    patching the ownership the wrappers consult. The ownership maps and
    bounds are lru_cached off the hot path, so each patch clears them."""
    from gslora_tpu.config import MeshConfig
    from gslora_tpu.parallel import multihost
    from gslora_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(MeshConfig(data=4, model=2))

    def patch_blocks(mapping):
        monkeypatch.setattr(multihost, "process_block_map",
                            lambda names, proc: mapping)
        multihost._process_blocks.cache_clear()
        multihost._host_batch_bounds_cached.cache_clear()

    patch_blocks({0: [0, 1], 1: [2, 3]})
    monkeypatch.setattr(multihost, "host_batch_bounds",
                        lambda m, gb, process_index=None: (0, gb // 2))
    x = np.zeros((16, 3), np.float32)  # full batch; process 0 owns rows 0-7
    with pytest.raises(ValueError, match="must feed rows"):
        make_global_batch(mesh, x, process_index=0, global_batch=16)
    # un-annotated feeds resolve against the loader-declared batch sizes:
    # a full-global-batch feed matches no declared size's per-process
    # share and raises IMMEDIATELY (the round-5 review-pass guard)
    monkeypatch.setattr(multihost, "_DECLARED_BATCHES", {16})
    with pytest.raises(ValueError, match="full-global-batch feed"):
        make_global_batch(mesh, x, process_index=0)
    # raw inference without any declarations rejects impossible splits
    # (16 local rows cannot be 3-of-4 blocks of any integer global batch)
    monkeypatch.setattr(multihost, "_DECLARED_BATCHES", set())
    patch_blocks({0: [0, 1, 2], 1: [3]})
    with pytest.raises(ValueError, match="integer global batch"):
        make_global_batch(mesh, x, process_index=0)
    multihost._process_blocks.cache_clear()
    multihost._host_batch_bounds_cached.cache_clear()


def test_process_sharded_loader_single_process():
    """On one process the sharded loader degrades to the full loader."""
    from gslora_tpu.config import MeshConfig
    from gslora_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(MeshConfig(data=4, model=2))
    ds = _dataset(n=16)
    full = list(BatchLoader(ds, 8, seed=2, mask_padding=True, prefetch=0))
    shard = list(process_sharded_loader(mesh, ds, 8, seed=2, prefetch=0))
    for (x, y), (xs, ys) in zip(full, shard):
        np.testing.assert_array_equal(x, xs)
        np.testing.assert_array_equal(y, ys)
