"""Device mesh + sharding layout.

TPU-native replacement for the reference's parallelism (SURVEY.md §2.10):
``nn.DataParallel`` replicate/scatter/gather (train_own.py:403-406) becomes
batch sharding over a ``data`` mesh axis — XLA all-reduces grads over ICI —
and the hand-chunked model-parallel heads (vit_face.py:37-51) become a
NamedSharding of the (num_class, dim) head weight over an optional ``model``
axis; XLA partitions the head matmul + CE logsumexp with the right
collectives automatically.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gslora_tpu.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"
# Optional outermost multi-slice axis (MeshConfig.slices > 1): pure data
# parallelism whose collectives ride DCN. Within-slice sharding (tp/pp
# over `model`, fsdp weight shards over `data`) stays on ICI — only the
# once-per-step gradient all-reduce crosses the slow inter-slice links,
# the layout the scaling playbook prescribes for multi-slice training.
DCN_AXIS = "dcn"


def batch_axes(mesh: Mesh):
    """The mesh axes the batch dim shards over: ('dcn', 'data') on a
    multi-slice mesh, plain 'data' otherwise."""
    return (DCN_AXIS, DATA_AXIS) if DCN_AXIS in mesh.axis_names \
        else DATA_AXIS


def data_parallel_size(mesh: Optional[Mesh]) -> int:
    """Total data-parallel ways (dcn x data) — what batch sizes must
    divide."""
    if mesh is None:
        return 1
    return mesh.shape.get(DCN_AXIS, 1) * mesh.shape.get(DATA_AXIS, 1)

# Trace-time hint for ops that need an explicit mesh (the blocked Pallas
# attention kernel runs per-shard under jax.shard_map — a Mosaic custom
# call carries no GSPMD partitioning rule, so without this the partitioner
# would replicate its operands). Registered by placement()/the train loops
# before the step is traced; None = single-device, no wrapping.
_ATTENTION_MESH: Optional[Mesh] = None


def set_attention_mesh(mesh: Optional[Mesh]) -> None:
    global _ATTENTION_MESH
    _ATTENTION_MESH = mesh


def attention_mesh() -> Optional[Mesh]:
    return _ATTENTION_MESH


# Trace-time hint for GPipe pipeline parallelism (parallel/pipeline.py):
# (mesh, n_micro) or None. Like the attention mesh, a shard_map needs the
# concrete Mesh at trace time — registered by placement(pp=True); cached
# jitted steps must key on it (engine.loop._cached_step does).
_PIPELINE: Optional[tuple] = None


def set_pipeline(mesh: Optional[Mesh], n_micro: int = 0) -> None:
    global _PIPELINE
    if mesh is None:
        _PIPELINE = None
    else:
        stages = mesh.shape[MODEL_AXIS]
        _PIPELINE = (mesh, n_micro if n_micro > 0 else stages)


def pipeline_config() -> Optional[tuple]:
    return _PIPELINE


def pipeline_cache_key() -> Optional[tuple]:
    """Hashable identity of the registered pipeline (None when unset).

    pipeline_config() is read at TRACE time, so any lru-cached jitted-step
    builder whose trace embeds the pipeline shard_map (engine.loop's train
    step, make_eval_step, the prototype embed) must fold this into its
    cache key — otherwise two runs differing only in pp/pp_micro silently
    share one traced executable."""
    if _PIPELINE is None:
        return None
    mesh, n_micro = _PIPELINE
    return (n_micro, _mesh_key(mesh))


def _mesh_key(mesh: Mesh) -> tuple:
    return (mesh.axis_names, mesh.devices.shape,
            tuple(d.id for d in mesh.devices.flat))


# Trace-time hint for Megatron-style sequence parallelism
# (MeshConfig.sp): the token dim of the block activations is sharded over
# ``model`` between the matmul regions (with_sharding_constraint at layer
# boundaries; GSPMD derives the all-gather / reduce-scatter pairs around
# attention and the tp-sharded FFN). Registered by placement(sp=True).
_SEQUENCE: Optional[Mesh] = None


def set_sequence_sharding(mesh: Optional[Mesh]) -> None:
    global _SEQUENCE
    _SEQUENCE = mesh


def sequence_mesh() -> Optional[Mesh]:
    return _SEQUENCE


def sequence_sharding_constraint(x: jax.Array) -> jax.Array:
    """Constrain (B, n, d) activations to P(data, model, None) when
    sequence parallelism is registered; identity otherwise. GSPMD handles
    the non-divisible token count (197 = 196 patches + CLS) by padding
    internally — no shape change is visible here."""
    if _SEQUENCE is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(_SEQUENCE,
                         P(batch_axes(_SEQUENCE), MODEL_AXIS, None)))


def spmd_cache_key() -> Optional[tuple]:
    """Combined trace-time SPMD registry identity (pipeline + sequence
    sharding). engine.loop.step_cache folds this into every cached
    jitted-step builder's key automatically; eval/prototype builders use
    it directly."""
    seq = None if _SEQUENCE is None else _mesh_key(_SEQUENCE)
    pp = pipeline_cache_key()
    if seq is None and pp is None:
        return None
    return (pp, seq)


def make_mesh(cfg: Optional[MeshConfig] = None, devices=None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(cfg.model, 1)
    slices = max(cfg.slices, 1)
    data = cfg.data if cfg.data > 0 else n // (model * slices)
    assert data >= 1 and slices * data * model <= n, \
        f"mesh {slices}x{data}x{model} does not fit {n} devices"
    if slices > 1:
        # multi-slice: outermost `dcn` axis. On real multi-slice TPU the
        # hybrid mesh groups each slice's chips into one dcn row so the
        # data/model axes stay on ICI; a reshape there could interleave
        # physical slices into one dcn row and silently push the per-layer
        # fsdp/tp collectives onto DCN, so the fallback is ONLY for
        # single-granule platforms (CPU tests, one slice's worth of
        # devices — topologically equivalent). Real topology mismatches
        # (e.g. --mesh_slices 2 on a 4-slice pod) fail loudly inside
        # create_hybrid_device_mesh.
        use = devices[: slices * data * model]
        granules = {getattr(d, "slice_index",
                            getattr(d, "process_index", 0)) for d in use}
        if len(granules) > 1:
            from jax.experimental import mesh_utils
            arr = mesh_utils.create_hybrid_device_mesh(
                (1, data, model), (slices, 1, 1), use)
        else:
            arr = np.asarray(use).reshape(slices, data, model)
        return Mesh(arr, (DCN_AXIS, DATA_AXIS, MODEL_AXIS))
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over the data-parallel axes (dcn x data on a
    multi-slice mesh)."""
    return NamedSharding(mesh, P(batch_axes(mesh)))


def shard_batch(mesh: Mesh, *arrays):
    """Place host arrays with batch-dim sharding over the data-parallel
    axes (dcn x data on a multi-slice mesh).

    Multi-host (jax.process_count() > 1): each process passes ONLY its
    local rows (BatchLoader(local_bounds=...) / multihost.
    process_sharded_loader) and the global Array is assembled via
    jax.make_array_from_process_local_data — a full-global-batch feed
    raises with the expected row span (parallel/multihost.py)."""
    if jax.process_count() > 1:
        from gslora_tpu.parallel.multihost import make_global_batch
        out = tuple(make_global_batch(mesh, a) for a in arrays)
        return out if len(out) > 1 else out[0]
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def check_batch_divisible(mesh: Optional[Mesh], batch_size: int) -> None:
    """Fail fast when a batch cannot shard evenly over the mesh's
    data-parallel ways (dcn x data) — the shared guard for every driver/
    loop; without it the run dies minutes later inside jit with a cryptic
    sharding error."""
    if mesh is None:
        return
    dsize = data_parallel_size(mesh)
    if batch_size % dsize != 0:
        raise ValueError(
            f"batch_size {batch_size} not divisible by the mesh "
            f"data-parallel ways ({dsize}) — padded batches cannot shard")


# TP rules: (path names to match, leaf ndim, sharded dim) over `model`.
# fc1 (L, d, m) by columns + its bias, fc2 (L, m, d) by rows, and the LoRA
# factors carrying the hidden dim (B1 (L, m, r) rows, A2 (L, r, m) columns)
# so factored deltas and the merged B@A fold land on the local shard with
# no resharding. Attention stays replicated: its fused qkv kernel
# interleaves q/k/v at thirds that don't align with power-of-two shard
# boundaries — splitting it would buy an all-to-all per layer.
_TP_RULES = (
    (("fc1", "kernel"), 3, 2),
    (("fc1", "bias"), 2, 1),
    (("fc2", "kernel"), 3, 1),
    (("ffn", "B1"), 3, 1),
    (("ffn", "A2"), 3, 2),
)

# FSDP rules: the big stacked block kernels, each sharded on its model-dim
# ``d`` over `data` — disjoint from the TP dims so tp+fsdp compose to e.g.
# fc1 P(None, data, model). Optimizer moments inherit via zeros_like, so
# param + moment memory scales 1/data (ZeRO); XLA all-gathers weights
# just-in-time or keeps partial matmuls + psum, whichever it schedules.
_FSDP_RULES = (
    (("qkv", "kernel"), 3, 1),
    (("attn_out", "kernel"), 3, 2),
    (("fc1", "kernel"), 3, 1),
    (("fc2", "kernel"), 3, 2),
)


def param_shardings(mesh: Mesh, params, shard_head: bool = True,
                    tp: bool = False, fsdp: bool = False,
                    pp: bool = False):
    """Replicate everything; optionally shard the classification head's
    class dim over ``model`` (capability parity with the reference's
    model-parallel heads).

    ``tp=True`` (MeshConfig.tp) adds Megatron-style tensor parallelism over
    the ``model`` axis and ``fsdp=True`` ZeRO-style kernel/moment sharding
    over the ``data`` axis — see _TP_RULES/_FSDP_RULES. XLA derives every
    collective schedule from these NamedShardings alone. Sharded dims must
    divide evenly; guarded here with a clear error instead of GSPMD's
    compile-time one."""
    replicated = NamedSharding(mesh, P())
    head_sh = NamedSharding(mesh, P(MODEL_AXIS, None))
    mp = mesh.shape[MODEL_AXIS]
    dp = mesh.shape[DATA_AXIS]
    if pp and (tp or fsdp):
        raise ValueError("pp excludes tp/fsdp: pipeline stages own the "
                         "model axis and the pipeline body is a fully "
                         "manual shard_map")
    active = []
    if tp and mp > 1:
        active.append(("tp", _TP_RULES, MODEL_AXIS, mp))
    if fsdp and dp > 1:
        active.append(("fsdp", _FSDP_RULES, DATA_AXIS, dp))
    pp_sh = NamedSharding(mesh, P(MODEL_AXIS))

    def place(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if pp and mp > 1 and ("blocks" in names or "ffn" in names or
                              "attn" in names):
            # pipeline stages: every stacked (L, ...) leaf sharded on the
            # layer dim (blocks + the LoRA trees, whose top-level keys are
            # "ffn"/"attn")
            if leaf.shape[0] % mp != 0:
                raise ValueError(
                    f"pp: depth {leaf.shape[0]} of "
                    f"{'/'.join(map(str, names))} not divisible by the "
                    f"model axis ({mp} stages)")
            return pp_sh
        if shard_head and not pp and "head" in names and \
                "weight" in names and leaf.ndim == 2 and mp > 1:
            if leaf.shape[0] % mp != 0:
                raise ValueError(
                    f"head weight class dim {leaf.shape[0]} not divisible "
                    f"by model axis {mp} — pick a model axis that divides "
                    f"num_class")
            return head_sh
        spec = [None] * leaf.ndim
        hit = False
        for mode, rules, axis, size in active:
            for keys, ndim, dim in rules:
                if all(k in names for k in keys) and leaf.ndim == ndim:
                    if leaf.shape[dim] % size != 0:
                        raise ValueError(
                            f"{mode}=True: {'/'.join(map(str, names))} dim "
                            f"{dim} size {leaf.shape[dim]} not divisible "
                            f"by {axis} axis {size}")
                    spec[dim] = axis
                    hit = True
        return NamedSharding(mesh, P(*spec)) if hit else replicated

    return jax.tree_util.tree_map_with_path(place, params)


def replicate(mesh: Mesh, tree, tp: bool = False, fsdp: bool = False,
              pp: bool = False):
    """device_put a pytree with its param_shardings layout.

    Multi-host: every process holds the full params on host (identical
    init seed / identical checkpoint restore), and each addressable shard
    is served its slice via make_array_from_callback — works for every
    layout (replicated, tp/fsdp/pp shards) without device_put's
    non-addressable-sharding restrictions."""
    sh = param_shardings(mesh, tree, tp=tp, fsdp=fsdp, pp=pp)
    if jax.process_count() > 1:
        def put(x, s):
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, s,
                                                lambda idx: x[idx])
        return jax.tree.map(put, tree, sh)
    return jax.tree.map(jax.device_put, tree, sh)


def place_like(template, tree):
    """device_put every array leaf of ``tree`` with the sharding of the
    matching leaf in ``template`` — a live, correctly-sharded structure
    twin (e.g. a freshly created ForgetState under the mesh).

    This is the missing half of sharded fault recovery (SURVEY §5.3):
    ``checkpoints.io.restore_train_state`` returns host numpy arrays, and
    feeding those straight into a step compiled for tp/fsdp layouts would
    silently re-place everything replicated — a fresh multi-minute XLA
    compile on tunneled TPUs and, for ZeRO (fsdp) states at scale, the
    exact optimizer-moment memory blow-up the sharding exists to avoid."""
    def put(t, r):
        # only COMMITTED template leaves carry a meaningful layout (the
        # mesh-sharded params/moments); uncommitted scalars (optax count,
        # injected hyperparams, the step counter) must stay uncommitted —
        # device_put would pin them to one device and the next jitted step
        # would reject the mixed committed device sets
        if isinstance(t, jax.Array) and t.committed:
            return jax.device_put(r, t.sharding)
        return r
    return jax.tree.map(put, template, tree)


def placement(mesh: Optional[Mesh], tp: bool = False, fsdp: bool = False,
              pp: bool = False, pp_micro: int = 0, sp: bool = False):
    """(put_params, put_batch) pair for an optional mesh.

    With a mesh: put_params replicates a param pytree (head weight sharded
    over ``model`` when that axis is >1; FFN hidden dims too when
    ``tp=True``; block kernels over ``data`` when ``fsdp=True``; the
    stacked layer dim over ``model`` when ``pp=True`` — which also
    registers the pipeline for the trace) and put_batch shards arrays'
    leading dim over ``data``. ``sp=True`` registers Megatron-style
    sequence sharding of the block activations' token dim over ``model``
    (no param layout change — pure with_sharding_constraints in the
    transformer stack; composes with tp/fsdp, excludes pp whose shard_map
    body is manual over the same axis). With mesh=None both are plain
    asarray/identity — so every engine can take ``mesh=None`` and stay
    single-device with zero branching at call sites.
    """
    import jax.numpy as jnp

    # a requested parallelism the mesh cannot express would otherwise be a
    # SILENT no-op (everything stays replicated) — fail loudly instead
    if mesh is None:
        if tp or fsdp or pp or sp:
            raise ValueError(
                "tp/fsdp/pp/sp need a device mesh — run with --dp and a "
                "mesh that has the axis to shard over (--mesh_model N for "
                "tp/pp/sp; a data axis > 1 for fsdp)")
    else:
        if (tp or pp or sp) and mesh.shape[MODEL_AXIS] <= 1:
            which = "tp" if tp else ("pp" if pp else "sp")
            raise ValueError(
                f"{which}=True is a no-op on a model axis "
                f"of 1 — set --mesh_model N (mesh is "
                f"{dict(zip(mesh.axis_names, mesh.devices.shape))})")
        if fsdp and mesh.shape[DATA_AXIS] <= 1:
            raise ValueError(
                f"fsdp=True is a no-op on a data axis of 1 (mesh is "
                f"{dict(zip(mesh.axis_names, mesh.devices.shape))})")
        if sp and pp:
            raise ValueError(
                "sp excludes pp: the pipeline body is a fully manual "
                "shard_map over the model axis, so GSPMD sharding "
                "constraints cannot reference it there")

    set_attention_mesh(mesh)  # pallas attention shards per-device under it
    set_pipeline(mesh if (pp and mesh is not None and
                          mesh.shape[MODEL_AXIS] > 1) else None, pp_micro)
    set_sequence_sharding(mesh if (sp and mesh is not None) else None)
    if mesh is None:
        return (lambda t: t), \
            (lambda *a: tuple(jnp.asarray(x) for x in a))
    bs = batch_sharding(mesh)

    if jax.process_count() > 1:
        # multi-host: each process feeds only its local rows; the global
        # Array is assembled across processes (parallel/multihost.py) —
        # shape-guarded there so single-process-style full batches fail
        # loudly instead of silently mis-sharding
        from gslora_tpu.parallel.multihost import make_global_batch

        def put_batch(*arrays):
            return tuple(make_global_batch(mesh, np.asarray(a))
                         for a in arrays)
    else:
        def put_batch(*arrays):
            return tuple(jax.device_put(jnp.asarray(a), bs)
                         for a in arrays)

    return (lambda t: replicate(mesh, t, tp=tp, fsdp=fsdp, pp=pp)), \
        put_batch
