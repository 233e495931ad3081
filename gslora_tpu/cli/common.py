"""Shared driver plumbing: dataset construction, model init/resume."""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def setup_jax_runtime(rng_impl: Optional[str] = None,
                      cache_dir: Optional[str] = None) -> None:
    """Driver-level runtime knobs: persistent compilation cache (first
    compiles on tunneled TPUs run 1-2 minutes; cached reruns are instant)
    and the PRNG implementation ('rbg' = hardware RNG, ~17ms/step cheaper
    dropout on v5e than threefry)."""
    cache = cache_dir or os.environ.get("GSLORA_COMPILE_CACHE",
                                        os.path.expanduser(
                                            "~/.cache/gslora_xla"))
    # Partition the cache by platform: XLA:CPU AOT entries embed host
    # machine features, and loading an entry produced under different
    # features fails noisily (cpu_aot_loader "machine type doesn't match")
    # on every program — one dir per platform keeps TPU entries (the ones
    # that matter: 1-2 min compiles over the relay) clean.
    try:
        platform = (jax.config.jax_platforms or "default").split(",")[0]
    except AttributeError:
        platform = "default"
    cache = os.path.join(cache, platform)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    impl = rng_impl or os.environ.get("GSLORA_PRNG_IMPL")
    if impl:
        jax.config.update("jax_default_prng_impl", impl)

from gslora_tpu.config import RunConfig
from gslora_tpu.data.folders import Dataset, ImageFolderDataset
from gslora_tpu.data.synthetic import synthetic_face_dataset
from gslora_tpu.models.import_torch import import_reference_checkpoint
from gslora_tpu.models.vit import init_vit_params
from gslora_tpu.models.vit_imagenet import from_torchvision_state_dict
from gslora_tpu.checkpoints.io import load_pytree


def build_datasets(cfg: RunConfig) -> Tuple[Dataset, Dataset]:
    """(train, test) datasets per cfg.data (reference config.py DATA_ROOT
    layout: <root>/train, <root>/test class folders)."""
    d = cfg.data
    if d.data_mode == "synthetic" or d.data_root == "synthetic":
        train = synthetic_face_dataset(
            num_classes=cfg.model.num_class, per_class=20,
            image_size=cfg.model.image_size, seed=d.seed, noise=1.0)
        test = synthetic_face_dataset(
            num_classes=cfg.model.num_class, per_class=5,
            image_size=cfg.model.image_size, seed=d.seed + 1, noise=1.0)
        return train, test
    imagenet = d.data_mode == "imagenet100"
    # --uint8_transfer on the ImageNet path: decode stops at raw uint8
    # (mean/std moves on-device via ViTConfig.input_norm="imagenet").
    # The face path instead keeps the native float decoder and quantizes
    # in the loader (exact k/255 round-trip) — see BatchLoader.
    raw_u8 = imagenet and d.uint8_transfer
    train = ImageFolderDataset(os.path.join(d.data_root, "train"),
                               image_size=cfg.model.image_size,
                               imagenet_eval=imagenet, raw_uint8=raw_u8)
    test = ImageFolderDataset(os.path.join(d.data_root, "test"),
                              image_size=cfg.model.image_size,
                              imagenet_eval=imagenet,
                              class_order=train.classes, raw_uint8=raw_u8)
    return train, test


def build_params(cfg: RunConfig, seed: Optional[int] = None):
    """Init params, then resume from cfg.resume if set. Supported resume
    formats: reference .pth state_dict (torch pickle), torchvision .pth
    (VIT_B16), or our .msgpack pytree."""
    pdt = jnp.bfloat16 if cfg.param_dtype == "bfloat16" else jnp.float32
    params = init_vit_params(jax.random.key(seed if seed is not None
                                            else cfg.data.seed),
                             cfg.model, cfg.lora, param_dtype=pdt)
    if not cfg.resume:
        return params
    path = cfg.resume
    if path.endswith(".msgpack"):
        # Mirror the reference's strict=False-with-only-lora-missing resume
        # (train_own_forget.py:629-638) for our own format too: a rank-0
        # pretrain checkpoint must load into a rank>0 forget run (the
        # run_pretrain.sh -> run_forget.sh chain), with the absent LoRA
        # keeping its fresh init; any missing NON-lora key still aborts.
        from flax import serialization
        with open(path, "rb") as fh:
            raw = serialization.msgpack_restore(fh.read())
        raw_lora = raw.get("lora") if isinstance(raw, dict) else None
        if isinstance(raw, dict) and set(raw) == {"base", "lora"} and \
                jax.tree.structure(raw_lora) != \
                jax.tree.structure(params.get("lora", {})):
            if raw_lora and not params.get("lora"):
                # torch treats these as warned unexpected_keys, not fatal
                import warnings
                warnings.warn(f"resume {path}: dropping its LoRA tree "
                              f"(this run has lora_rank=0)", stacklevel=2)
            elif raw_lora:
                raise ValueError(
                    f"Wrong resume: {path} carries a LoRA tree that does "
                    f"not match lora_rank={cfg.lora.rank} "
                    f"(train_own_forget.py:629-638 aborts likewise)")
            merged = dict(raw)
            merged["lora"] = params["lora"]
            return serialization.from_state_dict(params, merged)
        # structures match: restore from the already-parsed bytes instead
        # of load_pytree re-reading the file (a full-model checkpoint is
        # hundreds of MB — one parse, not two)
        return serialization.from_state_dict(params, raw)
    if cfg.net == "VIT_B16":
        from gslora_tpu.models.import_torch import load_torch_state_dict
        sd = load_torch_state_dict(path)
        imported = from_torchvision_state_dict(sd, cfg.model, cfg.lora,
                                               param_dtype=pdt)
    else:
        imported = import_reference_checkpoint(path, cfg.model, cfg.lora,
                                               param_dtype=pdt)
    # reference resume is strict=False with only lora_* keys allowed absent
    # (train_own_forget.py:629-638): absent LoRA keeps its fresh init
    # (kaiming A, zero B) rather than the importer's zero placeholder
    if imported.get("lora") and params.get("lora"):
        all_zero = all(float(jnp.abs(leaf).max()) == 0.0
                       for leaf in jax.tree.leaves(imported["lora"]))
        if all_zero:
            imported["lora"] = params["lora"]
    return imported


def _imagenet_global_index(data_root: str):
    """wnid -> ImageNet-1k index from <data_root>/imagenet_folder_names.txt
    (the file the reference requires, train_own_forget_cl.py:148-155)."""
    path = os.path.join(data_root, "imagenet_folder_names.txt")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        classes = [ln.strip() for ln in f if ln.strip()]
    return {c: i for i, c in enumerate(classes)}


def prepare_imagenet_head(cfg, params, train_ds):
    """ImageNet-100 head surgery (reference modify_head flow,
    train_own_forget_cl.py:180-296): when the resumed torchvision head is
    1000-way, slice it down to the run's classes via the wnid->index map.
    Returns (params, original_head-or-None); the original head feeds the
    missing-class eval (resume_head)."""
    head = params["base"].get("head", {})
    w = head.get("weight")
    C = cfg.model.num_class
    if w is None or w.shape[0] == C:
        return params, None
    idx_of = _imagenet_global_index(cfg.data.data_root)
    if idx_of is not None:
        missing = [c for c in train_ds.classes if c not in idx_of]
        if missing:
            raise ValueError(
                f"dataset classes not in the ImageNet-1k list: "
                f"{missing[:5]} (train_own_forget_cl.py:183-186 assert)")
        class_id_map = {i: idx_of[c] for i, c in enumerate(train_ds.classes)}
    else:
        import warnings
        warnings.warn(
            "imagenet_folder_names.txt not found under data_root — slicing "
            f"the first {C} head rows (class identity NOT aligned with "
            "ImageNet-1k indices)")
        class_id_map = {i: i for i in range(C)}
    from gslora_tpu.models.vit_imagenet import modify_head
    out = modify_head(params, class_id_map)
    original = out.pop("original_head")
    print(f"sliced ImageNet head {w.shape[0]} -> {C} classes")
    return out, original


def build_missing_dataset(cfg, miss_root: str):
    """Held-out-class val set with GLOBAL ImageNet-1k labels (reference
    ImageNet900 construction, train_own_forget_cl.py:160-178)."""
    idx_of = _imagenet_global_index(cfg.data.data_root)
    if idx_of is None:
        raise FileNotFoundError(
            "imagenet_folder_names.txt required under data_root for the "
            "missing-class eval")
    entries = []
    for cls in sorted(os.listdir(miss_root)):
        cdir = os.path.join(miss_root, cls)
        if not os.path.isdir(cdir):
            continue
        if cls not in idx_of:
            raise ValueError(f"held-out class {cls!r} not in the global "
                             "1000-class list (cl.py:170-171)")
        for fn in sorted(os.listdir(cdir)):
            if fn.lower().endswith((".jpg", ".jpeg", ".png")):
                entries.append((os.path.join(cdir, fn), idx_of[cls]))
    from gslora_tpu.data.folders import PathListDataset
    return PathListDataset(entries, image_size=cfg.model.image_size)
