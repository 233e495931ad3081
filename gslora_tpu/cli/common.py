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
    train = ImageFolderDataset(os.path.join(d.data_root, "train"),
                               image_size=cfg.model.image_size,
                               imagenet_eval=imagenet)
    test = ImageFolderDataset(os.path.join(d.data_root, "test"),
                              image_size=cfg.model.image_size,
                              imagenet_eval=imagenet,
                              class_order=train.classes)
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
        return load_pytree(path, params)
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
