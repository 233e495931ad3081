"""gslora_tpu — a TPU-native continual-forgetting framework.

A from-scratch JAX/XLA/Pallas/pjit re-design with the capabilities of the
GS-LoRA / GS-LoRA++ reference ("Continual Forgetting for Pre-trained Vision
Models", CVPR'24; T-PAMI'26): face/vision transformers with LoRA adapters,
selective-forgetting losses (bounded forget CE, group-Lasso structure loss,
prototype regularization), a continual task loop, and the full baseline zoo
(EWC/MAS/L2/Retrain/Replay, LwF, DER/DER++, FDR, SCRUB, LIRF).

Design principles (TPU-first, not a port):
  * one jit-compiled train step fusing both (forget, remain) batches,
    all loss terms, grad and optimizer update;
  * models are pure pytrees; transformer blocks are stacked on a leading
    layer axis and applied with ``jax.lax.scan``;
  * LoRA params live in a separate stacked subtree so "mark only LoRA as
    trainable" is a tree split and the group-Lasso is a vectorized
    reduction over the layer axis (optionally a fused Pallas kernel);
  * scaling via ``jax.sharding.Mesh`` + NamedSharding (data axis, optional
    model axis for the classification head), XLA collectives over ICI.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import gslora_tpu` jax-free)."""
    surface = {
        "ViTConfig": "gslora_tpu.config",
        "LoraConfig": "gslora_tpu.config",
        "OptimConfig": "gslora_tpu.config",
        "ForgetConfig": "gslora_tpu.config",
        "RunConfig": "gslora_tpu.config",
        "init_vit_params": "gslora_tpu.models.vit",
        "vit_apply": "gslora_tpu.models.vit",
        "make_forget_step": "gslora_tpu.engine.forget",
        "run_forget_training": "gslora_tpu.engine.loop",
        "ForgetData": "gslora_tpu.engine.loop",
        "run_continual_forgetting": "gslora_tpu.engine.continual",
    }
    if name in surface:
        import importlib
        return getattr(importlib.import_module(surface[name]), name)
    raise AttributeError(f"module 'gslora_tpu' has no attribute {name!r}")
