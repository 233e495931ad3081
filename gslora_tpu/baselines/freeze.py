"""Reference baseline param-freezing semantics (round-5 parity fix).

Every reference CL-baseline branch (EWC/MAS/L2/LwF/DER/DER++/FDR/SCRUB
and the open single-step reg family — NOT LIRF, which scopes its
optimizer to student_model_low separately) freezes the margin head
before training:

* ``"loss" in n and not args.ffn_open`` -> ``requires_grad = False``
  (train_own_forget_cl.py:426, train_own_forget_cl_open.py:316,
  train_own_forget_open.py:711; ``--ffn_open`` default False,
  util/args.py:301) — the margin head (the reference model's ``loss``
  module = our ``params["base"]["head"]``) never trains in a baseline
  run unless --ffn_open;
* ``data_mode == "imagenet100"`` additionally freezes ``"head"``
  UNCONDITIONALLY (train_own_forget_cl.py:429-431) — the surgered
  torchvision class head;
* ``--only_ffn`` (util/args.py:304, cl.py:432-439) then inverts the
  default: ONLY ``"fn.fn.net"`` (the FFN Linears = our blocks fc1/fc2 and
  their LoRA factors) and ``"loss"`` train, everything else is frozen.

torch realizes freezing as grad=None params that the optimizer skips
entirely (no moments, no weight decay). The TPU equivalent here zeroes
the frozen leaves of the optimizer's UPDATE pytree — trajectories are
identical (AdamW has no cross-leaf coupling; a zero update leaves the
param bit-unchanged, and decoupled weight decay rides the update so it
is zeroed too). Importance/anchor pytrees may keep their frozen leaves:
with the param pinned, (p - p*) == 0 and the quadratic-penalty term
contributes exactly nothing, matching the reference's requires_grad
filter (train_own_forget_open.py:878-880) for free.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _path_keys(path) -> list:
    return [k.key for k in path if hasattr(k, "key")]


def mask_updates(updates, *, ffn_open: bool = False, only_ffn: bool = False,
                 imagenet: bool = False):
    """Zero the frozen leaves of an optimizer update pytree (static
    structure surgery — the flags are trace-time python bools, so the
    frozen branches compile to nothing)."""
    if only_ffn:
        def trainable(keys):
            if keys[:1] == ["lora"]:
                return "ffn" in keys  # FFN LoRA factors ride fn.fn.net.*
            if "fc1" in keys or "fc2" in keys:
                return True
            # "loss" is re-enabled by the only_ffn loop on the face models;
            # the imagenet model has no "loss" module and its "head" stays
            # frozen (set before the only_ffn loop, not matched inside it)
            return keys[:2] == ["base", "head"] and not imagenet
    else:
        head_trains = ffn_open and not imagenet
        if head_trains:
            return updates

        def trainable(keys):
            return keys[:2] != ["base", "head"]

    return jax.tree_util.tree_map_with_path(
        lambda p, u: u if trainable(_path_keys(p)) else jnp.zeros_like(u),
        updates)


def freeze_flags(cfg) -> dict:
    """The (static, hashable) mask_updates kwargs for a RunConfig."""
    return {"ffn_open": cfg.baseline.ffn_open,
            "only_ffn": cfg.baseline.only_ffn,
            "imagenet": cfg.data.data_mode == "imagenet100"}
