"""Import reference PyTorch ``.pth`` checkpoints into our pytree layout.

The reference ships ViT_face state_dicts with names like
``transformer.layers.{i}.1.fn.fn.net.0.lora_A`` (engine.py:585-656 shows the
full template). This module maps that naming onto the stacked pytree of
models/vit.py — kernels transposed to (fan_in, fan_out), per-layer tensors
stacked on the leading layer axis, MergedLinear qkv LoRA reshaped to
(3, r, ·).

torch is only needed to unpickle (CPU); pass an already-loaded
``{name: np.ndarray}`` dict to ``from_state_dict`` to avoid torch entirely.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from gslora_tpu.config import LoraConfig, ViTConfig


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def from_state_dict(sd: Dict[str, np.ndarray], model: ViTConfig,
                    lora: Optional[LoraConfig] = None,
                    param_dtype=jnp.float32,
                    strict_lora: bool = False) -> Dict:
    """state_dict (reference naming) -> {"base": ..., "lora": ...}.

    Missing LoRA keys are tolerated like the reference's strict=False resume
    that only allows lora_* keys to be absent (train_own_forget.py:629-638):
    absent LoRA is initialized to zeros (A AND B — callers wanting fresh
    kaiming A should reinit_lora afterwards). Missing non-LoRA keys raise.
    """
    L, d, m, inner = model.depth, model.dim, model.mlp_dim, model.inner_dim
    dt = param_dtype

    def get(name):
        if name not in sd:
            raise KeyError(f"reference checkpoint missing non-LoRA key "
                           f"{name!r}")
        return np.asarray(sd[name])

    def stack(fmt, transpose=False):
        arrs = [get(fmt.format(i)) for i in range(L)]
        out = np.stack([a.T if transpose else a for a in arrs])
        return jnp.asarray(out, dt)

    base = {
        "patch": {"kernel": jnp.asarray(get("patch_to_embedding.weight").T, dt),
                  "bias": jnp.asarray(get("patch_to_embedding.bias"), dt)},
        "cls_token": jnp.asarray(get("cls_token").reshape(-1), dt),
        "pos_embed": jnp.asarray(get("pos_embedding").reshape(
            model.seq_len, d), dt),
        "blocks": {
            "attn_ln": {
                "scale": stack("transformer.layers.{}.0.fn.norm.weight"),
                "bias": stack("transformer.layers.{}.0.fn.norm.bias"),
            },
            "qkv": {"kernel": stack(
                "transformer.layers.{}.0.fn.fn.to_qkv.weight",
                transpose=True)},
            "attn_out": {
                "kernel": stack(
                    "transformer.layers.{}.0.fn.fn.to_out.0.weight",
                    transpose=True),
                "bias": stack("transformer.layers.{}.0.fn.fn.to_out.0.bias"),
            },
            "ffn_ln": {
                "scale": stack("transformer.layers.{}.1.fn.norm.weight"),
                "bias": stack("transformer.layers.{}.1.fn.norm.bias"),
            },
            "fc1": {
                "kernel": stack("transformer.layers.{}.1.fn.fn.net.0.weight",
                                transpose=True),
                "bias": stack("transformer.layers.{}.1.fn.fn.net.0.bias"),
            },
            "fc2": {
                "kernel": stack("transformer.layers.{}.1.fn.fn.net.3.weight",
                                transpose=True),
                "bias": stack("transformer.layers.{}.1.fn.fn.net.3.bias"),
            },
        },
        "head_ln": {"scale": jnp.asarray(get("mlp_head.0.weight"), dt),
                    "bias": jnp.asarray(get("mlp_head.0.bias"), dt)},
    }
    if "loss.weight" in sd:
        base["head"] = {"weight": jnp.asarray(get("loss.weight"), dt)}
        if "loss.bias" in sd:
            base["head"]["bias"] = jnp.asarray(get("loss.bias"), dt)
    elif model.head_type != "None":
        # fail at load time with the offending key, not with a KeyError
        # deep inside the first jitted forward (the reference's
        # load_state_dict(strict=True) would flag the same mismatch)
        raise KeyError(
            f"checkpoint has no 'loss.weight' but head_type="
            f"{model.head_type!r} needs one — a backbone-only .pth can "
            f"only be loaded with head_type='None'; to train a fresh head "
            f"on top, add a 'loss.weight' entry to the state dict (or save "
            f"a full-tree .msgpack snapshot and resume from that)")

    lora_tree: Dict = {}
    if lora is not None and lora.rank > 0:
        r = lora.rank

        def lora_stack(fmt, shape):
            arrs = []
            for i in range(L):
                name = fmt.format(i)
                if name in sd:
                    arrs.append(np.asarray(sd[name]))
                elif strict_lora:
                    raise KeyError(name)
                else:
                    arrs.append(np.zeros(shape, np.float32))
            return jnp.asarray(np.stack(arrs), jnp.float32)

        if lora.pos == "FFN":
            lora_tree["ffn"] = {
                "A1": lora_stack(
                    "transformer.layers.{}.1.fn.fn.net.0.lora_A", (r, d)),
                "B1": lora_stack(
                    "transformer.layers.{}.1.fn.fn.net.0.lora_B", (m, r)),
                "A2": lora_stack(
                    "transformer.layers.{}.1.fn.fn.net.3.lora_A", (r, m)),
                "B2": lora_stack(
                    "transformer.layers.{}.1.fn.fn.net.3.lora_B", (d, r)),
            }
        elif lora.pos == "Attention":
            A = lora_stack("transformer.layers.{}.0.fn.fn.to_qkv.lora_A",
                           (3 * r, d))
            B = lora_stack("transformer.layers.{}.0.fn.fn.to_qkv.lora_B",
                           (3 * inner, r))
            lora_tree["attn"] = {
                "A": A.reshape(L, 3, r, d),
                "B": B.reshape(L, 3, inner, r),
            }
    return {"base": base, "lora": lora_tree}


def import_reference_checkpoint(path: str, model: ViTConfig,
                                lora: Optional[LoraConfig] = None,
                                param_dtype=jnp.float32) -> Dict:
    return from_state_dict(load_torch_state_dict(path), model, lora,
                           param_dtype)


def to_state_dict(params: Dict, model: ViTConfig) -> Dict[str, np.ndarray]:
    """Export our pytree back to reference naming (round-trip/compat)."""
    base = params["base"]
    sd: Dict[str, np.ndarray] = {
        "patch_to_embedding.weight": np.asarray(base["patch"]["kernel"]).T,
        "patch_to_embedding.bias": np.asarray(base["patch"]["bias"]),
        "cls_token": np.asarray(base["cls_token"]).reshape(1, 1, -1),
        "pos_embedding": np.asarray(base["pos_embed"])[None],
        "mlp_head.0.weight": np.asarray(base["head_ln"]["scale"]),
        "mlp_head.0.bias": np.asarray(base["head_ln"]["bias"]),
    }
    b = base["blocks"]
    for i in range(model.depth):
        p = f"transformer.layers.{i}"
        sd[f"{p}.0.fn.norm.weight"] = np.asarray(b["attn_ln"]["scale"][i])
        sd[f"{p}.0.fn.norm.bias"] = np.asarray(b["attn_ln"]["bias"][i])
        sd[f"{p}.0.fn.fn.to_qkv.weight"] = np.asarray(
            b["qkv"]["kernel"][i]).T
        sd[f"{p}.0.fn.fn.to_out.0.weight"] = np.asarray(
            b["attn_out"]["kernel"][i]).T
        sd[f"{p}.0.fn.fn.to_out.0.bias"] = np.asarray(
            b["attn_out"]["bias"][i])
        sd[f"{p}.1.fn.norm.weight"] = np.asarray(b["ffn_ln"]["scale"][i])
        sd[f"{p}.1.fn.norm.bias"] = np.asarray(b["ffn_ln"]["bias"][i])
        sd[f"{p}.1.fn.fn.net.0.weight"] = np.asarray(b["fc1"]["kernel"][i]).T
        sd[f"{p}.1.fn.fn.net.0.bias"] = np.asarray(b["fc1"]["bias"][i])
        sd[f"{p}.1.fn.fn.net.3.weight"] = np.asarray(b["fc2"]["kernel"][i]).T
        sd[f"{p}.1.fn.fn.net.3.bias"] = np.asarray(b["fc2"]["bias"][i])
    if "head" in base:
        sd["loss.weight"] = np.asarray(base["head"]["weight"])
        if "bias" in base["head"]:
            sd["loss.bias"] = np.asarray(base["head"]["bias"])
    lt = params.get("lora", {})
    if "ffn" in lt:
        f = lt["ffn"]
        for i in range(model.depth):
            p = f"transformer.layers.{i}.1.fn.fn"
            sd[f"{p}.net.0.lora_A"] = np.asarray(f["A1"][i])
            sd[f"{p}.net.0.lora_B"] = np.asarray(f["B1"][i])
            sd[f"{p}.net.3.lora_A"] = np.asarray(f["A2"][i])
            sd[f"{p}.net.3.lora_B"] = np.asarray(f["B2"][i])
    if "attn" in lt:
        a = lt["attn"]
        L = a["A"].shape[0]
        for i in range(L):
            p = f"transformer.layers.{i}.0.fn.fn.to_qkv"
            sd[f"{p}.lora_A"] = np.asarray(a["A"][i]).reshape(-1,
                                                              a["A"].shape[-1])
            sd[f"{p}.lora_B"] = np.asarray(a["B"][i]).reshape(-1,
                                                              a["B"].shape[-1])
    return sd
