"""ViT-B/16 (torchvision-equivalent) for the ImageNet-100 path.

The reference wraps torchvision vit_b_16 in ModifiedViT (modified_VIT.py:5-39)
and post-hoc swaps every FFN linear for lora.Linear
(util/utils.py:552-576 replace_ffn_with_lora). Here the SAME scanned
backbone (models/vit.py) expresses it via config: conv patch-embed ==
non-overlapping unfold with channel-major layout (our soft_split path with
kernel=stride=16, pad=0), qkv bias on, standard head-dim attention scale,
plain Linear (Softmax) head. The final encoder LayerNorm equals our
``head_ln`` on the pooled CLS token (LayerNorm is per-token, so norm-then-
select == select-then-norm).

Also: importer from a torchvision vit_b_16 state_dict, and the head
modify/resume utilities (util/utils.py:579-649) that slice the 1000-class
ImageNet head down to the run's 100 classes and restore it.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from gslora_tpu.config import LoraConfig, ViTConfig
from gslora_tpu.lora.core import init_lora


def vit_b16_config(num_class: int = 100) -> ViTConfig:
    return ViTConfig.vit_b16(num_class=num_class)


def from_torchvision_state_dict(sd: Dict[str, np.ndarray], model: ViTConfig,
                                lora: Optional[LoraConfig] = None,
                                param_dtype=jnp.float32,
                                lora_key=None) -> Dict:
    """torchvision vit_b_16 state_dict (optionally already LoRA-surgered
    with names ``encoder.layers.encoder_layer_{i}.mlp.{0,3}.lora_{A,B}``,
    engine_cl.py:349-432) -> our stacked pytree."""
    L, d = model.depth, model.dim
    dt = param_dtype

    def get(name):
        if name not in sd:
            raise KeyError(f"torchvision checkpoint missing {name!r}")
        return np.asarray(sd[name])

    def stack(fmt, transpose=False):
        arrs = [get(fmt.format(i)) for i in range(L)]
        return jnp.asarray(np.stack([a.T if transpose else a for a in arrs]),
                           dt)

    # conv_proj (768, 3, 16, 16) -> (patch_dim=c*k*k, 768); channel-major
    # flatten matches conv_general_dilated_patches' (c, kh, kw) ordering
    conv_w = get("conv_proj.weight").reshape(d, -1).T
    pre = "encoder.layers.encoder_layer_{}"
    base = {
        "patch": {"kernel": jnp.asarray(conv_w, dt),
                  "bias": jnp.asarray(get("conv_proj.bias"), dt)},
        "cls_token": jnp.asarray(get("class_token").reshape(-1), dt),
        "pos_embed": jnp.asarray(get("encoder.pos_embedding").reshape(
            model.seq_len, d), dt),
        "blocks": {
            "attn_ln": {"scale": stack(pre + ".ln_1.weight"),
                        "bias": stack(pre + ".ln_1.bias")},
            "qkv": {
                "kernel": stack(pre + ".self_attention.in_proj_weight",
                                transpose=True),
                "bias": stack(pre + ".self_attention.in_proj_bias"),
            },
            "attn_out": {
                "kernel": stack(pre + ".self_attention.out_proj.weight",
                                transpose=True),
                "bias": stack(pre + ".self_attention.out_proj.bias"),
            },
            "ffn_ln": {"scale": stack(pre + ".ln_2.weight"),
                       "bias": stack(pre + ".ln_2.bias")},
            "fc1": {"kernel": stack(pre + ".mlp.0.weight", transpose=True),
                    "bias": stack(pre + ".mlp.0.bias")},
            "fc2": {"kernel": stack(pre + ".mlp.3.weight", transpose=True),
                    "bias": stack(pre + ".mlp.3.bias")},
        },
        "head_ln": {"scale": jnp.asarray(get("encoder.ln.weight"), dt),
                    "bias": jnp.asarray(get("encoder.ln.bias"), dt)},
        "head": {"weight": jnp.asarray(get("heads.head.weight"), dt),
                 "bias": jnp.asarray(get("heads.head.bias"), dt)},
    }
    lora_tree: Dict = {}
    if lora is not None and lora.rank > 0:
        r, m = lora.rank, model.mlp_dim
        names = [(pre + ".mlp.0.lora_A", (r, d)),
                 (pre + ".mlp.0.lora_B", (m, r)),
                 (pre + ".mlp.3.lora_A", (r, m)),
                 (pre + ".mlp.3.lora_B", (d, r))]
        if all(n.format(0) in sd for n, _ in names):
            lora_tree["ffn"] = {
                key: jnp.asarray(np.stack([np.asarray(sd[n.format(i)])
                                           for i in range(L)]), jnp.float32)
                for key, (n, _) in zip(("A1", "B1", "A2", "B2"), names)}
        else:
            import jax
            lora_tree = init_lora(
                lora_key if lora_key is not None else jax.random.key(0),
                model, lora)
    return {"base": base, "lora": lora_tree}


def to_torchvision_state_dict(params: Dict, model: ViTConfig) -> Dict[str, np.ndarray]:
    """Export our pytree back to torchvision vit_b_16 naming (inverse of
    ``from_torchvision_state_dict``), including loralib-surgered LoRA keys
    ``encoder.layers.encoder_layer_{i}.mlp.{0,3}.lora_{A,B}``
    (util/utils.py:552-576 replace_ffn_with_lora) — so a VIT_B16 checkpoint
    trained here round-trips into the reference's ImageNet-100 resume path
    (train_own_forget_cl.py:206-243)."""
    base = params["base"]
    d, k = model.dim, model.patch_size
    sd: Dict[str, np.ndarray] = {
        "conv_proj.weight": np.asarray(base["patch"]["kernel"]).T.reshape(
            d, model.channels, k, k),
        "conv_proj.bias": np.asarray(base["patch"]["bias"]),
        "class_token": np.asarray(base["cls_token"]).reshape(1, 1, -1),
        "encoder.pos_embedding": np.asarray(base["pos_embed"])[None],
        "encoder.ln.weight": np.asarray(base["head_ln"]["scale"]),
        "encoder.ln.bias": np.asarray(base["head_ln"]["bias"]),
        "heads.head.weight": np.asarray(base["head"]["weight"]),
        "heads.head.bias": np.asarray(base["head"]["bias"]),
    }
    b = base["blocks"]
    for i in range(model.depth):
        p = f"encoder.layers.encoder_layer_{i}"
        sd[f"{p}.ln_1.weight"] = np.asarray(b["attn_ln"]["scale"][i])
        sd[f"{p}.ln_1.bias"] = np.asarray(b["attn_ln"]["bias"][i])
        sd[f"{p}.self_attention.in_proj_weight"] = np.asarray(
            b["qkv"]["kernel"][i]).T
        sd[f"{p}.self_attention.in_proj_bias"] = np.asarray(
            b["qkv"]["bias"][i])
        sd[f"{p}.self_attention.out_proj.weight"] = np.asarray(
            b["attn_out"]["kernel"][i]).T
        sd[f"{p}.self_attention.out_proj.bias"] = np.asarray(
            b["attn_out"]["bias"][i])
        sd[f"{p}.ln_2.weight"] = np.asarray(b["ffn_ln"]["scale"][i])
        sd[f"{p}.ln_2.bias"] = np.asarray(b["ffn_ln"]["bias"][i])
        sd[f"{p}.mlp.0.weight"] = np.asarray(b["fc1"]["kernel"][i]).T
        sd[f"{p}.mlp.0.bias"] = np.asarray(b["fc1"]["bias"][i])
        sd[f"{p}.mlp.3.weight"] = np.asarray(b["fc2"]["kernel"][i]).T
        sd[f"{p}.mlp.3.bias"] = np.asarray(b["fc2"]["bias"][i])
    lt = params.get("lora", {})
    if "ffn" in lt:
        f = lt["ffn"]
        for i in range(model.depth):
            p = f"encoder.layers.encoder_layer_{i}.mlp"
            sd[f"{p}.0.lora_A"] = np.asarray(f["A1"][i])
            sd[f"{p}.0.lora_B"] = np.asarray(f["B1"][i])
            sd[f"{p}.3.lora_A"] = np.asarray(f["A2"][i])
            sd[f"{p}.3.lora_B"] = np.asarray(f["B2"][i])
    return sd


def modify_head(params: Dict, class_id_map: Dict[int, int]) -> Dict:
    """Slice the 1000-class head down to the run's classes
    (util/utils.py:579-619): row i of the new head = original-ImageNet row
    class_id_map[i]. Returns new params; callers should stash the original
    head (see resume_head)."""
    head = params["base"]["head"]
    idx = np.asarray([class_id_map[i] for i in sorted(class_id_map)])
    new_head = {"weight": head["weight"][idx]}
    if "bias" in head:
        new_head["bias"] = head["bias"][idx]
    base = dict(params["base"])
    base["head"] = new_head
    return {"base": base, "lora": params.get("lora", {}),
            "original_head": head}


def resume_head(params: Dict, original_head: Dict) -> Dict:
    """Restore the stashed full ImageNet head (util/utils.py:621-634) —
    used for the missing-class eval over the held-out 900 classes."""
    base = dict(params["base"])
    base["head"] = original_head
    return {"base": base, "lora": params.get("lora", {})}
