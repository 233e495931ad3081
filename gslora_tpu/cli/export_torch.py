"""Export a trained/forgotten checkpoint to the reference's ``.pth`` format.

Produces a torch-pickled state_dict with the reference ViT_face naming
(``transformer.layers.{i}.1.fn.fn.net.{0,3}.lora_{A,B}`` etc., see
vit_face.py:449-548) so any checkpoint trained here can be loaded by the
reference codebase (train_own_forget.py:624-648 resume path) — and so a
real-data accuracy comparison is one command once datasets are available.
VIT_B16 runs export with torchvision naming instead
(``encoder.layers.encoder_layer_{i}.mlp.{0,3}.lora_{A,B}``, the surgered
vit_b_16 of train_own_forget_cl.py:206-243).

Two forms, mirroring loralib's stateful train/eval merge semantics
(loralib lora.Linear: ``.eval()`` folds ``scaling * B @ A`` into ``weight``
but keeps the lora_A/lora_B parameters in the state_dict; ``.train()``
subtracts it back out):

* ``unmerged`` — base weights untouched + current lora_A/lora_B. What
  ``torch.save(model.state_dict())`` yields in TRAIN mode; loadable with
  the reference's strict=False resume.
* ``merged``   — FFN/qkv kernels += scaling * (B @ A), lora_A/lora_B kept
  at their current values. What the reference actually writes at CL task
  boundaries (the engine deep-copies + ``.eval()`` before saving,
  engine.py:449; the next task reloads and reinitializes LoRA, so the
  stale lora values in the file are never double-counted).

Usage::

    python -m gslora_tpu.cli.export_torch -r runs/.../ckpt.msgpack \
        --export_out model.pth --export_form merged
"""
from __future__ import annotations

import json
import os

import numpy as np

from gslora_tpu.config import build_parser, config_from_args


def export_state_dict(params: dict, model_cfg, lora_cfg,
                      form: str = "unmerged", naming: str = "vit_face") -> dict:
    """Our pytree -> reference-named numpy state_dict (merged or unmerged).

    ``naming``: "vit_face" (transformer.layers.{i}... — ViT_face/ViTs_face,
    vit_face.py:449-548) or "torchvision" (encoder.layers.encoder_layer_{i}
    ... — the surgered vit_b_16 of the ImageNet-100 path)."""
    from gslora_tpu.lora.core import merge_lora
    from gslora_tpu.models.import_torch import to_state_dict
    from gslora_tpu.models.vit_imagenet import to_torchvision_state_dict

    if form not in ("merged", "unmerged"):
        raise ValueError(f"export form must be merged|unmerged, got {form!r}")
    if form == "merged" and params.get("lora"):
        base = dict(params["base"])
        base["blocks"] = merge_lora(base["blocks"], params["lora"],
                                    lora_cfg.scaling)
        params = {"base": base, "lora": params["lora"]}
    if naming == "torchvision":
        return to_torchvision_state_dict(params, model_cfg)
    return to_state_dict(params, model_cfg)


def save_pth(sd: dict, path: str) -> None:
    import torch
    # copy=True: jax-backed arrays are read-only views, which torch rejects
    out = {k: torch.from_numpy(np.array(v, dtype=np.float32, copy=True))
           for k, v in sd.items()}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(out, path)


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--export_out", required=True,
                        help="output .pth path (reference-format state_dict)")
    parser.add_argument("--export_form", default="unmerged",
                        choices=["unmerged", "merged", "both"],
                        help="loralib train-mode (unmerged) or eval-mode "
                             "(merged) state_dict; 'both' writes "
                             "<out> and <out stem>_merged.pth")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    if not cfg.resume:
        parser.error("export requires a checkpoint: pass -r/--resume")
    naming = "torchvision" if cfg.net == "VIT_B16" else "vit_face"

    from gslora_tpu.cli.common import build_params
    params = build_params(cfg)

    forms = (["unmerged", "merged"] if args.export_form == "both"
             else [args.export_form])
    written = []
    for form in forms:
        path = args.export_out
        if args.export_form == "both" and form == "merged":
            stem, ext = os.path.splitext(path)
            path = f"{stem}_merged{ext or '.pth'}"
        save_pth(export_state_dict(params, cfg.model, cfg.lora, form,
                                   naming=naming), path)
        written.append({"path": path, "form": form, "naming": naming})
    print(json.dumps({"exported": written}))
    return written


if __name__ == "__main__":
    main()
