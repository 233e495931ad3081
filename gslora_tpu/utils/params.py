"""Parameter accounting (reference util/utils.py:423-426
count_trainable_parameters; param-count comments train_own_forget.py:658)."""
from __future__ import annotations

import jax
import numpy as np


def count_params(tree) -> int:
    return int(sum(np.prod(leaf.shape) for leaf in jax.tree.leaves(tree)))


def param_summary(params) -> dict:
    """{'base': N, 'lora': M, 'trainable_fraction': M/(N+M)} for the
    standard {base, lora} split."""
    base = count_params(params.get("base", {}))
    lora = count_params(params.get("lora", {}))
    total = base + lora
    return {"base": base, "lora": lora, "total": total,
            "trainable_fraction": lora / total if total else 0.0}
