"""Deterministic synthetic image-folder stand-in for tests and benches:
class-conditional gaussian blobs that a ViT can actually fit, so tiny
end-to-end forgetting runs show real forget/remain dynamics."""
from __future__ import annotations

import numpy as np

from gslora_tpu.data.folders import ArrayDataset


def synthetic_face_dataset(num_classes: int = 10, per_class: int = 8,
                           image_size: int = 32, seed: int = 0,
                           noise: float = 0.15,
                           proto_seed: int = 1234) -> ArrayDataset:
    """``proto_seed`` fixes the class identities; vary ``seed`` to draw a
    disjoint split (train/test) of the same classes."""
    rng = np.random.RandomState(seed)
    protos = np.random.RandomState(proto_seed).randn(
        num_classes, 3, image_size, image_size).astype(np.float32)
    images, labels = [], []
    for c in range(num_classes):
        for _ in range(per_class):
            images.append(protos[c] +
                          noise * rng.randn(3, image_size, image_size)
                          .astype(np.float32))
            labels.append(c)
    order = rng.permutation(len(images))
    images = np.stack(images)[order]
    labels = np.asarray(labels, np.int64)[order]
    return ArrayDataset(images, labels)
