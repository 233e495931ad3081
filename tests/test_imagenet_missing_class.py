"""ImageNet missing-class eval: head slice for the run's 100 classes, head
restore for the held-out-900 eval; AugmentedDataset replication."""
import jax
import jax.numpy as jnp
import numpy as np

from gslora_tpu.config import LoraConfig, ViTConfig
from gslora_tpu.data.folders import ArrayDataset, AugmentedDataset
from gslora_tpu.data.pipeline import BatchLoader
from gslora_tpu.engine.evaluate import eval_accuracy, make_eval_step
from gslora_tpu.models.vit import init_vit_params
from gslora_tpu.models.vit_imagenet import modify_head, resume_head

MODEL = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                  dim_head=16, mlp_dim=64, num_class=20, dropout=0.0,
                  emb_dropout=0.0, head_type="Softmax")
LORA = LoraConfig(rank=0)


def test_missing_class_eval_roundtrip():
    """Train-free check: slicing to 5 'imagenet100' classes then restoring
    the 20-way head must reproduce the original model's predictions on
    held-out classes exactly."""
    params = init_vit_params(jax.random.key(0), MODEL, LORA)
    ev = make_eval_step(MODEL, LORA, compute_dtype=jnp.float32)
    rng = np.random.RandomState(0)
    held_out = ArrayDataset(rng.rand(12, 3, 16, 16).astype(np.float32),
                            rng.randint(5, 20, 12))
    acc_before = eval_accuracy(ev, params, BatchLoader(held_out, 12,
                                                       shuffle=False,
                                                       prefetch=0))
    sliced = modify_head(params, {i: i for i in range(5)})
    assert sliced["base"]["head"]["weight"].shape == (5, 32)
    restored = resume_head(sliced, sliced["original_head"])
    acc_after = eval_accuracy(ev, restored, BatchLoader(held_out, 12,
                                                        shuffle=False,
                                                        prefetch=0))
    assert acc_before == acc_after


def test_augmented_dataset_replication():
    rng = np.random.RandomState(1)
    ds = ArrayDataset(rng.rand(4, 3, 8, 8).astype(np.float32),
                      np.array([0, 1, 0, 1]))
    aug = AugmentedDataset(ds, k=3, magnitude=5, seed=0)
    assert len(aug) == 12
    assert aug.targets == [0, 1, 0, 1] * 3
    # copy 0 is the original; later copies differ
    np.testing.assert_allclose(aug.decode(0), ds.decode(0))
    assert np.abs(aug.decode(4) - ds.decode(0)).max() > 1e-4
    # deterministic given the seed
    np.testing.assert_allclose(aug.decode(4),
                               AugmentedDataset(ds, 3, 5, 0).decode(4))
