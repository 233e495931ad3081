"""RandAugment policy (gslora_tpu.data.randaugment) — the torchvision
v0.15 op set the reference's few-shot prototype path uses
(util/utils.py:508-523), re-implemented host-side on PIL."""
import numpy as np
import pytest
from PIL import Image

from gslora_tpu.data.randaugment import RandAugment, _apply_op


def _img(seed=0, size=32):
    rng = np.random.RandomState(seed)
    return Image.fromarray(rng.randint(0, 256, (size, size, 3), np.uint8))


ALL_OPS = ["Identity", "ShearX", "ShearY", "TranslateX", "TranslateY",
           "Rotate", "Brightness", "Color", "Contrast", "Sharpness",
           "Posterize", "Solarize", "AutoContrast", "Equalize"]


@pytest.mark.parametrize("name", ALL_OPS)
def test_every_op_valid_output(name):
    img = _img()
    mag = {"Posterize": 4, "Solarize": 128, "Rotate": 15.0,
           "TranslateX": 5.0, "TranslateY": 5.0}.get(name, 0.3)
    out = _apply_op(img, name, mag)
    assert out.size == img.size and out.mode == "RGB"
    if name != "Identity":
        pass  # some ops can no-op on specific content; shape/mode is the contract


def test_magnitude_tables_match_torchvision():
    """Spot-check the v0.15 _augmentation_space values at bin 9 and 30."""
    ra = RandAugment(magnitude=9, seed=0)
    space = {n: (m, s) for n, m, s in ra._space(112, 112)}
    assert space["ShearX"][0] == pytest.approx(0.3 * 9 / 30)
    assert space["Rotate"][0] == pytest.approx(30.0 * 9 / 30)
    assert space["Brightness"][0] == pytest.approx(0.9 * 9 / 30)
    assert space["TranslateX"][0] == pytest.approx(150.0 / 331.0 * 112 * 9 / 30)
    assert space["Posterize"][0] == 8 - round(9 / 7.5)  # == 7
    assert space["Solarize"][0] == pytest.approx(255.0 * (1 - 9 / 30))
    ra30 = RandAugment(magnitude=30, seed=0)
    space30 = {n: (m, s) for n, m, s in ra30._space(64, 64)}
    assert space30["ShearX"][0] == pytest.approx(0.3)
    assert space30["Posterize"][0] == 4
    assert space30["Solarize"][0] == pytest.approx(0.0)
    # signedness flags
    for n in ("ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate",
              "Brightness", "Color", "Contrast", "Sharpness"):
        assert space[n][1] is True
    for n in ("Identity", "Posterize", "Solarize", "AutoContrast",
              "Equalize"):
        assert space[n][1] is False


def test_deterministic_given_seed_and_varies():
    x = np.random.RandomState(3).rand(4, 3, 16, 16).astype(np.float32)
    a = RandAugment(magnitude=9, seed=42).apply_batch(x)
    b = RandAugment(magnitude=9, seed=42).apply_batch(x)
    c = RandAugment(magnitude=9, seed=43).apply_batch(x)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.shape == x.shape and a.dtype == np.float32
    assert a.min() >= 0.0 and a.max() <= 1.0


def test_prototypes_with_randaugment():
    """calculate_prototypes(aug_repeat=k): k augmented views, no clean view;
    prototype stays near the clean-view prototype (means are robust) but is
    not identical to it."""
    import jax
    import jax.numpy as jnp

    from gslora_tpu.config import LoraConfig, ViTConfig
    from gslora_tpu.data.synthetic import synthetic_face_dataset
    from gslora_tpu.data.pipeline import BatchLoader
    from gslora_tpu.engine.prototypes import calculate_prototypes
    from gslora_tpu.models.vit import init_vit_params

    model = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                      dim_head=16, mlp_dim=64, num_class=4, dropout=0.0,
                      emb_dropout=0.0, head_type="Softmax")
    lora = LoraConfig(rank=4)
    params = init_vit_params(jax.random.key(0), model, lora)
    ds = synthetic_face_dataset(num_classes=4, per_class=4, image_size=16,
                                seed=0)
    batches = list(BatchLoader(ds, 8, shuffle=False, prefetch=0))

    clean = calculate_prototypes(params, batches, model, lora, 4,
                                 compute_dtype=jnp.float32, aug_repeat=0)
    auged = calculate_prototypes(params, batches, model, lora, 4,
                                 compute_dtype=jnp.float32, aug_repeat=5,
                                 seed=1, aug_magnitude=5)
    assert auged.shape == (4, model.dim)
    assert np.isfinite(np.asarray(auged)).all()
    assert not np.allclose(np.asarray(clean), np.asarray(auged))
    # augmented views perturb, not destroy: prototypes stay correlated
    c = np.asarray(clean).ravel()
    a = np.asarray(auged).ravel()
    corr = np.corrcoef(c, a)[0, 1]
    assert corr > 0.8, f"prototype correlation collapsed: {corr}"
