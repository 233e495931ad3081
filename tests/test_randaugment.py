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


def test_prototypes_aug_normalization_parity():
    """Regression (round-3 review): augmented prototypes on the ImageNet
    uint8-transfer path must see the SAME input distribution the fp32
    host-normalized path sees — dequantizing /255 without the model's
    input_norm silently fed un-normalized pixels to the embed."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gslora_tpu.config import (IMAGENET_MEAN, IMAGENET_STD, LoraConfig,
                                   ViTConfig)
    from gslora_tpu.engine.prototypes import calculate_prototypes
    from gslora_tpu.models.vit import init_vit_params

    model = dataclasses.replace(
        ViTConfig.vit_b16(num_class=4), image_size=32, depth=2, dim=32,
        heads=2, dim_head=16, mlp_dim=64)
    assert model.input_norm == "imagenet"
    lora = LoraConfig(rank=0)
    params = init_vit_params(jax.random.key(0), model, lora)

    rng = np.random.RandomState(0)
    pix = rng.randint(0, 256, (8, 3, 32, 32)).astype(np.uint8)
    y = np.arange(8) % 4
    mean = np.asarray(IMAGENET_MEAN, np.float32).reshape(1, 3, 1, 1)
    std = np.asarray(IMAGENET_STD, np.float32).reshape(1, 3, 1, 1)
    xf = (pix.astype(np.float32) / np.float32(255.0) - mean) / std

    kw = dict(compute_dtype=jnp.float32, aug_repeat=3, seed=7,
              aug_magnitude=5)
    p_u8 = np.asarray(calculate_prototypes(
        params, [(pix, y)], model, lora, 4, **kw))
    p_f32 = np.asarray(calculate_prototypes(
        params, [(xf, y)], model, lora, 4, **kw))
    # same RandAugment seed, same pixel space -> near-identical (the fp32
    # path round-trips denormalize/renormalize, fp rounding only)
    np.testing.assert_allclose(p_u8, p_f32, rtol=0, atol=5e-4)

    # and the normalized-aug path must NOT equal the broken un-normalized
    # one (pixels fed straight to embed)
    base_model = dataclasses.replace(model, input_norm="none")
    p_raw = np.asarray(calculate_prototypes(
        params, [(pix, y)], base_model, lora, 4, **kw))
    assert not np.allclose(p_u8, p_raw, atol=1e-3)


def test_shear_is_about_top_left_corner():
    """torchvision v0.15 passes center=[0, 0] to F.affine for ShearX/Y
    (autoaugment._apply_op): the PIL inverse map is (1, mag, 0, 0, 1, 0)
    with NO center offset, so the y=0 row (x=0 column for ShearY) is
    fixed while far rows shift."""
    img = _img(seed=3)
    arr = np.asarray(img)
    sx = np.asarray(_apply_op(img, "ShearX", 0.3))
    np.testing.assert_array_equal(sx[0], arr[0])  # top row fixed
    assert not np.array_equal(sx[-1], arr[-1])  # bottom row sheared
    sy = np.asarray(_apply_op(img, "ShearY", 0.3))
    np.testing.assert_array_equal(sy[:, 0], arr[:, 0])
    assert not np.array_equal(sy[:, -1], arr[:, -1])


def test_translate_truncates_to_whole_pixels():
    """torchvision passes translate=[int(magnitude), 0]: a fractional
    magnitude must land on exactly the truncated whole-pixel shift."""
    img = _img(seed=4)
    frac = np.asarray(_apply_op(img, "TranslateX", 5.7))
    whole = np.asarray(_apply_op(img, "TranslateX", 5.0))
    np.testing.assert_array_equal(frac, whole)
    # the shift itself is real: columns move by exactly 5
    arr = np.asarray(img)
    np.testing.assert_array_equal(whole[:, 5:], arr[:, :-5])
    neg = np.asarray(_apply_op(img, "TranslateY", -5.7))
    np.testing.assert_array_equal(neg[:-5], np.asarray(img)[5:])


def test_solarize_float_threshold_boundary():
    """F.solarize passes the float threshold through: pixels >= threshold
    invert, so 178 stays and 179 flips at threshold 178.5 (int() would
    also flip 178)."""
    img = Image.fromarray(np.full((4, 4, 3), 178, np.uint8))
    np.testing.assert_array_equal(
        np.asarray(_apply_op(img, "Solarize", 178.5)), 178)
    img2 = Image.fromarray(np.full((4, 4, 3), 179, np.uint8))
    np.testing.assert_array_equal(
        np.asarray(_apply_op(img2, "Solarize", 178.5)), 255 - 179)
