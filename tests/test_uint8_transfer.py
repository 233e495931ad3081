"""uint8 host->device transfer path (gslora_tpu addition): BatchLoader
ships uint8 pixels, vit_embed dequantizes inside the jitted step — 4x
less H2D traffic than fp32, bit-identical results for ToTensor-only
pipelines (the face path, reference train_own.py:287)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslora_tpu.config import DataConfig, ForgetConfig, LoraConfig, \
    OptimConfig, RunConfig, ViTConfig
from gslora_tpu.data.folders import ArrayDataset
from gslora_tpu.data.pipeline import BatchLoader
from gslora_tpu.models.vit import init_vit_params, vit_apply

CFG = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                dim_head=16, mlp_dim=64, num_class=6, dropout=0.0,
                emb_dropout=0.0)
LORA = LoraConfig(rank=4)


def _u8_dataset(n=10, seed=0):
    """Images whose float values are exactly k/255 (decoded-uint8 form)."""
    rng = np.random.RandomState(seed)
    raw = rng.randint(0, 256, size=(n, 3, 16, 16)).astype(np.uint8)
    return ArrayDataset(raw.astype(np.float32) / np.float32(255.0),
                        rng.randint(0, 6, n)), raw


def test_uint8_loader_roundtrip_is_exact():
    ds, raw = _u8_dataset()
    f32 = list(BatchLoader(ds, 4, shuffle=False, prefetch=0))
    u8 = list(BatchLoader(ds, 4, shuffle=False, prefetch=0,
                          uint8_transfer=True))
    assert all(x.dtype == np.uint8 for x, _ in u8)
    for (xf, yf), (xu, yu) in zip(f32, u8):
        np.testing.assert_array_equal(yf, yu)
        # device-side dequant (u8 -> f32 / 255) reproduces the fp32 batch
        # bit-for-bit
        np.testing.assert_array_equal(
            xu.astype(np.float32) / np.float32(255.0), xf)


def test_uint8_loader_rejects_non_tensor_pixels():
    rng = np.random.RandomState(1)
    ds = ArrayDataset(rng.randn(8, 3, 16, 16).astype(np.float32),
                      rng.randint(0, 6, 8))  # mean/std-style values
    with pytest.raises(ValueError, match="uint8_transfer"):
        next(iter(BatchLoader(ds, 4, shuffle=False, prefetch=0,
                              uint8_transfer=True)))


def test_vit_apply_uint8_matches_float_bitwise():
    """fp32 compute: the uint8 path must be BIT-identical to feeding the
    host-dequantized fp32 batch (same k/255 division, same casts)."""
    ds, _ = _u8_dataset()
    (xf, y), = list(BatchLoader(ds, 10, shuffle=False, prefetch=0))[:1]
    (xu, _), = list(BatchLoader(ds, 10, shuffle=False, prefetch=0,
                                uint8_transfer=True))[:1]
    params = init_vit_params(jax.random.key(0), CFG, LORA)
    lg_f, emb_f = vit_apply(params, jnp.asarray(xf), jnp.asarray(y), CFG,
                            LORA, train=False, compute_dtype=jnp.float32)
    lg_u, emb_u = vit_apply(params, jnp.asarray(xu), jnp.asarray(y), CFG,
                            LORA, train=False, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(lg_f), np.asarray(lg_u))
    np.testing.assert_array_equal(np.asarray(emb_f), np.asarray(emb_u))
    # bf16 compute: same fp32 dequant happens before the cdt cast, so the
    # paths stay identical there too
    lg_f16, _ = vit_apply(params, jnp.asarray(xf), jnp.asarray(y), CFG,
                          LORA, train=False, compute_dtype=jnp.bfloat16)
    lg_u16, _ = vit_apply(params, jnp.asarray(xu), jnp.asarray(y), CFG,
                          LORA, train=False, compute_dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(lg_f16), np.asarray(lg_u16))


def test_forget_loop_uint8_matches_float():
    """run_forget_training with uint8_transfer matches the fp32 default
    (fp32 compute, same seeds): identical accuracies; final params equal
    to fp32 ROUNDING tolerance — the dequant inside the compiled step
    shifts XLA's fusion/reassociation slightly (measured max-abs 1e-8
    after 2 epochs), while the pure forward is bit-identical (above)."""
    from gslora_tpu.engine.loop import ForgetData, run_forget_training

    rng = np.random.RandomState(3)

    def blobs(n_per, classes, seed):
        r = np.random.RandomState(seed)
        xs, ys = [], []
        for c in classes:
            base = r.rand(1, 3, 16, 16)
            imgs = np.clip(base + 0.08 * r.randn(n_per, 3, 16, 16), 0, 1)
            xs.append(np.rint(imgs * 255).astype(np.uint8))
            ys += [c] * n_per
        raw = np.concatenate(xs)
        return ArrayDataset(raw.astype(np.float32) / np.float32(255.0),
                            np.asarray(ys))

    del rng
    data = ForgetData(train_forget=blobs(6, [4, 5], 0),
                      train_remain=blobs(6, [0, 1, 2, 3], 1),
                      test_forget=blobs(3, [4, 5], 2),
                      test_remain=blobs(3, [0, 1, 2, 3], 3))
    results = {}
    for u8 in (False, True):
        cfg = RunConfig(
            model=dataclasses.replace(CFG, head_type="Softmax"),
            lora=LORA,
            optim=OptimConfig(opt="adamw", lr=1e-3, warmup_epochs=0,
                              epochs=2),
            forget=ForgetConfig(bnd=10.0, beta=0.2, alpha=0.01,
                                alpha_epoch=0),
            data=DataConfig(batch_size=6, uint8_transfer=u8),
            num_epoch=2, compute_dtype="float32")
        res = run_forget_training(cfg, init_vit_params(jax.random.key(1),
                                                       cfg.model, LORA),
                                  data)
        results[u8] = res
    a, b = results[False], results[True]
    assert a.forget_acc == b.forget_acc and a.remain_acc == b.remain_acc
    la = jax.tree_util.tree_leaves(a.state.params)
    lb = jax.tree_util.tree_leaves(b.state.params)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_uint8_mesh_dp_equivalence():
    """uint8 transfer composes with the data-parallel mesh: an 8-device
    DP run with uint8_transfer matches the single-device fp32 run (same
    seeds) to all-reduce/reassociation tolerance — certifies sharded
    device_put of uint8 batches + in-step dequant under shard semantics."""
    from gslora_tpu.config import MeshConfig
    from gslora_tpu.engine.loop import ForgetData, run_forget_training
    from gslora_tpu.parallel.mesh import make_mesh

    def blobs(n_per, classes, seed):
        r = np.random.RandomState(seed)
        xs, ys = [], []
        for c in classes:
            base = r.rand(1, 3, 16, 16)
            imgs = np.clip(base + 0.08 * r.randn(n_per, 3, 16, 16), 0, 1)
            xs.append(np.rint(imgs * 255).astype(np.uint8))
            ys += [c] * n_per
        raw = np.concatenate(xs)
        return ArrayDataset(raw.astype(np.float32) / np.float32(255.0),
                            np.asarray(ys))

    data = ForgetData(train_forget=blobs(8, [4, 5], 0),
                      train_remain=blobs(8, [0, 1, 2, 3], 1),
                      test_forget=blobs(4, [4, 5], 2),
                      test_remain=blobs(4, [0, 1, 2, 3], 3))

    def cfg(u8):
        return RunConfig(
            model=dataclasses.replace(CFG, head_type="Softmax"),
            lora=LORA,
            optim=OptimConfig(opt="adamw", lr=1e-3, warmup_epochs=0,
                              epochs=2),
            forget=ForgetConfig(bnd=10.0, beta=0.2, alpha=0.01,
                                alpha_epoch=0),
            data=DataConfig(batch_size=8, uint8_transfer=u8),
            num_epoch=2, compute_dtype="float32")

    model = dataclasses.replace(CFG, head_type="Softmax")
    res_single = run_forget_training(
        cfg(False), init_vit_params(jax.random.key(1), model, LORA), data,
        mesh=None)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    res_u8 = run_forget_training(
        cfg(True), init_vit_params(jax.random.key(1), model, LORA), data,
        mesh=mesh)
    for a, b in zip(jax.tree_util.tree_leaves(res_single.state.lora),
                    jax.tree_util.tree_leaves(res_u8.state.lora)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    assert abs(res_single.best_h - res_u8.best_h) < 1e-3


def test_imagenet_uint8_device_norm_matches_host(tmp_path):
    """ImageNet path: raw_uint8 decode + device-side mean/std
    (ViTConfig.input_norm="imagenet") must reproduce the host transform
    (ImageFolderDataset imagenet_eval decode) exactly, end to end through
    vit_apply on a B/16-structure config."""
    from PIL import Image
    from gslora_tpu.data.folders import ImageFolderDataset

    rng = np.random.RandomState(5)
    for c in range(2):
        d = tmp_path / f"n{c:03d}"
        d.mkdir()
        for i in range(3):
            arr = (rng.rand(240, 260, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(str(d / f"{i}.png"))

    ds_f32 = ImageFolderDataset(str(tmp_path), image_size=32,
                                imagenet_eval=True)
    ds_u8 = ImageFolderDataset(str(tmp_path), image_size=32,
                               imagenet_eval=True, raw_uint8=True)
    (xf, y), = list(BatchLoader(ds_f32, 6, shuffle=False, prefetch=0))[:1]
    (xu, yu), = list(BatchLoader(ds_u8, 6, shuffle=False, prefetch=0,
                                 uint8_transfer=True))[:1]
    assert xu.dtype == np.uint8 and xu.shape == xf.shape
    np.testing.assert_array_equal(y, yu)
    # host transform reproduced exactly by (u8/255 - mean)/std in fp32
    mean = np.array([0.485, 0.456, 0.406], np.float32)[:, None, None]
    std = np.array([0.229, 0.224, 0.225], np.float32)[:, None, None]
    np.testing.assert_array_equal(
        (xu.astype(np.float32) / np.float32(255.0) - mean) / std, xf)

    # through the model: tiny B/16-structure config (input_norm=imagenet)
    # imagenet_eval decode always yields 224px (the reference's fixed eval
    # transform) — shrink the model, keep the input size
    cfg = dataclasses.replace(ViTConfig.vit_b16(num_class=4),
                              depth=2, dim=64, heads=4, dim_head=16,
                              mlp_dim=128)
    assert cfg.input_norm == "imagenet"
    params = init_vit_params(jax.random.key(0), cfg, LoraConfig(rank=0))
    lg_f, _ = vit_apply(params, jnp.asarray(xf), jnp.asarray(y), cfg,
                        LoraConfig(rank=0), train=False,
                        compute_dtype=jnp.float32)
    lg_u, _ = vit_apply(params, jnp.asarray(xu), jnp.asarray(y), cfg,
                        LoraConfig(rank=0), train=False,
                        compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(lg_f), np.asarray(lg_u))


def test_raw_uint8_without_flag_is_rejected():
    """A raw_uint8 dataset fed through a default fp32 loader would skip
    normalization silently — the loader must refuse."""
    from gslora_tpu.data.folders import PathListDataset
    ds = ArrayDataset(np.zeros((4, 3, 16, 16), np.float32),
                      np.zeros(4, np.int64))
    ds.images = np.zeros((4, 3, 16, 16), np.uint8)  # simulate raw u8
    with pytest.raises(ValueError, match="raw_uint8"):
        next(iter(BatchLoader(ds, 4, shuffle=False, prefetch=0)))
    del PathListDataset
