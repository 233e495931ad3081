"""Pair verification + recordio round-trips."""
import io
import os
import pickle

import numpy as np
import pytest

from gslora_tpu.evaluation.verification import (calculate_accuracy,
                                                calculate_roc,
                                                calculate_val,
                                                evaluate_verification,
                                                perform_val)


def _synthetic_pairs(n_pairs=200, d=32, seed=0):
    """Same-pairs share a latent vector; diff-pairs don't."""
    rng = np.random.RandomState(seed)
    embs = np.zeros((2 * n_pairs, d))
    issame = []
    for i in range(n_pairs):
        same = i % 2 == 0
        a = rng.randn(d)
        b = a + 0.1 * rng.randn(d) if same else rng.randn(d)
        embs[2 * i] = a / np.linalg.norm(a)
        embs[2 * i + 1] = b / np.linalg.norm(b)
        issame.append(same)
    return embs, issame


def test_calculate_accuracy_basics():
    dist = np.array([0.1, 0.2, 3.0, 3.5])
    same = np.array([True, True, False, False])
    tpr, fpr, acc = calculate_accuracy(1.0, dist, same)
    assert (tpr, fpr, acc) == (1.0, 0.0, 1.0)
    tpr, fpr, acc = calculate_accuracy(4.0, dist, same)
    assert (tpr, fpr) == (1.0, 1.0) and acc == 0.5


def test_roc_separable_pairs():
    embs, issame = _synthetic_pairs()
    tpr, fpr, accuracy, best = evaluate_verification(embs, issame)
    assert accuracy.mean() > 0.95
    assert 0 < best.mean() < 4


def test_val_at_far():
    embs, issame = _synthetic_pairs()
    e1, e2 = embs[0::2], embs[1::2]
    thresholds = np.arange(0, 4, 0.01)
    val, val_std, far = calculate_val(thresholds, e1, e2,
                                      np.asarray(issame), far_target=0.1)
    assert val > 0.8
    assert far <= 0.2


def test_perform_val_with_flip_sum():
    rng = np.random.RandomState(1)
    n, d = 64, 16
    images = rng.rand(n, 3, 8, 8).astype(np.float32)
    flipped = images[:, :, :, ::-1].copy()
    proj = rng.randn(3 * 8 * 8, d).astype(np.float32)

    def embed_fn(batch):
        return batch.reshape(len(batch), -1) @ proj

    issame = [True, False] * (n // 4)
    acc_mean, acc_std, xnorm, best = perform_val(
        embed_fn, (images, flipped), issame, embedding_size=d, batch_size=16)
    assert 0 <= acc_mean <= 1
    assert xnorm > 0


def test_perform_val_deit_token_protocol():
    """perform_val_deit: full batches embed WITH the dis token, the ragged
    tail WITHOUT (reference utils.py:253-266), and results match
    perform_val when the token is a no-op."""
    from gslora_tpu.evaluation.verification import perform_val_deit
    rng = np.random.RandomState(3)
    n, d = 40, 16  # batch 16 -> two full batches + ragged tail of 8
    images = rng.rand(n, 3, 8, 8).astype(np.float32)
    flipped = images[:, :, :, ::-1].copy()
    proj = rng.randn(3 * 8 * 8, d).astype(np.float32)
    token = np.ones((1, d), np.float32)
    calls = []

    def embed_fn(batch, dis_token):
        calls.append((len(batch), dis_token is not None))
        return batch.reshape(len(batch), -1) @ proj

    issame = [True, False] * (n // 4)
    acc, std, xnorm, thr = perform_val_deit(
        embed_fn, token, (images, flipped), issame,
        embedding_size=d, batch_size=16)
    # two flip passes x (2 full-with-token + 1 tail-without)
    assert calls == [(16, True), (16, True), (8, False)] * 2
    assert 0 <= acc <= 1 and xnorm > 0

    def embed_plain(batch):
        return batch.reshape(len(batch), -1) @ proj

    ref = perform_val(embed_plain, (images, flipped), issame,
                      embedding_size=d, batch_size=16)
    assert np.allclose((acc, std, xnorm, thr), ref)


def test_recordio_roundtrip(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image
    from gslora_tpu.data.recordio import (FaceRecordDataset, load_bin,
                                          write_recordio)
    # build 6 images, 2 classes
    records = []
    rng = np.random.RandomState(0)
    for i in range(6):
        img = Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        records.append((np.asarray([i % 2], np.float32), buf.getvalue()))
    rec_path = str(tmp_path / "train.rec")
    write_recordio(rec_path, records, header0=np.asarray([7.0, 9.0],
                                                         np.float32))
    ds = FaceRecordDataset(rec_path, rand_mirror=False)
    assert len(ds) == 6
    assert sorted(set(ds.targets)) == [0, 1]
    img = ds.decode(0)
    assert img.shape == (3, 16, 16) and img.max() <= 1.0

    # .bin pair file
    bins = []
    for i in range(4):
        img = Image.fromarray((rng.rand(112, 112, 3) * 255)
                              .astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="JPEG")
        bins.append(buf.getvalue())
    bin_path = str(tmp_path / "lfw.bin")
    with open(bin_path, "wb") as f:
        pickle.dump((bins, [True, False]), f)
    (imgs, flipped), issame = load_bin(bin_path)
    assert imgs.shape == (4, 3, 112, 112)
    np.testing.assert_allclose(flipped, imgs[:, :, :, ::-1])
    assert issame == [True, False]


def test_get_val_data(tmp_path):
    from PIL import Image
    from gslora_tpu.data.recordio import get_val_data
    rng = np.random.RandomState(7)
    for name in ("lfw", "cfp_ff"):
        bins = []
        for _ in range(2):
            img = Image.fromarray((rng.rand(112, 112, 3) * 255)
                                  .astype(np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            bins.append(buf.getvalue())
        with open(tmp_path / f"{name}.bin", "wb") as f:
            pickle.dump((bins, [True]), f)
    sets = get_val_data(str(tmp_path), ["lfw", "cfp_ff", "missing"])
    assert [s[0] for s in sets] == ["lfw", "cfp_ff"]
    assert sets[0][1][0].shape == (2, 3, 112, 112)


def test_perform_val_with_vit_model():
    """End-to-end: pair verification through the actual backbone embed."""
    import jax
    import jax.numpy as jnp
    from gslora_tpu.config import LoraConfig, ViTConfig
    from gslora_tpu.models.vit import init_vit_params, vit_apply

    cfg = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                    dim_head=16, mlp_dim=64, num_class=6, dropout=0.0,
                    emb_dropout=0.0, head_type="None")
    lora = LoraConfig(rank=4)
    params = init_vit_params(jax.random.key(0), cfg, lora)

    @jax.jit
    def embed_fn(batch):
        return vit_apply(params, jnp.asarray(batch), None, cfg, lora,
                         compute_dtype=jnp.float32)

    rng = np.random.RandomState(0)
    # same-pairs are exact duplicates (distance exactly 0 after embed);
    # diff-pairs use high-variance inputs so an untrained model still
    # spreads them
    n_pairs = 20
    imgs = np.zeros((2 * n_pairs, 3, 16, 16), np.float32)
    issame = []
    for i in range(n_pairs):
        a = 5.0 * rng.randn(3, 16, 16).astype(np.float32)
        same = i % 2 == 0
        b = a.copy() if same else 5.0 * rng.randn(3, 16, 16) \
            .astype(np.float32)
        imgs[2 * i], imgs[2 * i + 1] = a, b
        issame.append(same)
    flipped = imgs[:, :, :, ::-1].copy()
    acc, std, xnorm, thr = perform_val(embed_fn, (imgs, flipped), issame,
                                       embedding_size=32, batch_size=8)
    assert acc > 0.8  # exact duplicates separable even untrained
    assert xnorm > 0
