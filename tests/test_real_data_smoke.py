"""Real-data ingestion smoke tests (docs/REAL_DATA.md companion).

Certifies, without any real dataset present, that the moment CASIA/.rec
verification .bin / ImageNet-100 folders appear, the ingestion path
produces exactly what the reference's torch pipeline would:

* a CASIA-scale generated .rec/.idx pair reads through FaceRecordDataset
  (native C++ reader when built, python fallback otherwise) with pixels
  matching an independent PIL decode (reference FaceDataset,
  image_iter.py:34-86);
* a generated verification .bin loads through load_bin + perform_val
  (util/utils.py:38-57);
* a 224-px ImageFolder with the ImageNet eval transform matches
  torchvision's documented Resize(256)+CenterCrop(224)+Normalize
  semantics (image_iter.py:143-149): BILINEAR short-side resize with
  int() truncation of the long side, round()-offset center crop.
"""
import io

import numpy as np
import pytest

from gslora_tpu.data.recordio import (FaceRecordDataset, load_bin,
                                      write_recordio)


def _jpeg(rng, h, w):
    from PIL import Image
    img = Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def test_casia_scale_rec_roundtrip(tmp_path):
    """200 112x112 JPEG records (CASIA image geometry) through the indexed
    .rec reader; batched decode pixels == independent PIL decode."""
    from PIL import Image
    rng = np.random.RandomState(0)
    bodies = [_jpeg(rng, 112, 112) for _ in range(200)]
    records = [(np.asarray([float(i % 20)], np.float32), b)
               for i, b in enumerate(bodies)]
    rec = str(tmp_path / "train.rec")
    write_recordio(rec, records,
                   header0=np.asarray([201.0, 221.0], np.float32))
    ds = FaceRecordDataset(rec, rand_mirror=False)
    assert len(ds) == 200
    assert ds.targets[:5] == [0, 1, 2, 3, 4]
    batch = ds.decode_batch(list(range(0, 200, 7)))
    assert batch.shape == (len(range(0, 200, 7)), 3, 112, 112)
    for j, i in enumerate(range(0, 200, 7)):
        want = np.asarray(
            Image.open(io.BytesIO(bodies[i])).convert("RGB"),
            np.float32).transpose(2, 0, 1) / 255.0
        np.testing.assert_array_equal(batch[j], want)


def test_verification_bin_through_perform_val(tmp_path):
    """Generated .bin pair set loads and drives the full perform_val
    protocol (flip-sum embeddings, KFold ROC)."""
    import pickle

    from gslora_tpu.evaluation.verification import perform_val

    rng = np.random.RandomState(1)
    bins = [_jpeg(rng, 112, 112) for _ in range(24)]
    issame = [True, False] * 6
    with open(tmp_path / "lfw.bin", "wb") as f:
        pickle.dump((bins, issame), f)
    data_set, loaded_issame = load_bin(str(tmp_path / "lfw.bin"), 112)
    assert data_set[0].shape == (24, 3, 112, 112)
    assert loaded_issame == issame
    # flipped copy is an exact horizontal mirror
    np.testing.assert_array_equal(data_set[1], data_set[0][:, :, :, ::-1])

    def embed(batch):  # deterministic stand-in embedder
        return batch.reshape(batch.shape[0], -1)[:, :16].astype(np.float32)

    acc, std, xnorm, thr = perform_val(embed, data_set, issame,
                                       embedding_size=16)
    assert 0.0 <= acc <= 1.0 and np.isfinite(xnorm)


def test_imagenet_folder_transform_parity(tmp_path):
    """224-px ImageFolder ingestion == torchvision
    Resize(256)/CenterCrop(224)/ToTensor/Normalize semantics re-derived
    independently (incl. non-square and odd-aspect images)."""
    from PIL import Image

    from gslora_tpu.data.folders import ImageFolderDataset

    rng = np.random.RandomState(2)
    sizes = [(467, 311), (333, 500), (256, 256), (640, 427)]
    raw = []
    for c in range(2):
        d = tmp_path / f"n{c:08d}"
        d.mkdir()
        for i, (h, w) in enumerate(sizes[c * 2:c * 2 + 2]):
            arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"img{i}.png")  # lossless
            raw.append(arr)

    ds = ImageFolderDataset(str(tmp_path), image_size=224,
                            imagenet_eval=True)
    assert len(ds) == 4 and ds.targets == [0, 0, 1, 1]
    mean = np.array([0.485, 0.456, 0.406], np.float32)[:, None, None]
    std = np.array([0.229, 0.224, 0.225], np.float32)[:, None, None]
    for i, arr in enumerate(raw):
        img = Image.fromarray(arr)
        w, h = img.size
        # torchvision F.resize(int): short side -> 256, long side int()
        if w <= h:
            nw, nh = 256, max(1, int(h * 256 / w))
        else:
            nw, nh = max(1, int(w * 256 / h)), 256
        img = img.resize((nw, nh), Image.BILINEAR)
        # torchvision F.center_crop: round() offsets
        left = int(round((nw - 224) / 2.0))
        top = int(round((nh - 224) / 2.0))
        img = img.crop((left, top, left + 224, top + 224))
        want = np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0
        want = (want - mean) / std
        got = ds.decode(i)
        assert got.shape == (3, 224, 224)
        np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.skipif(
    not pytest.importorskip("importlib.util").find_spec("torchvision"),
    reason="torchvision not installed")
def test_imagenet_transform_exact_vs_torchvision(tmp_path):
    """When torchvision IS available, assert bit-parity with the actual
    reference transform chain (image_iter.py:143-149)."""
    import torchvision.transforms as T
    from PIL import Image

    from gslora_tpu.data.folders import ImageFolderDataset

    rng = np.random.RandomState(3)
    d = tmp_path / "cls0"
    d.mkdir()
    arr = (rng.rand(375, 500, 3) * 255).astype(np.uint8)
    Image.fromarray(arr).save(d / "img.png")
    tf = T.Compose([T.Resize(256), T.CenterCrop(224), T.ToTensor(),
                    T.Normalize(mean=[0.485, 0.456, 0.406],
                                std=[0.229, 0.224, 0.225])])
    want = tf(Image.fromarray(arr)).numpy()
    ds = ImageFolderDataset(str(tmp_path), image_size=224,
                            imagenet_eval=True)
    np.testing.assert_allclose(ds.decode(0), want, atol=1e-6)
