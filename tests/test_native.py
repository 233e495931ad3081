"""Native C++ recordio runtime vs the pure-python reader."""
import io
import subprocess
import sys

import numpy as np
import pytest

from gslora_tpu.data.recordio import write_recordio


@pytest.fixture(scope="module")
def native():
    import gslora_tpu.native as native_mod
    if not native_mod.available():
        rc = subprocess.run(["make", "-C", "native"],
                            capture_output=True).returncode
        if rc != 0 or not native_mod.available():
            pytest.skip("native toolchain unavailable")
    return native_mod


def _write_fixture(tmp_path, n=10):
    from PIL import Image
    rng = np.random.RandomState(0)
    records, bodies = [], []
    for i in range(n):
        img = Image.fromarray((rng.rand(8, 8, 3) * 255).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        bodies.append(buf.getvalue())
        records.append((np.asarray([float(i % 3)], np.float32),
                        bodies[-1]))
    path = str(tmp_path / "train.rec")
    write_recordio(path, records, header0=np.asarray([99.0, 100.0],
                                                     np.float32))
    return path, bodies


def test_native_single_reads(native, tmp_path):
    path, bodies = _write_fixture(tmp_path)
    r = native.NativeRecordReader(path)
    assert len(r) == 11  # header0 + 10 records
    # key 0 is header; image records are keys 1..10 (positions follow idx)
    pos = r._key_to_pos[1]
    label, body = r.read(pos)
    assert label == 0.0
    assert body == bodies[0]
    label, body = r.read(r._key_to_pos[5])
    assert label == float(4 % 3)
    assert body == bodies[4]


def test_native_batched_reads_match_python(native, tmp_path):
    from gslora_tpu.data.recordio import FaceRecordDataset
    path, bodies = _write_fixture(tmp_path)
    r = native.NativeRecordReader(path, n_threads=3)
    positions = [r._key_to_pos[k] for k in range(1, 11)]
    labels, payloads = r.read_batch(positions)
    np.testing.assert_allclose(labels, [i % 3 for i in range(10)])
    assert payloads == bodies
    # python reader agrees on labels
    ds = FaceRecordDataset(path, rand_mirror=False)
    assert ds.targets == [i % 3 for i in range(10)]
    r.close()


def test_native_image_decode_matches_pil(native, tmp_path):
    """The C++ decoder (libjpeg/libpng — the codecs PIL wraps) must produce
    bit-identical floats to the PIL path for already-sized images, and
    decline (ok=False) images that need a resize."""
    from PIL import Image

    from gslora_tpu.data.folders import ImageFolderDataset
    from gslora_tpu.native import decode_image_batch

    rng = np.random.RandomState(0)
    for c in ("a", "b"):
        d = tmp_path / c
        d.mkdir()
        for i in range(3):
            arr = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
            Image.fromarray(arr).save(d / f"{i}.jpg", quality=90)
    # a BMP: unsupported by the native decoder, handled by the PIL
    # fallback (right-sized, so the batch still stacks)
    Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(
        tmp_path / "a" / "odd.bmp")

    ds = ImageFolderDataset(str(tmp_path), image_size=16)
    paths = [s[0] for s in ds.samples]
    res = decode_image_batch(paths, 16, 16, threads=3)
    assert res is not None, "native image decoder not built"
    out, ok = res
    assert out.shape == (len(paths), 3, 16, 16)
    for i, p in enumerate(paths):
        if p.endswith("odd.bmp"):
            assert not ok[i]
        else:
            assert ok[i], p
            pil = ds.decode(i)
            np.testing.assert_array_equal(out[i], pil), p

    # the dataset-level batched path stitches native + PIL fallback
    batch = ds.decode_batch(list(range(len(paths))))
    for i in range(len(paths)):
        np.testing.assert_array_equal(batch[i], ds.decode(i))
