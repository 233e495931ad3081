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


def test_native_rejects_corrupt_records(native, tmp_path):
    """Robustness (fuzz regression): a record whose IRHeader.flag claims
    more labels than the payload holds must return a read ERROR — the
    unvalidated path read out of heap bounds and wrapped body_len negative
    (confirmed SIGSEGV). A nonzero continuation flag must also fail loudly
    instead of serving a truncated body."""
    import struct

    path, _ = _write_fixture(tmp_path)
    r = native.NativeRecordReader(path)
    pos = r._key_to_pos[1]
    # corrupt record 1 in place: oversized label count
    from gslora_tpu.data.recordio import read_idx_file
    idx = read_idx_file(path[:-4] + ".idx")
    off = idx[1]
    with open(path, "r+b") as f:
        f.seek(off + 8)  # past magic+lrecord, at IRHeader.flag
        f.write(struct.pack("<I", 1_000_000))
    with pytest.raises(IOError):
        r.read(pos)
    assert r._lib.ri_read_batch is not None
    with pytest.raises(IOError):
        r.read_batch([pos])
    r.close()

    # continuation flag set (upper 3 bits of lrecord)
    sub = tmp_path / "sub"
    sub.mkdir()
    path2, _ = _write_fixture(sub)
    r2 = native.NativeRecordReader(path2)
    idx2 = read_idx_file(path2[:-4] + ".idx")
    with open(path2, "r+b") as f:
        f.seek(idx2[1] + 4)
        lrec = struct.unpack("<I", f.read(4))[0]
        f.seek(idx2[1] + 4)
        f.write(struct.pack("<I", lrec | (1 << 29)))
    with pytest.raises(IOError):
        r2.read(r2._key_to_pos[1])
    r2.close()


def test_native_idx_malformed_line_fails_open(native, tmp_path):
    """A malformed .idx line must fail ri_open loudly, not silently
    truncate the dataset at that line."""
    path, _ = _write_fixture(tmp_path)
    idx_path = path[:-4] + ".idx"
    lines = open(idx_path).read().splitlines()
    lines.insert(len(lines) // 2, "garbage line")
    open(idx_path, "w").write("\n".join(lines) + "\n")
    with pytest.raises(IOError):
        native.NativeRecordReader(path)


def test_face_record_dataset_native_batch_path(native, tmp_path):
    """FaceRecordDataset.decode_batch routes raw reads through the C++
    thread pool and must produce the same batch as the python reader."""
    from gslora_tpu.data.recordio import FaceRecordDataset
    path, _ = _write_fixture(tmp_path)
    ds_native = FaceRecordDataset(path, rand_mirror=False)
    batch = ds_native.decode_batch(list(range(len(ds_native))))
    assert ds_native._native_reader is not None  # native path engaged
    ds_py = FaceRecordDataset(path, rand_mirror=False)
    ds_py._native_reader = None  # force the python path
    want = np.stack([ds_py.decode(i) for i in range(len(ds_py))])
    np.testing.assert_array_equal(batch, want)


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


def test_face_record_dataset_thread_safe_decode(tmp_path):
    """Concurrent decodes (the dual-loader prefetch pattern: two
    BatchLoader worker threads over subsets of the SAME dataset) must not
    interleave seek/read on a shared handle — regression guards the
    thread-local-handle fix (bad-magic / wrong-record reads)."""
    import threading
    from gslora_tpu.data.recordio import FaceRecordDataset
    path, bodies = _write_fixture(tmp_path, n=10)
    ds = FaceRecordDataset(path, rand_mirror=False)
    want = [ds.decode(i) for i in range(len(ds))]
    errors = []

    def worker():
        try:
            for _ in range(30):
                for i in range(len(ds)):
                    np.testing.assert_array_equal(ds.decode(i), want[i])
        except Exception as e:  # surfaced below
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[0]


def test_face_record_dataset_label_scan_matches_full_read(tmp_path):
    """The metadata-only index scan (read_record_labels) must agree with
    full-record reads for both single-label and multi-label records."""
    from gslora_tpu.data.recordio import (FaceRecordDataset, read_record,
                                          read_record_labels)
    path, _ = _write_fixture(tmp_path, n=6)
    ds = FaceRecordDataset(path, rand_mirror=False)
    with open(path, "rb") as rec:
        for k in ds.imgidx:
            full_labels, _ = read_record(rec, ds.idx[k])
            np.testing.assert_array_equal(
                read_record_labels(rec, ds.idx[k]), full_labels)
        # header0 is a 2-float multi-label record (flag > 0)
        np.testing.assert_array_equal(
            read_record_labels(rec, ds.idx[0]), [99.0, 100.0])
