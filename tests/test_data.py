"""Data layer: order-list/splits parity with the reference protocol,
few-shot, relabel, loaders, synthetic datasets."""
import numpy as np
import pytest

from gslora_tpu.data.folders import ArrayDataset, SubsetDataset
from gslora_tpu.data.pipeline import BatchLoader, CyclingLoader
from gslora_tpu.data.splits import (few_shot_subset, make_order_list,
                                    random_relabel, ratio_subset,
                                    split_by_class_window, task_windows)
from gslora_tpu.data.synthetic import synthetic_face_dataset


def test_order_list_matches_reference_rng_protocol():
    """Same python-random stream as train_own_forget.py:400-406."""
    import random
    order = make_order_list(100, seed=1337)
    want = list(range(100))
    random.seed(1337)
    random.shuffle(want)
    assert order == want
    assert sorted(order) == list(range(100))


def test_split_by_class_window_keeps_global_labels():
    ds = synthetic_face_dataset(num_classes=10, per_class=4)
    order = make_order_list(10, seed=1337)
    remain, forget = split_by_class_window(ds, order, 0, 8, 8, 10)
    assert len(remain) == 8 * 4 and len(forget) == 2 * 4
    assert set(remain.targets) == set(order[:8])


def test_unique_classes():
    """get_unique_classes parity (util/utils.py:444-454): names + count of
    the classes present in a subset."""
    from gslora_tpu.data.splits import unique_classes
    ds = synthetic_face_dataset(num_classes=10, per_class=4)
    order = make_order_list(10, seed=1337)
    remain, forget = split_by_class_window(ds, order, 0, 8, 8, 10)
    names, n = unique_classes(forget)
    assert n == 2
    assert names == sorted(ds.classes[c] for c in order[8:10])
    assert set(forget.targets) == set(order[8:10])
    # labels are original global ids, not remapped
    assert max(remain.targets + forget.targets) <= 9


def test_task_windows_match_cl_arithmetic():
    # train_own_forget_cl.py:539-542 with first=80, per=20
    assert task_windows(80, 20, 0) == (0, 80, 80, 100)
    assert task_windows(80, 20, 1) == (0, 60, 60, 80)
    assert task_windows(80, 20, 3) == (0, 20, 20, 40)


def test_few_shot_subset():
    ds = synthetic_face_dataset(num_classes=5, per_class=10)
    sub = few_shot_subset(ds, 4, seed=0)
    assert len(sub) == 20
    counts = {}
    for t in sub.targets:
        counts[t] = counts.get(t, 0) + 1
    assert all(v == 4 for v in counts.values())
    with pytest.raises(ValueError):
        few_shot_subset(ds, 11)


def test_ratio_subset_and_relabel():
    ds = synthetic_face_dataset(num_classes=5, per_class=10)
    sub = ratio_subset(ds, 0.2, seed=1)
    assert len(sub) == 10
    rl = random_relabel(ds, 5, seed=0)
    assert len(rl) == len(ds)
    # never the original label (image_iter.py:89-121)
    assert all(a != b for a, b in zip(rl.targets, ds.targets))
    # decode still returns the original image
    np.testing.assert_allclose(rl.decode(0), ds.decode(0))


def test_batch_loader_seeded_and_complete():
    ds = synthetic_face_dataset(num_classes=4, per_class=5)
    dl = BatchLoader(ds, batch_size=8, seed=7)
    batches = list(dl)
    assert sum(b[1].shape[0] for b in batches) == 20
    assert batches[0][0].shape[1:] == (3, 32, 32)
    # same seed, fresh loader -> same first-epoch order
    dl2 = BatchLoader(ds, batch_size=8, seed=7)
    np.testing.assert_allclose(batches[0][0], next(iter(dl2))[0])
    # second epoch reshuffles
    b2 = next(iter(dl))
    assert not np.allclose(batches[0][1], b2[1]) or \
        not np.allclose(batches[0][0], b2[0])


def test_cycling_loader_restarts():
    ds = synthetic_face_dataset(num_classes=2, per_class=3)
    cyc = CyclingLoader(BatchLoader(ds, batch_size=4, seed=0))
    seen = [cyc.next() for _ in range(5)]  # 6 samples, bs 4 -> cycles
    assert all(x.shape[0] in (2, 4) for x, _ in seen)


def test_subset_preserves_metadata():
    ds = synthetic_face_dataset(num_classes=3, per_class=2)
    sub = SubsetDataset(ds, [0, 1])
    assert sub.classes == ds.classes
    assert len(sub.targets) == 2


def test_image_folder(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image
    for cls in ["b_cls", "a_cls"]:
        d = tmp_path / cls
        d.mkdir()
        for i in range(2):
            Image.fromarray(
                (np.random.RandomState(i).rand(16, 16, 3) * 255)
                .astype(np.uint8)).save(d / f"{i}.png")
    from gslora_tpu.data.folders import ImageFolderDataset
    ds = ImageFolderDataset(str(tmp_path), image_size=16)
    assert ds.classes == ["a_cls", "b_cls"]  # sorted like ImageFolder
    assert len(ds) == 4
    img = ds.decode(0)
    assert img.shape == (3, 16, 16)
    assert img.max() <= 1.0  # ToTensor scaling
    # off-size images resize to image_size instead of crashing np.stack
    # mid-epoch (pre-sized ones pass through untouched, as above)
    ds112 = ImageFolderDataset(str(tmp_path))  # default image_size=112
    assert ds112.decode(0).shape == (3, 112, 112)
    assert ds112.decode_batch([0, 1]).shape == (2, 3, 112, 112)


def test_batch_loader_pad_and_drop():
    ds = synthetic_face_dataset(num_classes=2, per_class=5)  # 10 samples
    padded = list(BatchLoader(ds, 4, seed=0, pad_to_batch=True, prefetch=0))
    assert [b[1].shape[0] for b in padded] == [4, 4, 4]
    dropped = list(BatchLoader(ds, 4, seed=0, drop_last=True, prefetch=0))
    assert [b[1].shape[0] for b in dropped] == [4, 4]
    assert len(BatchLoader(ds, 4, drop_last=True)) == 2


def test_batch_loader_mask_padding():
    """mask_padding: static shapes with label -1 sentinels in pad slots —
    the TPU/mesh default (engine.loop auto_pad)."""
    ds = synthetic_face_dataset(num_classes=2, per_class=5)  # 10 samples
    batches = list(BatchLoader(ds, 4, seed=0, mask_padding=True, prefetch=0))
    assert [b[1].shape[0] for b in batches] == [4, 4, 4]
    full = np.concatenate([b[1] for b in batches])
    assert (full[:10] >= 0).all()  # real samples keep their labels
    assert (full[10:] == -1).all()  # pad slots carry the sentinel
    # full batches are untouched
    assert (batches[0][1] >= 0).all() and (batches[1][1] >= 0).all()


def test_device_prefetcher():
    from gslora_tpu.data.pipeline import DevicePrefetcher
    ds = synthetic_face_dataset(num_classes=2, per_class=6)
    dl = BatchLoader(ds, 4, seed=0, prefetch=0)
    batches = list(DevicePrefetcher(iter(dl), depth=2))
    assert sum(b[1].shape[0] for b in batches) == 12
    import jax
    assert isinstance(batches[0][0], jax.Array)


def test_batch_loader_abandoned_iterator_releases_worker():
    """A half-consumed epoch (CyclingLoader dropped at an epoch boundary)
    must not leave the prefetch worker parked in q.put forever — that
    leaked one thread + ~3 decoded batches per epoch."""
    import gc
    import threading
    import time

    ds = synthetic_face_dataset(num_classes=2, per_class=16)
    dl = BatchLoader(ds, 2, seed=0, prefetch=2)
    before = threading.active_count()
    for _ in range(5):
        it = iter(dl)
        next(it)  # consume one batch, abandon the rest
        del it
    gc.collect()
    deadline = time.time() + 10.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_batch_loader_propagates_decode_errors():
    class BadDataset:
        samples = [(0, 0), (1, 1)]
        targets = [0, 1]
        classes = ["0", "1"]

        def __len__(self):
            return 2

        def decode(self, idx):
            raise RuntimeError("corrupt image")

    with pytest.raises(RuntimeError, match="corrupt image"):
        list(BatchLoader(BadDataset(), 2, seed=0))


def test_concat_dataset_batched_decode_routes_to_parents():
    """ConcatDataset.decode_batch must split the index list between the
    two parents (keeping their batched fast paths) and reassemble in
    order — regression for the per-image fallback on the Replay path."""
    from gslora_tpu.data.folders import ConcatDataset

    a = synthetic_face_dataset(num_classes=2, per_class=3, image_size=8,
                               seed=0)
    b = synthetic_face_dataset(num_classes=2, per_class=3, image_size=8,
                               seed=1)
    calls = []
    orig_a, orig_b = a.decode_batch, b.decode_batch
    a.decode_batch = lambda ii: (calls.append(("a", list(ii))),
                                 orig_a(ii))[1]
    b.decode_batch = lambda ii: (calls.append(("b", list(ii))),
                                 orig_b(ii))[1]
    cat = ConcatDataset(a, b)
    idxs = [7, 0, 9, 3, 6]
    got = cat.decode_batch(idxs)
    want = np.stack([cat.decode(i) for i in idxs])
    np.testing.assert_array_equal(got, want)
    assert ("a", [0, 3]) in calls and ("b", [1, 3, 0]) in calls


def test_relabel_dataset_batched_decode_passthrough():
    from gslora_tpu.data.splits import random_relabel
    ds = synthetic_face_dataset(num_classes=3, per_class=4, image_size=8,
                                seed=0)
    rl = random_relabel(ds, 3, seed=1)
    np.testing.assert_array_equal(rl.decode_batch([0, 5, 2]),
                                  np.stack([rl.decode(i)
                                            for i in (0, 5, 2)]))
    # relabeled pairs: never the original label
    assert all(nt != t for (_, nt), t in zip(rl.samples, ds.targets))


def test_path_list_dataset_classes_indexed_by_label(tmp_path):
    """classes must be label-indexed (protocol contract): ImageNet-900
    entries carry GLOBAL labels, so classes[999] has to resolve."""
    from PIL import Image
    from gslora_tpu.data.folders import PathListDataset
    p = tmp_path / "x.jpg"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(p)
    ds = PathListDataset([(str(p), 999), (str(p), 100)], image_size=8)
    assert ds.classes[999] == "999" and ds.classes[100] == "100"
    from gslora_tpu.data.splits import unique_classes
    names, n = unique_classes(ds)
    assert n == 2 and set(names) == {"100", "999"}


def test_make_eval_step_rejects_headless_config():
    import pytest as _pytest
    from gslora_tpu.config import LoraConfig, ViTConfig
    from gslora_tpu.engine.evaluate import make_eval_step
    cfg = ViTConfig(image_size=16, patch_size=8, dim=16, depth=1, heads=2,
                    dim_head=8, mlp_dim=32, num_class=4, head_type="None")
    with _pytest.raises(ValueError, match="head"):
        make_eval_step(cfg, LoraConfig(rank=0))
