"""Continual class-window splits, few-shot / ratio subsets.

Split parity with the reference is exact where it matters for accuracy
comparison: the class order list uses the same python-random stream
(random.seed(SEED); random.shuffle — train_own_forget.py:400-406), windows
use the same [start, end) slicing, and labels keep their ORIGINAL global
ids (the head stays 100-way throughout — util/utils.py:371-420).
"""
from __future__ import annotations

import random as pyrandom
from collections import defaultdict
from typing import List, Sequence, Tuple

from gslora_tpu.data.folders import Dataset, RelabelDataset, SubsetDataset


def make_order_list(num_classes: int, seed: int = 1337) -> List[int]:
    """Seeded shuffled class order (train_own_forget.py:400-406)."""
    order = list(range(num_classes))
    rng = pyrandom.Random()
    rng.seed(seed)
    rng.shuffle(order)
    return order


def split_by_class_window(dataset: Dataset, order_list: Sequence[int],
                          s1: int, e1: int, s2: int, e2: int
                          ) -> Tuple[SubsetDataset, SubsetDataset]:
    """Two subsets whose classes are order_list[s1:e1] / order_list[s2:e2]
    (util/utils.py:371-420 split_dataset). Labels keep global ids."""
    w1 = set(order_list[s1:e1])
    w2 = set(order_list[s2:e2])
    idx1 = [i for i, t in enumerate(dataset.targets) if t in w1]
    idx2 = [i for i, t in enumerate(dataset.targets) if t in w2]
    return SubsetDataset(dataset, idx1), SubsetDataset(dataset, idx2)


def unique_classes(dataset: Dataset) -> Tuple[List[str], int]:
    """Class names present in a (sub)dataset + their count
    (util/utils.py:444-454 get_unique_classes) — the reference logs which
    classes feed EWC/MAS importance estimation."""
    labels = sorted({t for t in dataset.targets})
    classes = getattr(dataset, "classes", None)
    names = [classes[l] for l in labels] if classes else \
        [str(l) for l in labels]
    return names, len(labels)


def task_windows(num_of_first_cls: int, per_forget_cls: int, task: int
                 ) -> Tuple[int, int, int, int]:
    """CL window arithmetic (train_own_forget_cl.py:539-542): at task i the
    remain window is [0, first - i*per) and the forget window is
    [first - i*per, first - (i-1)*per) ... matching en1 = first - i*per.

    Returns (remain_start, remain_end, forget_start, forget_end)."""
    en1 = num_of_first_cls - task * per_forget_cls
    return 0, en1, en1, en1 + per_forget_cls


def open_single_windows(num_of_first_cls: int, per_forget_cls: int,
                        open_cls_num: int):
    """Single-step open-set 3-way windows (train_own_forget_open.py:392-401):
    remain [0, first-open), open [first-open, first), forget [first,
    first+per). Returns ((rs,re),(fs,fe),(os,oe))."""
    en1 = num_of_first_cls - open_cls_num
    return (0, en1), (num_of_first_cls,
                      num_of_first_cls + per_forget_cls), (en1,
                                                           num_of_first_cls)


def open_task_windows(num_of_first_cls: int, per_forget_cls: int,
                      open_cls_num: int, task: int):
    """Continual open-set windows (train_own_forget_cl_open.py:413-418):
    open classes sit at the FRONT of the order list and are never replayed:
    open [0, open), remain [open, en1), forget [en1, en1+per)."""
    en1 = num_of_first_cls - task * per_forget_cls
    return (open_cls_num, en1), (en1, en1 + per_forget_cls), (0,
                                                              open_cls_num)


def few_shot_subset(dataset: Dataset, n_shot: int, seed: int | None = None
                    ) -> SubsetDataset:
    """n_shot samples per class via the reference's python-random protocol
    (util/utils.py:457-496: random.sample per class, then shuffle).

    A private Random(seed) instance produces the same stream as
    random.seed(seed) without clobbering the global module state; callers
    drawing multiple subsets should pass DIFFERENT seeds so the draws are
    uncorrelated (the reference seeds once at startup and consumes one
    ambient stream across calls)."""
    rng = pyrandom.Random(seed) if seed is not None else pyrandom
    by_class = defaultdict(list)
    for i, t in enumerate(dataset.targets):
        by_class[t].append(i)
    chosen: List[int] = []
    for cls, idxs in by_class.items():
        if len(idxs) < n_shot:
            raise ValueError(f"Class {cls} has fewer samples than {n_shot}.")
        chosen.extend(rng.sample(idxs, n_shot))
    rng.shuffle(chosen)
    return SubsetDataset(dataset, chosen)


def ratio_subset(dataset: Dataset, ratio: float, seed: int = 0
                 ) -> SubsetDataset:
    """Random fraction of the dataset (train_own_forget.py:479-490
    torch.randperm[:k]; we use numpy permutation with the given seed)."""
    import numpy as np
    k = int(len(dataset) * ratio)
    perm = np.random.RandomState(seed).permutation(len(dataset))[:k]
    return SubsetDataset(dataset, perm.tolist())


def random_relabel(dataset: Dataset, num_classes: int,
                   seed: int = 0) -> RelabelDataset:
    """Forget-by-wrong-label wrapper for the baseline family."""
    return RelabelDataset(dataset, num_classes, seed)
