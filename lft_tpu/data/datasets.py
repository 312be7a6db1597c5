"""Datasets and batch iteration (torch-free).

Parity with reference utils/utils_datasets.py:

* `TrainDataset` scans `data_for_train/SR_{A}x{A}_{S}x/<dataset>/*.h5`,
  reads `Lr_SAI_y`/`Hr_SAI_y` *without* transposing (like the reference
  train loader, utils/utils_datasets.py:37-39 -- the Matlab column-major
  transpose is harmless for square patches given the transpose
  augmentation), applies the 3-op p=0.5 mosaic augmentation
  (utils/utils_datasets.py:114-124) and yields `[1, H, W]` float32 pairs.
* `TestDataset` / `multi_test_sets` transpose `(1, 0)` to undo the Matlab
  layout (utils/utils_datasets.py:89-90) and yield whole scenes.
* `iterate_batches` replaces torch DataLoader: shuffled fixed-shape numpy
  batches with a background-thread prefetcher (`num_workers` threads;
  h5py reads release the GIL), ready for a device `put`.
"""

from __future__ import annotations

import concurrent.futures as _fut
import os
import random
import threading
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np
import h5py


def _dataset_dir(root: str, ang_res: int, scale: int) -> str:
    return os.path.join(root, f"SR_{ang_res}x{ang_res}_{scale}x")


def augmentation(data: np.ndarray, label: np.ndarray,
                 rng: Optional[random.Random] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Reference 3-op SAI-mosaic augmentation (utils/utils_datasets.py:114-124):
    p=0.5 W-axis flip (reverses view order v AND pixels w jointly), p=0.5
    H-axis flip, p=0.5 transpose (swaps U<->V and H<->W)."""
    r = rng or random
    if r.random() < 0.5:
        data = data[:, ::-1]
        label = label[:, ::-1]
    if r.random() < 0.5:
        data = data[::-1, :]
        label = label[::-1, :]
    if r.random() < 0.5:
        data = data.transpose(1, 0)
        label = label.transpose(1, 0)
    return data, label


class TrainDataset:
    """Reference TrainSetDataLoader parity (utils/utils_datasets.py:14-47)."""

    def __init__(self, args, seed: Optional[int] = None):
        self.dataset_dir = _dataset_dir(args.path_for_train, args.angRes,
                                        args.scale_factor)
        if args.data_name == "ALL":
            self.data_list = sorted(os.listdir(self.dataset_dir))
        else:
            self.data_list = [args.data_name]
        self.file_list: List[str] = []
        for name in self.data_list:
            files = sorted(os.listdir(os.path.join(self.dataset_dir, name)))
            self.file_list.extend(os.path.join(name, f) for f in files)
        self.seed = seed
        self.rng = random.Random(seed) if seed is not None else None

    def __len__(self) -> int:
        return len(self.file_list)

    def item(self, index: int,
             rng: Optional[random.Random]) -> Tuple[np.ndarray, np.ndarray]:
        """Fetch one item with an EXPLICIT augmentation rng. Seeded batch
        iteration derives `rng` per item from (epoch seed, index) so
        prefetch-thread scheduling cannot reorder the draws -- seeded runs
        are bitwise reproducible at any num_workers (the role the
        reference's worker-seeded DataLoader plays, reference train.py:26)."""
        path = os.path.join(self.dataset_dir, self.file_list[index])
        with h5py.File(path, "r") as hf:
            data = np.array(hf.get("Lr_SAI_y"))
            label = np.array(hf.get("Hr_SAI_y"))
        data, label = augmentation(data, label, rng)
        # ToTensor-equivalent: add leading channel dim, keep float values
        return (np.ascontiguousarray(data, dtype=np.float32)[None],
                np.ascontiguousarray(label, dtype=np.float32)[None])

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        # direct indexing keeps the shared-rng behavior (single-threaded
        # callers); iterate_batches uses item() with a per-item rng
        return self.item(index, self.rng)


class TestDataset:
    """Reference TestSetDataLoader parity (utils/utils_datasets.py:67-98)."""

    def __init__(self, args, data_name: str):
        self.dataset_dir = _dataset_dir(args.path_for_test, args.angRes,
                                        args.scale_factor)
        files = sorted(os.listdir(os.path.join(self.dataset_dir, data_name)))
        self.file_list = [os.path.join(data_name, f) for f in files]

    def __len__(self) -> int:
        return len(self.file_list)

    def scene_name(self, index: int) -> str:
        return Path(self.file_list[index]).stem

    def scene_shape(self, index: int) -> Tuple[int, ...]:
        """LR mosaic shape WITHOUT reading pixel data (h5 header only) --
        lets the eval sweep group same-shape scenes so scene-batch
        dispatch amortization survives arbitrary dataset order
        (inference/tiled.py evaluate_dataset)."""
        path = os.path.join(self.dataset_dir, self.file_list[index])
        with h5py.File(path, "r") as hf:
            s = hf["Lr_SAI_y"].shape
        return (s[1], s[0])  # the (1, 0) Matlab transpose __getitem__ applies

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        path = os.path.join(self.dataset_dir, self.file_list[index])
        with h5py.File(path, "r") as hf:
            lr = np.array(hf.get("Lr_SAI_y"))
            hr = np.array(hf.get("Hr_SAI_y"))
        # undo Matlab column-major storage (utils/utils_datasets.py:89-90)
        lr = np.ascontiguousarray(lr.transpose(1, 0), dtype=np.float32)
        hr = np.ascontiguousarray(hr.transpose(1, 0), dtype=np.float32)
        return lr, hr


def multi_test_sets(args) -> Tuple[List[str], List[TestDataset], int]:
    """Reference MultiTestSetDataLoader parity
    (utils/utils_datasets.py:50-64): one dataset per sub-directory.
    Respects --data_name when it names a single dataset."""
    root = _dataset_dir(args.path_for_test, args.angRes, args.scale_factor)
    names = sorted(os.listdir(root))
    if args.data_name != "ALL" and args.data_name in names:
        names = [args.data_name]
    sets = [TestDataset(args, n) for n in names]
    return names, sets, sum(len(s) for s in sets)


def iterate_batches(dataset, batch_size: int, shuffle: bool = True,
                    seed: int = 0, drop_last: bool = True,
                    num_workers: int = 2) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield stacked `(data [B,1,H,W], label [B,1,HS,WS])` numpy batches.

    With `drop_last=True` every batch has identical shape, so the jitted
    train step compiles exactly once. Items are fetched by a thread pool
    and batches are prefetched one ahead of the consumer.

    When the dataset is seeded (TrainDataset(seed=...)), each item's
    augmentation rng is derived from `(seed, index)` -- `seed` here is
    already epoch-mixed by the trainer (trainer.py passes
    `args.seed + epoch`) -- so two runs with the same seed produce
    identical batches at ANY `num_workers`.
    """
    order = np.arange(len(dataset))
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    n = len(order)
    nb = n // batch_size if drop_last else -(-n // batch_size)
    deterministic = (hasattr(dataset, "item")
                     and getattr(dataset, "seed", None) is not None)

    def fetch(i: int):
        if deterministic:
            # integer mix of (epoch seed, item index): distinct per item,
            # non-colliding across epochs for any dataset < 1e6 items
            return dataset.item(int(i), random.Random(1_000_003 * seed + int(i)))
        return dataset[int(i)]

    def make_batch(bi: int):
        idxs = order[bi * batch_size:(bi + 1) * batch_size]
        items = [fetch(i) for i in idxs]
        data = np.stack([it[0] for it in items])
        label = np.stack([it[1] for it in items])
        return data, label

    if num_workers and num_workers > 0:
        with _fut.ThreadPoolExecutor(max_workers=num_workers) as ex:
            pending = [ex.submit(make_batch, i) for i in range(min(2, nb))]
            nxt = len(pending)
            for _ in range(nb):
                fut = pending.pop(0)
                if nxt < nb:
                    pending.append(ex.submit(make_batch, nxt))
                    nxt += 1
                yield fut.result()
    else:
        for i in range(nb):
            yield make_batch(i)
