"""Host data pipeline: batching, sharding, prefetch.

Replaces torch DataLoader + DistributedSampler
(reference: dataloaders/dataloader.py:14-157) with a numpy loader:

  * deterministic per-epoch shuffling (seeded Generator),
  * multi-host sharding by slicing the index space per process
    (the jax.distributed analogue of DistributedSampler),
  * background-thread prefetch so host item assembly overlaps device
    compute (the torch num_workers analogue — item cost here is
    KD-tree queries and npz reads),
  * infinite ``save_iter`` that bumps the epoch on wrap
    (dataloader.py:14-32).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


def _stack_batch(items) -> Dict[str, np.ndarray]:
    keys = items[0].keys()
    out = {}
    for k in keys:
        vals = [it[k] for it in items]
        if isinstance(vals[0], np.ndarray) or np.isscalar(vals[0]) or isinstance(
            vals[0], (int, float, np.floating, np.integer)
        ):
            out[k] = np.stack([np.asarray(v) for v in vals])
        else:
            out[k] = vals  # strings etc.
    return out


class NumpyLoader:
    """Iterable over shuffled, stacked batches of a map-style dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        num_shards: int = 1,
        shard_index: int = 0,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            idx = rng.permutation(n)
        # contiguous shard slice per process (DistributedSampler analogue)
        return idx[self.shard_index :: self.num_shards]

    def __len__(self):
        n = len(self._epoch_indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _produce(self, indices, q: queue.Queue):
        try:
            for s in range(0, len(indices), self.batch_size):
                chunk = indices[s : s + self.batch_size]
                if self.drop_last and len(chunk) < self.batch_size:
                    break
                q.put(_stack_batch([self.dataset[int(i)] for i in chunk]))
        finally:
            q.put(None)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._epoch_indices()
        q: queue.Queue = queue.Queue(maxsize=max(1, self.prefetch))
        t = threading.Thread(target=self._produce, args=(indices, q), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item


def save_iter(loader: NumpyLoader) -> Iterator:
    """Infinite iterator with epoch bump on wrap (dataloader.py:14-32)."""
    it = iter(loader)
    while True:
        try:
            yield next(it)
        except StopIteration:
            loader.set_epoch(loader.epoch + 1)
            it = iter(loader)
            yield next(it)


def get_dataloader(cfg, num_shards: int = 1, shard_index: int = 0):
    """Dataset dispatch + loader construction
    (reference: dataloaders/dataloader.py:57-157).

    Returns (train_loader, val_loader)."""
    name = cfg.data.dataset
    seed = cfg.training.get("seed", 42) if "training" in cfg else 42
    if name == "PUNet":
        from .punet import get_dataset

        train_ds = get_dataset(
            cfg.data.data_dir,
            split="train",
            dataset="PUNet",
            patch_size=cfg.data.npoints,
            aug_rotate=cfg.data.get("augment", True),
            seed=seed,
        )
        val_ds = get_dataset(
            cfg.data.data_dir,
            split="test",
            dataset="PUNet",
            patch_size=cfg.data.npoints,
            aug_rotate=False,
            resolutions=["10000_poisson"],
            seed=seed + 1,
        )
    elif name == "ScanNetPP":
        from .scannetpp import ScanNetPP

        use_features = cfg.data.get("point_features", None) is not None
        splits_path = cfg.data.get("splits_path", "splits")
        train_ds = ScanNetPP(
            cfg.data.data_dir,
            mode="training",
            additional_features=use_features,
            augment=cfg.data.get("augment", False),
            splits_path=splits_path,
            seed=seed,
        )
        val_ds = ScanNetPP(
            cfg.data.data_dir,
            mode="validation",
            splits_path=splits_path,
            additional_features=use_features,
            seed=seed + 1,
        )
    elif name == "ArKitPP":
        from .arkitscenes import ArkitNPZ

        train_ds = ArkitNPZ(
            cfg.data.data_dir, mode="training",
            features=cfg.data.get("point_features", None),
            augment=cfg.data.get("augment", False), seed=seed,
        )
        val_ds = ArkitNPZ(
            cfg.data.data_dir, mode="validation",
            features=cfg.data.get("point_features", None), seed=seed + 1,
        )
    else:
        raise NotImplementedError(f"dataset {name}")

    bs = cfg.training.bs if "training" in cfg else cfg.sampling.bs
    train_loader = NumpyLoader(
        train_ds, bs, shuffle=True, drop_last=True, seed=seed,
        num_shards=num_shards, shard_index=shard_index,
    )
    val_loader = NumpyLoader(
        val_ds, cfg.sampling.get("bs", bs) if "sampling" in cfg else bs,
        shuffle=False, drop_last=False, seed=seed,
    )
    return train_loader, val_loader
