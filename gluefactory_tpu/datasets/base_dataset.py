"""Dataset framework (reference: gluefactory/datasets/base_dataset.py:25-209).

TPU-first re-design:
  - No torch DataLoader. Host-side loading is numpy/cv2 in a thread pool
    (cv2 releases the GIL), collated into fixed-shape numpy batches, and
    double-buffered ahead of the device step. Static shapes come from the
    datasets themselves (every sample of a split has identical array shapes),
    so one XLA compilation serves the whole epoch.
  - Distributed loading: each process takes a strided shard of the epoch
    index list (``shard``/``num_shards`` ≙ torch DistributedSampler,
    reference base_dataset.py:166-169); per-epoch reshuffling folds the epoch
    into the seed exactly like the reference's ``set_epoch``.
  - The ``conf.seed`` / per-epoch / per-worker RNG discipline maps to
    numpy Generators derived from (seed, epoch, index).
"""

from __future__ import annotations

import collections.abc as cabc
import queue
import threading
from typing import Any, ClassVar

import numpy as np

from ..core.config import Config


def collate(samples: list[Any]) -> Any:
    """Stack a list of samples (nested dicts/lists of arrays/scalars) into a
    batch (reference base_dataset.py:47-97). Strings and None pass through as
    lists; numeric scalars stack to arrays; array shapes must match (static
    shapes are the datasets' contract)."""
    elem = samples[0]
    if isinstance(elem, np.ndarray):
        return np.stack(samples, axis=0)
    if isinstance(elem, (np.bool_, bool, int, float, np.integer, np.floating)):
        return np.asarray(samples)
    if isinstance(elem, cabc.Mapping):
        return {k: collate([s[k] for s in samples]) for k in elem}
    if isinstance(elem, tuple) and hasattr(elem, "_fields"):  # namedtuple
        return type(elem)(*(collate(list(x)) for x in zip(*samples)))
    if isinstance(elem, cabc.Sequence) and not isinstance(elem, str):
        return [collate(list(x)) for x in zip(*samples)]
    if hasattr(elem, "R") or hasattr(elem, "f"):  # Pose/Camera dataclass pytrees
        import jax

        return jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *samples)
    # str / None pass through as lists
    return samples


class BaseDataset:
    base_default_conf: ClassVar[dict] = {
        "name": "???",
        "num_workers": 4,
        "train_batch_size": 2,
        "val_batch_size": 2,
        "test_batch_size": 1,
        "batch_size": None,  # overrides per-split sizes when set
        "shuffle_training": True,
        "seed": 0,
        "prefetch": 2,
    }
    default_conf: ClassVar[dict] = {}

    def __init__(self, conf: Config | dict | None = None):
        merged: dict = {}
        for klass in reversed(type(self).__mro__):
            for attr in ("base_default_conf", "default_conf"):
                dc = klass.__dict__.get(attr)
                if dc:
                    merged = Config(merged).merge(dc).to_dict()
        self.conf = Config(merged).merge(conf or {})
        self.conf.freeze()
        self._init(self.conf)

    def _init(self, conf: Config):
        pass

    # -- to implement -------------------------------------------------------
    def get_dataset(self, split: str) -> "BaseDataset | Any":
        """Return an indexable split view with __len__/__getitem__(idx, rng)."""
        raise NotImplementedError

    # -- loaders -------------------------------------------------------------
    def batch_size(self, split: str) -> int:
        if self.conf.get("batch_size") is not None:
            return int(self.conf.batch_size)
        return int(self.conf.get(f"{split}_batch_size"))

    def get_data_loader(
        self,
        split: str,
        shuffle: bool | None = None,
        shard: int = 0,
        num_shards: int = 1,
        epoch: int = 0,
        drop_last: bool | None = None,
    ) -> "DataLoader":
        dataset = self.get_dataset(split)
        if shuffle is None:
            shuffle = split == "train" and self.conf.shuffle_training
        if drop_last is None:
            drop_last = split == "train"
        return DataLoader(
            dataset,
            batch_size=self.batch_size(split),
            shuffle=shuffle,
            seed=int(self.conf.seed),
            num_workers=int(self.conf.num_workers),
            prefetch=int(self.conf.prefetch),
            shard=shard,
            num_shards=num_shards,
            epoch=epoch,
            drop_last=drop_last,
        )

    def get_overfit_loader(self, split: str, num_items: int = 1) -> "DataLoader":
        """Loop over the first items forever-ish (reference LoopSampler,
        base_dataset.py:25-34,187-209)."""
        dataset = self.get_dataset(split)
        return DataLoader(
            dataset,
            batch_size=self.batch_size(split),
            shuffle=False,
            seed=int(self.conf.seed),
            num_workers=0,
            prefetch=0,
            loop_items=num_items,
        )


class DataLoader:
    """Thread-pooled, double-buffered batch loader over an indexable dataset.

    Dataset items are fetched as ``dataset.getitem(idx, rng)`` if available
    (explicit RNG threading), else ``dataset[idx]``.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool,
        seed: int,
        num_workers: int = 4,
        prefetch: int = 2,
        shard: int = 0,
        num_shards: int = 1,
        epoch: int = 0,
        drop_last: bool = False,
        loop_items: int | None = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.prefetch = max(prefetch, 1)
        self.shard = shard
        self.num_shards = num_shards
        self.epoch = epoch
        self.drop_last = drop_last
        self.loop_items = loop_items

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        # per-epoch item resampling hook (≙ reference dataset_callback_fn,
        # train.py:408-409 / megadepth.py:160-249)
        if hasattr(self.dataset, "sample_new_items"):
            self.dataset.sample_new_items(epoch)
        # per-epoch reconfiguration (e.g. scannet multiscale cycling)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.loop_items is not None:
            reps = max(self.batch_size * 100, 1)
            return np.tile(np.arange(min(self.loop_items, n)), reps)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(idx)
        if self.num_shards > 1:
            # Pad so every shard sees the same number of batches.
            per = -(-n // self.num_shards)
            pad = per * self.num_shards - n
            idx = np.concatenate([idx, idx[:pad]])
            idx = idx[self.shard :: self.num_shards]
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _get_one(self, idx: int):
        rng = np.random.default_rng((self.seed, self.epoch, int(idx)))
        if hasattr(self.dataset, "getitem"):
            return self.dataset.getitem(int(idx), rng)
        return self.dataset[int(idx)]

    def __iter__(self):
        indices = self._indices()
        nb = len(self)
        batches = [
            indices[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(nb)
        ]
        if self.num_workers <= 0:
            for b in batches:
                yield collate([self._get_one(i) for i in b])
            return
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(self._get_one, b))
                        out_q.put(("ok", collate(samples)))
                out_q.put(("done", None))
            except Exception as e:  # surface worker errors to the consumer
                out_q.put(("err", e))

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                kind, payload = out_q.get()
                if kind == "done":
                    return
                if kind == "err":
                    raise payload
                yield payload
        finally:
            stop.set()


def get_dataset(name: str) -> type[BaseDataset]:
    from ..core.registry import resolve_component

    return resolve_component(
        name,
        package="gluefactory_tpu.datasets",
        prefixes=(),
        base_class=BaseDataset,
        attr="__main_dataset__",
    )
