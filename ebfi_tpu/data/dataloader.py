"""Input pipeline: datalist -> sharded, shuffled, prefetched device batches.

Replaces the reference's torch DataLoader + DistributedSampler stack
(dataloader/h5dataloader.py): datasets from a datalist txt are concatenated
(h5dataloader.py:21-35), items are sharded per process/replica
(DistributedSampler ≡ rank-interleaved index slicing, h5dataloader.py:47-57),
and a background thread pool assembles host batches while the device
computes; `device_prefetch` keeps N batches in flight on the accelerator
(the HBM-resident double-buffering the torch pin_memory/num_workers pair
approximated).
"""
from __future__ import annotations

import concurrent.futures as cf
import random
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from .h5dataset import H5ClipDataset, H5ClipDatasetReal


def read_datalist(path: str) -> List[str]:
    """One H5 path per line (pandas-free equivalent of infer_ours.py:369)."""
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


# --------------------------------------------------------------------- #
# process-pool fetch plane (the reference's torch num_workers>0 analogue,
# h5dataloader.py/infer_ours.py:54-57 use 4 worker processes).  Thread
# workers share the parent's GIL, so numpy-heavy decode (blur synthesis,
# uint8->f32 scaling) cannot overlap main-thread work on a busy host;
# worker PROCESSES can.  Each worker rebuilds its datasets from
# (paths, config) on first use — h5py handles don't cross processes.

_PP_DATASETS: Optional[list] = None


def _pp_init(paths, config, real_data, fast):
    global _PP_DATASETS
    if fast and not real_data:
        from .h5dataset_fast import H5ClipDatasetFast as cls
    else:
        cls = H5ClipDatasetReal if real_data else H5ClipDataset
    _PP_DATASETS = [cls(p, config) for p in paths]


def _pp_fetch(di: int, ii: int, seed: int) -> Dict[str, np.ndarray]:
    return _PP_DATASETS[di].get(ii, seed=seed)


def collate(items: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


class EBFIDataLoader:
    """Epoch-based loader over concatenated H5 clip datasets.

    Args:
      sources: datalist txt path, a single .h5 path, or a list of .h5 paths.
      dataset_config: per-dataset config dict (see H5ClipDataset).
      batch_size, shuffle, drop_last: usual semantics.
      shard_index/num_shards: per-process data sharding (DistributedSampler
        equivalent); every shard sees a disjoint interleaved slice of the
        epoch permutation.
      real_data: use the RealBlur reader.
      seed: shuffle base seed; combined with the epoch like
        `sampler.set_epoch` (train_ours.py:219).
    """

    def __init__(
        self,
        sources,
        dataset_config: dict,
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = False,
        shard_index: int = 0,
        num_shards: int = 1,
        real_data: bool = False,
        seed: int = 0,
        num_threads: int = 2,
        fast: bool = False,
        num_workers: int = 0,
    ):
        if isinstance(sources, str):
            paths = [sources] if sources.endswith(".h5") else read_datalist(sources)
        else:
            paths = list(sources)
        if fast and not real_data and num_workers == 0:
            # fast preload only pays off where fetches happen; with process
            # workers the parent instances exist only for index/len, so the
            # (large) per-item cache is built in the workers instead
            from .h5dataset_fast import H5ClipDatasetFast

            cls = H5ClipDatasetFast
        else:
            cls = H5ClipDatasetReal if real_data else H5ClipDataset
        self._worker_spec = (paths, dataset_config, real_data, fast)
        self.datasets = [cls(p, dataset_config) for p in paths]
        self.index = [
            (di, ii) for di, ds in enumerate(self.datasets) for ii in range(len(ds))
        ]
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.seed = seed
        self.epoch = 0
        self.num_threads = num_threads
        self.num_workers = num_workers

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _shard_order(self) -> List[int]:
        order = list(range(len(self.index)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(order)
        return order[self.shard_index :: self.num_shards]

    def __len__(self) -> int:
        n = len(self._shard_order())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _fetch(self, flat_idx: int, seed: int) -> Dict[str, np.ndarray]:
        di, ii = self.index[flat_idx]
        return self.datasets[di].get(ii, seed=seed)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._shard_order()
        nb = len(self)
        batches = [
            order[b * self.batch_size : (b + 1) * self.batch_size] for b in range(nb)
        ]
        # Per-item augmentation seeds are drawn HERE, in the main thread and
        # in item order (the reference's per-item `random.randint(0, 2**32)`,
        # h5dataset.py:192-194 with num_workers=0) — drawing them inside the
        # workers would make augmentation depend on scheduling.
        seeds = [[random.randint(0, 2**32) for _ in batch] for batch in batches]
        if self.num_workers > 0:
            yield from self._iter_processes(batches, seeds)
            return
        # Not a context manager: abandoning the generator mid-epoch must not
        # block (or crash at interpreter teardown) on a joining pool.
        pool = cf.ThreadPoolExecutor(self.num_threads)
        try:
            futures = [
                [pool.submit(self._fetch, i, s) for i, s in zip(batch, bseeds)]
                for batch, bseeds in zip(batches, seeds)
            ]
            for fb in futures:
                yield collate([f.result() for f in fb])
        finally:
            try:
                pool.shutdown(wait=False, cancel_futures=True)
            except Exception:
                # abandoned generators may be finalized during interpreter
                # shutdown when concurrent.futures internals are already gone
                pass

    def _iter_processes(self, batches, seeds) -> Iterator[Dict[str, np.ndarray]]:
        """Worker-process fetch plane: decode/synthesis/encode run OUTSIDE
        the main interpreter so they overlap device compute, metrics, and
        PNG encodes even on GIL-bound numpy work (the torch num_workers
        analogue).  Items are consumed strictly in submission order, so
        batch contents and augmentation seeds are identical to the
        single-process path.  In-flight submissions are bounded to cap host
        memory (a 720p eval window is ~0.4 GB)."""
        import multiprocessing as mp

        # spawn, not fork: the parent may hold a live TPU client/tunnel and
        # XLA threads that must not be duplicated into the workers
        ctx = mp.get_context("spawn")
        pool = cf.ProcessPoolExecutor(
            self.num_workers,
            mp_context=ctx,
            initializer=_pp_init,
            initargs=self._worker_spec,
        )
        flat = [
            (self.index[i], s)
            for batch, bs in zip(batches, seeds)
            for i, s in zip(batch, bs)
        ]
        # lookahead bound (in ITEMS beyond the batch being assembled):
        # enough to keep every worker busy, small enough to cap RSS
        lookahead = max(self.num_workers + 1, self.batch_size)
        pending: List = []
        flat_pos = 0
        consumed = 0
        try:
            for batch in batches:
                want = consumed + len(batch) + lookahead
                while flat_pos < len(flat) and flat_pos < want:
                    (di, ii), s = flat[flat_pos]
                    pending.append(pool.submit(_pp_fetch, di, ii, s))
                    flat_pos += 1
                items = [pending[consumed + j].result() for j in range(len(batch))]
                for j in range(len(batch)):
                    pending[consumed + j] = None  # free the (large) result
                consumed += len(batch)
                yield collate(items)
        finally:
            try:
                pool.shutdown(wait=False, cancel_futures=True)
            except Exception:
                pass


def device_prefetch(iterator, n_prefetch: int = 2, sharding=None):
    """Move host batches to device ahead of consumption.

    With `sharding` (a jax.sharding.Sharding) batches land already laid out
    for the data-parallel mesh — the jnp conversion becomes the host->HBM
    transfer that overlaps the previous step's compute.
    """
    import collections

    import jax

    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            return {k: jax.device_put(v, sharding) for k, v in batch.items()}
        return {k: jax.device_put(v) for k, v in batch.items()}

    it = iter(iterator)
    try:
        for _ in range(n_prefetch):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
