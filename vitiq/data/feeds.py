"""Batch feeds: the uniform interface between data sources and fit()/eval.

The reference streams its 20 GB corpus through 6 forked DataLoader workers
(ref: ViT/training/train.py:346-366); the in-RAM path materializes whole
splits. A `DataFeed` abstracts over both so the SAME `fit()` loop trains
either way:

  * `ArrayFeed`  — splits that fit in RAM (synthetic corpora, small HDF5).
  * `StreamFeed` — out-of-core splits: wraps any per-epoch batch-iterator
    factory (e.g. `HDF5DataSource.batch_stream`'s windowed sequential reads
    or `PackedDataSource.batch_stream` over mmap shards). RSS stays bounded
    by the window size; randomness is epoch-deterministic (window-order
    shuffle + within-window permutation, seeded by `shuffle_seed + epoch`).

Both feeds yield host numpy batches; `fit()` wraps them in
`vitiq.data.pipeline.device_prefetch`, so the H2D DMA for step N+1 overlaps
compute for step N regardless of the storage path.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional, Tuple

import numpy as np

Batch = Tuple[np.ndarray, np.ndarray]                     # (x, y)
EvalBatch = Tuple[np.ndarray, np.ndarray, np.ndarray]     # (x, y, valid_mask)
RawBatch = Tuple[np.ndarray, np.ndarray, np.ndarray]      # (x, y, snr)


def _pad_eval(bx: np.ndarray, by: np.ndarray, batch_size: int) -> EvalBatch:
    """Pad a (possibly partial) final batch to full size with a valid mask so
    jitted eval shapes stay trace-stable and padded rows score as zero."""
    n_valid = len(bx)
    if n_valid < batch_size:
        pad = batch_size - n_valid
        bx = np.concatenate([bx, np.zeros((pad,) + bx.shape[1:], bx.dtype)])
        by = np.concatenate([by, np.zeros((pad,), by.dtype)])
    mask = np.zeros(batch_size, np.float32)
    mask[:n_valid] = 1.0
    return bx, by, mask


class DataFeed:
    """Interface: per-epoch shuffled train batches + padded eval batches +
    raw (x, y, snr) batches for confusion-matrix evaluation."""

    num_samples: int

    def train_batches(self, epoch: int, batch_size: int) -> Iterator[Batch]:
        raise NotImplementedError

    def eval_batches(self, batch_size: int) -> Iterator[EvalBatch]:
        raise NotImplementedError

    def raw_batches(self, batch_size: int) -> Iterator[RawBatch]:
        """Sequential un-padded (x, y, snr) batches (final may be partial)."""
        raise NotImplementedError

    def close(self) -> None:
        """Release any underlying storage handle (no-op for in-RAM feeds)."""


class ArrayFeed(DataFeed):
    """In-RAM feed over (x, y[, snr]) arrays.

    Train shuffling is a full permutation seeded `shuffle_seed + epoch` —
    epoch-deterministic, so a resumed run at epoch E sees the exact batch
    order the uninterrupted run would have.
    """

    def __init__(self, x: np.ndarray, y: np.ndarray,
                 snr: Optional[np.ndarray] = None, shuffle_seed: int = 0):
        self.x, self.y = x, y
        self.snr = snr if snr is not None else np.zeros(len(x), np.float32)
        self.shuffle_seed = shuffle_seed
        self.num_samples = len(x)

    def train_batches(self, epoch: int, batch_size: int) -> Iterator[Batch]:
        rng = np.random.default_rng(self.shuffle_seed + epoch)
        perm = rng.permutation(self.num_samples)
        for start in range(0, self.num_samples - batch_size + 1, batch_size):
            idx = perm[start:start + batch_size]
            yield self.x[idx], self.y[idx]

    def eval_batches(self, batch_size: int) -> Iterator[EvalBatch]:
        for start in range(0, self.num_samples, batch_size):
            yield _pad_eval(self.x[start:start + batch_size],
                            self.y[start:start + batch_size], batch_size)

    def raw_batches(self, batch_size: int) -> Iterator[RawBatch]:
        for start in range(0, self.num_samples, batch_size):
            sl = slice(start, start + batch_size)
            yield self.x[sl], self.y[sl], self.snr[sl]


class StreamFeed(DataFeed):
    """Out-of-core feed over a per-epoch batch-iterator factory.

    `make_iter(batch_size, shuffle, seed, drop_last)` must yield raw
    (x, y, snr) batches — exactly `HDF5DataSource.batch_stream`'s /
    `PackedDataSource.batch_stream`'s contract. Epoch determinism comes from
    seeding each epoch's iterator with `shuffle_seed + epoch`.
    """

    def __init__(self, make_iter: Callable[..., Iterator[RawBatch]],
                 num_samples: int, shuffle_seed: int = 0, source=None):
        self._make_iter = make_iter
        self.num_samples = num_samples
        self.shuffle_seed = shuffle_seed
        # the storage object behind make_iter (closed by close() — streaming
        # runs open one handle per split and must not leak them)
        self.source = source

    def close(self) -> None:
        if self.source is not None and hasattr(self.source, "close"):
            self.source.close()

    def train_batches(self, epoch: int, batch_size: int) -> Iterator[Batch]:
        it = self._make_iter(batch_size=batch_size, shuffle=True,
                             seed=self.shuffle_seed + epoch, drop_last=True)
        for bx, by, _ in it:
            yield bx, by

    def eval_batches(self, batch_size: int) -> Iterator[EvalBatch]:
        it = self._make_iter(batch_size=batch_size, shuffle=False,
                             seed=0, drop_last=False)
        for bx, by, _ in it:
            yield _pad_eval(bx, by, batch_size)

    def raw_batches(self, batch_size: int) -> Iterator[RawBatch]:
        return self._make_iter(batch_size=batch_size, shuffle=False,
                               seed=0, drop_last=False)


class ProcessShardFeed(DataFeed):
    """Per-host view of a global feed for multi-host meshes (SURVEY §0/§2.9
    "per-host data feeding"; VERDICT r3 item 6).

    Every process constructs the SAME underlying feed (identical seeds), so
    each epoch's global permutation is identical across hosts; this wrapper
    yields only the rows of each global batch owned by this process's
    devices (`vitiq.parallel.mesh.process_local_rows`). Paired with
    `shard_batch_per_process`, batch assembly is host-local: no process
    ever materializes — in host RAM past the slice, or on device at all —
    another host's shard. (For packed-shard storage the row range can also
    drive ranged reads; slicing here already bounds per-host device memory
    and H2D traffic, which is the multi-host contract.)

    `process_index`/`process_of_device` default to the real JAX process
    topology; tests inject fake mappings to exercise multi-host geometry on
    a single-process CPU mesh.
    """

    def __init__(self, inner: DataFeed, mesh, process_index=None,
                 process_of_device=None):
        self._inner = inner
        self._mesh = mesh
        self._process_index = process_index
        self._process_of_device = process_of_device
        self.num_samples = inner.num_samples

    def local_rows(self, global_batch: int) -> slice:
        from vitiq.parallel.mesh import process_local_rows

        return process_local_rows(self._mesh, global_batch,
                                  process_index=self._process_index,
                                  process_of_device=self._process_of_device)

    def close(self) -> None:
        self._inner.close()

    def train_batches(self, epoch: int, batch_size: int) -> Iterator[Batch]:
        sl = self.local_rows(batch_size)
        for bx, by in self._inner.train_batches(epoch, batch_size):
            # the slice was derived from batch_size; a partial batch would be
            # silently mis-sharded (rows duplicated/lost across processes) —
            # fail loudly instead (ADVICE r4; train feeds drop-last today)
            if bx.shape[0] != batch_size:
                raise ValueError(
                    f"ProcessShardFeed.train_batches: got a partial batch of "
                    f"{bx.shape[0]} rows (expected {batch_size}); per-process "
                    f"sharding requires equal-size batches — use a drop-last "
                    f"train feed")
            yield bx[sl], by[sl]

    def eval_batches(self, batch_size: int) -> Iterator[EvalBatch]:
        sl = self.local_rows(batch_size)
        for bx, by, mask in self._inner.eval_batches(batch_size):
            if bx.shape[0] != batch_size:
                raise ValueError(
                    f"ProcessShardFeed.eval_batches: got a partial batch of "
                    f"{bx.shape[0]} rows (expected {batch_size}); pad+mask "
                    f"eval batches to a fixed size before process sharding")
            yield bx[sl], by[sl], mask[sl]

    def raw_batches(self, batch_size: int) -> Iterator[RawBatch]:
        # raw (x, y, snr) batches feed host-side confusion-matrix eval and
        # may be partial — per-process slicing of a partial final batch is
        # ill-defined, so the host-side eval path stays global
        return self._inner.raw_batches(batch_size)


def as_feed(data, shuffle_seed: int = 0) -> DataFeed:
    """Coerce fit()'s `train_data`/`valid_data` argument: a DataFeed passes
    through; an (x, y) or (x, y, snr) tuple becomes an ArrayFeed."""
    if isinstance(data, DataFeed):
        return data
    return ArrayFeed(*data, shuffle_seed=shuffle_seed)
