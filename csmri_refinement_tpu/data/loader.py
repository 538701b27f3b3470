"""Batched data loading with threaded prefetch.

Replaces torch ``DataLoader(num_workers=N)`` (reference train.py:396-413):
items are prepared by a thread pool (scipy/numpy release the GIL in the hot
paths) and whole batches are prefetched ahead of device compute via a
double-buffered queue. Per-worker seeding hazards of the reference
(utils/__init__.py:33-37) don't arise: each dataset owns an explicit RNG and
all device-side randomness is keyed.
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def _collate(items):
  """Stack a list of dict items into a dict of batched numpy arrays."""
  batch = {}
  for key in items[0]:
    batch[key] = np.stack([item[key] for item in items])
  return batch


class DataLoader:
  """Iterable over batches of a SliceDataset-like dataset."""

  def __init__(self, dataset, batch_size, shuffle=False, seed=0,
               num_workers=0, drop_last=False, prefetch=2,
               num_samples=None, process_shard=None):
    """``num_samples`` limits to a subset (reference
    maybe_get_subset_sampler, data/__init__.py:12-21).

    ``process_shard=(rank, world)`` is the multi-process (multi-host) data
    path: ``batch_size`` stays the GLOBAL batch size, the index stream
    (shuffle order, epoch boundaries) is computed globally and identically
    on every process (same ``seed``), and each process materializes only
    its contiguous 1/world slice of every batch. Concatenating the slices
    in rank order reproduces the single-process batch exactly — which is
    what ``parallel.shard_batch`` assembles on device (rank r's devices
    are rows r·(n/world)..(r+1)·(n/world) of the mesh's data axis)."""
    self.dataset = dataset
    self.batch_size = batch_size
    self.shuffle = shuffle
    self.num_workers = num_workers
    self.drop_last = drop_last
    self.prefetch = max(prefetch, 1)
    self.process_shard = process_shard
    if process_shard is not None:
      rank, world = process_shard
      assert 0 <= rank < world, process_shard
      assert batch_size % world == 0, \
          ('Global batch size {} must divide evenly over {} processes'
           .format(batch_size, world))
    self._rng = np.random.RandomState(seed)
    if num_samples is not None and num_samples > 0:
      if num_samples > len(dataset):
        raise ValueError('Requesting subset of {} samples, but dataset '
                         'has only {}'.format(num_samples, len(dataset)))
      self._indices = np.arange(num_samples)
    else:
      self._indices = np.arange(len(dataset))

  def __len__(self):
    n = len(self._indices)
    if self.drop_last:
      return n // self.batch_size
    if self.process_shard is not None:
      # Ragged final batches shrink to a multiple of world (or drop when
      # smaller than world) so every process holds an equal local slice.
      world = self.process_shard[1]
      full, rem = divmod(n, self.batch_size)
      return full + (1 if rem >= world else 0)
    return -(-n // self.batch_size)

  def _batch_indices(self):
    indices = self._indices.copy()
    if self.shuffle:
      self._rng.shuffle(indices)
    for start in range(0, len(indices), self.batch_size):
      chunk = indices[start:start + self.batch_size]
      if self.drop_last and len(chunk) < self.batch_size:
        return
      if self.process_shard is not None:
        rank, world = self.process_shard
        per = len(chunk) // world
        if per == 0:
          return  # final ragged batch smaller than the process count
        # Equal contiguous slices in rank order (== single-process batch
        # order after the on-device concat over the mesh's data axis).
        chunk = chunk[rank * per:(rank + 1) * per]
      yield chunk

  def _make_batch(self, idx_chunk, pool):
    # Native C++ batch fast path, when the dataset supports it
    native_fn = getattr(self.dataset, 'native_batch', None)
    if native_fn is not None:
      batch = native_fn(idx_chunk)
      if batch is not None:
        return batch
    if pool is not None:
      items = list(pool.map(self.dataset.__getitem__, idx_chunk))
    else:
      items = [self.dataset[i] for i in idx_chunk]
    return _collate(items)

  def __iter__(self):
    pool = ThreadPoolExecutor(self.num_workers) if self.num_workers else None
    if self.prefetch <= 1:
      try:
        for chunk in self._batch_indices():
          yield self._make_batch(chunk, pool)
      finally:
        if pool:
          pool.shutdown()
      return

    q = queue.Queue(maxsize=self.prefetch)
    _SENTINEL = object()

    def producer():
      try:
        for chunk in self._batch_indices():
          q.put(self._make_batch(chunk, pool))
      except BaseException as e:  # surface worker errors to the consumer
        q.put(e)
      finally:
        q.put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
      while True:
        item = q.get()
        if item is _SENTINEL:
          break
        if isinstance(item, BaseException):
          raise item
        yield item
    finally:
      thread.join(timeout=1.0)
      if pool:
        pool.shutdown(wait=False)
