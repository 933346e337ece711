# ------------------------------------------------------------------
"""Host-side batch loader with asynchronous device prefetch.

Replaces torch DataLoader(workers=8, pin_memory) + per-step .to(device)
(reference: train_synthetic.py:79-90,178). Batches are assembled on the host
by a background thread pool and transferred ahead of compute with
``jax.device_put`` double-buffering, so the TPU never waits on host collate.

For multi-chip data parallelism pass a NamedSharding: device_put places each
host batch directly as a global sharded array (per-host file sharding is the
multi-host extension point).
"""
# ------------------------------------------------------------------

import queue
import threading
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import jax
import numpy as np


def collate(items: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


class DataLoader:
    """Iterates dict batches; optionally prefetches to device.

    Args:
      dataset: indexable with __len__/__getitem__ returning dict[str, ndarray].
      batch_size: global batch size.
      shuffle: reshuffle indices each epoch.
      drop_last: drop the trailing partial batch (required under jit --
        static shapes; the reference keeps partial batches, which is
        irrelevant at batch_size=1).
      sharding: optional jax.sharding.Sharding for device placement.
      prefetch: number of batches to stage ahead (0 disables the thread).
    """

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0,
                 sharding: Optional[Any] = None, prefetch: int = 2,
                 transform: Optional[Callable] = None,
                 keys: Optional[Sequence[str]] = None,
                 cast: Optional[Dict[str, Any]] = None,
                 workers: int = 0):
        """keys: upload only these batch entries (host->device bandwidth is
        the TPU tunnel's scarcest resource; the jitted steps use a subset
        of the dataset's fields). cast: per-key host-side dtype cast, e.g.
        {"x": jnp.bfloat16} to halve the payload when the model computes in
        bf16 anyway. workers: >0 assembles batches with a thread pool
        (batches are built concurrently, yielded in order) -- the analogue
        of the reference's DataLoader(num_workers=8) for IO-bound item
        pipelines like CERRA/ERA5 NetCDF reads (config.py:22-24), where
        h5py/scipy release the GIL during file IO."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.sharding = sharding
        self.prefetch = prefetch
        self.transform = transform
        self.keys = list(keys) if keys is not None else None
        self.cast = dict(cast) if cast else None
        self.workers = workers
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        nb = len(self)
        for b in range(nb):
            yield idx[b * self.batch_size:(b + 1) * self.batch_size]

    def _make_batch(self, indices) -> Dict[str, Any]:
        batch = None
        if hasattr(self.dataset, "get_batch"):
            # native fused assembly (idee_tpu/native); None -> numpy path
            batch = self.dataset.get_batch(indices)
        if batch is None:
            batch = collate([self.dataset[int(i)] for i in indices])
        if self.keys is not None:
            batch = {k: batch[k] for k in self.keys}
        if self.cast:
            batch = {k: (np.asarray(v).astype(self.cast[k])
                         if k in self.cast else v)
                     for k, v in batch.items()}
        if self.transform is not None:
            batch = self.transform(batch)
        if callable(self.sharding):
            # per-leaf sharding builder (e.g. spatial sharding, where
            # different-rank leaves need different PartitionSpecs)
            batch = jax.device_put(batch, self.sharding(batch))
        elif self.sharding is not None:
            batch = jax.device_put(batch, self.sharding)
        else:
            batch = jax.device_put(batch)
        return batch

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        self._epoch += 1
        if self.workers > 0:
            yield from self._iter_pooled()
            return
        if self.prefetch <= 0:
            for indices in self._index_batches():
                yield self._make_batch(indices)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def worker():
            try:
                for indices in self._index_batches():
                    if stop.is_set():
                        return
                    q.put(self._make_batch(indices))
            except Exception as e:  # surface worker errors in the main thread
                q.put(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            # a consumer that stops early (benchmarks, tests) must not leave
            # the worker blocked on q.put mid-device-transfer -- the runtime
            # aborts if the thread is killed inside a transfer at exit
            stop.set()
            while t.is_alive():
                try:
                    while True:
                        q.get_nowait()
                except queue.Empty:
                    pass
                t.join(timeout=0.1)
            t.join()

    def _iter_pooled(self) -> Iterator[Dict[str, Any]]:
        """Thread-pool batch assembly: up to `workers` batches build
        concurrently; completed batches are yielded strictly in order with
        at most prefetch+workers staged ahead of the consumer."""
        from concurrent.futures import ThreadPoolExecutor

        window = max(self.prefetch, 1) + self.workers
        with ThreadPoolExecutor(max_workers=self.workers) as pool:
            pending = []
            try:
                for indices in self._index_batches():
                    pending.append(pool.submit(self._make_batch, indices))
                    if len(pending) >= window:
                        yield pending.pop(0).result()
                while pending:
                    yield pending.pop(0).result()
            finally:
                for fut in pending:
                    fut.cancel()
