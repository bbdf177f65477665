"""Deterministic host-side input pipeline.

Replaces the reference's torch DataLoader + worker processes + accelerate
sharding (lumo/data/loader.py, data/accelerator.py:33-188).  Dialogue
feature dumps are tiny (all of IEMOCAP fits in host RAM), so the pipeline
is a simple indexable epoch iterator:

- per-epoch shuffle from an explicit PRNG (same order on every host)
- optional length-sorted "pack" mode that groups similar-length dialogues
  to minimize padding waste (the main throughput lever on TPU)
- multi-host: each process takes a strided slice of each batch, and
  `parallel.mesh.shard_batch` reassembles the global batch on device
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import numpy as np

from erc_tpu.core.seed import RngPool
from erc_tpu.data.collate import ERCBatcher


class DialogueLoader:
    """Epoch iterator over dialogue samples.

    sort_by_length is a *bucketed* shuffle, not a global sort: the shuffled
    order is cut into chunks of ``sort_chunk`` batches, each chunk is sorted
    by dialogue length (padding waste shrinks), and then the resulting batch
    order is re-shuffled — so the gradient sequence stays fully shuffled
    like the reference's DataLoader, with no short→long curriculum.

    Multi-host: every process computes the identical global order (shared
    seed) and takes a strided slice of each batch
    (``idx[process_index::process_count]``); ``parallel.mesh.shard_batch``
    then assembles the global batch on device from the per-process shards.
    """

    def __init__(
        self,
        samples: List[dict],
        batcher: ERCBatcher,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = False,
        seed: int = 0,
        sort_by_length: bool = False,
        sort_chunk: int = 8,
        batch_count: Optional[int] = None,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.samples = samples
        self.batcher = batcher
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = RngPool(seed)
        self.sort_by_length = sort_by_length
        self.sort_chunk = max(int(sort_chunk), 1)
        # epoch-length override (reference: LumoDataLoader batch_count,
        # loader.py:50-78): truncate when shorter, cycle when longer
        self.batch_count = batch_count
        self.epoch = 0
        if process_index is None or process_count is None:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        self.process_index = int(process_index)
        self.process_count = max(int(process_count), 1)

    def __len__(self):
        if self.batch_count is not None:
            return int(self.batch_count)
        n = len(self.samples)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _batch_indices(self) -> List[np.ndarray]:
        """Global batch index lists for this epoch (same on every process)."""
        n = len(self.samples)
        if self.shuffle:
            order = self.rng.numpy_rng("shuffle", self.epoch).permutation(n)
        else:
            order = np.arange(n)
        bs = self.batch_size
        if self.sort_by_length and n:
            chunk = bs * self.sort_chunk
            lens = np.array([len(self.samples[i]["label"]) for i in order])
            pieces = [
                order[s : s + chunk][np.argsort(lens[s : s + chunk], kind="stable")]
                for s in range(0, n, chunk)
            ]
            order = np.concatenate(pieces)
        n_full = n // bs
        end = n_full * bs if self.drop_last else n
        batches = [order[s : s + bs] for s in range(0, end, bs)]
        if self.shuffle and self.sort_by_length and len(batches) > 1:
            perm = self.rng.numpy_rng("batch_order", self.epoch).permutation(len(batches))
            batches = [batches[i] for i in perm]
        return batches

    def __iter__(self) -> Iterator[dict]:
        batches = self._batch_indices()
        if self.batch_count is not None and batches:
            want = int(self.batch_count)
            # cycle deterministically when the epoch is shorter than asked
            batches = [batches[i % len(batches)] for i in range(want)]
        for idx in batches:
            if self.process_count > 1:
                # strided per-process slice of the *global* batch; mesh.
                # shard_batch reassembles via make_array_from_process_local_data
                idx = idx[self.process_index :: self.process_count]
            yield self.batcher([self.samples[i] for i in idx])
        self.epoch += 1


class LoaderSide:
    """Zip/chain multiple loaders (reference: DataLoaderSide loader.py:110-166
    — the semi-supervised labelled+unlabelled pattern).

    zip mode: yields dicts {name: batch}; shorter loaders cycle.
    chain mode: yields each loader's batches in sequence.
    """

    def __init__(self):
        self._loaders = {}
        self._cycle = {}
        self._mode = "zip"

    def add(self, name: str, loader, cycle: bool = False) -> "LoaderSide":
        self._loaders[name] = loader
        self._cycle[name] = cycle
        return self

    def zip(self) -> "LoaderSide":
        self._mode = "zip"
        return self

    def chain(self) -> "LoaderSide":
        self._mode = "chain"
        return self

    def __len__(self):
        lens = [len(l) for n, l in self._loaders.items() if not self._cycle[n]]
        if self._mode == "chain":
            return sum(len(l) for l in self._loaders.values())
        return min(lens) if lens else max(len(l) for l in self._loaders.values())

    def __iter__(self):
        import itertools

        if self._mode == "chain":
            for loader in self._loaders.values():
                yield from loader
            return
        its = {
            n: (itertools.cycle(l) if self._cycle[n] else iter(l))
            for n, l in self._loaders.items()
        }
        n_batches = len(self)
        for _ in range(n_batches):
            try:
                yield {n: next(it) for n, it in its.items()}
            except StopIteration:
                return


def stack_batches(batches) -> dict:
    """Stack K same-shape host batches → {key: [K, B, ...]} (None passes)."""
    out = {}
    for k in batches[0]:
        if batches[0][k] is None:
            out[k] = None
        else:
            out[k] = np.stack([np.asarray(b[k]) for b in batches])
    return out


class MappedLoader:
    """Apply ``fn`` to every yielded batch (e.g. the transfer-dtype cast);
    forwards len/set_epoch like the other wrappers."""

    def __init__(self, loader, fn):
        self.loader = loader
        self.fn = fn

    def __len__(self):
        return len(self.loader)

    def set_epoch(self, epoch: int):
        self.loader.set_epoch(epoch)

    def __iter__(self):
        return (self.fn(b) for b in self.loader)


def transfer_cast_fn(dtype):
    """Batch-cast fn for ``--transfer_dtype``: quantize float32 arrays to
    `dtype` (bfloat16 halves the bytes the host link ships per step; the
    jitted steps upcast at entry — trainer.cast_floats); int/bool/label
    arrays pass through.  None when dtype is float32 (no cast needed)."""
    if not dtype or str(dtype) == "float32":
        return None
    import ml_dtypes

    target = np.dtype(getattr(ml_dtypes, str(dtype)))

    def cast(batch):
        return {
            k: (
                v.astype(target)
                if isinstance(v, np.ndarray) and v.dtype == np.float32
                else v
            )
            for k, v in batch.items()
        }

    return cast


class GroupedLoader:
    """Group K consecutive same-shape batches into stacked [K, B, ...]
    arrays for the trainer's multi-step scan (steps_per_call > 1).

    Yields ``(stacked_or_batch, k)``: k > 1 means a stacked group, k == 1
    a plain leftover batch (tail of the epoch, or a shape change under
    length bucketing — np.stack needs identical shapes).  Wrapping this in
    ``PrefetchLoader(place_fn=...)`` moves stack + upload off the step
    loop's critical path."""

    def __init__(self, loader, k: int):
        self.loader = loader
        self.k = max(int(k), 1)

    def __len__(self):
        # NB: the underlying batch count == total optimizer steps, NOT the
        # number of yielded items (~len/k plus leftovers)
        return len(self.loader)

    def set_epoch(self, epoch: int):
        self.loader.set_epoch(epoch)

    @staticmethod
    def _shape_key(batch: dict) -> tuple:
        return tuple(
            (kk, tuple(np.asarray(v).shape))
            for kk, v in sorted(batch.items())
            if v is not None
        )

    _stack = staticmethod(stack_batches)

    def __iter__(self):
        group = []
        for batch in self.loader:
            if group and self._shape_key(batch) != self._shape_key(group[0]):
                yield from self._flush(group)
                group = []
            group.append(batch)
            if len(group) == self.k:
                yield self._stack(group), self.k
                group = []
        yield from self._flush(group)

    def _flush(self, group):
        # partial groups run single-step: a stacked group of length k' ≠ k
        # would compile a second multi-step program
        for b in group:
            yield b, 1


class PrefetchLoader:
    """Background-thread prefetch wrapper: collation — and, with
    ``place_fn``, host→device transfer — of batch N+1 overlaps device
    execution of batch N (the torch-DataLoader-workers equivalent).

    ``place_fn`` (e.g. ``mesh.shard_batch``) runs in the producer thread;
    jax dispatch is thread-safe and uploads are asynchronous, so the
    train loop sees device-resident batches and never waits on PCIe (or,
    here, the tunnel)."""

    def __init__(self, loader, depth: int = 2, place_fn=None):
        self.loader = loader
        self.depth = depth
        self.place_fn = place_fn

    def __len__(self):
        return len(self.loader)

    def set_epoch(self, epoch: int):
        self.loader.set_epoch(epoch)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        _END = object()
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded put that gives up when the consumer is gone, so an
            # early-stopped epoch (trainer.stopped / mid-epoch exception)
            # never leaves the producer blocked forever holding (with
            # place_fn) device-resident batches
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for b in self.loader:
                    if self.place_fn is not None:
                        b = self.place_fn(b)
                    if not _put(b):
                        return
                _put(_END)
            except BaseException as e:  # propagate, never truncate silently
                _put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:  # GeneratorExit-safe: unblock + reap the producer
            stop.set()
            t.join()
