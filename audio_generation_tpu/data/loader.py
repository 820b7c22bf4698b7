"""Asynchronous prefetching data loader.

The reference's DataLoader feeds the GPU synchronously from a Python iterator
(host->device transfer on the training critical path, SURVEY.md §3.1). Here a
small thread pool prepares and `device_put`s the next batches while the TPU
runs the current step, so input feeding overlaps compute (the single-host
analog of per-host input pipelines in SPMD training).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax


class PrefetchIterator:
    """Wrap a batch iterator: worker thread stages `n_prefetch` batches ahead
    (optionally already device_put). Exhausts cleanly; propagates worker
    exceptions to the consumer."""

    _SENTINEL = object()

    def __init__(
        self,
        source: Iterator,
        n_prefetch: int = 2,
        device_put: bool = True,
        sharding=None,
        assemble=None,
    ):
        self._queue: queue.Queue = queue.Queue(maxsize=max(n_prefetch, 1))
        self._sharding = sharding
        self._device_put = device_put
        # `assemble` overrides device_put: multi-host feeding passes
        # parallel.mesh.global_batch_from_local so each process stages only
        # its own rows (jax.make_array_from_process_local_data)
        self._assemble = assemble
        self._error: Optional[BaseException] = None

        def work():
            try:
                for item in source:
                    if self._assemble is not None:
                        item = self._assemble(item)
                    elif self._device_put:
                        item = (
                            jax.device_put(item, self._sharding)
                            if self._sharding is not None
                            else jax.device_put(item)
                        )
                    self._queue.put(item)
            except BaseException as e:  # propagate to consumer
                self._error = e
            finally:
                self._queue.put(self._SENTINEL)

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._SENTINEL:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item


def prefetch(source: Iterator, n_prefetch: int = 2, sharding=None,
             assemble=None) -> PrefetchIterator:
    return PrefetchIterator(source, n_prefetch=n_prefetch, sharding=sharding,
                            assemble=assemble)


def parallel_batches(build_fn: Callable[[int], object], n_batches: int,
                     num_workers: int = 2, ahead: Optional[int] = None) -> Iterator:
    """Build batches with a thread pool, yielding IN ORDER while up to
    `ahead` later batches build concurrently (wav decode + resample + crop
    are the host-side cost; overlapping them keeps the accelerator fed —
    the multi-worker analog of torch DataLoader(num_workers=...), which the
    reference leaves at its synchronous default).

    `build_fn(batch_index)` must be thread-safe — give each batch its own
    np.random.Generator seeded from the batch index so augmentation streams
    are deterministic regardless of worker count."""
    from concurrent.futures import ThreadPoolExecutor
    from collections import deque

    if num_workers <= 1:
        for i in range(n_batches):
            yield build_fn(i)
        return
    ahead = ahead if ahead is not None else num_workers + 1
    with ThreadPoolExecutor(max_workers=num_workers) as ex:
        futures: deque = deque()
        nxt = 0
        while nxt < min(ahead, n_batches):
            futures.append(ex.submit(build_fn, nxt))
            nxt += 1
        while futures:
            out = futures.popleft().result()
            if nxt < n_batches:
                futures.append(ex.submit(build_fn, nxt))
                nxt += 1
            yield out
