"""Host→device input pipeline: threaded decode pool + double-buffered feed.

TPU-native replacement for the reference's ``torch.utils.data.DataLoader``
worker-process machinery (SURVEY.md §2.2 N5; `embedders/plip.py:39`,
`plip.py:44`). Design:

- a thread pool decodes/loads items (JPEG decode releases the GIL inside
  libjpeg via PIL, so threads scale without fork overhead or the reference's
  ``file_system`` sharing workarounds),
- batches are assembled as pinned host numpy and shipped with
  ``jax.device_put`` ``prefetch`` batches ahead, overlapping H2D with compute,
- everything is static-shape: the final partial batch is padded and the true
  count returned alongside.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional, Sequence, Tuple

import numpy as np

import jax


class PrefetchLoader:
    """Iterate device-resident batches of a host dataset.

    dataset: indexable returning numpy arrays (or tuples of them).
    batch_size: static batch size; last batch zero-padded (count reported).
    num_workers: decode threads.
    prefetch: batches kept in flight ahead of the consumer.
    device_put: whether to ship batches to device (else host numpy).
    sharding: optional jax sharding for device_put (mesh feeding).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        num_workers: int = 8,
        prefetch: int = 2,
        device_put: bool = True,
        sharding=None,
        collate: Optional[Callable] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.prefetch = max(1, prefetch)
        self.device_put = device_put
        self.sharding = sharding
        self.collate = collate or _default_collate

    def __len__(self):
        return -(-len(self.dataset) // self.batch_size)

    def __iter__(self) -> Iterator[Tuple]:
        n = len(self.dataset)
        bs = self.batch_size
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            """Bounded put that aborts if the consumer went away."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    for start in range(0, n, bs):
                        if stop.is_set():
                            return
                        idxs = list(range(start, min(start + bs, n)))
                        items = list(pool.map(self.dataset.__getitem__, idxs))
                        batch = self.collate(items, bs)
                        if self.device_put:
                            batch = jax.tree.map(
                                lambda x: jax.device_put(x, self.sharding)
                                if isinstance(x, np.ndarray)
                                else x,
                                batch,
                            )
                        if not put_or_stop((batch, len(idxs))):
                            return
                put_or_stop(None)
            except BaseException as e:  # surface worker errors to the consumer
                put_or_stop(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def _default_collate(items: Sequence, batch_size: int):
    """Stack items (arrays or tuples of arrays/scalars); zero-pad to batch_size."""
    first = items[0]
    if isinstance(first, tuple):
        cols = list(zip(*items))
        return tuple(_collate_column(c, batch_size) for c in cols)
    return _collate_column(items, batch_size)


def _collate_column(col, batch_size: int):
    if isinstance(col[0], np.ndarray):
        arr = np.stack(col)
        if arr.shape[0] < batch_size:
            pad = np.zeros((batch_size - arr.shape[0],) + arr.shape[1:], arr.dtype)
            arr = np.concatenate([arr, pad])
        return arr
    if isinstance(col[0], (int, np.integer, float, np.floating)):
        arr = np.asarray(col)
        if arr.shape[0] < batch_size:
            arr = np.concatenate([arr, np.zeros(batch_size - arr.shape[0], arr.dtype)])
        return arr
    return list(col)  # strings (captions) stay host-side lists
