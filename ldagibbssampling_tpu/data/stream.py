"""Host→device streaming minibatch pipeline — the pipeline-parallel analog.

SURVEY.md §2.3 PP row: Gibbs has no layer stack to pipeline, but the
SVI/CVB0 minibatch backends stream batches from host memory; the pipeline
overlap worth having is host slicing + H2D transfer of batch ``t+1`` hidden
behind device compute on batch ``t``.

``prefetch_to_device`` keeps ``depth`` batches in flight: ``jax.device_put``
is asynchronous, so enqueueing the transfer before the consumer needs it
overlaps the copy with whatever the device is currently running.  The
consumer receives committed device arrays in order.
"""

from __future__ import annotations

import collections
from typing import Callable, Iterable, Iterator, Optional, Sequence

import jax
import numpy as np


def prefetch_to_device(
    batches: Iterable,
    depth: int = 2,
    device: Optional[jax.Device] = None,
) -> Iterator:
    """Yield device-resident copies of ``batches``, ``depth`` ahead of use.

    Each batch may be an array or an arbitrary pytree of arrays.
    """
    if depth < 1:
        raise ValueError("depth must be >= 1")
    dev = device or jax.devices()[0]
    queue: collections.deque = collections.deque()
    it = iter(batches)

    def put(batch):
        return jax.tree.map(lambda x: jax.device_put(x, dev), batch)

    try:
        for _ in range(depth):
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


def minibatch_indices(
    num_items: int,
    batch_size: int,
    rng: np.random.Generator,
    drop_remainder: bool = False,
) -> Iterator[np.ndarray]:
    """Shuffled index batches; the final partial batch is PADDED to full size
    (by repeating its own indices) unless dropped — static batch shapes mean
    one jit compilation instead of one per remainder size.

    Yields ``(indices[batch_size], real_count)`` pairs.
    """
    order = rng.permutation(num_items)
    for s in range(0, num_items, batch_size):
        chunk = order[s : s + batch_size]
        real = len(chunk)
        if real < batch_size:
            if drop_remainder:
                return
            pad = np.resize(chunk, batch_size)
            yield pad, real
        else:
            yield chunk, real


class BowStream:
    """Bag-of-words minibatch source over a flat corpus.

    Produces ``(bow [B, V] float32, real_count)`` with deterministic
    shuffling; plugs into :func:`prefetch_to_device`.
    """

    def __init__(self, bow: np.ndarray, batch_size: int, seed: int = 0):
        self.bow = bow
        self.batch_size = batch_size
        self._rng = np.random.default_rng(seed)

    def epoch(self) -> Iterator[tuple[np.ndarray, np.ndarray, int]]:
        for idx, real in minibatch_indices(
            self.bow.shape[0], self.batch_size, self._rng
        ):
            yield idx, self.bow[idx], real
