"""Host data loader: shuffling, batching, background prefetch.

Replaces torch DataLoader (reference datasets/*_config.py) with a
numpy-native loader: batches are assembled by fancy-indexing whole arrays
(no per-item Python transform chain) on a background thread so host input
never blocks the device step. Static batch shapes (drop_last) keep a
single XLA program.
"""

import queue
import threading
from typing import Callable, Dict, Iterator, Optional

import numpy as np


def prepare_input(x):
    """Normalise a batch 'input' to float32 [0,1] on whatever device it
    lives on. Loaders are encouraged to ship uint8 (4x less host->device
    traffic); models always see f32."""
    if hasattr(x, "dtype") and str(x.dtype) == "uint8":
        return x.astype("float32") / 255.0
    return x


class ArrayDataset:
    """Dataset over parallel numpy arrays (optionally memory-mapped)."""

    def __init__(self, arrays: Dict[str, np.ndarray],
                 transform: Optional[Callable] = None):
        lengths = {k: len(v) for k, v in arrays.items()}
        assert len(set(lengths.values())) == 1, lengths
        self.arrays = arrays
        self.transform = transform

    def __len__(self):
        return len(next(iter(self.arrays.values())))

    def get_batch(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        batch = {k: np.asarray(v[idx]) for k, v in self.arrays.items()}
        if self.transform is not None:
            batch = self.transform(batch)
        return batch


class MapDataset:
    """Dataset over a list of items with a per-batch fetch function
    (file-backed datasets: PNG/JPEG paths etc.). `fetch(items) -> batch
    dict` runs on the prefetch thread."""

    def __init__(self, items, fetch):
        self.items = list(items)
        self.fetch = fetch

    def __len__(self):
        return len(self.items)

    def get_batch(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        return self.fetch([self.items[i] for i in idx])


class DataLoader:
    """Iterable over shuffled fixed-size batches with background prefetch.

    One pass over the data per __iter__ (epoch), like torch DataLoader.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0,
                 prefetch: int = 3):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        end = (n // self.batch_size) * self.batch_size \
            if self.drop_last else n
        for start in range(0, end, self.batch_size):
            yield order[start:start + self.batch_size]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.prefetch <= 0:
            for idx in self._index_batches():
                yield self.dataset.get_batch(idx)
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error_box = []
        stop = threading.Event()

        def producer():
            try:
                for idx in self._index_batches():
                    batch = self.dataset.get_batch(idx)
                    # Bounded put that aborts when the consumer stopped
                    # early (e.g. eval breaking at num_batches) — without
                    # this the thread blocks on the full queue forever.
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # surface worker errors
                error_box.append(e)
            finally:
                # The sentinel must be delivered reliably or the consumer
                # blocks on q.get forever; bail out only if the consumer
                # itself has stopped.
                while not stop.is_set():
                    try:
                        q.put(sentinel, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if error_box:
                        raise error_box[0]
                    return
                yield item
        finally:
            stop.set()


def infinite(loader) -> Iterator:
    """Endless epoch cycling (the reference's while/for loop at
    train.py:215-216)."""
    while True:
        yield from loader


def materialize_inputs(loader,
                       max_bytes: int = 8 << 30) -> Optional[np.ndarray]:
    """One epoch through `loader`, stacking the "input" field into a
    single host array — the staging step of the device-resident dataset
    path (`--device_dataset`): the array is device_put once and batches
    are gathered by index ON device, so the per-step host->device
    traffic shrinks to a [B] int32 index array.

    Returns None when the split exceeds `max_bytes` (caller falls back
    to the streaming loader) or the loader yields nothing.
    """
    chunks = []
    total = 0
    for batch in loader:
        x = batch["input"]
        total += x.nbytes
        if total > max_bytes:
            return None
        chunks.append(np.ascontiguousarray(x))
    if not chunks:
        return None
    return np.concatenate(chunks, axis=0)
