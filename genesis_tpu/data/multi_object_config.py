"""Multi-object (DeepMind) data config
(reference datasets/multi_object_config.py).

Wraps the four TF-free tfrecord readers behind one `dataset` flag with the
reference's per-dataset defaults, take/skip 10k/10k test/val split,
CLEVR centre-crop 192 (IODINE protocol), background-entity folding to
label 0, and a shuffle-buffer epoch loader (GZIP streams cannot be
random-accessed; the reference also uses a shuffle buffer,
multi_object_config.py:150).
"""

import os.path as osp
from typing import Dict, Iterator

import numpy as np

from genesis_tpu.core import flags
from genesis_tpu.core.experiment import fprint
from genesis_tpu.data import multi_object_datasets as mods
from genesis_tpu.utils.misc import loader_throughput, np_img_centre_crop

flags.DEFINE_string("data_folder", "data/multi-object-datasets",
                    "Path to data folder.")
flags.DEFINE_string("dataset", "objects_room",
                    "{multi_dsprites, objects_room, clevr, tetrominoes}")
flags.DEFINE_integer("img_size", -1, "Dimension of images (square).")
flags.DEFINE_integer("dataset_size", -1, "Number of images to use.")
flags.DEFINE_integer("num_workers", 4, "Data loading threads.")
flags.DEFINE_integer("buffer_size", 128, "Shuffle buffer (x batch_size).")
flags.DEFINE_integer("K_steps", -1, "Number of recurrent steps.")

PATHS = {
    "multi_dsprites":
        "multi_dsprites/multi_dsprites_colored_on_colored.tfrecords",
    "objects_room": "objects_room/objects_room_train.tfrecords",
    "clevr": "clevr_with_masks/clevr_with_masks_train.tfrecords",
    "tetrominoes": "tetrominoes/tetrominoes_train.tfrecords",
}
VARIANTS = {"multi_dsprites": "colored_on_colored",
            "objects_room": "train", "clevr": None, "tetrominoes": None}
# (img_size, K_steps, background_entities, max_frames) per dataset
DEFAULTS = {
    "multi_dsprites": (64, 5, 1, 60000),
    "objects_room": (64, 7, 4, 1000000),
    "clevr": (128, 11, 1, 70000),
    "tetrominoes": (32, 4, 1, 60000),
}
CLEVR_CROP = 192  # IODINE pre-processing


def _resize_nearest(x: np.ndarray, size: int) -> np.ndarray:
    """[B,H,W,C] nearest resize (torch F.interpolate semantics)."""
    h, w = x.shape[1], x.shape[2]
    ys = (np.arange(size) * (h / size)).astype(np.int64)
    xs = (np.arange(size) * (w / size)).astype(np.int64)
    return x[:, ys][:, :, xs]


class MultiObjectLoader:
    """Stream epoch loader with shuffle buffer.

    The GZIP record stream is sequential by nature, but the CPU-heavy
    stages parallelise: with `num_workers` > 0, one reader thread drains
    the stream while a worker pool decodes records (proto/byte extract)
    and a second pool assembles batches (crop/resize/mask folding) —
    replacing the reference's forked DataLoader workers
    (multi_object_config.py:145-212) with threads, since the arrays are
    produced by the GIL-releasing native parser / numpy.
    """

    def __init__(self, path: str, name: str, variant, skip: int,
                 num_frames: int, background_entities: int,
                 batch_size: int, img_size: int,
                 buffer_size: int = 128, seed: int = 0,
                 num_workers: int = 0):
        self.path = path
        self.name = name
        self.variant = variant
        self.skip = skip
        self.num_frames = num_frames
        self.background_entities = background_entities
        self.batch_size = batch_size
        self.img_size = img_size
        self.buffer_size = buffer_size * batch_size
        self.num_workers = num_workers
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        return self.num_frames // self.batch_size

    def _examples(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.num_workers > 0:
            yield from self._examples_threaded()
            return
        it = mods.dataset(self.path, self.name, self.variant,
                          skip=self.skip, fields=("image", "mask"))
        for i, ex in enumerate(it):
            if i >= self.num_frames:
                return
            yield ex

    def _examples_threaded(self) -> Iterator[Dict[str, np.ndarray]]:
        """Reader thread (stream) + worker pool (decode)."""
        import queue
        import threading

        from genesis_tpu.data import tfrecord as tfr

        n = self.num_workers
        q_rec: "queue.Queue" = queue.Queue(maxsize=64 * n)
        q_ex: "queue.Queue" = queue.Queue(maxsize=64 * n)
        sentinel = object()
        decode = mods.make_decoder(self.name, self.variant,
                                   ("image", "mask"))

        def reader():
            try:
                it = tfr.iter_records(self.path, compression="auto",
                                      skip=self.skip)
                for i, record in enumerate(it):
                    if i >= self.num_frames:
                        break
                    q_rec.put(record)
            except BaseException as e:  # propagate into the consumer
                q_ex.put(("__error__", e))
            finally:
                for _ in range(n):
                    q_rec.put(sentinel)

        def worker():
            try:
                while True:
                    record = q_rec.get()
                    if record is sentinel:
                        break
                    q_ex.put(decode(record))
            except BaseException as e:
                q_ex.put(("__error__", e))
            finally:
                q_ex.put(sentinel)

        threads = [threading.Thread(target=reader, daemon=True)]
        threads += [threading.Thread(target=worker, daemon=True)
                    for _ in range(n)]
        for t in threads:
            t.start()
        done = 0
        while done < n:
            item = q_ex.get()
            if item is sentinel:
                done += 1
                continue
            if isinstance(item, tuple) and item and item[0] == "__error__":
                raise item[1]
            yield item

    def _shuffled(self):
        buf = []
        for ex in self._examples():
            buf.append(ex)
            if len(buf) >= self.buffer_size:
                j = self._rng.randint(len(buf))
                buf[j], buf[-1] = buf[-1], buf[j]
                yield buf.pop()
        self._rng.shuffle(buf)
        yield from buf

    def _to_batch(self, examples):
        img = np.stack([e["image"] for e in examples])  # uint8
        h, w = img.shape[1], img.shape[2]
        if h != w:  # CLEVR 240x320 -> centre crop 192
            img = np_img_centre_crop(img, CLEVR_CROP, batch=True)
        if self.img_size != img.shape[1]:
            img = _resize_nearest(img, self.img_size)

        # Instance labels: entity masks are uint8 {0,255}; background
        # entities fold to label 0 (reference :189-196). Vectorised
        # "last entity wins" fold (== the reference's ascending
        # overwrite loop), one pass instead of E boolean passes.
        raw = np.stack([e["mask"] for e in examples])   # [B,E,H,W]
        be = self.background_entities
        fg = raw[:, be:] == 255                          # [B,Ef,H,W]
        n_fg = fg.shape[1]
        # "Last entity wins" fold as a max over (entity index + 1) per
        # set pixel — one dense uint8 max instead of the reversed-view
        # argmax it replaces (argmax on a flipped bool view was ~25% of
        # the whole loader epoch).
        ids = np.arange(1, n_fg + 1, dtype=np.uint8)[None, :, None, None]
        idx = (fg * ids).max(axis=1)                     # [B,H,W], 0=bg
        labels = np.where(idx > 0, idx.astype(np.int32) + be, 0) \
            [..., None]
        if h != w:
            labels = np_img_centre_crop(labels, CLEVR_CROP, batch=True)
        if self.img_size != labels.shape[1]:
            labels = _resize_nearest(labels, self.img_size)
        return {"input": img, "instances": labels.astype(np.int32)}

    def __iter__(self):
        if self.num_workers > 0:
            yield from self._iter_threaded()
            return
        batch = []
        for ex in self._shuffled():
            batch.append(ex)
            if len(batch) == self.batch_size:
                yield self._to_batch(batch)
                batch = []

    def _iter_threaded(self):
        """Overlap batch assembly (crop/resize/mask-folding) with the
        decode pipeline: keep a few _to_batch futures in flight."""
        import collections
        from concurrent.futures import ThreadPoolExecutor

        in_flight = collections.deque()
        max_in_flight = 2 * self.num_workers
        with ThreadPoolExecutor(self.num_workers) as pool:
            batch = []
            for ex in self._shuffled():
                batch.append(ex)
                if len(batch) == self.batch_size:
                    in_flight.append(pool.submit(self._to_batch, batch))
                    batch = []
                    if len(in_flight) >= max_in_flight:
                        yield in_flight.popleft().result()
            while in_flight:
                yield in_flight.popleft().result()


def load(cfg, **unused_kwargs):
    del unused_kwargs
    name = cfg.dataset
    if name not in DEFAULTS:
        raise NotImplementedError(f"{name} not a valid dataset.")
    d_img, d_k, background_entities, max_frames = DEFAULTS[name]
    if cfg.get("img_size", -1) < 0:
        cfg.img_size = d_img
    if cfg.get("K_steps", -1) < 0:
        cfg.K_steps = d_k

    path = osp.join(cfg.data_folder, PATHS[name])
    if not osp.exists(path):
        raise FileNotFoundError(f"Dataset file not found: {path}")

    total_sz = cfg.get("dataset_size", -1)
    if total_sz > max_frames:
        fprint(f"WARNING: {total_sz} frames requested, but only "
               f"{max_frames} available.")
        total_sz = max_frames
    if total_sz <= 0:
        total_sz = max_frames
    val_sz, tst_sz = 10000, 10000
    tng_sz = total_sz - val_sz - tst_sz
    assert tng_sz > 0
    fprint(f"Splitting into {tng_sz}/{val_sz}/{tst_sz} for tng/val/tst")

    common = dict(path=path, name=name, variant=VARIANTS[name],
                  background_entities=background_entities,
                  batch_size=cfg.batch_size, img_size=cfg.img_size,
                  buffer_size=cfg.get("buffer_size", 128),
                  seed=cfg.get("seed", 0),
                  num_workers=max(cfg.get("num_workers", 0), 0))
    # take/skip split as in the reference: test = first 10k, val = next
    # 10k, train = rest (multi_object_config.py:124-126).
    tst = MultiObjectLoader(skip=0, num_frames=tst_sz, **common)
    val = MultiObjectLoader(skip=tst_sz, num_frames=val_sz, **common)
    tng = MultiObjectLoader(skip=tst_sz + val_sz, num_frames=tng_sz,
                            **common)
    if not cfg.get("debug", False):
        loader_throughput(tng)
    return tng, val, tst
