"""GQN rooms-ring-camera data config (reference datasets/gqn_config.py +
third_party/tf_gqn/gqn_tfr_provider.py), TF-free.

Records hold `frames` (sequence_size JPEG strings) and `cameras`
(sequence_size*5 floats). One random frame per record per epoch is
decoded (the reference's context_size=0 random-index gather,
gqn_tfr_provider.py:393-399). The devel_train/devel_val split slices the
TRAIN FILE LIST by val_frac exactly as the reference
(_get_dataset_files, gqn_tfr_provider.py:109-137); frame counts are the
reference's hard-coded 10.8M/1.2M (gqn_config.py:118-119).
"""

import collections
import io
import os
import os.path as osp
from typing import Iterator, List

import numpy as np

from genesis_tpu.core import flags
from genesis_tpu.data import tfrecord as tfr
from genesis_tpu.utils.misc import loader_throughput

flags.DEFINE_string("data_folder", "data/gqn_datasets",
                    "Path to data folder.")
flags.DEFINE_integer("img_size", 64, "Dimension of images (square).")
flags.DEFINE_integer("val_frac", 60,
                     "Fraction of training images used for validation.")
flags.DEFINE_integer("num_workers", 4, "Data loading threads.")
flags.DEFINE_integer("buffer_size", 128, "Shuffle buffer (x batch_size).")
flags.DEFINE_integer("K_steps", 7, "Number of recurrent steps.")

DatasetInfo = collections.namedtuple(
    "DatasetInfo",
    ["basepath", "train_size", "test_size", "frame_size", "sequence_size"])

# Registry mirrors gqn_tfr_provider.py:42-100 (incl. the 1-file debug stub).
DATASETS = dict(
    jaco=DatasetInfo("jaco", 3600, 400, 64, 11),
    mazes=DatasetInfo("mazes", 1080, 120, 84, 300),
    rooms_free_camera_with_object_rotations=DatasetInfo(
        "rooms_free_camera_with_object_rotations", 2034, 226, 128, 10),
    rooms_ring_camera=DatasetInfo("rooms_ring_camera", 2160, 240, 64, 10),
    rooms_ring_camera_debug=DatasetInfo(
        "rooms_ring_camera_debug", 1, 1, 64, 10),
    rooms_free_camera_no_object_rotations=DatasetInfo(
        "rooms_free_camera_no_object_rotations", 2160, 240, 64, 10),
    shepard_metzler_5_parts=DatasetInfo(
        "shepard_metzler_5_parts", 900, 100, 64, 15),
    shepard_metzler_7_parts=DatasetInfo(
        "shepard_metzler_7_parts", 900, 100, 64, 15),
)
MODES = ("train", "test", "devel_train", "devel_val")
# Hard-coded frame counts for rooms_ring_camera (gqn_config.py:118-119).
TRAIN_FRAMES = 10_800_000
TEST_FRAMES = 1_200_000


def get_dataset_files(info: DatasetInfo, mode: str, val_frac: int,
                      root: str) -> List[str]:
    """File-list slicing for the devel split
    (gqn_tfr_provider.py:109-137)."""
    folder = "train" if "devel" in mode else mode
    base = osp.join(root, info.basepath, folder)
    num_files = info.test_size if mode == "test" else info.train_size
    length = len(str(num_files))
    template = "{:0%d}-of-{:0%d}.tfrecord" % (length, length)
    if mode == "devel_train":
        start, end = 0, (num_files // val_frac) * (val_frac - 1)
    elif mode == "devel_val":
        start = (num_files // val_frac) * (val_frac - 1)
        end = num_files
    else:
        start, end = 0, num_files
    return [osp.join(base, template.format(i + 1, num_files))
            for i in range(start, end)]


def _decode_jpeg(data: bytes) -> np.ndarray:
    from PIL import Image
    img = Image.open(io.BytesIO(data))
    return np.asarray(img, np.uint8)


def _resize_nearest(x: np.ndarray, size: int) -> np.ndarray:
    h, w = x.shape[1], x.shape[2]
    ys = (np.arange(size) * (h / size)).astype(np.int64)
    xs = (np.arange(size) * (w / size)).astype(np.int64)
    return x[:, ys][:, :, xs]


class GQNLoader:
    """Epoch loader: per-epoch shuffled file order + shuffle buffer over
    records; one random frame per record decoded from JPEG."""

    def __init__(self, data_folder: str, dataset: str, mode: str,
                 img_size: int, val_frac: int, batch_size: int,
                 buffer_size: int = 128, seed: int = 0,
                 num_frames: int = None, all_frames: bool = False):
        info = DATASETS[dataset]
        self.info = info
        self.files = get_dataset_files(info, mode, val_frac, data_folder)
        self.mode = mode
        self.img_size = img_size
        self.batch_size = batch_size
        self.buffer_size = buffer_size * batch_size
        self._rng = np.random.RandomState(seed)
        # all_frames yields every view of every record instead of one
        # random view — the staging mode for the device-resident dataset
        # path, where the on-device per-epoch index shuffle reproduces
        # the reference's random-frame-per-visit sampling
        # (gqn_tfr_provider.py:393-399) over the full view set.
        self.all_frames = all_frames
        if num_frames is None:
            if dataset == "rooms_ring_camera":
                train_sz, test_sz = TRAIN_FRAMES, TEST_FRAMES
            else:
                # Estimate 5000 records/file like rooms_ring_camera.
                train_sz = info.train_size * 5000
                test_sz = info.test_size * 5000
            if mode == "train":
                num_frames = train_sz
            elif mode == "test":
                num_frames = test_sz
            elif mode == "devel_train":
                num_frames = (train_sz // val_frac) * (val_frac - 1)
            elif mode == "devel_val":
                num_frames = train_sz // val_frac
        self.num_frames = num_frames

    def set_all_frames(self, flag: bool) -> None:
        """Switch between all-views staging (device-dataset path) and
        one-random-view-per-record streaming; __len__ tracks the mode."""
        self.all_frames = bool(flag)

    def __len__(self):
        # With all_frames the loader yields every view of every record,
        # i.e. sequence_size x more frames per epoch.
        n = self.num_frames
        if self.all_frames:
            n *= self.info.sequence_size
        return n // self.batch_size

    def _records(self) -> Iterator[bytes]:
        files = list(self.files)
        if "train" in self.mode:
            self._rng.shuffle(files)
        for path in files:
            yield from tfr.iter_records(path)

    def _frames(self) -> Iterator[np.ndarray]:
        seq = self.info.sequence_size
        for record in self._records():
            jpegs = tfr.bytes_values(record, "frames")
            if self.all_frames:
                for data in jpegs:
                    yield _decode_jpeg(data)
            else:
                idx = self._rng.randint(seq)
                yield _decode_jpeg(jpegs[idx])

    def _shuffled(self):
        if "train" not in self.mode:
            yield from self._frames()
            return
        buf = []
        for fr in self._frames():
            buf.append(fr)
            if len(buf) >= self.buffer_size:
                j = self._rng.randint(len(buf))
                buf[j], buf[-1] = buf[-1], buf[j]
                yield buf.pop()
        self._rng.shuffle(buf)
        yield from buf

    def __iter__(self):
        batch = []
        for fr in self._shuffled():
            batch.append(fr)
            if len(batch) == self.batch_size:
                img = np.stack(batch)  # uint8; normalised on device
                if self.img_size != img.shape[1]:
                    img = _resize_nearest(img, self.img_size)
                yield {"input": img}
                batch = []


def load(cfg, **unused_kwargs):
    del unused_kwargs
    if not os.path.exists(cfg.data_folder):
        raise FileNotFoundError(
            f"Data folder does not exist: {cfg.data_folder}")
    dataset = cfg.get("gqn_dataset", "rooms_ring_camera")
    common = dict(data_folder=cfg.data_folder, dataset=dataset,
                  img_size=cfg.img_size, val_frac=cfg.val_frac,
                  buffer_size=cfg.get("buffer_size", 128),
                  seed=cfg.get("seed", 0))
    train_loader = GQNLoader(mode="devel_train",
                             batch_size=cfg.batch_size,
                             all_frames=cfg.get("device_dataset", False),
                             **common)
    val_loader = GQNLoader(mode="devel_val",
                           batch_size=cfg.batch_size, **common)
    test_loader = GQNLoader(mode="test", batch_size=1, **common)
    if not cfg.get("debug", False):
        loader_throughput(train_loader)
    return train_loader, val_loader, test_loader
