#!/usr/bin/env python
"""Throughput benchmark for the native tfrecord MultiObjectLoader.

Synthesizes an objects_room-shaped GZIP tfrecord (if missing) with our
own writer and measures loader images/sec for several num_workers
settings — the loader-vs-device evidence for the data path
(reference datasets/multi_object_config.py:145-212).

Usage: python scripts/bench_loader.py [--n 4096] [--batch 32]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_fixture(path: str, n: int) -> None:
    from genesis_tpu.data import tfrecord as tfr
    if os.path.exists(path):
        return
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rs = np.random.RandomState(0)
    recs = []
    for _ in range(n):
        img = rs.randint(0, 255, (64, 64, 3), np.uint8)
        owner = rs.randint(0, 7, (64, 64))
        mask = np.zeros((7, 64, 64, 1), np.uint8)
        for e in range(7):
            mask[e, owner == e] = 255
        recs.append(tfr.make_example({
            "image": img.tobytes(), "mask": mask.tobytes()}))
    tfr.write_records(path, recs, compression="GZIP")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--path",
                    default="/tmp/gt_loader_bench/objects_room.tfrecords")
    ap.add_argument("--workers", default="0,2,4")
    args = ap.parse_args()

    ensure_fixture(args.path, args.n)
    from genesis_tpu.data.multi_object_config import MultiObjectLoader

    for nw in [int(w) for w in args.workers.split(",")]:
        loader = MultiObjectLoader(
            path=args.path, name="objects_room", variant="train", skip=0,
            num_frames=args.n, background_entities=4,
            batch_size=args.batch, img_size=64, buffer_size=8, seed=0,
            num_workers=nw)
        # Warm one epoch (page cache), measure the second.
        for _ in loader:
            pass
        t0 = time.perf_counter()
        count = 0
        for batch in loader:
            count += len(batch["input"])
        dt = time.perf_counter() - t0
        print(f"num_workers={nw}: {count / dt:8.1f} im/s "
              f"({count} images, {dt:.2f}s)")


if __name__ == "__main__":
    main()
