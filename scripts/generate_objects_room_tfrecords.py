#!/usr/bin/env python
"""Generate an objects_room-shaped GZIP tfrecord dataset from the
procedural sprite generator.

Produces `<out>/objects_room/objects_room_train.tfrecords` with the
DeepMind objects_room feature layout (image [64,64,3] uint8, mask
[7,64,64,1] uint8 in {0,255}; reference
third_party/multi_object_datasets/objects_room.py) so the native
tfrecord MultiObjectLoader (genesis_tpu/data/multi_object_config.py)
can feed real training runs end-to-end: entity 0 carries the scene
background, entities 1-3 stay empty (all four fold to label 0 as
background_entities=4), entities 4-6 carry up to three sprites.

Usage: python scripts/generate_objects_room_tfrecords.py \
           [--out data/multi-object-synth] [--n 50000]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

ENTITIES = 7
BACKGROUND_ENTITIES = 4
MAX_SPRITES = ENTITIES - BACKGROUND_ENTITIES


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/multi-object-synth")
    ap.add_argument("--n", type=int, default=50000)
    ap.add_argument("--img_size", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from genesis_tpu.data import synthetic
    from genesis_tpu.data import tfrecord as tfr

    path = os.path.join(args.out, "objects_room",
                        "objects_room_train.tfrecords")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rs = np.random.RandomState(args.seed)

    def records():
        for i in range(args.n):
            img, ins = synthetic.generate_scene(
                rs, args.img_size, max_sprites=MAX_SPRITES)
            img8 = np.round(img * 255).astype(np.uint8)
            mask = np.zeros((ENTITIES, args.img_size, args.img_size, 1),
                            np.uint8)
            mask[0, ins == 0] = 255          # background -> entity 0
            for s in range(MAX_SPRITES):     # sprite s -> entity 4+s
                mask[BACKGROUND_ENTITIES + s, ins == s + 1] = 255
            if (i + 1) % 10000 == 0:
                print(f"{i + 1}/{args.n}")
            yield tfr.make_example({"image": img8.tobytes(),
                                    "mask": mask.tobytes()})

    tfr.write_records(path, records(), compression="GZIP")
    sz = os.path.getsize(path) / 1e6
    print(f"Wrote {args.n} frames to {path} ({sz:.1f} MB)")


if __name__ == "__main__":
    main()
