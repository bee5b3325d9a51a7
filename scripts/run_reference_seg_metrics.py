#!/usr/bin/env python
"""Run the UNMODIFIED reference compute_seg_metrics.py in this container
(via scripts/ref_shim.py's forge/attrdict stand-ins) against a real
reference checkpoint — the torch half of the real-checkpoint port
exercise (VERDICT r4 #8): the same trained artifact is evaluated by the
reference's own CLI here and by this framework's compute_seg_metrics on
the ported checkpoint; over the full test split the two means must
agree.

Usage:
  python scripts/run_reference_seg_metrics.py \
      --model_dir /tmp/ref_baseline/ref_baseline/1 \
      --model_file model.ckpt-latest --num_images 512 --split test
"""

import argparse
import os
import os.path as osp
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
REF = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--model_file", default="model.ckpt-latest")
    ap.add_argument("--num_images", type=int, default=512)
    ap.add_argument("--split", default="test")
    ap.add_argument("--data_folder", default="/tmp/multid_small/processed")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from scripts.ref_shim import install
    install()
    sys.path.insert(0, REF)

    sys.argv = [
        "compute_seg_metrics.py",
        "--data_config", "datasets/multid_config.py",
        "--model_config", "models/genesisv2_config.py",
        "--model_dir", args.model_dir,
        "--model_file", args.model_file,
        "--num_images", str(args.num_images),
        "--split", args.split,
        "--data_folder", args.data_folder,
    ]
    os.chdir(REF)
    import runpy
    runpy.run_path(osp.join(REF, "scripts", "compute_seg_metrics.py"),
                   run_name="__main__")


if __name__ == "__main__":
    main()
