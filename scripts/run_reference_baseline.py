"""Run the UNMODIFIED torch reference trainer on this host to measure a
same-host baseline (s/batch on the CPU the repo's loaders/tests share).

The reference's own train.py executes against /root/reference via the
shims in scripts/ref_shim.py; the result anchors bench.py's
`vs_baseline` with a *measured* number next to the GPU estimate
(BASELINE.md). Writes only to --results_dir.

Usage:
  python scripts/run_reference_baseline.py --train_iter 200 \
      --report_loss_every 25 --results_dir /tmp/ref_baseline

Parses the reference heartbeat "... - X.XX s/b" lines and prints one
JSON summary line at the end (median s/b over post-warmup heartbeats).
"""

import argparse
import importlib.util
import json
import os
import os.path as osp
import re
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
REF = "/root/reference"


def _preload(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


class _Done(Exception):
    pass


class _Tee:
    """Mirror reference stdout to a log while scanning for s/b lines;
    aborts the run (via _Done) once `enough` heartbeats are parsed, so
    the reference's final 10k-image validation/FID stage never runs —
    only the training-loop timing is wanted here."""

    def __init__(self, stream, log_path, enough):
        self.stream = stream
        self.log = open(log_path, "w")
        self.s_per_b = []
        self.enough = enough

    def write(self, text):
        self.stream.write(text)
        self.log.write(text)
        self.log.flush()
        for m in re.finditer(r"- (\d+\.\d+) s/b", text):
            self.s_per_b.append(float(m.group(1)))
        if len(self.s_per_b) >= self.enough:
            raise _Done

    def flush(self):
        self.stream.flush()
        self.log.flush()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_iter", type=int, default=200)
    ap.add_argument("--report_loss_every", type=int, default=25)
    ap.add_argument("--batch_size", type=int, default=32)
    # Match bench.py's canonical K=9 so the speedup is apples-to-apples
    # (the r4 measurement ran multid's default K=5, which flatters the
    # CPU baseline — direction conservative; recorded in the JSON).
    ap.add_argument("--K_steps", type=int, default=9)
    ap.add_argument("--model_config", default="models/genesisv2_config.py")
    ap.add_argument("--data_folder",
                    default=osp.join(REPO,
                                     "data/multi_dsprites/processed"))
    ap.add_argument("--results_dir", default="/tmp/ref_baseline")
    ap.add_argument("--out_json", default=None)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from scripts.ref_shim import install
    install()
    # The reference root must win module-name collisions from here on
    # (its `scripts` package vs this repo's).
    sys.path.insert(0, REF)
    # Reference train.py imports scripts.compute_fid; this repo's
    # `scripts` package is already cached in sys.modules, so preload the
    # reference's module under that name explicitly.
    _preload("scripts.compute_fid",
             osp.join(REF, "scripts", "compute_fid.py"))

    os.makedirs(args.results_dir, exist_ok=True)
    sys.argv = [
        "train.py",
        "--data_config", "datasets/multid_config.py",
        "--model_config", args.model_config,
        "--data_folder", args.data_folder,
        "--results_dir", args.results_dir,
        "--run_name", "ref_baseline",
        "--train_iter", str(args.train_iter),
        "--batch_size", str(args.batch_size),
        "--report_loss_every", str(args.report_loss_every),
        "--run_validation_every", str(10 ** 9),
        "--log_images_every", str(10 ** 9),
        "--num_checkpoints", "1",
        "--num_workers", "0",
        "--K_steps", str(args.K_steps),
    ]
    os.chdir(REF)  # reference resolves config paths relative to its root

    tee = _Tee(sys.stdout, osp.join(args.results_dir, "ref_train.log"),
               enough=max(args.train_iter // args.report_loss_every, 1))
    sys.stdout = tee
    import runpy
    try:
        runpy.run_path(osp.join(REF, "train.py"), run_name="__main__")
    except (SystemExit, _Done):
        pass
    finally:
        sys.stdout = tee.stream

    # Median over post-warmup heartbeats (the first includes dataset and
    # autograd warmup).
    samples = tee.s_per_b[1:] or tee.s_per_b
    if not samples:
        print(json.dumps({"error": "no s/b heartbeats parsed"}))
        sys.exit(1)
    med = sorted(samples)[len(samples) // 2]
    # The 1-core host is shared (TPU-queue host threads, test runs), so
    # the MINIMUM heartbeat is the fairest uncontended estimate of the
    # reference's speed — and the CONSERVATIVE choice for computing our
    # speedup (a slower-looking reference would inflate it).
    best = min(samples)
    result = {
        "baseline_measured_cpu_s_per_batch": best,
        "baseline_measured_cpu_im_per_s": args.batch_size / best,
        "baseline_median_s_per_batch": med,
        "batch_size": args.batch_size,
        "K_steps": args.K_steps,
        "train_iter": args.train_iter,
        "model_config": args.model_config,
        "n_heartbeats": len(tee.s_per_b),
        "host": "same-host torch CPU (1 core); min heartbeat "
                "(conservative under host contention)",
    }
    line = json.dumps(result)
    print(line)
    if args.out_json:
        with open(args.out_json, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
