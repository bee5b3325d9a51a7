#!/usr/bin/env python
"""Stale-log watchdog for long training runs (failure detection/recovery).

Launches a training command, watches its log file, and if the log goes
quiet for longer than --stale_seconds while the process is still alive,
kills the process (SIGTERM, then SIGKILL) and relaunches it with
`--resume` appended. Exits with the child's exit code once the child
terminates on its own.

Why this exists: on tunnel-attached TPU hosts the device connection can
hang indefinitely — the training process stays alive but makes no
progress. The trainer's own failure handling (divergence guard,
model.ckpt-latest + --resume continuity, genesis_tpu/train/loop.py)
recovers state perfectly across a kill; what is missing is something to
*do* the kill. This supervisor is that something. Complements (does not
replace) the in-trainer guards: the trainer detects bad numerics, the
supervisor detects a wedged device runtime.

Usage:
  python scripts/supervise_run.py --log /tmp/run.log \
      [--stale_seconds 2700] [--max_restarts 20] -- \
      python train.py ... --results_dir ... --run_name ...

Notes:
  * The child's stdout/stderr are appended to --log (the file whose
    mtime is watched), so the trainer's heartbeat cadence defines
    "alive". Keep --stale_seconds comfortably above the longest quiet
    phase (device-dataset staging, first compile, the FID stage — which
    logs every 2k images precisely so this watchdog never fires there).
  * Kills are by exact PID, never by name/pattern.
  * Relaunches append `--resume` only if the command does not already
    carry it (the flag is idempotent for the trainer anyway: it resumes
    the latest numbered run dir from model.ckpt-latest).
"""

import argparse
import os
import signal
import subprocess
import sys
import time


def parse_args(argv):
    p = argparse.ArgumentParser(
        description=__doc__, add_help=True,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--log", required=True,
                   help="Log file the child appends to; its mtime is the "
                        "liveness signal.")
    p.add_argument("--stale_seconds", type=int, default=2700,
                   help="Quiet period after which the child is presumed "
                        "wedged (default 45 min).")
    p.add_argument("--poll_seconds", type=int, default=60,
                   help="How often to check liveness.")
    p.add_argument("--max_restarts", type=int, default=20,
                   help="Give up (exit 1) after this many stale kills.")
    p.add_argument("--kill_grace", type=int, default=10,
                   help="Seconds between SIGTERM and SIGKILL.")
    if "--" not in argv:
        p.error("separate the training command with `--`")
    split = argv.index("--")
    args = p.parse_args(argv[:split])
    cmd = argv[split + 1:]
    if not cmd:
        p.error("no training command after `--`")
    return args, cmd


def launch(cmd, log_path):
    logf = open(log_path, "ab", buffering=0)
    # New process group so a stale kill takes helper threads with it.
    return subprocess.Popen(cmd, stdout=logf, stderr=logf,
                            start_new_session=True), logf


def mtime(path):
    try:
        return os.stat(path).st_mtime
    except OSError:
        return None


def kill_child(proc, grace):
    """SIGTERM then SIGKILL the child's process group, by exact pgid."""
    pgid = os.getpgid(proc.pid)
    os.killpg(pgid, signal.SIGTERM)
    deadline = time.time() + grace
    while time.time() < deadline:
        if proc.poll() is not None:
            return
        time.sleep(0.5)
    try:
        os.killpg(pgid, signal.SIGKILL)
    except ProcessLookupError:
        pass
    proc.wait()


def supervise(args, cmd):
    restarts = 0
    run_cmd = list(cmd)
    while True:
        start = time.time()
        proc, logf = launch(run_cmd, args.log)
        print(f"supervise_run: launched pid {proc.pid}: "
              f"{' '.join(run_cmd)}", flush=True)
        try:
            while True:
                if proc.poll() is not None:
                    return proc.returncode
                time.sleep(args.poll_seconds)
                mt = mtime(args.log)
                # A just-(re)launched child is not stale even though the
                # log's last write predates it — clock from whichever is
                # later, the last log write or this launch.
                ref = max(mt if mt is not None else 0.0, start)
                if time.time() - ref > args.stale_seconds:
                    break
        finally:
            logf.close()
        restarts += 1
        print(f"supervise_run: log quiet >{args.stale_seconds}s with "
              f"pid {proc.pid} alive — killing and resuming "
              f"({restarts}/{args.max_restarts})", flush=True)
        kill_child(proc, args.kill_grace)
        if restarts >= args.max_restarts:
            print("supervise_run: restart budget exhausted", flush=True)
            return 1
        if "--resume" not in run_cmd:
            run_cmd = run_cmd + ["--resume"]


def main():
    args, cmd = parse_args(sys.argv[1:])
    sys.exit(supervise(args, cmd))


if __name__ == "__main__":
    main()
