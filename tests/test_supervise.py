"""supervise_run CLI: stale-log kill + --resume relaunch, exit-code
passthrough (failure detection/recovery, SURVEY.md section 5)."""

import os
import os.path as osp
import subprocess
import sys

import pytest

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
SUPERVISE = osp.join(ROOT, "scripts", "supervise_run.py")

def run_supervisor(tmp_path, child_body, extra=()):
    # stale_seconds must exceed worst-case python startup on a loaded
    # single-core host, or a healthy-but-slow child gets killed as
    # "stale" before its first log write.
    child = tmp_path / "child.py"
    child.write_text(child_body)
    log = tmp_path / "run.log"
    cmd = [sys.executable, SUPERVISE, "--log", str(log),
           "--stale_seconds", "8", "--poll_seconds", "1",
           "--kill_grace", "2", *extra,
           "--", sys.executable, str(child.as_posix())]
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          timeout=120, cwd=str(tmp_path))
    return proc, log


@pytest.mark.quick
def test_passthrough_exit_code(tmp_path):
    proc, log = run_supervisor(
        tmp_path,
        "import sys\nprint('hello')\nsys.exit(7)\n")
    assert proc.returncode == 7
    assert "hello" in log.read_text()


@pytest.mark.quick
def test_stale_kill_and_resume(tmp_path):
    # First launch: writes one line, then hangs silently (simulated
    # wedged device tunnel). Relaunch arrives with --resume appended;
    # the child then exits 0.
    body = (
        "import sys, time\n"
        "print('child start', sys.argv[1:], flush=True)\n"
        "if '--resume' in sys.argv:\n"
        "    print('resumed ok', flush=True)\n"
        "    sys.exit(0)\n"
        "time.sleep(3600)\n")
    proc, log = run_supervisor(tmp_path, body)
    assert proc.returncode == 0
    text = log.read_text()
    assert "resumed ok" in text
    assert "killing and resuming" in proc.stdout


def test_restart_budget(tmp_path):
    # Child always hangs; supervisor gives up after max_restarts.
    body = "import time\nprint('up', flush=True)\ntime.sleep(3600)\n"
    proc, _ = run_supervisor(tmp_path, body,
                             extra=("--max_restarts", "2"))
    assert proc.returncode == 1
    assert proc.stdout.count("killing and resuming") == 2
    assert "restart budget exhausted" in proc.stdout
