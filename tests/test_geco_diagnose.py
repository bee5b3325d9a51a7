"""GECO-regime diagnostic CLI (scripts/geco_diagnose.py).

Pins the classifier against (a) synthetic trajectories built directly
from the GECO update law (ops/geco.py, reference utils/geco.py:35-51)
and (b) the real round-5 evidence runs whose regimes were established
by hand in STATUS.md ("Round-5 g_goal runs").
"""

import importlib.util as ilu
import json
import math
import os.path as osp

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

_spec = ilu.spec_from_file_location(
    "geco_diagnose", osp.join(REPO, "scripts", "geco_diagnose.py"))
gd = ilu.module_from_spec(_spec)
_spec.loader.exec_module(gd)

NUM_EL = 3 * 64 * 64  # err scale for synthetic rows


def _rows(err_el_traj, goal, g_lr=1e-5, beta0=1.0,
          g_min=1e-10, g_max=1e10, every=2500):
    """Synthesise train scalar rows by integrating the actual GECO law
    over a per-element err trajectory (one logged row per `every`
    steps, `every` law updates between rows)."""
    beta, rows = beta0, []
    for i, e in enumerate(err_el_traj):
        err = e * NUM_EL
        for _ in range(every):
            beta = min(max(beta * math.exp(g_lr * (goal - e) * NUM_EL),
                           g_min), g_max)
        rows.append({"tag": "train", "step": (i + 1) * every,
                     "err": err, "err_element": e,
                     "geco_err_ema": err, "geco_beta": beta})
    return rows


def test_beta_floor_goal_unreachable():
    # err floor 0.570 sits above the 0.5645 goal: beta decays to g_min.
    traj = [0.60 - 0.03 * min(i / 5.0, 1.0) for i in range(20)]
    rep = gd.diagnose(_rows(traj, goal=0.5645), goal=0.5645)
    assert rep["regime"] == "beta-floor"
    assert rep["beta_last"] <= 1e-7
    assert abs(rep["recommended_goal"] - 0.570) < 2e-3


def test_beta_ceiling_goal_too_easy():
    # err floor 0.560 sits below the 0.5700 goal: beta climbs to 1e10.
    traj = [0.60 - 0.04 * min(i / 5.0, 1.0) for i in range(20)]
    rep = gd.diagnose(_rows(traj, goal=0.5700), goal=0.5700)
    assert rep["regime"] == "beta-ceiling"
    assert rep["beta_last"] >= 1e7
    assert abs(rep["recommended_goal"] - 0.560) < 2e-3


def _raw_rows(pairs, every=2500):
    """Hand-crafted (err_element, beta) rows — for regimes that only
    arise from the closed training loop (the open-loop law integration
    in _rows can't hold err AT the goal)."""
    return [{"tag": "train", "step": (i + 1) * every,
             "err": e * NUM_EL, "err_element": e,
             "geco_err_ema": e * NUM_EL, "geco_beta": b}
            for i, (e, b) in enumerate(pairs)]


def test_fixed_point_at_goal():
    # The tetrominoes-0.5665 signature: err_ema pinned at the goal,
    # beta flat in a sane range (the closed loop holds it there).
    goal = 0.5665
    pairs = [(0.60 - 0.007 * min(i, 5), 0.05 + 0.07 * min(i, 5))
             for i in range(4)]
    pairs += [(goal + 2e-4 * (-1) ** i, 0.40 + 0.002 * i)
              for i in range(16)]
    rep = gd.diagnose(_raw_rows(pairs), goal=goal)
    assert rep["regime"] == "fixed-point"
    assert rep["recommended_goal"] is None
    assert 1e-4 < rep["beta_last"] < 1e4


def test_transient_mid_ramp():
    # err above goal but beta mid-range and climbing slowly (the
    # sketchy-at-50k look): no settled regime yet.
    pairs = [(0.576 - 0.0004 * i, 10.0 * 1.15 ** i) for i in range(12)]
    rep = gd.diagnose(_raw_rows(pairs), goal=0.5700)
    assert rep["regime"] == "transient"


EVIDENCE_REGIMES = [
    # (run dir, regime established by hand in STATUS.md round-5)
    ("evidence/r5_ggoal/tetro_g5665", "fixed-point"),
    ("evidence/r5_ggoal/apc_tex", "beta-floor"),
    ("evidence/r5_ggoal/apc_g573", "fixed-point"),
    ("evidence/r5_ggoal/sketchy_g573", "fixed-point"),
    ("evidence/r5_ggoal/clevr_g5625", "beta-floor"),
]


@pytest.mark.parametrize("run_dir,regime", EVIDENCE_REGIMES)
def test_real_round5_evidence(run_dir, regime):
    path = osp.join(REPO, run_dir)
    if not osp.exists(osp.join(path, "scalars.jsonl")):
        pytest.skip(f"evidence not present: {run_dir}")
    rep = gd.main(["--run_dir", path])
    assert rep["regime"] == regime


def test_cli_json_line(tmp_path, capsys):
    goal = 0.5665
    pairs = [(goal, 0.4)] * 12
    sc = tmp_path / "scalars.jsonl"
    with open(sc, "w") as f:
        for r in _raw_rows(pairs):
            f.write(json.dumps(r) + "\n")
    rep = gd.main(["--scalars", str(sc), "--g_goal", str(goal)])
    out = capsys.readouterr().out.strip().splitlines()
    tail = json.loads(out[-1])
    assert tail["regime"] == rep["regime"] == "fixed-point"
    assert "why" not in tail
