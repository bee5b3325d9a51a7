"""Diagnose a run's GECO regime and recommend a calibrated --g_goal.

The reference hand-picks a per-dataset GECO goal (reference
README.md:140, train.py:60 `g_goal`) and gives no guidance on choosing
it; rounds 4-5 of this rebuild showed empirically that the choice is
THE segmentation lever, and that each failure mode has an unambiguous
signature in the logged scalars (STATUS.md, "Round-5 g_goal runs").
This CLI encodes that playbook. The GECO law (ops/geco.py, same as
reference utils/geco.py:35-51) is

    beta *= exp(lr_eff * (goal - err_ema)),  clamp [g_min, 1e10]

so in per-element units (err_element = err / (C*H*W)):

- err floor ABOVE goal  -> constraint never satisfiable -> beta decays
  to the g_min floor and the KL runs free: GECO is effectively OFF
  ("beta-floor"). The outcome then depends on the data — segmentation
  can still emerge when reconstruction itself demands decomposition
  (CLEVR at goal 0.5625) or degrade when it does not (apc_tex at the
  published 0.5645) — but either way the goal is not doing its job.
- err floor BELOW goal  -> constraint permanently satisfied -> beta
  climbs to the 1e10 ceiling, the KL is crushed to ~0 nats, a dead
  model ("beta-ceiling"; e.g. APC at goal 0.580).
- err_ema == goal, beta flat and far from both clamps -> the textbook
  fixed point ("fixed-point"; e.g. tetrominoes at 0.5665, Sketchy at
  0.573).

Recommendation in every non-converged case: set --g_goal to the
measured late-run reconstruction floor (the late-window median
err_element), then bracket with a +/-0.001 sweep — the recipe that
took ShapeStacks 0.474->0.903 and CLEVR 0.337->0.841 ARI-FG-r.

Usage:
    python scripts/geco_diagnose.py --run_dir checkpoints/foo/1
    python scripts/geco_diagnose.py --scalars s.jsonl --g_goal 0.5655

Prints a human-readable report and one final machine-readable JSON
line: {"regime": ..., "goal": ..., "err_floor": ...,
"recommended_goal": ..., "beta_last": ..., "beta_log10_slope": ...}.
"""

import argparse
import json
import math
import os.path as osp


def load_run(run_dir=None, scalars=None, flags=None):
    """Returns (train_rows, flags_dict). Rows are the tag=='train'
    scalar records sorted by step."""
    if run_dir:
        scalars = scalars or osp.join(run_dir, "scalars.jsonl")
        fj = osp.join(run_dir, "flags.json")
        flags = flags or (fj if osp.exists(fj) else None)
    rows = []
    with open(scalars) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            if r.get("tag", "train") == "train" and "geco_beta" in r:
                rows.append(r)
    rows.sort(key=lambda r: r.get("step", 0))
    fl = {}
    if flags:
        with open(flags) as f:
            fl = json.load(f)
    return rows, fl


def _median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else 0.5 * (xs[n // 2 - 1] + xs[n // 2])


def _ema_element(r):
    """geco_err_ema (raw err units, what the update law compares to the
    goal) converted to per-element units via the row's own err scale;
    falls back to instantaneous err_element when the ema is absent."""
    if "geco_err_ema" in r and r.get("err"):
        return r["geco_err_ema"] * r["err_element"] / r["err"]
    return r["err_element"]


def diagnose(rows, goal, g_min=1e-10, g_max=1e10,
             tol=1e-3, late_frac=0.25, min_points=4):
    """Classify the GECO regime from train scalars.

    rows: dicts with step/geco_beta/err_element (+ optionally
    err/geco_err_ema) from the train tag.
    goal: per-element GECO goal (flags g_goal).
    Returns the report dict (see module docstring).
    """
    if len(rows) < min_points:
        raise ValueError(f"need >= {min_points} train scalar points, "
                         f"got {len(rows)}")
    n_late = max(min_points // 2, int(len(rows) * late_frac))
    late = rows[-n_late:]
    # The constraint is goal - err_EMA, so judge on the ema (the
    # instantaneous err_element is batch-noisy at +/-1e-3 scale).
    err_floor = _median([_ema_element(r) for r in late])
    beta_last = late[-1]["geco_beta"]
    # log10(beta) slope per 10k steps over the late window (0 slope =
    # equilibrium; clamped betas also read as 0).
    b0, b1 = max(late[0]["geco_beta"], g_min), max(beta_last, g_min)
    ds = max(late[-1]["step"] - late[0]["step"], 1)
    slope = (math.log10(b1) - math.log10(b0)) / ds * 1e4

    gap = err_floor - goal  # >0: floor above goal (unreachable)
    near_floor = beta_last <= 1e3 * g_min
    near_ceiling = beta_last >= 1e-3 * g_max
    # "Drifting by decades" = heading for a clamp even if not there yet.
    falling = slope < -0.1
    rising = slope > 0.1

    if gap > tol and (near_floor or falling):
        regime = "beta-floor"
        why = (f"err floor {err_floor:.4f} sits {gap:+.4f} ABOVE the "
               f"goal {goal:.4f}: the constraint is never satisfiable, "
               f"beta decays (last {beta_last:.3g}, slope "
               f"{slope:+.2f} dec/10k) and the KL runs free.")
    elif gap < -tol and (near_ceiling or rising):
        regime = "beta-ceiling"
        why = (f"err floor {err_floor:.4f} sits {-gap:.4f} BELOW the "
               f"goal {goal:.4f}: the constraint is permanently "
               f"satisfied, beta climbs (last {beta_last:.3g}, slope "
               f"{slope:+.2f} dec/10k) and crushes the KL.")
    elif abs(gap) <= tol and abs(slope) <= 0.1 and \
            not near_floor and not near_ceiling:
        regime = "fixed-point"
        why = (f"err_ema holds AT the goal ({err_floor:.4f} vs "
               f"{goal:.4f}) with beta {beta_last:.3g} flat "
               f"(slope {slope:+.2f} dec/10k), far from both clamps — "
               f"the textbook GECO equilibrium.")
    else:
        regime = "transient"
        why = (f"no settled regime yet: err floor {err_floor:.4f} vs "
               f"goal {goal:.4f}, beta {beta_last:.3g} with slope "
               f"{slope:+.2f} dec/10k — still converging (or mid "
               f"beta ramp); re-run the diagnosis on a longer log.")

    rec = None if regime == "fixed-point" else round(err_floor, 4)
    return {
        "regime": regime, "why": why, "goal": goal,
        "err_floor": round(err_floor, 6),
        "recommended_goal": rec,
        "beta_last": beta_last,
        "beta_log10_slope_per_10k": round(slope, 4),
        "late_points": n_late, "last_step": late[-1]["step"],
    }


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Diagnose GECO regime and recommend --g_goal")
    ap.add_argument("--run_dir", help="run dir with scalars.jsonl "
                    "+ flags.json (e.g. checkpoints/name/1)")
    ap.add_argument("--scalars", help="explicit scalars.jsonl path")
    ap.add_argument("--flags", help="explicit flags.json path")
    ap.add_argument("--g_goal", type=float, default=None,
                    help="override the goal (else read from flags.json)")
    ap.add_argument("--tol", type=float, default=1e-3,
                    help="per-element tolerance around the goal")
    ap.add_argument("--late_frac", type=float, default=0.25,
                    help="fraction of the log treated as 'late'")
    args = ap.parse_args(argv)
    if not args.run_dir and not args.scalars:
        ap.error("--run_dir or --scalars is required")

    rows, fl = load_run(args.run_dir, args.scalars, args.flags)
    goal = args.g_goal if args.g_goal is not None else fl.get("g_goal")
    if goal is None:
        ap.error("no g_goal: pass --g_goal or provide flags.json")
    rep = diagnose(rows, float(goal), g_min=float(fl.get("g_min", 1e-10)),
                   tol=args.tol, late_frac=args.late_frac)

    print(f"GECO diagnosis @ step {rep['last_step']} "
          f"({rep['late_points']} late points):")
    print(f"  regime: {rep['regime']}")
    print(f"  {rep['why']}")
    if rep["recommended_goal"] is not None:
        print(f"  recommendation: --g_goal {rep['recommended_goal']} "
              f"(= the measured late-run err_element floor; bracket "
              f"with a +/-0.001 sweep)")
    else:
        print("  recommendation: goal is calibrated — keep it.")
    print(json.dumps({k: v for k, v in rep.items() if k != "why"}))
    return rep


if __name__ == "__main__":
    main()
