"""CLI: evaluate an estimated trajectory against ground truth (ATE / RPE).

The reference emits TUM-format trajectories
(PhotoconsistencyVisualOdometry.cpp:187-188,240-243) and leaves evaluation to
the external TUM benchmark scripts (evaluate_ate.py / evaluate_rpe.py); this
brings that step in-tree so the full reference workflow — run odometry, score
it — needs nothing outside this package.

Usage:
    python -m phovo_tpu.apps.phovo_eval <groundtruth.txt> <estimated.txt> \
        [--mode ate|rpe|both] [--max-dt 0.02] [--rpe-delta 1] [--json]

Both files are TUM format: `timestamp tx ty tz qx qy qz qw`, '#' comments
skipped. ATE associates timestamps (nearest within --max-dt), Horn-aligns,
and reports translational RMSE; RPE compares relative motions over a fixed
frame delta. Matches the TUM tools' semantics (utils/trajectory.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="phovo-eval",
        description="ATE/RPE evaluation of TUM-format trajectories",
    )
    p.add_argument("groundtruth", help="ground-truth trajectory (TUM format)")
    p.add_argument("estimated", help="estimated trajectory (TUM format)")
    p.add_argument("--mode", default="both", choices=["ate", "rpe", "both"])
    p.add_argument("--max-dt", type=float, default=0.02,
                   help="timestamp association tolerance in seconds")
    p.add_argument("--rpe-delta", type=int, default=1,
                   help="frame-index delta for relative pose error")
    p.add_argument("--json", action="store_true",
                   help="print one machine-readable JSON object")
    return p


def main(argv=None) -> int:
    try:
        return _main(argv)
    except (FileNotFoundError, ValueError, IOError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1


def _main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from phovo_tpu.utils.trajectory import (
        absolute_trajectory_error,
        read_trajectory,
        relative_pose_error,
    )

    gt = read_trajectory(args.groundtruth)
    est = read_trajectory(args.estimated)

    out: dict = {}
    if args.mode in ("ate", "both"):
        out["ate"] = absolute_trajectory_error(est, gt, max_dt=args.max_dt)
    if args.mode in ("rpe", "both"):
        out["rpe"] = relative_pose_error(
            est, gt, delta=args.rpe_delta, max_dt=args.max_dt
        )

    if args.json:
        print(json.dumps(out))
        return 0
    if "ate" in out:
        a = out["ate"]
        print(f"ATE over {a['num_pairs']} associated poses:")
        print(f"  rmse   {a['rmse']:.6f} m")
        print(f"  mean   {a['mean']:.6f} m")
        print(f"  median {a['median']:.6f} m")
        print(f"  std    {a['std']:.6f} m")
        print(f"  min    {a['min']:.6f} m")
        print(f"  max    {a['max']:.6f} m")
    if "rpe" in out:
        r = out["rpe"]
        print(f"RPE over {r['num_pairs']} pairs (delta={args.rpe_delta}):")
        print(f"  trans rmse {r['trans_rmse']:.6f} m")
        print(f"  rot rmse   {r['rot_rmse_deg']:.6f} deg")
    return 0


if __name__ == "__main__":
    sys.exit(main())
