"""Photometric-BA ablation: does BA improve ATE, scene by scene?

VERDICT r3 item 1: windowed/global photometric BA had only ever been
measured on the single-plane synthetic scene, where it WORSENS forward-
sequence ATE — plausibly because one textured plane is geometrically
near-degenerate for joint pose+landmark photometric refinement. This
driver runs the FULL keyframe pipeline (track -> pose graph -> BA ->
recompose) on both the plane and the room scene (utils/synthetic
render_room: 5 non-parallel surfaces + 2 slabs at 0.8-4.5 m) and
reports ATE per BA setting from ONE shared tracking pass per scene
(keyframe poses snapshot/restored between finalize calls, so every BA
setting refines the identical front-end output).

Usage: python tools/ba_ablation.py [--shape 120x160] [--frames 100]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from phovo_tpu.datasets.tum import RGBDFrame
from phovo_tpu.models.analytic import PhotoconsistencyOdometryAnalytic
from phovo_tpu.models.keyframe import KeyframeVisualOdometry
from phovo_tpu.ops.camera import Intrinsics
from phovo_tpu.utils import synthetic
from phovo_tpu.utils.config import PhovoConfig
from tools.parity_harness import ate_rmse


def make_config():
    return PhovoConfig(
        num_levels=3, blur_filter_sizes=(0, 0, 0),
        gradient_scales=(0.0625,) * 3, max_iterations=(6, 10, 12),
        lambda_steps=(1.0,) * 3, min_gradient_norms=(1e-10,) * 3,
        sampling="bilinear",
    )


def track_scene(scene, traj, intr, shape, n_frames, motion_scale):
    if scene == "room":
        I, D, gts, ts = synthetic.make_room_sequence(
            intr, shape, n_frames, motion_scale, 0, traj
        )
    else:
        poses_cw = {
            "forward": synthetic.forward_trajectory,
            "loop": synthetic.loop_trajectory,
        }[traj](n_frames, motion_scale, 0)
        I, D, gts = [], [], []
        for T in poses_cw:
            i, d = synthetic.render_plane(intr, shape, T)
            I.append(i)
            D.append(d)
            gts.append(np.linalg.inv(T))
        ts = np.arange(n_frames) / 30.0
    vo = PhotoconsistencyOdometryAnalytic(make_config())
    vo.set_intrinsic_matrix(np.asarray(intr.matrix()))
    kvo = KeyframeVisualOdometry(vo)
    frames = (
        RGBDFrame(timestamp=float(ts[k]), depth_timestamp=float(ts[k]),
                  intensity=I[k], depth=D[k])
        for k in range(n_frames)
    )
    for _ in kvo.run(frames):
        pass
    return kvo, np.stack(gts)


def est_poses(kvo):
    return np.stack(
        [kvo.keyframes[0].pose] + [tf.pose for tf in kvo.tracked]
    )


def sweep(kvo, gts, settings):
    snap = [k.pose.copy() for k in kvo.keyframes]
    out = {}
    for label, kwargs in settings:
        for k, p in zip(kvo.keyframes, snap):
            k.pose = p.copy()
        kvo.finalize(**kwargs)
        out[label] = ate_rmse(est_poses(kvo), gts)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="120x160")
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--robust-delta", type=float, default=None)
    ap.add_argument("--occ-gate", type=float, default=None)
    ap.add_argument("--z-robust-delta", type=float, default=None)
    args = ap.parse_args()
    H, W = (int(v) for v in args.shape.split("x"))
    fx = 525.0 * W / 640.0
    intr = Intrinsics(
        np.float32(fx), np.float32(fx),
        np.float32((W - 1) / 2), np.float32((H - 1) / 2),
    )
    settings = [
        ("pg-only", dict(ba_iterations=0)),
        ("ba3-window", dict(ba_iterations=3, ba_window=8,
                            ba_robust_delta=args.robust_delta,
                            ba_occ_gate=args.occ_gate,
                            ba_z_robust_delta=args.z_robust_delta)),
        ("ba6-window", dict(ba_iterations=6, ba_window=8,
                            ba_robust_delta=args.robust_delta,
                            ba_occ_gate=args.occ_gate,
                            ba_z_robust_delta=args.z_robust_delta)),
        ("ba3-global", dict(ba_iterations=3, ba_scope="global", ba_covis=6,
                            ba_robust_delta=args.robust_delta,
                            ba_occ_gate=args.occ_gate,
                            ba_z_robust_delta=args.z_robust_delta)),
    ]
    for scene, traj, scale in [
        ("plane", "forward", 1.2),
        ("room", "forward", 1.2),
        ("room", "loop", 1.0),
    ]:
        kvo, gts = track_scene(scene, traj, intr, (H, W), args.frames, scale)
        res = sweep(kvo, gts, settings)
        row = "  ".join(f"{k}={v:.4f}" for k, v in res.items())
        print(
            f"{scene}/{traj}: kf={len(kvo.keyframes)} "
            f"lc={len(kvo.loop_closures)}  {row}",
            flush=True,
        )


if __name__ == "__main__":
    main()
