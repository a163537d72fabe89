"""Dataset streaming + sequence VO + CLI, on a synthetic TUM fixture."""

import dataclasses

import cv2
import numpy as np
import pytest

from phovo_tpu.datasets.tum import TUMSequence, prefetch, read_index
from phovo_tpu.ops import se3
from phovo_tpu.ops.camera import Intrinsics
from phovo_tpu.utils.synthetic import render_plane
from phovo_tpu.utils.trajectory import (
    Trajectory,
    absolute_trajectory_error,
    format_pose_line,
    read_trajectory,
    relative_pose_error,
)

INTR = Intrinsics(np.float32(128.0), np.float32(128.0), np.float32(63.5), np.float32(47.5))
SHAPE = (96, 128)
N_FRAMES = 5


def _camera_pose(k: int) -> np.ndarray:
    """World->camera pose for frame k: slow forward+turn motion."""
    state = np.array(
        [0.015 * k, -0.01 * k, 0.008 * k, 0.006 * k, -0.004 * k, 0.005 * k],
        dtype=np.float64,
    )
    return np.asarray(se3.pose_matrix(state))


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    """Synthetic TUM sequence directory: rgb/, depth/, index files,
    groundtruth.txt."""
    root = tmp_path_factory.mktemp("tum_seq")
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    rgb_lines = ["# color images", "# timestamp filename"]
    depth_lines = ["# depth images"]
    gt_lines = ["# ground truth"]
    for k in range(N_FRAMES):
        T = _camera_pose(k)
        I, D = render_plane(INTR, SHAPE, T)
        ts = 1000.0 + 0.05 * k
        ts_d = ts + 0.004  # offset depth timestamps to exercise association
        cv2.imwrite(str(root / "rgb" / f"{ts:.6f}.png"), (I * 255).astype(np.uint8))
        cv2.imwrite(
            str(root / "depth" / f"{ts_d:.6f}.png"),
            np.clip(D * 5000.0, 0, 65535).astype(np.uint16),
        )
        rgb_lines.append(f"{ts:.6f} rgb/{ts:.6f}.png")
        depth_lines.append(f"{ts_d:.6f} depth/{ts_d:.6f}.png")
        # groundtruth stores camera-in-world: inverse of world->camera
        Tw = np.linalg.inv(T)
        gt_lines.append(format_pose_line(ts, Tw))
    (root / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("\n".join(depth_lines) + "\n")
    (root / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")
    return root


def test_read_index_skips_comments(tum_dir):
    entries = read_index(tum_dir / "rgb.txt")
    assert len(entries) == N_FRAMES
    assert entries[0].timestamp == pytest.approx(1000.0)
    assert entries[0].path.exists()


def test_read_index_missing_file_raises(tum_dir):
    with pytest.raises(FileNotFoundError):
        read_index(tum_dir / "nonexistent.txt")


@pytest.mark.parametrize("pairing", ["lockstep", "associate"])
def test_sequence_iteration(tum_dir, pairing):
    seq = TUMSequence(tum_dir, pairing=pairing)
    frames = list(seq)
    assert len(frames) == N_FRAMES
    f = frames[0]
    assert f.intensity.dtype == np.uint8
    assert f.intensity.shape == SHAPE
    assert f.depth.dtype == np.float32
    # depth decoded via 16-bit png * 1/5000 back to ~2 m
    assert 1.0 < np.median(f.depth) < 4.0


def test_prefetch_matches_direct(tum_dir):
    seq = TUMSequence(tum_dir)
    direct = list(seq)
    fetched = list(prefetch(iter(seq), depth=2))
    assert len(direct) == len(fetched)
    for a, b in zip(direct, fetched):
        np.testing.assert_array_equal(a.intensity, b.intensity)


def test_trajectory_roundtrip(tmp_path):
    T = np.asarray(se3.pose_matrix(np.array([0.1, 0.2, 0.3, 0.4, -0.2, 0.1])))
    line = format_pose_line(1234.5678, T)
    p = tmp_path / "traj.txt"
    p.write_text("# hdr\n" + line + "\n")
    traj = read_trajectory(p)
    assert len(traj) == 1
    np.testing.assert_allclose(traj.positions[0], T[:3, 3], atol=1e-6)
    np.testing.assert_allclose(traj.pose_matrix(0), T, atol=1e-5)


def test_ate_zero_for_identical_trajectories(tum_dir):
    gt = read_trajectory(tum_dir / "groundtruth.txt")
    ate = absolute_trajectory_error(gt, gt)
    assert ate["rmse"] < 1e-9
    rpe = relative_pose_error(gt, gt)
    assert rpe["trans_rmse"] < 1e-9


def test_ate_invariant_to_rigid_offset(tum_dir):
    gt = read_trajectory(tum_dir / "groundtruth.txt")
    R = np.asarray(se3.pose_matrix(np.array([1.0, -2.0, 3.0, 0.3, 0.2, -0.4])))
    moved = Trajectory(
        gt.timestamps,
        gt.positions @ R[:3, :3].T + R[:3, 3],
        gt.quaternions,
    )
    ate = absolute_trajectory_error(moved, gt)
    assert ate["rmse"] < 1e-6  # Horn alignment removes the rigid offset


def test_vo_cli_end_to_end(tum_dir, tmp_path):
    """Drive the real CLI: trajectory must be written and ATE vs ground truth
    must be small on the synthetic sequence."""
    from phovo_tpu.apps.phovo_vo import main

    cfg = tmp_path / "cfg.yml"
    cfg.write_text(
        "num_levels: 2\n"
        "blur_filter_sizes: [0, 0]\n"
        "gradient_scales: [0.0625, 0.0625]\n"
        "lambda_steps: [1, 1]\n"
        "max_iterations: [12, 12]\n"
        "min_gradient_norms: [1e-9, 1e-9]\n"
        "sampling: bilinear\n"
    )
    out = tmp_path / "trajectory.txt"
    rc = main(
        [
            "--config", str(cfg),
            "--dataset", str(tum_dir),
            "--output", str(out),
            "--intrinsics", "128,128,63.5,47.5",
            "--eval-gt", str(tum_dir / "groundtruth.txt"),
            "--quiet",
        ]
    )
    assert rc == 0
    est = read_trajectory(out)
    assert len(est) == N_FRAMES - 1
    gt = read_trajectory(tum_dir / "groundtruth.txt")
    ate = absolute_trajectory_error(est, gt)
    assert ate["rmse"] < 0.01, ate


def test_vo_checkpoint_resume(tum_dir, tmp_path):
    """Crash/resume must reproduce the uninterrupted trajectory."""
    from phovo_tpu.apps.phovo_vo import main

    cfg = tmp_path / "cfg.yml"
    cfg.write_text(
        "num_levels: 1\nmax_iterations: [8]\nmin_gradient_norms: [1e-9]\n"
        "sampling: bilinear\n"
    )
    full = tmp_path / "full.txt"
    main(["--config", str(cfg), "--dataset", str(tum_dir), "--output", str(full),
          "--intrinsics", "128,128,63.5,47.5", "--quiet"])

    part = tmp_path / "part.txt"
    ckpt = tmp_path / "ckpt.json"
    main(["--config", str(cfg), "--dataset", str(tum_dir), "--output", str(part),
          "--intrinsics", "128,128,63.5,47.5", "--quiet",
          "--checkpoint", str(ckpt), "--max-frames", "2"])
    # force a checkpoint at frame 2 by writing it manually through the pipeline
    # interface (checkpoint_every defaults to 50)
    import json

    from phovo_tpu.models.sequence import Checkpoint
    from phovo_tpu.ops import se3 as _se3

    est_part = read_trajectory(part)
    T = est_part.pose_matrix(1)
    Checkpoint(2, T, np.zeros(6)).save(ckpt)

    resumed = tmp_path / "resumed.txt"
    main(["--config", str(cfg), "--dataset", str(tum_dir), "--output", str(resumed),
          "--intrinsics", "128,128,63.5,47.5", "--quiet",
          "--checkpoint", str(ckpt), "--resume"])
    est_full = read_trajectory(full)
    est_resumed = read_trajectory(resumed)
    # resumed trajectory covers the remaining frames and matches the tail
    np.testing.assert_allclose(
        est_resumed.positions[-1], est_full.positions[-1], atol=1e-4
    )


def test_vo_cli_keyframe_mode_with_ba(tum_dir, tmp_path):
    """Keyframe mode with photometric-BA finalize through the real CLI."""
    from phovo_tpu.apps.phovo_vo import main

    cfg = tmp_path / "cfg.yml"
    cfg.write_text(
        "num_levels: 2\n"
        "blur_filter_sizes: [0, 0]\n"
        "gradient_scales: [0.0625, 0.0625]\n"
        "lambda_steps: [1, 1]\n"
        "max_iterations: [12, 12]\n"
        "min_gradient_norms: [1e-9, 1e-9]\n"
        "sampling: bilinear\n"
    )
    out = tmp_path / "trajectory_kf_ba.txt"
    rc = main(
        [
            "--config", str(cfg),
            "--dataset", str(tum_dir),
            "--output", str(out),
            "--intrinsics", "128,128,63.5,47.5",
            "--mode", "keyframe",
            "--kf-translation", "0.02",
            "--ba-iterations", "3",
            "--ba-window", "4",
            "--ba-grid", "6",
            "--quiet",
        ]
    )
    assert rc == 0
    est = read_trajectory(out)
    assert len(est) == N_FRAMES - 1
    gt = read_trajectory(tum_dir / "groundtruth.txt")
    ate = absolute_trajectory_error(est, gt)
    assert ate["rmse"] < 0.01, ate
