"""Multi-camera serving: apps/phovo_serve + parallel/batch.py chunked server.

Two synthetic TUM streams with different motions are served together; each
stream's trajectory must match running the single-sequence phovo-vo chunked
pipeline on that stream alone.
"""

import cv2
import numpy as np
import pytest

from phovo_tpu.apps import phovo_serve, phovo_vo
from phovo_tpu.ops import se3
from phovo_tpu.utils.trajectory import read_trajectory
from phovo_tpu.utils.synthetic import render_plane
from phovo_tpu.ops.camera import Intrinsics

INTR = Intrinsics(
    np.float32(128.0), np.float32(128.0), np.float32(63.5), np.float32(47.5)
)
SHAPE = (96, 128)
CFG_YAML = """
num_levels: 2
blur_filter_sizes: [0, 0]
gradient_scales: [0.0625, 0.0625]
max_iterations: [6, 8]
lambda_steps: [1.0, 1.0]
min_gradient_norms: [1.0e-10, 1.0e-10]
sampling: bilinear
"""


def _write_stream(root, n_frames: int, scale: float) -> None:
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    rgb_lines, depth_lines = ["# rgb"], ["# depth"]
    for k in range(n_frames):
        state = scale * np.array(
            [0.015 * k, -0.01 * k, 0.008 * k, 0.006 * k, -0.004 * k, 0.005 * k]
        )
        T = np.asarray(se3.pose_matrix(state))
        I, D = render_plane(INTR, SHAPE, T)
        ts = 1000.0 + 0.05 * k
        cv2.imwrite(str(root / "rgb" / f"{k}.png"), (I * 255).astype(np.uint8))
        cv2.imwrite(
            str(root / "depth" / f"{k}.png"),
            np.clip(D * 5000.0, 0, 65535).astype(np.uint16),
        )
        rgb_lines.append(f"{ts:.6f} rgb/{k}.png")
        depth_lines.append(f"{ts:.6f} depth/{k}.png")
    (root / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("\n".join(depth_lines) + "\n")


@pytest.fixture(scope="module")
def two_streams(tmp_path_factory):
    """Two sequences with different motion and different lengths."""
    a = tmp_path_factory.mktemp("serve_a")
    b = tmp_path_factory.mktemp("serve_b")
    _write_stream(a, n_frames=6, scale=1.0)
    _write_stream(b, n_frames=5, scale=0.5)
    return a, b


def test_serve_matches_single_stream_vo(two_streams, tmp_path):
    a, b = two_streams
    cfg = tmp_path / "cfg.yml"
    cfg.write_text(CFG_YAML)
    out_dir = tmp_path / "served"

    rc = phovo_serve.main([
        "--config", str(cfg), "--dataset", str(a), "--dataset", str(b),
        "--out-dir", str(out_dir), "--chunk", "2", "--quiet",
        "--intrinsics", "128,128,63.5,47.5",
    ])
    assert rc == 0

    for stream_dir, n_frames in ((a, 6), (b, 5)):
        solo = tmp_path / f"solo_{stream_dir.name}.txt"
        rc = phovo_vo.main([
            "--config", str(cfg), "--dataset", str(stream_dir),
            "--output", str(solo), "--chunk", "2",
            "--intrinsics", "128,128,63.5,47.5", "--quiet",
        ])
        assert rc == 0
        got = read_trajectory(out_dir / f"{stream_dir.name}.txt")
        want = read_trajectory(solo)
        assert len(got.timestamps) == len(want.timestamps) == n_frames - 1
        np.testing.assert_allclose(got.timestamps, want.timestamps)
        np.testing.assert_allclose(
            got.positions, want.positions, atol=1e-5
        )
        np.testing.assert_allclose(
            np.abs(np.sum(got.quaternions * want.quaternions, axis=1)),
            1.0, atol=1e-6,
        )


def test_serve_max_frames(two_streams, tmp_path):
    a, b = two_streams
    cfg = tmp_path / "cfg.yml"
    cfg.write_text(CFG_YAML)
    out_dir = tmp_path / "served_capped"
    rc = phovo_serve.main([
        "--config", str(cfg), "--dataset", str(a), "--dataset", str(b),
        "--out-dir", str(out_dir), "--chunk", "2", "--max-frames", "3",
        "--quiet", "--intrinsics", "128,128,63.5,47.5",
    ])
    assert rc == 0
    for d in (a, b):
        traj = read_trajectory(out_dir / f"{d.name}.txt")
        assert len(traj.timestamps) == 3
