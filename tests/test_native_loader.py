"""Native C++ decode-ahead loader vs the Python/cv2 loader (byte parity)."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from phovo_tpu.datasets import native_loader
from phovo_tpu.datasets.tum import TUMSequence

NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not native_loader.available():
        r = subprocess.run(["make", "-C", str(NATIVE_DIR), "libphovo_io.so"],
                           capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"cannot build native loader: {r.stderr[-500:]}")
    if not native_loader.available():
        pytest.skip("native loader unavailable")


# reuse the synthetic on-disk TUM fixture from test_tum_pipeline
from tests.test_tum_pipeline import tum_dir  # noqa: E402,F401


@pytest.mark.parametrize("pairing", ["lockstep", "associate"])
def test_native_matches_python_loader(tum_dir, pairing):
    py_frames = list(TUMSequence(tum_dir, pairing=pairing))
    nat = native_loader.NativeTUMSequence(tum_dir, pairing=pairing)
    nat_frames = list(nat)
    nat.close()
    assert len(nat_frames) == len(py_frames)
    for a, b in zip(py_frames, nat_frames):
        assert a.timestamp == pytest.approx(b.timestamp)
        assert a.depth_timestamp == pytest.approx(b.depth_timestamp)
        # intensity decode: byte-exact (same BT.601 rounding as cv2)
        np.testing.assert_array_equal(a.intensity, b.intensity)
        np.testing.assert_allclose(a.depth, b.depth, atol=1e-6)


def test_native_loader_missing_dataset():
    with pytest.raises(FileNotFoundError):
        native_loader.NativeTUMSequence("/nonexistent_phovo_dataset")


def test_native_loader_vo_cli(tum_dir, tmp_path):
    from phovo_tpu.apps.phovo_vo import main
    from phovo_tpu.utils.trajectory import absolute_trajectory_error, read_trajectory

    cfg = tmp_path / "cfg.yml"
    cfg.write_text(
        "num_levels: 1\nmax_iterations: [8]\nmin_gradient_norms: [1.0e-9]\n"
        "sampling: bilinear\n"
    )
    out = tmp_path / "traj.txt"
    rc = main(
        ["--config", str(cfg), "--dataset", str(tum_dir), "--output", str(out),
         "--intrinsics", "128,128,63.5,47.5", "--loader", "native", "--quiet",
         "--eval-gt", str(tum_dir / "groundtruth.txt")]
    )
    assert rc == 0
    est = read_trajectory(out)
    gt = read_trajectory(tum_dir / "groundtruth.txt")
    assert absolute_trajectory_error(est, gt)["rmse"] < 0.01
