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


def test_read_chunk_matches_iteration(tum_dir):
    frames = list(TUMSequence(tum_dir))
    H, W = frames[0].intensity.shape
    nat = native_loader.NativeTUMSequence(tum_dir)
    Ii, Dd, ts = nat.read_chunk(3, H, W)
    assert Ii.shape == (3, H, W) and Ii.dtype == np.uint8
    for k in range(3):
        np.testing.assert_array_equal(Ii[k], frames[k].intensity)
        np.testing.assert_allclose(Dd[k], frames[k].depth, atol=1e-6)
        assert ts[k] == pytest.approx(frames[k].timestamp)
    # stream continues where the chunk left off, then ends cleanly
    Ii2, Dd2, ts2 = nat.read_chunk(10, H, W)
    assert len(Ii2) == len(frames) - 3
    Ii3, _, _ = nat.read_chunk(4, H, W)
    assert len(Ii3) == 0
    nat.close()


def test_align_accepts_u8_intensity(intr, small_pair):
    import jax.numpy as jnp

    from phovo_tpu.models.analytic import align_analytic
    from phovo_tpu.utils.config import PhovoConfig

    cfg = PhovoConfig(
        num_levels=2, blur_filter_sizes=(0, 0), gradient_scales=(0.0625,) * 2,
        max_iterations=(8, 8), lambda_steps=(1.0, 1.0),
        min_gradient_norms=(1e-10,) * 2, sampling="bilinear",
    )
    I0, D0, I1, D1, gt = small_pair
    u8 = lambda x: jnp.asarray((np.asarray(x) * 255).astype(np.uint8))
    f = lambda x: jnp.asarray((np.asarray(x) * 255).astype(np.uint8).astype(np.float32) / 255.0)
    args_u8 = (u8(I0), jnp.asarray(D0), u8(I1), jnp.asarray(D1), intr, jnp.zeros(6))
    args_f = (f(I0), jnp.asarray(D0), f(I1), jnp.asarray(D1), intr, jnp.zeros(6))
    s_u8 = align_analytic(*args_u8, cfg)
    s_f = align_analytic(*args_f, cfg)
    np.testing.assert_allclose(
        np.asarray(s_u8.state), np.asarray(s_f.state), atol=1e-6
    )


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


def test_close_while_consumer_blocked(tum_dir):
    """close() from another thread must cleanly unblock a consumer waiting
    inside phovo_loader_next (regression: stop() never notified cv_consume
    and the loader was deleted under a blocked thread — UB at exit)."""
    import threading
    import time

    nat = native_loader.NativeTUMSequence(tum_dir, pairing="lockstep")
    consumed = []
    done = threading.Event()

    def consume():
        for f in nat:
            consumed.append(f.timestamp)
            time.sleep(0.01)
        done.set()

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    time.sleep(0.03)  # let it get into the stream
    nat.close()  # stop + destroy while the consumer may be mid-next()
    assert done.wait(timeout=5.0), "consumer thread failed to unblock"
    t.join(timeout=5.0)
    assert not t.is_alive()
    # a second close must be a no-op
    nat.close()
