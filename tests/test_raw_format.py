"""Raw memmap replay format: conversion fidelity + zero-decode VO parity.

convert_to_raw must reproduce the PNG pipeline's pixels exactly, and
phovo_vo driven from the raw replay must produce the same trajectory as the
PNG path (datasets/raw.py — the production streaming layout; no reference
counterpart, CCameraRecord re-decodes PNGs every run)."""

import numpy as np
import pytest

from phovo_tpu.datasets.raw import RawSequence, convert_to_raw, is_raw_dir
from phovo_tpu.datasets.tum import TUMSequence

# reuse the synthetic TUM directory fixture
from tests.test_tum_pipeline import tum_dir, N_FRAMES  # noqa: F401

DEPTH_SCALE = 1.0 / 5000.0


@pytest.fixture(scope="module")
def raw_dir(tum_dir, tmp_path_factory):  # noqa: F811
    out = tmp_path_factory.mktemp("raw_seq")
    convert_to_raw(tum_dir, out, depth_scale=DEPTH_SCALE, loader="python")
    return out


def test_convert_is_pixel_exact(tum_dir, raw_dir):  # noqa: F811
    png = TUMSequence(tum_dir, depth_scale=DEPTH_SCALE)
    raw = RawSequence(raw_dir)
    assert len(raw) == len(png) == N_FRAMES
    assert is_raw_dir(raw_dir)
    for fp, fr in zip(png, raw):
        assert fp.timestamp == fr.timestamp
        assert fp.depth_timestamp == fr.depth_timestamp
        np.testing.assert_array_equal(np.asarray(fp.intensity), np.asarray(fr.intensity))
        np.testing.assert_array_equal(
            np.asarray(fp.depth, np.float32), np.asarray(fr.depth)
        )


def test_read_chunk_streams_whole_sequence(raw_dir):
    raw = RawSequence(raw_dir)
    H, W = raw.height, raw.width
    got = 0
    while True:
        I, D, ts = raw.read_chunk(2, H, W)
        if len(I) == 0:
            break
        # storage dtypes pass through untouched (device converts)
        assert I.dtype == np.uint8 and D.dtype == raw.depth_dtype == np.uint16
        assert I.shape[1:] == (H, W)
        got += len(I)
    assert got == N_FRAMES


def test_iter_restartable_and_chunk_cursor_independent(raw_dir):
    """Iteration over the memmap is restartable (random access); the chunk
    cursor is separate and one-shot — phovo_vo's chunked pipeline primes via
    read_chunk(1), never via iteration."""
    raw = RawSequence(raw_dir)
    ts_a = [f.timestamp for f in raw]
    ts_b = [f.timestamp for f in raw]
    assert ts_a == ts_b and len(ts_a) == N_FRAMES
    I, D, ts = raw.read_chunk(N_FRAMES, raw.height, raw.width)
    assert len(I) == N_FRAMES  # iteration did not consume the chunk stream
    I2, _, _ = raw.read_chunk(1, raw.height, raw.width)
    assert len(I2) == 0  # chunk stream itself is one-shot


def test_wrong_shape_chunk_raises(raw_dir):
    raw = RawSequence(raw_dir)
    with pytest.raises(IOError):
        raw.read_chunk(1, raw.height + 8, raw.width)


def test_missing_meta_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        RawSequence(tmp_path)


def _vo_config(tmp_path):
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
    return cfg


@pytest.mark.parametrize("chunk", [1, 3])
def test_vo_from_raw_matches_png_path(tum_dir, raw_dir, tmp_path, chunk):  # noqa: F811
    """The raw replay (auto-detected via meta.json) must reproduce the PNG
    pipeline's trajectory, in both frame mode and chunked mode."""
    from phovo_tpu.apps.phovo_vo import main
    from phovo_tpu.utils.trajectory import read_trajectory

    cfg = _vo_config(tmp_path)
    out_png = tmp_path / f"png_{chunk}.txt"
    out_raw = tmp_path / f"raw_{chunk}.txt"
    common = [
        "--config", str(cfg), "--intrinsics", "128,128,63.5,47.5", "--quiet",
        "--chunk", str(chunk),
    ]
    assert main(["--dataset", str(tum_dir), "--output", str(out_png),
                 "--loader", "python"] + common) == 0
    assert main(["--dataset", str(raw_dir), "--output", str(out_raw)] + common) == 0

    est_png = read_trajectory(out_png)
    est_raw = read_trajectory(out_raw)
    assert len(est_png) == len(est_raw) == N_FRAMES - 1
    np.testing.assert_allclose(
        np.asarray(est_raw.positions), np.asarray(est_png.positions), atol=1e-5
    )


def test_vo_keyframe_mode_from_raw_matches_png_path(tum_dir, raw_dir, tmp_path):  # noqa: F811
    """Keyframe mode over the raw replay (storage-dtype chunked tracking
    with on-device depth conversion — apps/phovo_vo.py storage_stream) must
    reproduce the PNG path's keyframe trajectory."""
    from phovo_tpu.apps.phovo_vo import main
    from phovo_tpu.utils.trajectory import read_trajectory

    cfg = _vo_config(tmp_path)
    out_png = tmp_path / "kf_png.txt"
    out_raw = tmp_path / "kf_raw.txt"
    common = [
        "--config", str(cfg), "--intrinsics", "128,128,63.5,47.5", "--quiet",
        "--mode", "keyframe", "--chunk", "3",
        "--kf-translation", "0.05", "--kf-rotation", "0.05",
    ]
    assert main(["--dataset", str(tum_dir), "--output", str(out_png),
                 "--loader", "python"] + common) == 0
    assert main(["--dataset", str(raw_dir), "--output", str(out_raw)] + common) == 0

    est_png = read_trajectory(out_png)
    est_raw = read_trajectory(out_raw)
    assert len(est_png) == len(est_raw)
    np.testing.assert_allclose(
        np.asarray(est_raw.positions), np.asarray(est_png.positions),
        atol=1e-5,
    )
