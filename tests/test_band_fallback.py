"""Production band_masked fallback policy (VERDICT r2 weak #1 / item 3).

The fused kernels' banded sampling window can drop pixels under fast
in-plane rotation (ops/fused.py band_masked). These tests pin the POLICY
half: PhotoconsistencyOdometryBase.optimize() and the keyframe/chunked
pipelines must gate on band_masked_fraction and re-run flagged alignments
on the exact full-band path. The kernel half (the diagnostic itself) is
pinned in tests/test_fused.py; the on-device end-to-end engagement test
lives in tests/test_tpu_device.py (-m tpu).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from phovo_tpu.models.base import (
    AlignmentResult,
    band_masked_fraction,
    band_masked_fractions,
)
from phovo_tpu.models.analytic import PhotoconsistencyOdometryAnalytic
from phovo_tpu.utils.config import PhovoConfig


def _result(state, band_masked, num_valid, levels=2):
    z = jnp.zeros(levels)
    return AlignmentResult(
        state=jnp.asarray(state, jnp.float32),
        iterations=jnp.ones(levels, jnp.int32),
        gradient_norm=z,
        cost=z,
        num_valid=jnp.asarray(num_valid, jnp.float32),
        band_masked=jnp.asarray(band_masked, jnp.float32),
    )


def test_band_masked_fraction_helpers():
    assert band_masked_fraction([0.0, 0.0], [100.0, 400.0]) == 0.0
    # 50 dropped of 50+150 kept at level 0 -> 0.25
    assert band_masked_fraction([50.0, 0.0], [150.0, 400.0]) == pytest.approx(
        0.25
    )
    fr = band_masked_fractions(
        np.array([[0.0, 0.0], [30.0, 0.0]]),
        np.array([[100.0, 100.0], [70.0, 100.0]]),
    )
    np.testing.assert_allclose(fr, [0.0, 0.3])
    # all-masked level (num_valid 0) must not divide by zero
    assert band_masked_fraction([5.0], [0.0]) == 1.0


class _FakeBackend(PhotoconsistencyOdometryAnalytic):
    """Analytic backend with canned align results: the fused path reports
    heavy band masking, the full-band path a different (marker) state."""

    def __init__(self, masked_frac):
        super().__init__(
            PhovoConfig(
                num_levels=2, blur_filter_sizes=(0, 0),
                gradient_scales=(0.0625,) * 2, max_iterations=(1, 1),
                lambda_steps=(1.0,) * 2, min_gradient_norms=(0.0,) * 2,
            )
        )
        nv = 1000.0
        self._fused_result = _result(
            [1.0] * 6, [masked_frac * nv / (1 - masked_frac), 0.0], [nv, nv]
        )
        self.full_band_calls = 0

    def align(self, *a):
        return self._fused_result

    def align_full_band(self, *a):
        self.full_band_calls += 1
        return _result([2.0] * 6, [0.0, 0.0], [1000.0, 1000.0])


def _prep(vo):
    vo.set_intrinsic_matrix(np.array([[100.0, 0, 16], [0, 100.0, 16], [0, 0, 1]]))
    f = np.random.default_rng(0).random((32, 32)).astype(np.float32)
    vo.set_source_frame(f, np.ones_like(f))
    vo.set_target_frame(f, np.ones_like(f))
    vo.set_initial_state_vector(np.zeros(6, np.float32))


def test_optimize_gate_engages_and_uses_full_band_result():
    vo = _FakeBackend(masked_frac=0.3)
    _prep(vo)
    res = vo.optimize()
    assert vo.full_band_calls == 1
    assert vo.band_fallbacks == 1
    np.testing.assert_allclose(np.asarray(res.state), 2.0)


def test_optimize_gate_quiet_below_threshold():
    vo = _FakeBackend(masked_frac=0.001)  # below the 2% default
    _prep(vo)
    res = vo.optimize()
    assert vo.full_band_calls == 0
    assert vo.band_fallbacks == 0
    np.testing.assert_allclose(np.asarray(res.state), 1.0)


def test_optimize_gate_disabled_by_zero_threshold():
    vo = _FakeBackend(masked_frac=0.5)
    vo.band_fallback = 0.0
    _prep(vo)
    res = vo.optimize()
    assert vo.full_band_calls == 0
    np.testing.assert_allclose(np.asarray(res.state), 1.0)


def test_cpu_alignment_never_band_masks(intr, small_pair):
    """On the CPU (XLA) path band_masked is identically 0, so the default
    gate must never fire — optimize() returns the plain result."""
    I0, D0, I1, D1, _ = small_pair
    vo = PhotoconsistencyOdometryAnalytic(
        PhovoConfig(
            num_levels=2, blur_filter_sizes=(0, 0),
            gradient_scales=(0.0625,) * 2, max_iterations=(2, 2),
            lambda_steps=(1.0,) * 2, min_gradient_norms=(1e-10,) * 2,
        )
    )
    vo.set_intrinsic_matrix(np.asarray(intr.matrix()))
    vo.set_source_frame(I0, D0)
    vo.set_target_frame(I1, D1)
    vo.set_initial_state_vector(np.zeros(6, np.float32))
    res = vo.optimize()
    assert vo.band_fallbacks == 0
    assert float(np.max(np.asarray(res.band_masked))) == 0.0


def test_keyframe_chunked_fallback_engages(monkeypatch, intr):
    """run_chunked must re-track a frame whose chunk diagnostics report
    band masking above the threshold, through the full-band aligner."""
    from phovo_tpu.datasets.tum import RGBDFrame
    from phovo_tpu.models import analytic as analytic_mod
    from phovo_tpu.models.keyframe import KeyframeVisualOdometry

    cfg = PhovoConfig(
        num_levels=1, blur_filter_sizes=(0,), gradient_scales=(0.0625,),
        max_iterations=(1,), lambda_steps=(1.0,), min_gradient_norms=(0.0,),
    )
    vo = PhotoconsistencyOdometryAnalytic(cfg)
    vo.set_intrinsic_matrix(np.asarray(intr.matrix()))
    kvo = KeyframeVisualOdometry(vo)

    B = 4

    def fake_track(kf_i, kf_d, I, D, _intr, init, _cfg, _fused,
                   depth_scale=None):
        # frame 1 reports 30% masking; others clean
        bm = np.zeros((B, 1), np.float32)
        bm[1, 0] = 300.0
        return AlignmentResult(
            state=jnp.zeros((B, 6)),
            iterations=jnp.ones((B, 1), jnp.int32),
            gradient_norm=jnp.zeros((B, 1)),
            cost=jnp.zeros((B, 1)),
            num_valid=jnp.full((B, 1), 700.0),
            band_masked=jnp.asarray(bm),
        )

    marker = np.array([0.01, 0, 0, 0, 0, 0], np.float32)
    full_band_calls = []

    def fake_align(si, sd, ti, td, _intr, init, _cfg, use_fused=True):
        assert use_fused is False
        full_band_calls.append(np.asarray(init))
        return _result(marker, [0.0], [700.0], levels=1)

    monkeypatch.setattr(analytic_mod, "track_sequence_chunk", fake_track)
    monkeypatch.setattr(analytic_mod, "align_analytic", fake_align)

    h = w = 16
    frames = [
        RGBDFrame(
            timestamp=float(k),
            depth_timestamp=float(k),
            intensity=np.full((h, w), 0.5, np.float32),
            depth=np.ones((h, w), np.float32),
        )
        for k in range(1 + B)
    ]
    tracked = list(kvo.run_chunked(iter(frames), chunk=B))
    assert kvo.band_fallbacks == 1
    assert len(full_band_calls) == 1
    # the flagged frame's pose comes from the full-band marker state
    flagged = tracked[1]
    np.testing.assert_allclose(
        flagged.pose[:3, 3], [-0.01, 0, 0], atol=1e-6
    )
    # clean frames keep the chunk-scan state (identity)
    np.testing.assert_allclose(tracked[0].pose[:3, 3], 0.0, atol=1e-6)
