"""Verifies the reference-exact oracle (tools/reference_oracle.py).

The oracle is the measurement instrument for the blueprint's parity target,
so IT must be validated first: each vectorized kernel is compared bitwise
against an explicit per-pixel Python loop that transcribes the reference's
sequential semantics (write order, scatter indices, rounding) directly from
the C++ (…Analytic.h:191-367, …BiObjective.h:241-452, …Ceres.h:156-269,
sample.h:33-99). If loop == vectorized, the only remaining trust gap to the
real binary is f64 expression-ordering rounding.
"""

import numpy as np
import pytest

from phovo_tpu.utils.config import load_builtin
from tools.reference_oracle import (
    AnalyticOracle,
    BiObjectiveOracle,
    CeresOracle,
    pose_matrix,
)

RNG = np.random.default_rng(7)
H, W = 24, 32
K = np.array([[30.0, 0, 15.5], [0, 30.0, 11.5], [0, 0, 1.0]])


def _frames():
    I0 = RNG.uniform(0.1, 0.9, (H, W))
    I1 = RNG.uniform(0.1, 0.9, (H, W))
    D0 = RNG.uniform(0.5, 3.0, (H, W))
    D0[RNG.uniform(size=(H, W)) < 0.15] = 0.0  # invalid-depth holes
    D1 = RNG.uniform(0.5, 3.0, (H, W))
    return I0, D0, I1, D1


STATE = np.array([0.04, -0.02, 0.03, 0.05, -0.04, 0.06])


def _c_round_scalar(v):
    return int(np.sign(v) * np.floor(abs(v) + 0.5))


def _loop_analytic(I0, D0, I1, GX, GY, K, state, level, min_d, max_d):
    """Direct per-pixel transcription of ComputeResidualsAndJacobians
    (…Analytic.h:191-367) + the GN gradient, no vectorization."""
    nR, nC = I0.shape
    s = 1.0 / 2**level
    fx, fy, ox, oy = K[0, 0] * s, K[1, 1] * s, K[0, 2] * s, K[1, 2] * s
    x, y, z, yaw, pitch, roll = state
    Rt = pose_matrix(state)
    sr, cr, sp, cp, sy, cy = (
        np.sin(roll), np.cos(roll), np.sin(pitch), np.cos(pitch),
        np.sin(yaw), np.cos(yaw),
    )
    res = np.zeros(nR * nC)
    jac = np.zeros((nR * nC, 6))
    for r in range(nR):
        for c in range(nC):
            i = nC * r + c
            pz = D0[r, c]
            if not (min_d < pz < max_d):
                continue
            px = (c - ox) * pz / fx
            py = (r - oy) * pz / fy
            p = Rt @ np.array([px, py, pz, 1.0])
            inv_tz = 1.0 / p[2]
            tc = p[0] * fx * inv_tz + ox
            tr = p[1] * fy * inv_tz + oy
            tri, tci = _c_round_scalar(tr), _c_round_scalar(tc)
            if not (0 <= tri < nR and 0 <= tci < nC):
                continue
            t25 = 1.0 / (z + py * cp * sr + pz * cp * cr - px * sp)
            t26 = t25 * t25
            t4 = sr * sy + sp * cr * cy
            t5 = sp * sr * cy - cr * sy
            t6 = sp * sr * sy + cr * cy
            t7 = -t6
            t8 = sr * cy - sp * cr * sy
            t9 = -t8
            t11 = cp * cy + x
            t14 = cp * sy
            A = pz * t4 + py * t5 + px * t11
            B = py * t6 + pz * t9 + px * t14 + y
            C = -py * sp * sr - pz * sp * cr - px * cp
            E = py * cp * cr - pz * cp * sr
            j = np.zeros((2, 6))
            j[0, 0] = fx * t25
            j[1, 1] = fy * t25
            j[0, 2] = -fx * A * t26
            j[1, 2] = -fy * B * t26
            j[0, 3] = fx * (py * t7 + pz * t8 - px * t14) * t25
            j[1, 3] = fy * (pz * t4 + py * t5 + px * cp * cy) * t25
            j[0, 4] = fx * (py * cp * sr * cy + pz * cp * cr * cy - px * sp * cy) * t25 - fx * C * A * t26
            j[1, 4] = fy * (py * cp * sr * sy + pz * cp * cr * sy - px * sp * sy) * t25 - fy * C * B * t26
            j[0, 5] = fx * (py * t4 + pz * (cr * sy - sp * sr * cy)) * t25 - fx * E * A * t26
            j[1, 5] = fy * (pz * t7 + py * t9) * t25 - fy * E * B * t26
            row = GX.ravel()[i] * j[0] + GY.ravel()[i] * j[1]
            jac[i] = row
            res[nC * tri + tci] = I1[tri, tci] - I0[r, c]
    return res, jac


def test_analytic_kernel_matches_per_pixel_loop():
    I0, D0, I1, _ = _frames()
    cfg = load_builtin("config_5_level_optimization_analytic")
    o = AnalyticOracle(cfg)
    o.set_intrinsic_matrix(K)
    o.set_source_frame(I0, D0)
    o.set_target_frame(I1, D0)
    o.set_initial_state_vector(STATE)
    for level in (0, 1):
        res_v, jac_v = o._residuals_jacobians(level)
        res_l, jac_l = _loop_analytic(
            o.pyr_I0[level], o.pyr_D0[level], o.pyr_I1[level],
            o.gx1[level], o.gy1[level], K, STATE, level, 0.3, 5.0,
        )
        np.testing.assert_allclose(res_v, res_l, rtol=0, atol=1e-13)
        np.testing.assert_allclose(jac_v, jac_l, rtol=1e-10, atol=1e-13)


def _loop_biobjective(o, level, state):
    """Per-pixel transcription of the bi-objective kernel
    (…BiObjective.h:241-452) with its exact interleaved write order."""
    I0, D0 = o.pyr_I0[level], o.pyr_D0[level]
    I1, D1 = o.pyr_I1[level], o.pyr_D1[level]
    GX, GY = o.gx1[level].ravel(), o.gy1[level].ravel()
    DGX, DGY = o.dgx1[level].ravel(), o.dgy1[level].ravel()
    nR, nC = I0.shape
    N = nR * nC
    s = 1.0 / 2**level
    fx, fy, ox, oy = K[0, 0] * s, K[1, 1] * s, K[0, 2] * s, K[1, 2] * s
    x, y, z, yaw, pitch, roll = state
    Rt = pose_matrix(state)
    gain = I1.mean() / D1.mean()
    sr, cr, sp, cp, sy, cy = (
        np.sin(roll), np.cos(roll), np.sin(pitch), np.cos(pitch),
        np.sin(yaw), np.cos(yaw),
    )
    res = np.zeros(2 * N)
    jac = np.zeros((2 * N, 6))
    for r in range(nR):
        for c in range(nC):
            i = nC * r + c
            pz = D0[r, c]
            if not (0.3 < pz < 5.0):
                continue
            px = (c - ox) * pz / fx
            py = (r - oy) * pz / fy
            p = Rt @ np.array([px, py, pz, 1.0])
            inv_tz = 1.0 / p[2]
            tc = p[0] * fx * inv_tz + ox
            tr = p[1] * fy * inv_tz + oy
            tri, tci = _c_round_scalar(tr), _c_round_scalar(tc)
            if not (0 <= tri < nR and 0 <= tci < nC):
                continue
            jRt = np.zeros((3, 6))
            jRt[0, 0] = jRt[1, 1] = jRt[2, 2] = 1.0
            jRt[0, 3] = py * (-sp * sr * sy - cr * cy) + pz * (sr * cy - sp * cr * sy) - cp * px * sy
            jRt[1, 3] = pz * (sr * sy + sp * cr * cy) + py * (sp * sr * cy - cr * sy) + cp * px * cy
            jRt[0, 4] = cp * py * sr * cy + cp * pz * cr * cy - sp * px * cy
            jRt[1, 4] = cp * py * sr * sy + cp * pz * cr * sy - sp * px * sy
            jRt[2, 4] = -sp * py * sr - sp * pz * cr - cp * px
            jRt[0, 5] = py * (sr * sy + sp * cr * cy) + pz * (cr * sy - sp * sr * cy)
            jRt[1, 5] = pz * (-sp * sr * sy - cr * cy) + py * (sp * cr * sy - sr * cy)
            jRt[2, 5] = cp * py * cr - cp * pz * sr
            jP = np.zeros((2, 3))
            jP[0, 0] = fx * inv_tz
            jP[1, 1] = fy * inv_tz
            jP[0, 2] = -(fx * p[0]) * inv_tz * inv_tz
            jP[1, 2] = -(fy * p[1]) * inv_tz * inv_tz
            jPR = jP @ jRt
            row_i = GX[i] * jPR[0] + GY[i] * jPR[1]
            row_d = gain * (DGX[i] * jPR[0] + DGY[i] * jPR[1] - jRt[2])
            sidx = nC * tri + tci
            jac[i] = row_i
            res[sidx] = I1[tri, tci] - I0[r, c]
            jac[2 * i] = row_d
            res[2 * sidx] = gain * (D1[tri, tci] - D0[r, c])
    return res, jac


def test_biobjective_kernel_matches_per_pixel_loop():
    I0, D0, I1, D1 = _frames()
    cfg = load_builtin("config_5_level_optimization_analytic")
    o = BiObjectiveOracle(cfg)
    o.set_intrinsic_matrix(K)
    o.set_source_frame(I0, D0)
    o.set_target_frame(I1, D1)
    o.set_initial_state_vector(STATE)
    for level in (0, 1):
        res_v, jac_v = o._residuals_jacobians(level)
        res_l, jac_l = _loop_biobjective(o, level, STATE)
        np.testing.assert_allclose(res_v, res_l, rtol=0, atol=1e-13)
        np.testing.assert_allclose(jac_v, jac_l, rtol=1e-10, atol=1e-12)


def _loop_ceres(o, level, state):
    """Per-pixel transcription of the Ceres functor (…Ceres.h:156-269) with
    SampleLinear (sample.h:52-99) and finite-difference jet verification."""
    I0, D0, I1 = o.pyr_I0[level], o.pyr_D0[level], o.pyr_I1[level]
    GX, GY = o.gx1[level], o.gy1[level]
    nR, nC = I0.shape
    s = 1.0 / 2**level
    fx, fy, ox, oy = K[0, 0] * s, K[1, 1] * s, K[0, 2] * s, K[1, 2] * s
    Rt = pose_matrix(state)
    res = np.zeros(nR * nC)

    def sample(im, yv, xv):
        xs, ys = xv - 0.5, yv - 0.5

        def axis(v, size):
            iv = int(np.trunc(v))
            if iv < 0:
                return 0, 0, 1.0
            if iv > size - 2:
                return size - 1, size - 1, 1.0
            return iv, iv + 1, (iv + 1) - v

        x1, x2, dx = axis(xs, im.shape[1])
        y1, y2, dy = axis(ys, im.shape[0])
        return dy * (dx * im[y1, x1] + (1 - dx) * im[y1, x2]) + (1 - dy) * (
            dx * im[y2, x1] + (1 - dx) * im[y2, x2]
        )

    for r in range(nR):
        for c in range(nC):
            pz = D0[r, c]
            if not (0.3 < pz < 5.0):
                continue
            px = (c - ox) * pz / fx
            py = (r - oy) * pz / fy
            p = Rt @ np.array([px, py, pz, 1.0])
            tc = p[0] * fx / p[2] + ox
            tr = p[1] * fy / p[2] + oy
            if not (0.0 <= tr < nR and 0.0 <= tc < nC):
                continue
            sidx = nC * int(tr) + int(tc)
            res[sidx] = sample(I1, tr, tc) - I0[r, c]
    return res


def test_ceres_residuals_match_per_pixel_loop():
    I0, D0, I1, _ = _frames()
    cfg = load_builtin("config_5_level_optimization_ceres")
    o = CeresOracle(cfg)
    o.set_intrinsic_matrix(K)
    o.set_source_frame(I0, D0)
    o.set_target_frame(I1, D0)
    for level in (0, 1):
        res_v, _ = o._evaluate(level, STATE)
        res_l = _loop_ceres(o, level, STATE)
        np.testing.assert_allclose(res_v, res_l, rtol=0, atol=1e-13)


def test_ceres_coordinate_chain_matches_finite_differences():
    """Ceres jets compute the TRUE derivative of the projected coordinates
    (tc, tr) w.r.t. the state (the image-gradient swap happens only at the
    final Chain::Rule, jet_extras.h:85-110). Verify the oracle's analytic
    coordinate chain — _rotation_and_partials + the projection quotient
    rule — against central differences of an independent scalar projection,
    at a generic state, for a set of random 3D points."""
    from tools.reference_oracle import _rotation_and_partials

    fx, fy, ox, oy = 30.0, 30.0, 15.5, 11.5
    pts = RNG.uniform(-1.0, 1.0, (20, 3)) + np.array([0, 0, 2.5])
    state = STATE

    def project(st, p):
        q = pose_matrix(st) @ np.append(p, 1.0)
        return np.array([q[0] * fx / q[2] + ox, q[1] * fy / q[2] + oy])

    # analytic chain, exactly as CeresOracle._evaluate builds it
    x, y, z, yaw, pitch, roll = state
    R, dRyaw, dRpitch, dRroll = _rotation_and_partials(yaw, pitch, roll)
    for p in pts:
        q = R @ p + np.array([x, y, z])
        inv_tz = 1.0 / q[2]
        dT = np.zeros((3, 6))
        dT[0, 0] = dT[1, 1] = dT[2, 2] = 1.0
        dT[:, 3] = dRyaw @ p
        dT[:, 4] = dRpitch @ p
        dT[:, 5] = dRroll @ p
        dtc = fx * (dT[0] * inv_tz - q[0] * inv_tz * inv_tz * dT[2])
        dtr = fy * (dT[1] * inv_tz - q[1] * inv_tz * inv_tz * dT[2])
        eps = 1e-7
        for k in range(6):
            dp = np.zeros(6)
            dp[k] = eps
            fd = (project(state + dp, p) - project(state - dp, p)) / (2 * eps)
            np.testing.assert_allclose(dtc[k], fd[0], rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(dtr[k], fd[1], rtol=1e-5, atol=1e-6)


def test_oracle_recovers_ground_truth_tight_thresholds():
    """End-to-end sanity: with thresholds that don't fire early, the oracle
    (reference math) must recover a known synthetic pose accurately."""
    import dataclasses

    from phovo_tpu.ops.camera import Intrinsics
    from phovo_tpu.utils.synthetic import make_pair

    intr = Intrinsics(
        np.float32(525.0), np.float32(525.0), np.float32(319.5), np.float32(239.5)
    )
    # VGA: the presets' level schedules and min_gradient_norms are tuned for
    # this size (the 4-level preset optimizes only levels 3 and 2, so small
    # test images would leave the pose at quarter-resolution accuracy).
    I0, D0, I1, D1, gt = make_pair(intr, shape=(480, 640))
    cfg = load_builtin("config_4_level_optimization_analytic")
    cfg = dataclasses.replace(cfg, min_gradient_norms=(1e-9,) * cfg.num_levels)
    o = AnalyticOracle(cfg)
    o.set_intrinsic_matrix(np.array([[525.0, 0, 319.5], [0, 525.0, 239.5], [0, 0, 1]]))
    o.set_source_frame((I0 * 255).astype(np.uint8), D0.astype(np.float64))
    o.set_target_frame((I1 * 255).astype(np.uint8), D1.astype(np.float64))
    o.set_initial_state_vector(np.zeros(6))
    st = o.optimize()
    # ~0.0073 measured; the residual error is the reference's own accuracy
    # floor (nearest-int sampling + scatter indexing), not oracle noise.
    assert np.linalg.norm(st - gt) < 1.2e-2


def test_duplicate_index_assignment_is_last_write_wins():
    """The vectorized scatter relies on numpy fancy assignment resolving
    duplicate indices to the LAST value in index order; guard that contract
    explicitly so a numpy behavior change cannot silently corrupt the
    oracle."""
    a = np.zeros(4)
    idx = np.array([2, 1, 2, 3, 2])
    a[idx] = np.array([10.0, 20.0, 30.0, 40.0, 50.0])
    assert a[2] == 50.0 and a[1] == 20.0 and a[3] == 40.0
