"""End-to-end alignment convergence on synthetic pairs with known pose.

This is the correctness anchor SURVEY §4 calls for: each backend must
recover the ground-truth state, and backends must agree with each other
(cross-backend oracle, reference has none in-tree).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from phovo_tpu.models.analytic import PhotoconsistencyOdometryAnalytic, align_analytic
from phovo_tpu.models.autodiff import align_autodiff
from phovo_tpu.models.biobjective import align_biobjective
from phovo_tpu.utils.config import PhovoConfig

CFG_GN = PhovoConfig(
    num_levels=3,
    blur_filter_sizes=(0, 0, 0),
    gradient_scales=(0.0625, 0.0625, 0.0625),
    max_iterations=(10, 15, 20),
    lambda_steps=(1.0, 1.0, 1.0),
    min_gradient_norms=(1e-10, 1e-10, 1e-10),
    sampling="bilinear",
)

CFG_TR = dataclasses.replace(
    CFG_GN,
    function_tolerances=(1e-8, 1e-8, 1e-8),
    gradient_tolerances=(1e-12, 1e-12, 1e-12),
    parameter_tolerances=(1e-10, 1e-10, 1e-10),
    initial_trust_region_radii=(1e4, 1e4, 1e4),
    max_trust_region_radii=(1e8, 1e8, 1e8),
    min_trust_region_radii=(1e-32, 1e-32, 1e-32),
    min_relative_decreases=(1e-3, 1e-3, 1e-3),
    max_iterations=(30, 30, 30),
)


def _check(state, gt, tol_t=2e-3, tol_r=2e-3):
    state = np.asarray(state)
    gt = np.asarray(gt)
    assert np.linalg.norm(state[:3] - gt[:3]) < tol_t, (state, gt)
    assert np.linalg.norm(state[3:] - gt[3:]) < tol_r, (state, gt)


def test_analytic_alignment_recovers_pose(intr, small_pair):
    I0, D0, I1, D1, gt = small_pair
    res = align_analytic(
        jnp.asarray(I0), jnp.asarray(D0), jnp.asarray(I1), jnp.asarray(D1),
        intr, jnp.zeros(6), CFG_GN,
    )
    _check(res.state, gt)
    assert int(res.iterations.sum()) > 0


def test_autodiff_alignment_recovers_pose(intr, small_pair):
    I0, D0, I1, D1, gt = small_pair
    res = align_autodiff(
        jnp.asarray(I0), jnp.asarray(D0), jnp.asarray(I1), jnp.asarray(D1),
        intr, jnp.zeros(6), CFG_TR,
    )
    _check(res.state, gt)


def test_biobjective_alignment_recovers_pose(intr, small_pair):
    I0, D0, I1, D1, gt = small_pair
    res = align_biobjective(
        jnp.asarray(I0), jnp.asarray(D0), jnp.asarray(I1), jnp.asarray(D1),
        intr, jnp.zeros(6), CFG_GN,
    )
    _check(res.state, gt, tol_t=4e-3, tol_r=4e-3)


def test_backends_agree(intr, small_pair):
    I0, D0, I1, D1, gt = small_pair
    args = (jnp.asarray(I0), jnp.asarray(D0), jnp.asarray(I1), jnp.asarray(D1), intr, jnp.zeros(6))
    s_gn = align_analytic(*args, CFG_GN).state
    s_tr = align_autodiff(*args, CFG_TR).state
    np.testing.assert_allclose(np.asarray(s_gn), np.asarray(s_tr), atol=5e-3)


def test_skipped_levels_pass_state_through(intr, small_pair):
    """max_iterations == 0 at every level must leave the state untouched
    (reference …Analytic.h:526 / 'only level k' presets)."""
    I0, D0, I1, D1, _ = small_pair
    cfg = dataclasses.replace(CFG_GN, max_iterations=(0, 0, 0))
    init = jnp.array([0.1, 0.2, 0.3, 0.01, 0.02, 0.03], jnp.float32)
    res = align_analytic(
        jnp.asarray(I0), jnp.asarray(D0), jnp.asarray(I1), jnp.asarray(D1),
        intr, init, cfg,
    )
    np.testing.assert_allclose(np.asarray(res.state), np.asarray(init), atol=0)
    assert int(res.iterations.sum()) == 0


def test_object_api_matches_reference_surface(intr, small_pair):
    I0, D0, I1, D1, gt = small_pair
    vo = PhotoconsistencyOdometryAnalytic(CFG_GN)
    vo.set_intrinsic_matrix(np.asarray(intr.matrix()))
    vo.set_source_frame((I0 * 255).astype(np.uint8), D0)  # u8 path like the apps
    vo.set_target_frame((I1 * 255).astype(np.uint8), D1)
    vo.set_initial_state_vector(np.zeros(6, np.float32))
    vo.optimize()
    state = np.asarray(vo.get_optimal_state_vector())
    T = np.asarray(vo.get_optimal_rigid_transformation_matrix())
    # u8 quantization loosens the tolerance
    assert np.linalg.norm(state[:3] - gt[:3]) < 5e-3
    assert T.shape == (4, 4)
    np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=0)


def test_warm_start_converges_faster(intr, small_pair):
    I0, D0, I1, D1, gt = small_pair
    args = (jnp.asarray(I0), jnp.asarray(D0), jnp.asarray(I1), jnp.asarray(D1), intr)
    cfg = dataclasses.replace(CFG_GN, min_gradient_norms=(1e-3, 1e-3, 1e-3))
    cold = align_analytic(*args, jnp.zeros(6), cfg)
    warm = align_analytic(*args, jnp.asarray(gt), cfg)
    assert int(warm.iterations.sum()) <= int(cold.iterations.sum())
    _check(warm.state, gt)
