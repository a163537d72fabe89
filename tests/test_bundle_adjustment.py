"""Schur-complement bundle adjustment (parallel/bundle_adjustment.py).

Oracles (the reference ships no BA and no tests — SURVEY §4): a dense
full-system GN solve on tiny problems, synthetic ground-truth recovery, and
sharded-vs-single-device equality on the virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phovo_tpu.ops import se3
from phovo_tpu.ops.camera import TUM_DEFAULT
from phovo_tpu.parallel.bundle_adjustment import (
    BAProblem,
    dense_gn_step,
    make_synthetic_ba,
    optimize_bundle,
    project_point,
)
from phovo_tpu.parallel.mesh import make_mesh


def test_project_point_matches_warp_convention():
    """Projecting a landmark placed by backprojection through pose T lands on
    the original pixel (round trip through the world frame)."""
    state = jnp.asarray([0.05, -0.02, 0.01, 0.03, -0.02, 0.01], jnp.float32)
    T = se3.pose_matrix(state)
    # camera-frame point at pixel (u, v), depth z
    u, v, z = 200.0, 150.0, 2.5
    pc = jnp.asarray(
        [
            (u - TUM_DEFAULT.cx) * z / TUM_DEFAULT.fx,
            (v - TUM_DEFAULT.cy) * z / TUM_DEFAULT.fy,
            z,
        ]
    )
    X = T[:3, :3] @ pc + T[:3, 3]  # world point
    uv, depth = project_point(state, X, TUM_DEFAULT)
    np.testing.assert_allclose(np.asarray(uv), [u, v], atol=1e-3)
    np.testing.assert_allclose(float(depth), z, atol=1e-5)


def test_schur_step_matches_dense_solve():
    """One Schur-reduced LM step equals the full (6M+3P) dense solve.

    optimize_bundle's returned cost is the POST-step evaluated cost (the
    monotone LM driver's guarantee), while the dense oracle reports the
    pre-step cost — so cost is checked for improvement, states for
    equality."""
    problem, _, _ = make_synthetic_ba(
        n_poses=4, n_points=12, state_noise=0.03, point_noise=0.05, seed=1
    )
    s_d, p_d, cost_d = dense_gn_step(problem, TUM_DEFAULT, damping=1e-6)
    s_s, p_s, cost_s = optimize_bundle(
        problem, TUM_DEFAULT, iterations=1, damping=1e-6
    )
    assert float(cost_s) < float(cost_d)
    np.testing.assert_allclose(np.asarray(s_s), np.asarray(s_d), atol=2e-4)
    np.testing.assert_allclose(np.asarray(p_s), np.asarray(p_d), atol=2e-4)


def test_ba_recovers_ground_truth():
    """Noiseless observations: GN converges to the exact scene."""
    problem, gt_states, gt_points = make_synthetic_ba(
        n_poses=5, n_points=40, state_noise=0.02, point_noise=0.03, seed=0
    )
    states, points, cost = optimize_bundle(
        problem, TUM_DEFAULT, iterations=15, damping=1e-8
    )
    assert float(cost) < 1e-4
    np.testing.assert_allclose(
        np.asarray(states), np.asarray(gt_states), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(points), np.asarray(gt_points), atol=2e-3
    )


def test_ba_reduces_cost_with_noise():
    problem, _, _ = make_synthetic_ba(
        n_poses=5, n_points=40, pixel_noise=0.5, seed=2
    )
    _, _, cost1 = optimize_bundle(problem, TUM_DEFAULT, iterations=1)
    _, _, cost8 = optimize_bundle(problem, TUM_DEFAULT, iterations=8)
    assert float(cost8) < float(cost1)
    assert np.isfinite(float(cost8))


def test_sharded_matches_single_device():
    """Constraint-sharded accumulation (psum over the 8-device CPU mesh)
    produces the same optimum as the single-device path."""
    problem, _, _ = make_synthetic_ba(n_poses=5, n_points=24, seed=3)
    mesh = make_mesh(8, pixel_parallel=2)
    s1, p1, c1 = optimize_bundle(problem, TUM_DEFAULT, iterations=6)
    s8, p8, c8 = optimize_bundle(problem, TUM_DEFAULT, mesh=mesh, iterations=6)
    np.testing.assert_allclose(np.asarray(s8), np.asarray(s1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p1), atol=1e-4)
    # both costs sit at the f32 convergence floor (~1e-8); atol covers the
    # reduction-order difference between 1- and 8-device accumulation
    np.testing.assert_allclose(float(c8), float(c1), rtol=1e-5, atol=1e-7)


def test_padding_observations_are_inert():
    problem, _, _ = make_synthetic_ba(n_poses=4, n_points=16, seed=4)
    padded = BAProblem(
        pose_states=problem.pose_states,
        points=problem.points,
        obs_pose=jnp.concatenate([problem.obs_pose, -jnp.ones(7, jnp.int32)]),
        obs_point=jnp.concatenate([problem.obs_point, jnp.zeros(7, jnp.int32)]),
        obs_uv=jnp.concatenate([problem.obs_uv, jnp.full((7, 2), 123.0)]),
        obs_z=jnp.concatenate([problem.obs_z, jnp.full((7,), 9.0)]),
        weights=jnp.concatenate([problem.weights, jnp.zeros(7)]),
        z_weights=jnp.concatenate([problem.z_weights, jnp.zeros(7)]),
    )
    s1, p1, c1 = optimize_bundle(problem, TUM_DEFAULT, iterations=4)
    s2, p2, c2 = optimize_bundle(padded, TUM_DEFAULT, iterations=4)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), atol=1e-6)
    np.testing.assert_allclose(float(c2), float(c1), rtol=1e-7)


def test_unobserved_landmark_is_frozen():
    """A landmark with no observations must not move (identity V floor)."""
    problem, _, _ = make_synthetic_ba(n_poses=4, n_points=16, seed=5)
    extra = jnp.asarray([[9.0, 9.0, 9.0]], jnp.float32)
    grown = problem._replace(
        points=jnp.concatenate([problem.points, extra], axis=0)
    )
    _, points, _ = optimize_bundle(grown, TUM_DEFAULT, iterations=3)
    np.testing.assert_allclose(np.asarray(points[-1]), [9.0, 9.0, 9.0], atol=1e-7)


def test_gauge_anchor_fixed():
    problem, gt_states, _ = make_synthetic_ba(n_poses=5, n_points=30, seed=6)
    states, _, _ = optimize_bundle(problem, TUM_DEFAULT, iterations=6)
    np.testing.assert_allclose(
        np.asarray(states[0]), np.asarray(problem.pose_states[0]), atol=1e-7
    )


def test_rank_deficient_landmark_does_not_poison_update():
    """A pixel-only landmark observed exactly on the optical axis has a
    projection Jacobian with a zero depth column, so its V block is exactly
    singular along that ray. Multiplicative damping alone cannot regularize
    a zero diagonal entry; without the absolute floor inv(Vd) is inf and the
    finite guard used to discard the ENTIRE window's update, silently
    returning the initialization."""
    problem, _, _ = make_synthetic_ba(n_poses=4, n_points=16, seed=7)
    # place a landmark on pose 0's optical axis (camera-frame (0, 0, 2)) at
    # the INITIAL estimate, observed only by pose 0 at the principal point
    # with z_weight 0 (pixel-only => scale direction unconstrained)
    T0 = se3.pose_matrix(problem.pose_states[0].astype(jnp.float64))
    p_w = (T0 @ jnp.asarray([0.0, 0.0, 2.0, 1.0], jnp.float64))[:3]
    degenerate = problem._replace(
        points=jnp.concatenate(
            [problem.points, p_w[None].astype(jnp.float32)], axis=0
        ),
        obs_pose=jnp.concatenate([problem.obs_pose, jnp.zeros(1, jnp.int32)]),
        obs_point=jnp.concatenate(
            [problem.obs_point,
             jnp.full((1,), problem.points.shape[0], jnp.int32)]
        ),
        obs_uv=jnp.concatenate(
            [problem.obs_uv,
             jnp.asarray([[TUM_DEFAULT.cx, TUM_DEFAULT.cy]], jnp.float32)]
        ),
        obs_z=jnp.concatenate([problem.obs_z, jnp.asarray([2.0], jnp.float32)]),
        weights=jnp.concatenate([problem.weights, jnp.ones(1, jnp.float32)]),
        z_weights=jnp.concatenate(
            [problem.z_weights, jnp.zeros(1, jnp.float32)]
        ),
    )
    _, _, c0 = optimize_bundle(degenerate, TUM_DEFAULT, iterations=0)
    states, _, c6 = optimize_bundle(degenerate, TUM_DEFAULT, iterations=6)
    assert float(c6) < 0.5 * float(c0)
    assert not np.allclose(
        np.asarray(states[1:]), np.asarray(degenerate.pose_states[1:])
    )


def test_sparse_schur_matches_dense():
    """schur='sparse' (pair-list fill, no dense W) must match the dense-W
    path — same problem, same damping schedule, near-identical iterates."""
    problem, _, _ = make_synthetic_ba(n_poses=5, n_points=24, seed=7)
    sd, pd, cd = optimize_bundle(problem, TUM_DEFAULT, iterations=6, schur="dense")
    ss, ps, cs = optimize_bundle(problem, TUM_DEFAULT, iterations=6, schur="sparse")
    np.testing.assert_allclose(np.asarray(ss), np.asarray(sd), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(pd), atol=2e-4)
    # both converge to float-noise cost (~1e-8); compare absolutely
    np.testing.assert_allclose(float(cs), float(cd), rtol=0.05, atol=1e-7)


def test_sparse_schur_sharded_matches_single_device():
    from phovo_tpu.parallel.mesh import make_mesh

    problem, _, _ = make_synthetic_ba(n_poses=5, n_points=24, seed=3)
    mesh = make_mesh(4)
    s1, p1, c1 = optimize_bundle(problem, TUM_DEFAULT, iterations=4, schur="sparse")
    s2, p2, c2 = optimize_bundle(
        problem, TUM_DEFAULT, mesh=mesh, iterations=4, schur="sparse"
    )
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), atol=1e-4)


def test_sparse_schur_scales_past_dense():
    """The map-scale case VERDICT r1 asked for: a 10k-landmark / ~50k-
    observation window optimizes WITHOUT materializing the (M, P, 6, 3)
    dense W (which would be 64*10000*18 floats = 46 MB plus the same-size
    WVinv intermediate). Small iteration count — this is a capacity test,
    run at reduced scale in CI (full scale in tools/ba_scale_bench.py)."""
    problem, gt_states, gt_points = make_synthetic_ba(
        n_poses=16, n_points=2000, seed=1
    )
    K = problem.obs_pose.shape[0]
    assert K >= 10_000
    s, p, c = optimize_bundle(problem, TUM_DEFAULT, iterations=3, schur="sparse")
    assert np.isfinite(float(c))
    # converges toward ground truth (noise-perturbed start)
    assert float(c) < 1.0


def test_auto_schur_selects_and_matches():
    """schur='auto' picks dense under the 256 MB W budget (and must equal
    the explicit dense result); beyond the budget it must route to sparse
    rather than materialize W."""
    import phovo_tpu.parallel.bundle_adjustment as ba

    problem, _, _ = make_synthetic_ba(
        n_poses=5, n_points=30, state_noise=0.02, point_noise=0.02, seed=3
    )
    sa, pa, ca = optimize_bundle(problem, TUM_DEFAULT, iterations=4, schur="auto")
    sd, pd, cd = optimize_bundle(problem, TUM_DEFAULT, iterations=4, schur="dense")
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sd), atol=0)
    np.testing.assert_allclose(np.asarray(ca), np.asarray(cd), atol=0)

    # big-problem routing: intercept the jit entry to observe pair args
    seen = {}
    orig = ba._optimize_bundle_jit

    def spy(problem, intr, damping, pair_a, pair_b, **kw):
        seen["sparse"] = pair_a is not None
        return orig(problem, intr, damping, pair_a, pair_b, **kw)

    big, _, _ = make_synthetic_ba(
        n_poses=2, n_points=1000, state_noise=0.01, point_noise=0.01, seed=0
    )
    ba._optimize_bundle_jit, restore = spy, orig
    try:
        optimize_bundle(big, TUM_DEFAULT, iterations=1, schur="auto")
        assert seen["sparse"] is False  # 2*2*1000*18*4 bytes << 256 MB
        # auto -> sparse branch: shrink the shared budget below this
        # problem's W footprint and the same call must route to sparse
        # (and still converge finitely)
        ba.DENSE_W_BUDGET_BYTES = 2 * 2 * 1000 * 18 * 4 - 1
        _, _, c_sp = optimize_bundle(
            big, TUM_DEFAULT, iterations=1, schur="auto"
        )
        assert seen["sparse"] is True
        assert np.isfinite(float(c_sp))
    finally:
        ba._optimize_bundle_jit = restore
        ba.DENSE_W_BUDGET_BYTES = 256e6

    import pytest

    with pytest.raises(ValueError):
        optimize_bundle(problem, TUM_DEFAULT, iterations=1, schur="bogus")
