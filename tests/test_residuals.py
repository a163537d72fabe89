import jax
import jax.numpy as jnp
import numpy as np

from phovo_tpu.ops import se3
from phovo_tpu.ops.camera import Intrinsics, backproject
from phovo_tpu.ops.residuals import (
    normal_equations,
    photometric_residual_jacobian,
    biobjective_residual_jacobian,
    residual_vector,
    warp_and_jacobian,
)
from phovo_tpu.ops.warp import forward_warp, gather_warp, transform_points


def test_pixel_jacobian_matches_autodiff(intr, small_pair):
    """The 2x6 geometric Jacobian must equal jacfwd of the projection."""
    _, D0, _, _, _ = small_pair
    D0 = jnp.asarray(D0)
    state = jnp.array([0.03, -0.02, 0.01, 0.02, -0.015, 0.01], jnp.float32)

    col, row, _, J_pix, valid = warp_and_jacobian(D0, state, intr, 0.3, 5.0)

    def uv(s):
        T = se3.pose_matrix(s)
        tp = transform_points(backproject(D0, intr), T)
        c = tp[..., 0] * intr.fx / tp[..., 2] + intr.cx
        r = tp[..., 1] * intr.fy / tp[..., 2] + intr.cy
        return jnp.stack([c, r], axis=-1)

    J_auto = jax.jacfwd(uv)(state)  # (H, W, 2, 6)
    mask = np.asarray(valid)
    np.testing.assert_allclose(
        np.asarray(J_pix)[mask], np.asarray(J_auto)[mask], rtol=1e-3, atol=1e-3
    )


def test_zero_state_identical_frames_zero_residual(intr, small_pair):
    I0, D0, _, _, _ = small_pair
    gx = jnp.zeros_like(jnp.asarray(I0))
    r, J, valid = photometric_residual_jacobian(
        I0, D0, I0, gx, gx, jnp.zeros(6), intr, sampling="bilinear"
    )
    assert np.asarray(valid).sum() > 0.9 * I0.size
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-6)


def test_residual_vector_autodiff_shape(intr, small_pair):
    I0, D0, I1, _, _ = small_pair
    r = residual_vector(jnp.zeros(6), I0, D0, I1, intr)
    assert r.shape == (I0.size,)
    J = jax.jacfwd(residual_vector)(jnp.zeros(6), I0, D0, I1, intr)
    assert J.shape == (I0.size, 6)
    assert np.isfinite(np.asarray(J)).all()


def test_normal_equations_reduction(intr, small_pair):
    I0, D0, I1, _, _ = small_pair
    gx = jnp.ones_like(jnp.asarray(I0))
    r, J, valid = photometric_residual_jacobian(
        I0, D0, I1, gx, gx, jnp.zeros(6), intr
    )
    ne = normal_equations(r, J, valid)
    Jf = np.asarray(J).reshape(-1, 6)
    rf = np.asarray(r).reshape(-1)
    # float32 accumulation over ~12k rows: tolerance relative to the matrix
    # scale, not elementwise (off-diagonals can be ~1e-8 of the diagonal)
    ref_JtJ = Jf.T @ Jf
    scale = np.abs(ref_JtJ).max()
    np.testing.assert_allclose(np.asarray(ne.JtJ), ref_JtJ, atol=1e-5 * scale)
    ref_Jtr = Jf.T @ rf
    np.testing.assert_allclose(
        np.asarray(ne.Jtr), ref_Jtr, atol=1e-5 * max(np.abs(ref_Jtr).max(), 1.0)
    )
    np.testing.assert_allclose(np.asarray(ne.cost), rf @ rf, rtol=1e-4)
    # JtJ symmetric PSD
    np.testing.assert_allclose(np.asarray(ne.JtJ), np.asarray(ne.JtJ).T, rtol=1e-5)
    assert np.linalg.eigvalsh(np.asarray(ne.JtJ)).min() > -1e-3


def test_gauss_newton_gradient_matches_cost_gradient(intr, small_pair):
    """J^T r from the analytic kernel must match the autodiff gradient of
    0.5*sum(r^2) when using bilinear sampling + warped gradients given by
    differentiating the same interpolant (finite-check on a smooth scene)."""
    I0, D0, I1, _, gt = small_pair
    state = jnp.zeros(6)

    def half_cost(s):
        r = residual_vector(s, I0, D0, I1, intr)
        return 0.5 * jnp.dot(r, r)

    g_auto = jax.grad(half_cost)(state)
    # analytic J^T r with gradients = derivative of the bilinear interpolant:
    # approximate with central differences of I1 (close on smooth scenes)
    I1j = jnp.asarray(I1)
    gx = (jnp.roll(I1j, -1, 1) - jnp.roll(I1j, 1, 1)) / 2.0
    gy = (jnp.roll(I1j, -1, 0) - jnp.roll(I1j, 1, 0)) / 2.0
    r, J, valid = photometric_residual_jacobian(
        I0, D0, I1, gx, gy, state, intr, sampling="bilinear", gradient_at="warped"
    )
    ne = normal_equations(r, J, valid)
    cos = np.dot(np.asarray(ne.Jtr), np.asarray(g_auto)) / (
        np.linalg.norm(np.asarray(ne.Jtr)) * np.linalg.norm(np.asarray(g_auto))
    )
    assert cos > 0.99  # same descent direction


def test_biobjective_shapes_and_validity(intr, small_pair):
    I0, D0, I1, D1, _ = small_pair
    z = jnp.zeros_like(jnp.asarray(I0))
    r, J, valid = biobjective_residual_jacobian(
        I0, D0, I1, D1, z, z, z, z, jnp.zeros(6), intr
    )
    assert r.shape == (2,) + I0.shape
    assert J.shape == (2,) + I0.shape + (6,)
    # depth residual ~0 at ground-truth-consistent depths and zero state?
    # state 0 != gt, so nonzero; just check finite and masked
    assert np.isfinite(np.asarray(r)).all()
    assert (np.asarray(r)[:, ~np.asarray(valid)] == 0).all()


def test_forward_warp_identity(intr, small_pair):
    I0, D0, _, _, _ = small_pair
    warped = forward_warp(jnp.asarray(I0), jnp.asarray(D0), jnp.zeros(6), intr)
    # Identity warp scatters each pixel onto itself up to the reference's own
    # int-truncation semantics (CPhotoconsistencyOdometry.h:119-122): pixels
    # whose reprojected float coordinate rounds just below the integer land
    # one pixel off, so exact equality holds for most but not all pixels.
    m = np.asarray(D0) > 0
    diff = np.abs(np.asarray(warped)[m] - np.asarray(I0)[m])
    assert (diff < 1e-6).mean() > 0.8
    assert np.median(diff) == 0.0


def test_gather_warp_reconstructs_source(intr, small_pair):
    """Warping the target back through the ground-truth pose must
    approximately reproduce the source intensities (photoconsistency)."""
    I0, D0, I1, _, gt = small_pair
    warped, valid = gather_warp(jnp.asarray(I1), jnp.asarray(D0), jnp.asarray(gt), intr)
    m = np.asarray(valid)
    err = np.abs(np.asarray(warped)[m] - np.asarray(I0)[m])
    assert np.median(err) < 5e-3
