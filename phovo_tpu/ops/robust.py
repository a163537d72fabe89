"""Robust loss functions as IRLS (iteratively reweighted least squares)
weights.

The reference minimizes a PURE quadratic photometric cost — every pixel,
including occlusions, specular highlights, and dynamic objects, enters the
normal equations at full weight (CPhotoconsistencyOdometryAnalytic.h:528-540
has no weighting of any kind). Production dense VO needs a robust kernel;
this module provides the standard ones as per-row weights w(r) such that
minimizing sum w(r) r^2 is one IRLS step toward minimizing sum rho(r):

    huber:  rho(r) = r^2/2 for |r|<=d, d(|r|-d/2) beyond
            w = min(1, d/|r|)
    cauchy: rho(r) = (d^2/2) log(1 + (r/d)^2)
            w = 1 / (1 + (r/d)^2)
    tukey:  rho saturates; outliers beyond d are cut off entirely
            w = (1 - (r/d)^2)^2 for |r|<d, 0 beyond
    tdist:  Student-t of TDIST_DOF degrees of freedom with an ADAPTIVE
            scale (Kerl et al., "Robust Odometry Estimation for RGB-D
            Cameras", ICRA 2013 — the DVO weighting): w = (nu+1)/(nu +
            (r/sigma)^2), where sigma is re-estimated from the residuals
            each Gauss-Newton iteration (one fixed-point step
            sigma^2 <- sum w r^2 / n per linearization, carried in the
            solver loop). Here `delta` IS the current scale sigma (the
            config robust_delta seeds the first iteration), so it may be a
            traced scalar.

All are vectorized elementwise ops (VPU-friendly, fuse into the residual
computation). Since the Gauss-Newton loops relinearize every iteration, the
reweighting converges alongside the state (standard IRLS)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOSSES = ("none", "huber", "cauchy", "tukey", "tdist")

# Student-t degrees of freedom for robust_loss='tdist'. nu=5 is the standard
# choice for photometric residuals (Kerl et al. 2013, §III-B).
TDIST_DOF = 5.0

# Floor for the adaptive tdist scale: a perfectly aligned (synthetic) pair
# would otherwise collapse sigma to 0 and divide by it next iteration.
# 1e-4 in unit-intensity terms is ~1/40 of one u8 quantization step.
TDIST_MIN_SCALE = 1e-4

# Scale-only fixed-point passes at the initial state of the FIRST active
# pyramid level (where sigma starts from the config seed): without them the
# first, nearly-unweighted GN step can commit to an outlier-biased basin
# before the scale adapts. Later levels inherit the previous level's sigma
# and need none. Measured on the 22%-occluder fixture: 4 passes recover the
# converged-fixed-point accuracy at the cost of 4 extra linearizations of
# the coarsest (cheapest) level.
TDIST_BURNIN = 4


def robust_weight(residual: jax.Array, loss: str, delta) -> jax.Array:
    """IRLS weight per residual element. loss='none' returns ones.

    delta is the loss's scale parameter — a static float for huber/cauchy/
    tukey, possibly a traced scalar (the carried adaptive sigma) for tdist.
    """
    if loss == "none":
        return jnp.ones_like(residual)
    if loss == "tdist":
        q = (residual / delta) ** 2
        return (TDIST_DOF + 1.0) / (TDIST_DOF + q)
    a = jnp.abs(residual)
    if loss == "huber":
        return jnp.minimum(1.0, delta / jnp.maximum(a, 1e-12))
    if loss == "cauchy":
        return 1.0 / (1.0 + (residual / delta) ** 2)
    if loss == "tukey":
        q = jnp.clip(1.0 - (residual / delta) ** 2, 0.0, None)
        return q * q
    raise ValueError(f"unknown robust loss {loss!r}; expected one of {LOSSES}")


def tdist_scale_update(weighted_cost, num_valid) -> jax.Array:
    """One fixed-point step of the t-distribution scale estimator:
    sigma^2 <- (1/n) sum_i w_i r_i^2, where weighted_cost = sum w r^2 is
    exactly the reweighted cost the normal-equation reductions already
    produce (Gram[6,6] in the fused kernels, NormalEquations.cost in XLA).
    """
    var = weighted_cost / jnp.maximum(num_valid, 1.0)
    return jnp.maximum(jnp.sqrt(var), TDIST_MIN_SCALE)


def sqrt_weight(residual: jax.Array, loss: str, delta: float) -> jax.Array:
    """sqrt of the IRLS weight — the factor applied to residual AND Jacobian
    rows so that the Gram of the scaled rows is the weighted normal system."""
    if loss == "none":
        return jnp.ones_like(residual)
    return jnp.sqrt(robust_weight(residual, loss, delta))
