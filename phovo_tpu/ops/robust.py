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

All are vectorized elementwise ops (VPU-friendly, fuse into the residual
computation). Since the Gauss-Newton loops relinearize every iteration, the
reweighting converges alongside the state (standard IRLS)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOSSES = ("none", "huber", "cauchy", "tukey")


def robust_weight(residual: jax.Array, loss: str, delta: float) -> jax.Array:
    """IRLS weight per residual element. loss='none' returns ones."""
    if loss == "none":
        return jnp.ones_like(residual)
    a = jnp.abs(residual)
    if loss == "huber":
        return jnp.minimum(1.0, delta / jnp.maximum(a, 1e-12))
    if loss == "cauchy":
        return 1.0 / (1.0 + (residual / delta) ** 2)
    if loss == "tukey":
        q = jnp.clip(1.0 - (residual / delta) ** 2, 0.0, None)
        return q * q
    raise ValueError(f"unknown robust loss {loss!r}; expected one of {LOSSES}")


def sqrt_weight(residual: jax.Array, loss: str, delta: float) -> jax.Array:
    """sqrt of the IRLS weight — the factor applied to residual AND Jacobian
    rows so that the Gram of the scaled rows is the weighted normal system."""
    if loss == "none":
        return jnp.ones_like(residual)
    return jnp.sqrt(robust_weight(residual, loss, delta))
