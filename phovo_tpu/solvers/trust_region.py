"""Trust-region Levenberg-Marquardt honoring the Ceres parameter schema.

The reference delegates its autodiff backend to Ceres's trust-region LM with
per-level options read from YAML (CPhotoconsistencyOdometryCeres.h:464-477:
max iterations, function/gradient/parameter tolerances, initial/max/min
trust-region radius, min_relative_decrease). This module is a from-scratch
jit-compilable LM with the same control parameters and Ceres's radius-update
rule, so the reference's 8 ceres config presets drive it unchanged.

The step model is classic Levenberg-Marquardt on the normal equations:
    (J^T J + (1/radius) * diag(J^T J)) dx = -J^T r
(Ceres's LevenbergMarquardtStrategy with Jacobi scaling approximated by the
JtJ diagonal). Accept when rho = actual/predicted decrease exceeds
min_relative_decrease; radius grows as radius / max(1/3, 1 - (2 rho - 1)^3)
on acceptance and shrinks by 0.5 on rejection (Ceres's update rule).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class TRLevelResult(NamedTuple):
    state: jax.Array  # (6,)
    iterations: jax.Array  # int32
    cost: jax.Array  # final accepted cost
    gradient_norm: jax.Array  # max-norm of J^T r at termination
    radius: jax.Array  # final trust-region radius


class TROptions(NamedTuple):
    max_iterations: int = 50
    function_tolerance: float = 1e-6
    gradient_tolerance: float = 1e-10
    parameter_tolerance: float = 1e-8
    initial_trust_region_radius: float = 1e4
    max_trust_region_radius: float = 1e16
    min_trust_region_radius: float = 1e-32
    min_relative_decrease: float = 1e-3


def trust_region_level(
    residual_and_jacobian: Callable[[jax.Array], tuple[jax.Array, jax.Array]],
    init_state: jax.Array,
    opts: TROptions,
) -> TRLevelResult:
    """Run trust-region LM at one pyramid level.

    residual_and_jacobian(state) -> (r (N,), J (N, 6)); typically jacfwd of a
    pure residual function (see models/autodiff.py). Invalid pixels must
    already be zeroed in both r and J.
    """
    init_state = jnp.asarray(init_state, dtype=jnp.float32)
    if opts.max_iterations <= 0:
        zero = jnp.float32(0.0)
        return TRLevelResult(
            init_state, jnp.int32(0), zero, zero, jnp.float32(opts.initial_trust_region_radius)
        )

    def eval_cost(state):
        r, J = residual_and_jacobian(state)
        JtJ = jnp.einsum(
            "ni,nj->ij", J, J, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        Jtr = jnp.einsum("ni,n->i", J, r, precision=jax.lax.Precision.HIGHEST)
        cost = 0.5 * jnp.dot(r, r)
        return cost, JtJ, Jtr

    cost0, JtJ0, Jtr0 = eval_cost(init_state)

    # carry: state, cost, JtJ, Jtr, radius, iteration, done
    def cond(carry):
        _, _, _, _, _, it, done = carry
        return (it < opts.max_iterations) & jnp.logical_not(done)

    def body(carry):
        state, cost, JtJ, Jtr, radius, it, _ = carry
        diag = jnp.clip(jnp.diag(JtJ), 1e-12, 1e32)
        A = JtJ + jnp.diag(diag) / radius
        step = jnp.linalg.solve(A, -Jtr)
        step = jnp.where(jnp.all(jnp.isfinite(step)), step, jnp.zeros_like(step))

        new_state = state + step
        new_cost, new_JtJ, new_Jtr = eval_cost(new_state)

        # rho = actual decrease / model decrease; model decrease for LM step:
        # -step.(Jtr) - 0.5 step.JtJ.step  (positive when the model predicts
        # improvement).
        predicted = -jnp.dot(step, Jtr) - 0.5 * jnp.dot(step, JtJ @ step)
        predicted = jnp.maximum(predicted, 1e-30)
        rho = (cost - new_cost) / predicted

        accept = rho > opts.min_relative_decrease
        # Ceres radius update.
        grow = radius / jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        new_radius = jnp.where(accept, jnp.minimum(grow, opts.max_trust_region_radius), radius * 0.5)

        state_n = jnp.where(accept, new_state, state)
        cost_n = jnp.where(accept, new_cost, cost)
        JtJ_n = jnp.where(accept, new_JtJ, JtJ)
        Jtr_n = jnp.where(accept, new_Jtr, Jtr)

        # Termination tests (Ceres semantics).
        f_done = accept & (jnp.abs(cost - new_cost) <= opts.function_tolerance * cost)
        g_done = jnp.max(jnp.abs(Jtr_n)) <= opts.gradient_tolerance
        p_done = accept & (
            jnp.linalg.norm(step)
            <= opts.parameter_tolerance * (jnp.linalg.norm(state) + opts.parameter_tolerance)
        )
        r_done = new_radius < opts.min_trust_region_radius
        done = f_done | g_done | p_done | r_done
        return (state_n, cost_n, JtJ_n, Jtr_n, new_radius, it + 1, done)

    init = (
        init_state,
        cost0,
        JtJ0,
        Jtr0,
        jnp.float32(opts.initial_trust_region_radius),
        jnp.int32(0),
        jnp.max(jnp.abs(Jtr0)) <= opts.gradient_tolerance,
    )
    state, cost, _, Jtr, radius, it, _ = jax.lax.while_loop(cond, body, init)
    return TRLevelResult(state, it, cost, jnp.max(jnp.abs(Jtr)), radius)
