"""Analytic Gauss-Newton backend.

Re-design of phovo::Analytic::CPhotoconsistencyOdometryAnalytic
(CPhotoconsistencyOdometryAnalytic.h:57-608): coarse-to-fine photometric
alignment with closed-form Jacobians and lambda-damped Gauss-Newton.

The entire Optimize() — intensity/depth pyramids, Scharr gradients, every
pyramid level, every GN iteration — compiles to ONE XLA program per
(config, image shape): Python drives the static level loop at trace time,
lax.while_loop drives iterations on-device, and the per-level linearization
is fused elementwise VPU work + two gathers + one (N,6)^T(N,6) MXU reduction
(see ops/residuals.py). No host round-trips inside an alignment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from phovo_tpu.models.base import AlignmentResult, PhotoconsistencyOdometryBase
from phovo_tpu.ops import pyramid as pyr
from phovo_tpu.ops.camera import Intrinsics
from phovo_tpu.ops.residuals import normal_equations, photometric_residual_jacobian
from phovo_tpu.solvers.gauss_newton import gauss_newton_level
from phovo_tpu.utils.config import PhovoConfig


@functools.partial(jax.jit, static_argnames=("config", "use_fused"))
def align_analytic(
    source_intensity: jax.Array,
    source_depth: jax.Array,
    target_intensity: jax.Array,
    target_depth: jax.Array,  # unused (reference SetTargetFrame ignores depth)
    intr: Intrinsics,
    init_state: jax.Array,
    config: PhovoConfig,
    use_fused: bool = False,
) -> AlignmentResult:
    del target_depth
    L = config.num_levels
    blur = tuple(config.blur_filter_sizes)
    int0 = pyr.build_pyramid(source_intensity, L, blur)
    dep0 = pyr.build_pyramid(source_depth, L, None)
    int1 = pyr.build_pyramid(target_intensity, L, blur)
    gx1, gy1 = pyr.build_gradient_pyramid(int1, tuple(config.gradient_scales))

    if use_fused:
        from phovo_tpu.ops.fused import fused_normal_equations as ne_fn
    else:
        ne_fn = None

    state = jnp.asarray(init_state, jnp.float32)
    diags = [None] * L
    for level in range(L - 1, -1, -1):
        intr_l = intr.at_level(level)

        def linearize(s, _lvl=level):
            if ne_fn is not None:
                return ne_fn(
                    int0[_lvl], dep0[_lvl], int1[_lvl], gx1[_lvl], gy1[_lvl],
                    s, intr_l,
                    min_depth=config.min_depth, max_depth=config.max_depth,
                    sampling=config.sampling, gradient_at=config.gradient_at,
                )
            r, J, valid = photometric_residual_jacobian(
                int0[_lvl], dep0[_lvl], int1[_lvl], gx1[_lvl], gy1[_lvl],
                s, intr_l,
                min_depth=config.min_depth, max_depth=config.max_depth,
                sampling=config.sampling, gradient_at=config.gradient_at,
            )
            return normal_equations(r, J, valid)

        res = gauss_newton_level(
            linearize,
            state,
            max_iterations=config.max_iterations[level],
            min_gradient_norm=config.min_gradient_norms[level],
            lambda_step=config.lambda_steps[level],
        )
        state = res.state
        diags[level] = res

    return AlignmentResult(
        state=state,
        iterations=jnp.stack([d.iterations for d in diags]),
        gradient_norm=jnp.stack([d.gradient_norm for d in diags]),
        cost=jnp.stack([d.cost for d in diags]),
        num_valid=jnp.stack([d.num_valid for d in diags]),
    )


class PhotoconsistencyOdometryAnalytic(PhotoconsistencyOdometryBase):
    """Object API over `align_analytic` (reference class:
    CPhotoconsistencyOdometryAnalytic, …Analytic.h:57)."""

    def __init__(self, config: PhovoConfig | None = None, use_fused: bool = False):
        super().__init__(config)
        self.use_fused = use_fused

    def align(self, si, sd, ti, td, intr, init_state) -> AlignmentResult:
        return align_analytic(
            si, sd, ti, td, intr, init_state, self.config, self.use_fused
        )
