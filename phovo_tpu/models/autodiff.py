"""Autodiff trust-region backend (the reference's "Ceres" path, JAX-native).

Re-design of phovo::Ceres::CPhotoconsistencyOdometryCeres
(CPhotoconsistencyOdometryCeres.h:60-577): instead of Ceres Jet forward-mode
autodiff through a hand-written bilinear sampler with manual chain-rule
re-attachment (third_party/sample.h:104-123, third_party/jet_extras.h:73-110),
the residual is a pure JAX function of the state (ops/residuals.py
`residual_vector`) and jax.jacfwd provides the exact forward-mode Jacobian —
6 tangents pushed through the same fused pipeline. The solver is our own
jit-compiled trust-region LM honoring the Ceres YAML parameter schema
(solvers/trust_region.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from phovo_tpu.models.base import AlignmentResult, PhotoconsistencyOdometryBase
from phovo_tpu.ops import pyramid as pyr
from phovo_tpu.ops.camera import Intrinsics
from phovo_tpu.ops.residuals import residual_vector
from phovo_tpu.solvers.trust_region import trust_region_level
from phovo_tpu.utils.config import PhovoConfig


@functools.partial(jax.jit, static_argnames=("config",))
def align_autodiff(
    source_intensity: jax.Array,
    source_depth: jax.Array,
    target_intensity: jax.Array,
    target_depth: jax.Array,  # unused, like the reference Ceres backend
    intr: Intrinsics,
    init_state: jax.Array,
    config: PhovoConfig,
) -> AlignmentResult:
    del target_depth
    L = config.num_levels
    blur = tuple(config.blur_filter_sizes)
    int0 = pyr.build_pyramid(source_intensity, L, blur)
    dep0 = pyr.build_pyramid(source_depth, L, None)
    int1 = pyr.build_pyramid(target_intensity, L, blur)

    state = jnp.asarray(init_state, jnp.float32)
    diags = [None] * L
    for level in range(L - 1, -1, -1):
        intr_l = intr.at_level(level)

        def r_fn(s, _lvl=level):
            return residual_vector(
                s, int0[_lvl], dep0[_lvl], int1[_lvl], intr_l,
                min_depth=config.min_depth, max_depth=config.max_depth,
            )

        def r_and_J(s, _fn=r_fn):
            return _fn(s), jax.jacfwd(_fn)(s)

        res = trust_region_level(r_and_J, state, config.trust_region_options(level))
        state = res.state
        diags[level] = res

    zeros = jnp.float32(0.0)
    return AlignmentResult(
        state=state,
        iterations=jnp.stack([d.iterations for d in diags]),
        gradient_norm=jnp.stack([d.gradient_norm for d in diags]),
        cost=jnp.stack([d.cost for d in diags]),
        num_valid=jnp.stack([zeros for _ in diags]),
    )


class PhotoconsistencyOdometryAutodiff(PhotoconsistencyOdometryBase):
    """Object API over `align_autodiff` (reference class:
    CPhotoconsistencyOdometryCeres, …Ceres.h:60)."""

    def align(self, si, sd, ti, td, intr, init_state) -> AlignmentResult:
        return align_autodiff(si, sd, ti, td, intr, init_state, self.config)
